package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextAnalysis
import graft.operators.{Relational, Similarity}

/** Physical-plan shape proofs for the scale claims the operators make
  * (SURVEY §5): pushdown reaches the parquet scan, small sides broadcast,
  * the IVF assignment is exchange-free. These are the properties that
  * decide whether a plan survives a 100 TB input, so they are pinned as
  * tests rather than left to .explain() spot checks.
  */
class PlanShapeSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("graft-planshape-test")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  val dir = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("scanFilter pushes predicate and projection into the parquet scan") {
    val p = plan(Relational.scanFilter(spark, dir))
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("l_quantity"), p)
    // pruned read schema: none of the 13 unreferenced lineitem columns
    assert(!p.contains("l_comment"), "projection must not read l_comment\n" + p)
  }

  test("Q5 dimension chain broadcasts; fact joins shuffle") {
    // disable size-based auto-broadcast: at sf0.001 EVERY table fits the
    // 10MB threshold, which would hide the 100 TB shape. With it off, only
    // the explicit broadcast() hints survive — which is exactly the claim:
    // dimensions broadcast by declaration, the fact join shuffles.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = plan(Relational.localSupplierVolume(spark, dir))
      assert(p.contains("BroadcastHashJoin"), p)
      assert(p.contains("ShuffledHashJoin") || p.contains("SortMergeJoin"), p)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("decontam joins the corpus against a broadcast eval shingle set") {
    val p = plan(TextAnalysis.decontam(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"),
      "eval set must broadcast, never sort-merge the corpus\n" + p)
  }

  test("IVF centroid assignment is exchange-free (scan + broadcast only)") {
    // the PRODUCTION assignment stage (ivfAnn checkpoints exactly this
    // plan): the centroid row aggregates through a broadcast; the corpus
    // side must see no shuffle Exchange at all
    val p = plan(Similarity.ivfAssignment(spark, dir))
    assert(!p.contains("Exchange hashpartitioning"),
      "corpus-side shuffle in IVF assignment\n" + p)
  }

  test("stratifiedSample and hashSplit are single-scan, shuffle-free plans") {
    for (df <- Seq(TextAnalysis.stratifiedSample(spark, dir),
                   TextAnalysis.hashSplit(spark, dir))) {
      val p = plan(df)
      assert(!p.contains("Exchange"), "per-row operators must not shuffle\n" + p)
    }
  }
}
