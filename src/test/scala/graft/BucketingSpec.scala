package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.Exchange
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Bucketing, Tables}

/** Proof of the co-located join path: bucketed+sorted tables joined on
  * the bucket key must plan a SortMergeJoin with ZERO exchanges — the
  * one-time-ingest-cost / no-per-join-shuffle trade a 100 TB deployment
  * relies on. */
class BucketingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val warehouse = Files.createTempDirectory("graft_wh").toString

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.warehouse.dir", warehouse)
    // force a real join strategy decision (no broadcast shortcut)
    .config("spark.sql.autoBroadcastJoinThreshold", "-1")
    .config("spark.ui.enabled", "false")
    .appName("graft-bucketing-test")
    .getOrCreate()

  override def afterAll(): Unit = {
    spark.stop()
    // the temp warehouse (three bucketed tables) must not accumulate
    // across runs
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(warehouse))
    try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(p => java.nio.file.Files.deleteIfExists(p))
    finally walk.close()
  }

  test("bucketed fact-fact join plans with zero exchanges") {
    val dir = "/root/testdata/sf0.001"
    Bucketing.writeBucketed(
      Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity"),
      "li_b", "l_orderkey", 8)
    Bucketing.writeBucketed(
      Tables.orders(spark, dir).select("o_orderkey", "o_custkey"),
      "o_b", "o_orderkey", 8)
    val joined = Bucketing.bucketedJoin(spark, "li_b", "o_b", "l_orderkey", "o_orderkey")
    val exchanges = joined.queryExecution.executedPlan.collect { case e: Exchange => e }
    assert(exchanges.isEmpty,
      s"expected exchange-free bucketed join, got:\n${joined.queryExecution.executedPlan}")
    // and the join is actually correct
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val expected = li.join(o, li("l_orderkey") === o("o_orderkey")).count()
    assert(joined.count() == expected)
  }

  test("point lookup on a bucketed table prunes to a single bucket") {
    val dir = "/root/testdata/sf0.001"
    Bucketing.writeBucketed(
      Tables.customer(spark, dir).select("c_custkey", "c_name", "c_mktsegment"),
      "cust_b", "c_custkey", 8)
    val lookup = Bucketing.pointLookup(spark, "cust_b", "c_custkey", 42L)
    val plan = lookup.queryExecution.executedPlan.toString
    assert(plan.contains("SelectedBucketsCount: 1 out of 8"),
      s"expected single-bucket scan, got:\n$plan")
    val rows = lookup.collect()
    assert(rows.length == 1 && rows.head.getLong(0) == 42L)
  }

  test("Wiki-Vote bucketed edge lookup (G15g) prunes to a single bucket") {
    // the real-dataset form of the same layout story: the gated
    // g_wikivote_lookup query reads 1/16 of the edge files ON ITS
    // AT-SCALE ROUTE — since the warm store landed, the default route at
    // this size serves from driver memory (a LocalTableScan), so the
    // layout pin runs with the knob off, which is exactly the 100 TB
    // routing. Both routes must agree on the result.
    val key = graft.graph.LocalExec.MaxBytesKey
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "0")
    val scanRoute =
      try {
        val lookup = graft.operators.GraphOps.wikivoteLookup(spark, "/root/testdata/sf0.001")
        val plan = lookup.queryExecution.executedPlan.toString
        assert(plan.contains("SelectedBucketsCount: 1 out of 16"),
          s"expected single-bucket scan of the Wiki-Vote edge table, got:\n$plan")
        lookup.collect().map(_.toString).toSet
      } finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    // hub 2565's out-degree in Wiki-VoteE.txt
    assert(scanRoute.size == 893)
    val warmRoute = graft.operators.GraphOps.wikivoteLookup(spark, "/root/testdata/sf0.001")
      .collect().map(_.toString).toSet
    assert(warmRoute == scanRoute, "warm route ≠ bucket-pruned scan route")
  }
}
