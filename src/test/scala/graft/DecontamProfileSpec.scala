package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextAnalysis

/** The production decontamination profile (8-gram shingles, the width
  * real pipelines run) executes behind the same [[TextAnalysis.decontamOf]]
  * code path as the oracle-gated 4-gram demo profile; this spec proves the
  * two properties that justify shipping it: planted verbatim contamination
  * is caught at full recall, while the narrower net admits no more
  * incidental (non-verbatim) collisions than the 4-gram. Mirrors
  * DedupProfileSpec's planted-recall gating of the 128/16 LSH profile.
  */
class DecontamProfileSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("graft-decontam-profile-test")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  val dir = "/root/testdata/sf0.001"

  test("8-gram production profile: full recall on planted contamination, less noise") {
    val W = TextAnalysis.DecontamShingleProd
    val docs = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .localCheckpoint()
    // eval docs (doc_id % 50 = 0) long enough to donate a verbatim W-gram
    // under decontamOf's own tokenizer
    val evalDocs = docs
      .filter(col("doc_id") % 50 === 0 &&
        size(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")) >= W)
      .limit(5)
      .localCheckpoint()
    assert(evalDocs.count() >= 3, "corpus must supply eval donors for the plant")
    // planted train docs: a verbatim W-token span lifted from an eval doc,
    // wrapped in filler that collides with nothing. Offset 1000001 keeps
    // every planted id on the train side ((id + 1000001) % 50 = 1).
    val Off = 1000001L
    val planted = evalDocs.select(
      (col("doc_id") + Off).as("doc_id"),
      concat(lit("zyxw filler prefix "),
        concat_ws(" ",
          slice(expr("regexp_extract_all(lower(text), '[a-z]+', 0)"), 1, W)),
        lit(" qpzm filler suffix")).as("text"))
    val corpus = docs.unionByName(planted).localCheckpoint()
    val plantedIds = planted.select(col("doc_id")).collect().map(_.getLong(0)).toSet

    val flagged8 = TextAnalysis.decontamOf(corpus, W)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(plantedIds.subsetOf(flagged8),
      s"8-gram profile must flag every planted doc; missed ${plantedIds -- flagged8}")

    // incidental collisions (everything flagged that was not planted) must
    // not exceed the wide-net 4-gram's — the sharper profile trades
    // sensitivity to loose paraphrase for precision on verbatim overlap
    val flagged4 = TextAnalysis.decontamOf(corpus, TextAnalysis.DecontamShingle)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(plantedIds.subsetOf(flagged4),
      "the verbatim plant contains a 4-gram overlap by construction")
    val noise8 = (flagged8 -- plantedIds).size
    val noise4 = (flagged4 -- plantedIds).size
    assert(noise8 <= noise4,
      s"8-gram incidental hits ($noise8) must not exceed 4-gram's ($noise4)")
  }
}
