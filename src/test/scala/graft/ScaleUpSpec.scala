package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, expr}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.tools.ScaleUp

/** Pins the honesty contract of the sf1 scale-up corpus — the r15
  * advice failure class (a salt period longer than the shingle length
  * left half of each replica's 3-gram windows salt-free, so cross-block
  * copies sat at ~50% containment and the dedup family scaled ~x9 per
  * replication decade instead of ~linearly). The properties below are
  * what CORRECTNESS_SF1_SELF.json's dedup rows mean anything by. */
class ScaleUpSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .appName("graft-scaleup-test")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def salted(text: String, blk: Long): Array[String] = {
    import spark.implicits._
    Seq((text, blk)).toDF("text", "blk")
      .select(expr(ScaleUp.SaltedTextSql).as("t"))
      .head.getString(0).split(' ')
  }

  private def shingles(words: Array[String], k: Int = 3): Set[String] =
    words.sliding(k).map(_.mkString(" ")).toSet

  test("no 3-gram shingle of a replica survives from the original (cross-block decorrelation)") {
    val doc = "the quick brown fox jumps over the lazy dog again and again"
    val orig = doc.split(' ')
    for (blk <- Seq(1L, 2L, 9L)) {
      val rep = salted(doc, blk)
      // period 1 ≤ ShingleLen: the longest salt-free run is 1 word, so
      // EVERY 3-token window contains a block-keyed salt
      assert(shingles(rep).intersect(shingles(orig)).isEmpty,
        s"blk=$blk replica shares a 3-gram with the original")
      // and two different blocks' replicas of the SAME doc share none
      val rep2 = salted(doc, blk + 10)
      assert(shingles(rep).intersect(shingles(rep2)).isEmpty,
        s"blk=$blk and blk=${blk + 10} replicas share a 3-gram")
    }
  }

  test("within-block shared spans salt identically at ANY offset (content-keyed values)") {
    // the same 6-word span at word offsets 0, 1, and 3 of three docs:
    // index-keyed salts (the r15 bug) only aligned when the offsets
    // agreed mod the splice period — content-keyed salts always align
    val span = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(s"$span tail one", s"lead $span tail", s"x y z $span")
    val reps = docs.map(salted(_, blk = 3L))
    val spanShingles = reps.map(r => shingles(r).filter(_.contains("gamma")))
    // every salted 3-gram around the span's interior is identical
    // across the three offsets
    assert(spanShingles(0).nonEmpty)
    assert(spanShingles(0) === spanShingles(1))
    assert(spanShingles(1) === spanShingles(2))
  }

  test("block 0 is verbatim and identical replica texts stay identical") {
    val doc = "one two three four five"
    assert(salted(doc, 0L).mkString(" ") === doc)
    assert(salted(doc, 4L).sameElements(salted(doc, 4L)))
    // salts are pure [a-z] single tokens (ordinary words to every
    // tokenizer regex in the repo)
    val saltTokens = salted(doc, 4L).filterNot(doc.split(' ').contains)
    assert(saltTokens.nonEmpty && saltTokens.forall(_.matches("[a-z]+")))
  }

  test("embedding jitter is flat ±0.1% at every block, block 0 verbatim") {
    import spark.implicits._
    val base = Array(1.0f, -2.0f, 0.5f)
    val df = Seq((7L, base)).toDF("vec_id", "embedding")
    def jittered(blk: Long): Array[Float] = df
      .withColumn("blk", expr(s"CAST($blk AS BIGINT)"))
      .select(expr(ScaleUp.JitteredEmbeddingSql).as("e"))
      .head.getSeq[Float](0).toArray
    assert(jittered(0L).sameElements(base), "block 0 must be verbatim")
    for (blk <- Seq(1L, 10L, 100L)) {
      val j = jittered(blk)
      base.indices.foreach { i =>
        val rel = math.abs(j(i) / base(i) - 1.0)
        assert(rel <= 0.001 + 1e-7,
          f"blk=$blk coord $i jitter $rel%.5f exceeds ±0.1%%")
      }
    }
  }
}
