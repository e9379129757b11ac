package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** The production LSH profile (128 hashes / 16 bands) runs behind the same
  * code path as the oracle-gated demo profile (8/4); this spec proves the
  * property that justifies shipping it: on PLANTED near-duplicates the
  * production profile's recall is at least the demo profile's, while its
  * sharper s-curve admits no more spurious candidates.
  */
class DedupProfileSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("graft-dedup-profile-test")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  val dir = "/root/testdata/sf0.001"

  test("128/16 profile recall on planted near-dups >= the gated 8/4 profile") {
    val base = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .filter(size(split(col("text"), " ")) >= 12)
      .limit(40)
      .localCheckpoint()
    // planted near-dup: same doc minus its last word (Jaccard ~0.9+), id
    // offset so planted pairs are exactly (id, id + Off)
    val Off = 1000000L
    val dups = base.select(
      (col("doc_id") + Off).as("doc_id"),
      expr("substring(text, 1, length(text) - length(element_at(split(text, ' '), -1)) - 1)").as("text"))
    val corpus = base.unionByName(dups).localCheckpoint()
    val planted = base.select(col("doc_id")).collect().map(_.getLong(0)).toSet

    def recallAndNoise(numHashes: Int, bands: Int): (Double, Long) = {
      val pairs = Dedup.minhashPairsOf(corpus, numHashes, bands)
        .select(col("a"), col("b")).localCheckpoint()
      val hits = pairs.filter(col("b") - col("a") === Off &&
        col("a").isin(planted.toSeq.map(Long.box): _*)).count()
      val noise = pairs.count() - hits
      (hits.toDouble / planted.size, noise)
    }

    val (demoRecall, demoNoise) = recallAndNoise(Dedup.NumHashes, Dedup.Bands)
    val (prodRecall, prodNoise) = recallAndNoise(Dedup.ProdNumHashes, Dedup.ProdBands)
    assert(prodRecall >= demoRecall,
      s"prod recall $prodRecall must be >= demo recall $demoRecall")
    assert(prodRecall >= 0.9, s"prod profile must catch planted dups, got $prodRecall")
    assert(prodNoise <= demoNoise,
      s"prod noise $prodNoise must not exceed demo noise $demoNoise (sharper s-curve)")
  }
}
