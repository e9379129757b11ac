package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{BloomBits, GraftFunctions}
import graft.operators.Dedup

/** Bloom membership sketch: the no-false-negative contract, partition
  * invariance (the mergeable-state property the map-side build relies
  * on), fpp sanity, and the D11 operator's equivalence to the exact
  * join it prefilters. */
class BloomSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("graft-bloom-test")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  val dir = "/root/testdata/sf0.001"

  private val Bits = 1 << 14 // 16k bits for ~1k inserts: m/n ≈ 16
  private val Hashes = 5

  private def buildFilter(parts: Int): Array[Byte] = {
    GraftFunctions.register(spark)
    spark.range(0, 1000).repartition(parts)
      .selectExpr("xxhash64(CAST(id AS STRING)) AS h")
      .selectExpr(s"graft_bloom_agg(h, $Bits, $Hashes) AS bf")
      .collect()(0).getAs[Array[Byte]](0)
  }

  test("no false negatives: every inserted value probes true") {
    val bf = buildFilter(4)
    val misses = spark.range(0, 1000)
      .selectExpr("xxhash64(CAST(id AS STRING)) AS h").collect()
      .map(_.getLong(0)).count(h => !BloomBits.mightContain(bf, h))
    assert(misses == 0, s"$misses inserted values probed false")
  }

  test("partition invariance: 1-partition and 8-partition builds are byte-identical") {
    // OR is commutative/associative and insertion idempotent, so the
    // final bit array cannot depend on how rows were split across
    // partial buffers — the property that makes the one-scan build safe
    assert(java.util.Arrays.equals(buildFilter(1), buildFilter(8)))
  }

  test("false-positive rate on disjoint probes stays near the design point") {
    val bf = buildFilter(4)
    // 10k values disjoint from the inserted keyspace
    val fps = spark.range(1000000, 1010000)
      .selectExpr("xxhash64(CAST(id AS STRING)) AS h").collect()
      .map(_.getLong(0)).count(h => BloomBits.mightContain(bf, h))
    // k=5, m/n=16.4 → theoretical fpp ≈ 0.1%; allow generous slack
    assert(fps < 100, s"$fps/10000 false positives — far above the m/n=16, k=5 design point")
  }

  test("probe expression matches the Scala helper through codegen") {
    val bf = buildFilter(4)
    GraftFunctions.register(spark)
    import spark.implicits._
    val got = spark.range(0, 2000).map(_.toString).toDF("s")
      .selectExpr("xxhash64(s) AS h")
      .crossJoin(Seq(bf).toDF("bf"))
      .selectExpr("h", "graft_bloom_contains(bf, h) AS hit")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    got.foreach { case (h, hit) =>
      assert(hit == BloomBits.mightContain(bf, h)) }
  }

  test("D11: bloom prefilter + exact verify equals the exact join") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val bloom = rows(Dedup.bloomSeenShingles(spark, dir))
    val exact = rows(Dedup.seenShinglesExact(spark, dir))
    assert(bloom == exact,
      s"bloom path diverged from exact: only-bloom=${bloom -- exact} only-exact=${exact -- bloom}")
    assert(exact.nonEmpty, "gate would be vacuous — no cross-source shingle overlap at sf0.001")
  }
}
