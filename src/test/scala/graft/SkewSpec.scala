package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew
import graft.sources.Tables

/** saltedJoin must be a drop-in for the plain equi-join: same rows, same
  * multiplicities, on a genuinely skewed key distribution. */
class SkewSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("graft-skew-test")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("saltedJoin works on map-typed columns and byte-identical duplicate rows") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 200 IDENTICAL left rows on one key (the shape a row-content-hash
    // salt cannot spread — and whose map column it cannot even hash)
    val left = Seq.fill(200)((1L, "dup")).toDF("k", "v")
      .withColumn("props", map(lit("a"), lit("b")))
      .repartition(4)
    val right = Seq((1L, "dim"), (2L, "unmatched")).toDF("rk", "name")
    val joined = Skew.saltedJoin(left, right, "k", "rk", saltFactor = 8)
    assert(joined.count() == 200)
    assert(joined.select("name").distinct().collect().map(_.getString(0)).toSeq == Seq("dim"))
  }

  test("saltedJoin matches the plain join on a hot-key distribution") {
    import spark.implicits._
    // 90% of left rows hit key 1 (the hot key), the rest spread out
    val left = spark.range(10000)
      .selectExpr("CASE WHEN id % 10 < 9 THEN 1 ELSE id END AS k", "id AS payload")
    val right = Seq((1L, "hot"), (19L, "cold"), (39L, "cold2"), (999999L, "miss"))
      .toDF("rk", "tag")
    val plain = left.join(right, left("k") === right("rk"))
      .selectExpr("k", "payload", "tag").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    val salted = Skew.saltedJoin(left, right, "k", "rk", saltFactor = 8)
      .selectExpr("k", "payload", "tag").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    assert(salted == plain)
    assert(plain.count(_._3 == "hot") == 9000)
  }

  test("saltedJoin on real tables matches the plain fact-dimension join") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select("l_orderkey", "l_suppkey")
    val s = Tables.supplier(spark, "/root/testdata/sf0.001")
      .select("s_suppkey", "s_name")
    val plain = li.join(s, li("l_suppkey") === s("s_suppkey")).count()
    val salted = Skew.saltedJoin(li, s, "l_suppkey", "s_suppkey").count()
    assert(salted == plain)
  }
}
