package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{BottomK, GraftFunctions}

/** BottomK custom aggregate: correctness vs the collect_set reference,
  * partition-merge invariance, and KMV estimate accuracy. */
class SketchSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("graft-sketch-test")
    .getOrCreate()

  override def beforeAll(): Unit = GraftFunctions.register(spark)
  override def afterAll(): Unit = spark.stop()

  test("bottom-k equals sorted-distinct-take-k, regardless of partitioning") {
    import org.apache.spark.sql.functions._
    val df = spark.range(5000)
      .selectExpr("id % 7 AS g", "md5(CAST(id % 800 AS STRING)) AS h")
    def sketch(parts: Int): Map[Long, Seq[String]] =
      df.repartition(parts)
        .groupBy(col("g")).agg(expr("graft_bottomk(h, 16)").as("s"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val expected = df.groupBy(col("g"))
      .agg(slice(array_sort(collect_set(col("h"))), 1, 16).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(sketch(1) == expected)
    assert(sketch(13) == expected) // partial-merge path must agree
  }

  test("exact below k: groups with < k distinct values return all of them") {
    import org.apache.spark.sql.functions._
    val df = spark.range(100).selectExpr("md5(CAST(id % 5 AS STRING)) AS h")
    val s = df.agg(expr("graft_bottomk(h, 16)")).collect().head.getSeq[String](0)
    assert(s.length == 5)
    assert(s == s.sorted)
  }

  test("KMV estimate within 35% on 1000 distinct hashed values") {
    import org.apache.spark.sql.functions._
    val df = spark.range(20000).selectExpr("md5(CAST(id % 1000 AS STRING)) AS h")
    val sketch = df.agg(expr("graft_bottomk(h, 64)")).collect().head.getSeq[String](0)
    val est = BottomK.kmvEstimate(sketch, 64)
    assert(est > 650 && est < 1350, s"estimate $est too far from 1000")
  }
}
