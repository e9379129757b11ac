package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, StructField, StructType}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions

/** `graft_dsum` (the native long-pair decimal sum behind Relational.dsum)
  * must be VALUE- and TYPE-identical to `sum(CAST(x AS DECIMAL(18,6)))`
  * under non-ANSI cast semantics — the gated decimal queries hash against
  * DuckDB oracles built on exactly that equivalence. The adversarial rows
  * here aim at the implementation's two seams: the round-trip fast path's
  * accept/decline boundary (values whose shortest representation has a
  * 7th decimal digit of exactly 5, where naive `Math.round(d*1e6)` and
  * HALF_UP-on-the-decimal-string disagree) and the skip-like-null
  * handling of NaN/Infinity/precision-overflow inputs. */
class DecimalSumSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    // the reference semantics being replicated are the non-ANSI cast's
    // (overflow/NaN → null, skipped by sum); see MicrosSum scaladoc
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .appName("graft-decimal-sum-test")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  val dir = "/root/testdata/sf0.001"

  private def df(vs: Seq[java.lang.Double], parts: Int = 3): DataFrame = {
    val rows = vs.map(v => Row(v))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, parts),
      StructType(Seq(StructField("x", DoubleType, nullable = true))))
  }

  private def both(d: DataFrame): (Seq[Row], Seq[Row]) = {
    GraftFunctions.register(spark)
    val fast = d.agg(call_function("graft_dsum", col("x")).as("s")).collect().toSeq
    val ref = d.agg(sum(col("x").cast(DecimalType(18, 6))).as("s")).collect().toSeq
    (fast, ref)
  }

  private def assertSame(vs: Seq[java.lang.Double]): Unit = {
    val (fast, ref) = both(df(vs))
    assert(fast == ref, s"graft_dsum diverged on ${vs.take(12)}…: $fast vs $ref")
  }

  test("result type matches sum(cast(x as decimal(18,6))) exactly") {
    GraftFunctions.register(spark)
    val d = df(Seq[java.lang.Double](1.5))
    val fastT = d.agg(call_function("graft_dsum", col("x"))).schema.head.dataType
    val refT = d.agg(sum(col("x").cast(DecimalType(18, 6)))).schema.head.dataType
    assert(fastT == refT && fastT == DecimalType(28, 6))
  }

  test("business values: 2-decimal money, quantities, rates") {
    assertSame(Seq[java.lang.Double](
      0.01, 0.07, 38538.92, 904.00, 0.10, 49.0, 7.02, 123456.78, 0.00, 999999.99))
  }

  test("full-precision products (price * (1-disc) * (1+tax)) — slow path") {
    val ps = for {
      p <- Seq(901.0, 38538.92, 55010.51, 104949.5)
      d <- Seq(0.02, 0.07, 0.1)
      t <- Seq(0.0, 0.04, 0.08)
    } yield java.lang.Double.valueOf(p * (1 - d) * (1 + t))
    assertSame(ps)
  }

  test("half-boundary 7th-decimal values where Math.round(d*1e6) is wrong") {
    // shortest repr "x.xxxxxx5": HALF_UP on the decimal string rounds up,
    // while d*1e6 in binary can sit just below the half-integer
    assertSame(Seq[java.lang.Double](
      1.0000005, 2.0000015, -1.0000005, -2.0000015, 0.0000005, -0.0000005,
      123.4567895, 7.9999995, -7.9999995))
  }

  test("negatives, signed zero, and magnitude extremes inside the domain") {
    assertSame(Seq[java.lang.Double](
      -0.0, 0.0, -38538.92, -0.000001, 0.000001, -4.4e9, 4.4e9, 4.6e9,
      -4.6e9, 1.0e11, -1.0e11, 9.99999e11))
  }

  test("NaN / Infinity / precision overflow are skipped like null casts") {
    assertSame(Seq[java.lang.Double](
      Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
      1.0e13, -1.0e13, 1.0e300, 5.5, null))
    // ALL rows unconvertible → null result on both engines
    assertSame(Seq[java.lang.Double](Double.NaN, 1.0e13, null))
  }

  test("empty input and all-null group return null like sum") {
    assertSame(Seq.empty[java.lang.Double])
    assertSame(Seq[java.lang.Double](null, null, null))
  }

  test("random doubles: dense fuzz against the reference sum") {
    val rnd = new scala.util.Random(20260814L)
    // mixed regimes: grid-exact, full-precision, large, tiny, negative
    val vs: Seq[java.lang.Double] = (1 to 4000).map { i =>
      java.lang.Double.valueOf(rnd.nextInt(5) match {
        case 0 => math.floor(rnd.nextDouble() * 1e8) / 100.0
        case 1 => rnd.nextDouble() * 1e5 * (1 - rnd.nextDouble() * 0.1)
        case 2 => (rnd.nextDouble() - 0.5) * 1e12
        case 3 => rnd.nextDouble() * 1e-6
        case 4 => -rnd.nextDouble() * 1e4
      })
    }
    assertSame(vs)
    // and in many groups with per-group parity
    GraftFunctions.register(spark)
    val g = df(vs, 7).withColumn("k", pmod(crc32(col("x").cast("string")), lit(13)))
    val fast = g.groupBy(col("k"))
      .agg(call_function("graft_dsum", col("x")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDecimal(1)).toMap
    val ref = g.groupBy(col("k"))
      .agg(sum(col("x").cast(DecimalType(18, 6))).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDecimal(1)).toMap
    assert(fast == ref)
  }

  test("gated q1 on real data equals the pre-MicrosSum formulation") {
    val li = graft.sources.Tables.lineitem(spark, dir)
    val legacy = li
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity").cast(DecimalType(18, 6))), 2).cast("double").as("sum_qty"),
        round(sum(col("l_extendedprice").cast(DecimalType(18, 6))), 2).cast("double").as("sum_base_price"),
        round(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(DecimalType(18, 6))), 2).cast("double").as("sum_disc_price"),
        round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).cast(DecimalType(18, 6))), 2).cast("double").as("sum_charge"),
        round(sum(col("l_quantity").cast(DecimalType(18, 6))).cast("double") / count(lit(1)), 4).as("avg_qty"),
        round(sum(col("l_extendedprice").cast(DecimalType(18, 6))).cast("double") / count(lit(1)), 4).as("avg_price"),
        round(sum(col("l_discount").cast(DecimalType(18, 6))).cast("double") / count(lit(1)), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
      .collect().toSeq
    val current = graft.operators.Relational.pricingSummary(spark, dir)
      .orderBy(col("l_returnflag"), col("l_linestatus"))
      .collect().toSeq
    assert(current == legacy)
  }
}
