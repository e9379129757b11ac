package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed unit semantics for the window-based relational
  * operators (the DuckDB oracle verifies them at sf0.01; these tiny
  * known-answer cases localize a failure to the operator, not the
  * data). Exercises the same expressions as Relational.asofJoin /
  * sessionize via small in-memory frames. */
class RelationalSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("graft-relational-test")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def ts(minute: Int) = new Timestamp(minute * 60000L)

  private def events(rows: (Long, Int, Long, String)*): DataFrame = {
    import spark.implicits._
    rows.map { case (id, m, u, t) => (id, ts(m), u, t, 1.0) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
  }

  test("as-of join: latest strictly-prior click, none at session start") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val e = events(
      (1L, 0, 7L, "click"), (2L, 5, 7L, "purchase"), (3L, 6, 7L, "click"),
      (4L, 9, 7L, "purchase"), (5L, 1, 8L, "purchase"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val got = e.withColumn("prior_click_id",
        last(when(col("event_type") === "click", col("event_id")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select("event_id", "prior_click_id").collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long]))).toMap
    assert(got == Map(2L -> Some(1L), 4L -> Some(3L), 5L -> None))
  }

  test("sessionization: 30-min gap splits sessions, per-user counters") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val e = events(
      (1L, 0, 7L, "c"), (2L, 10, 7L, "c"), (3L, 50, 7L, "c"), // gap 40 → split
      (4L, 55, 7L, "c"), (5L, 0, 8L, "c"))
    val wOrd = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val got = e.withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("us"), 1).over(wOrd))
      .withColumn("is_new",
        when(col("prev_us").isNull || col("us") - col("prev_us") > 1800000000L, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("is_new")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((7L, 1L, 2L), (7L, 2L, 2L), (8L, 1L, 1L)))
  }
}
