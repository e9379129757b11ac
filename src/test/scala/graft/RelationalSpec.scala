package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** Hand-computed unit semantics for the window-based relational
  * operators (the DuckDB oracle verifies them at sf0.01; these tiny
  * known-answer cases localize a failure to the operator, not the
  * data). Drives the PRODUCTION operators (Relational.asofJoinOf /
  * sessionizeOf) on small in-memory frames — not copies of their
  * expressions. */
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

  test("rangeWindow: 10-min RANGE frame is inclusive, per-user, and tie-stable") {
    val e = events(
      (1L, 0, 7L, "click"), (2L, 5, 7L, "click"), (3L, 9, 7L, "click"),
      (4L, 11, 7L, "click"), (5L, 30, 7L, "click"), (8L, 20, 7L, "click"),
      // timestamp tie: both rows must see the SAME frame (RANGE peers)
      (6L, 2, 8L, "view"), (7L, 2, 8L, "view"))
    val got = Relational.rangeWindowOf(e).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    // the EXACT boundary is inside the frame (inclusive bound): m30 sees
    // m20 (a gap of exactly 600000000 µs); m20 sees m11 but not m9
    assert(got == Map(
      1L -> ((1L, 1.0)), 2L -> ((2L, 2.0)), 3L -> ((3L, 3.0)),
      4L -> ((3L, 3.0)), 8L -> ((2L, 2.0)), 5L -> ((2L, 2.0)),
      6L -> ((2L, 2.0)), 7L -> ((2L, 2.0))), got.toString)
  }

  test("pivot: wide schema is static and cells equal the filtered group sums") {
    val got = Relational.pivotEvents(spark, "/root/testdata/sf0.001")
    assert(got.columns.toSeq == "cohort" +: Relational.PivotEventTypes)
    val rows = got.collect().map(r => r.getLong(0) -> r).toMap
    // independent recomputation of two cells from the raw table
    val raw = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select(org.apache.spark.sql.functions.expr("user_id % 50").as("cohort"),
        org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.col("value")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    for (cohort <- Seq(0L, 7L); t <- Seq("click", "view")) {
      val vals = raw.collect { case (c, tt, v) if c == cohort && tt == t => v }
      val expected =
        if (vals.isEmpty) null
        else {
          // same exact-decimal route as the operator: micros fixed point
          val micros = vals.map(v => BigDecimal(v).setScale(6)).sum
          Double.box(micros.setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
      val idx = got.columns.indexOf(t)
      assert(rows(cohort).get(idx) == expected,
        s"cohort $cohort type $t: got ${rows(cohort).get(idx)} expected $expected")
    }
  }

  test("as-of join: latest strictly-prior click, none at session start") {
    val e = events(
      (1L, 0, 7L, "click"), (2L, 5, 7L, "purchase"), (3L, 6, 7L, "click"),
      (4L, 9, 7L, "purchase"), (5L, 1, 8L, "purchase"))
    val got = Relational.asofJoinOf(e)
      .select("event_id", "prior_click_id").collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long]))).toMap
    assert(got == Map(2L -> Some(1L), 4L -> Some(3L), 5L -> None))
  }

  test("sessionization: 30-min gap splits sessions, per-user counters") {
    val e = events(
      (1L, 0, 7L, "c"), (2L, 10, 7L, "c"), (3L, 50, 7L, "c"), // gap 40 → split
      (4L, 55, 7L, "c"), (5L, 0, 8L, "c"))
    val got = Relational.sessionizeOf(e)
      .select("user_id", "session_id", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((7L, 1L, 2L), (7L, 2L, 2L), (8L, 1L, 1L)))
  }

  test("sessionization boundaries: start/end are the session's min/max micros") {
    val e = events((1L, 0, 7L, "c"), (2L, 10, 7L, "c"), (3L, 50, 7L, "c"))
    val got = Relational.sessionizeOf(e)
      .select("session_id", "start_us", "end_us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 0L, 10L * 60000000L), (2L, 50L * 60000000L, 50L * 60000000L)))
  }
}
