package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Relational / OLAP operator suite (SURVEY §2 R1-R13).
  *
  * Every query is a declarative DataFrame plan: filters/projections push to
  * the parquet scan, dimension joins are explicitly broadcast, fact joins
  * shuffle on their keys and rely on AQE for skew. Float aggregates are
  * rounded at the query edge only (oracle stability across engines), never
  * inside the plan.
  *
  * Reference semantics source: the reference is a graph benchmark
  * (databases.py); the relational substrate here is the engine these graph
  * ops run on, exercised TPC-H-style on the driver's tables.
  */
object Relational {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.types.DecimalType

  /** Exact-sum path for double money columns: cast each term to
    * decimal(18,6) (identical half-up rounding in Spark and DuckDB; 18
    * digits keeps the per-row value long-backed in UnsafeRow instead of a
    * 16-byte binary), sum exactly (associative — immune to partial-agg
    * ordering; the (28,6) sum buffer holds 22 integral digits, safe at any
    * SF), round, and surface as double. Summing raw doubles is
    * order-dependent and flakes the cross-engine hash at the cent
    * boundary. */
  /** Exact decimal sum of a double column, rounded and returned as double.
    * Routed through the native [[graft.functions.MicrosSum]] aggregate —
    * value- and type-identical to `round(sum(c.cast(DECIMAL(18,6))), s)`
    * (DecimalSumSpec pins parity) but with a primitive long-pair buffer
    * instead of a per-row BigDecimal accumulation: the decimal OLAP
    * queries (Q1 etc.) are conversion-bound on wide scans, and at one
    * task per parquet row group that per-row cost is the wall clock. */
  private def dsum(s: SparkSession, c: Column, scale: Int): Column = {
    graft.functions.GraftFunctions.register(s)
    round(call_function("graft_dsum", c), scale).cast("double")
  }

  /** The raw DECIMAL(28,6) exact sum (unrounded) — for averages that
    * divide the decimal total by a count, same route as [[dsum]]. */
  private def dsumRaw(s: SparkSession, c: Column): Column = {
    graft.functions.GraftFunctions.register(s)
    call_function("graft_dsum", c)
  }

  /** R1: scan + filter + project; both predicate and 3-column projection
    * must reach the parquet scan. */
  def scanFilter(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1999-01-01").cast("timestamp") &&
        col("l_quantity") < 5)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))

  /** R2: TPC-H Q1-style hash aggregation (map-side partial agg). */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(spark, col("l_quantity"), 2).as("sum_qty"),
        dsum(spark, col("l_extendedprice"), 2).as("sum_base_price"),
        dsum(spark, col("l_extendedprice") * (lit(1) - col("l_discount")), 2).as("sum_disc_price"),
        dsum(spark, col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 2).as("sum_charge"),
        round(dsumRaw(spark, col("l_quantity")).cast("double") / count(lit(1)), 4).as("avg_qty"),
        round(dsumRaw(spark, col("l_extendedprice")).cast("double") / count(lit(1)), 4).as("avg_price"),
        round(dsumRaw(spark, col("l_discount")).cast("double") / count(lit(1)), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** R3: TPC-H Q5-style multi-join. Broadcast hints only on the
    * genuinely fixed-size dimensions (region = 5 rows, nation = 25 rows
    * at EVERY scale factor). Customer and supplier grow with SF (×150k
    * and ×10k rows per SF) — at the 100 TB design point an unconditional
    * broadcast of either is an executor/driver OOM, so their joins carry
    * no hint and AQE picks the strategy (broadcast at small SF where they
    * fit the threshold, shuffle at large SF where they don't). */
  def localSupplierVolume(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    // r21 (guide §3.2 / §6, pre-filter the big side at the scan): the
    // region predicate restricts BOTH customer and supplier to ASIA
    // nations (c_nationkey = s_nationkey and s's nation is in ASIA), but
    // written only at the tail of the join chain it pruned nothing until
    // the final two broadcast joins — every intermediate join ran at
    // all-regions width. Resolve the ASIA nation-key list up front
    // (nation ⋈ region is a fixed ≤25-row dimension lookup — the same
    // bounded client-fetch class as the warm-store probes) and push it
    // into the customer and supplier SCANS as an `isin` predicate:
    // PushedFilters gains In(c_nationkey, …) / In(s_nationkey, …), so at
    // cluster scale ~4/5 of both tables never leaves parquet. The join
    // chain itself is untouched (same all-broadcast local plan; n_name
    // still attached by the tail nation/region broadcasts), and inner-
    // join algebra makes the added predicates redundant-but-earlier:
    // results identical, oracle-proven at sf0.001 and sf0.01.
    val asiaKeys = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir)
          .filter(col("r_name") === "ASIA").select(col("r_regionkey"))),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey")).collect().map(_.getInt(0)).sorted.toSeq
    val c = Tables.customer(spark, dir)
      .filter(col("c_nationkey").isin(asiaKeys: _*))
    val s = Tables.supplier(spark, dir)
      .filter(col("s_nationkey").isin(asiaKeys: _*))
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(s, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(dsum(spark, col("l_extendedprice") * (lit(1) - col("l_discount")), 2).as("revenue"))
  }

  /** R4: TPC-H Q3-style join+filter+agg (no LIMIT: deterministic set).
    * Customer is SF-scaled, so no broadcast hint (see R3's note): the
    * mktsegment filter pushes into its scan and AQE broadcasts the
    * filtered side only when its runtime size actually fits. */
  def shippingRevenue(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > lit("1996-07-01").cast("timestamp"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(dsum(spark, col("l_extendedprice") * (lit(1) - col("l_discount")), 2).as("revenue"))
  }

  /** R5: top-K on stored (non-aggregated) columns with an integer
    * tie-breaker — deterministic across engines. TakeOrderedAndProject:
    * no full sort, no full shuffle. */
  def topkOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .limit(10)

  /** R6: per-key top-N via row_number window (single shuffle on the
    * partition key; WindowGroupLimit pushes the rank filter down). */
  def windowTopN(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
  }

  /** R7: ROLLUP multi-dimensional aggregation (single pass, partial aggs). */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_rows"), dsum(spark, col("l_quantity"), 2).as("sum_qty"))

  /** R12: CUBE aggregation — all 2^k grouping-set combinations in a single
    * pass (Expand + partial aggs), completing the multi-dimensional family
    * next to R7's ROLLUP. */
  def cubeAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_rows"), dsum(spark, col("l_quantity"), 2).as("sum_qty"))

  /** R13: fixed-width histogram — equi-width binning of order totals via
    * integer bucket arithmetic (floor division; deterministic — no float
    * boundary ambiguity cross-engine). A single scan + partial-agg
    * groupBy on the bucket id: the classic distributed histogram. */
  def histogram(spark: SparkSession, dir: String): DataFrame = {
    val width = 20000L
    Tables.orders(spark, dir)
      .select((floor(col("o_totalprice") / width) * width).cast("long").as("bucket_lo"))
      .groupBy(col("bucket_lo"))
      .agg(count(lit(1)).as("n_orders"))
  }

  /** R14: TPC-H Q14-style promo revenue by part type — the fact-fact
    * shuffle join (lineitem ⋈ part on partkey): part scales with SF, so
    * unlike the dimension chain it is NOT broadcast; AQE picks the
    * strategy and splits skew at runtime. */
  def promoRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
    li.join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_type"))
      .agg(dsum(spark, col("l_extendedprice") * (lit(1) - col("l_discount")), 2).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** R8 over any (event_id, user_id, ts, event_type) frame — ONE
    * definition shared by the table-bound operator and the known-answer
    * spec, so the test exercises the production expressions rather than
    * a private copy. For each purchase, the most recent strictly-prior
    * click by the same user: a single window pass over the union (no
    * range-join explosion), one shuffle on user_id. */
  def asofJoinOf(events: DataFrame): DataFrame = {
    val e = events
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    e.withColumn("prior_click_id",
        last(when(col("event_type") === "click", col("event_id")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("prior_click_id"))
  }

  /** R8: as-of join on the driver's events table. */
  def asofJoin(spark: SparkSession, dir: String): DataFrame =
    asofJoinOf(Tables.events(spark, dir))

  /** R9 over any events frame (see asofJoinOf on why it is split out):
    * gap-based sessionization (30-min gap), batch form. Timestamps
    * compared in integer microseconds for cross-engine determinism. */
  def sessionizeOf(events: DataFrame): DataFrame = {
    val wOrd = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    events
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("us"), 1).over(wOrd))
      .withColumn("is_new",
        when(col("prev_us").isNull || col("us") - col("prev_us") > 1800000000L, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("is_new")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("us")).as("start_us"),
        max(col("us")).as("end_us"))
  }

  /** R9: sessionization on the driver's events table. */
  def sessionize(spark: SparkSession, dir: String): DataFrame =
    sessionizeOf(Tables.events(spark, dir))

  /** R10: event-time tumbling-window aggregation (batch twin of the
    * streaming S1 operator; windows are epoch-aligned 1h buckets). */
  def eventsWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"), window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n_events"), dsum(spark, col("value"), 2).as("sum_value"))
      .select(col("event_type"), unix_timestamp(col("w.start")).as("window_start_s"),
        col("n_events"), col("sum_value"))

  /** R11: left-semi and left-anti joins in one surface: customers with at
    * least one urgent order vs customers with no orders at all. */
  def semiAnti(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select(col("c_custkey"))
    val o = Tables.orders(spark, dir)
    val semi = c.join(o.filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .withColumn("tag", lit("has_urgent"))
    val anti = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .withColumn("tag", lit("no_orders"))
    semi.unionByName(anti)
  }

  /** R15: user pseudonymization — the privacy pass a training pipeline
    * applies before events leave the ingest boundary: the stable key is
    * replaced with a salted one-way hash, and downstream analytics (here:
    * per-user activity envelope) run on the pseudonym only. Pure per-row
    * expressions feeding one hash aggregation — zero extra shuffle beyond
    * the groupBy, same plan shape at any scale. */
  def pseudonymize(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(md5(concat(lit("graft-salt:"), col("user_id").cast("string"))).as("user_pseudo"),
        unix_micros(col("ts")).as("us"), col("event_type"))
      .groupBy(col("user_pseudo"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_event_types"),
        min(col("us")).as("first_us"),
        max(col("us")).as("last_us"))

  val pseudonymizeOracle: String =
    """SELECT md5('graft-salt:' || CAST(user_id AS VARCHAR)) AS user_pseudo,
      |  count(*) AS n_events,
      |  count(DISTINCT event_type) AS n_event_types,
      |  min(epoch_us(ts)) AS first_us,
      |  max(epoch_us(ts)) AS last_us
      |FROM events GROUP BY 1""".stripMargin

  /** R17: per-user inter-arrival gaps — the lag-window primitive (the one
    * window class R6/R8/R9 don't surface): consecutive event deltas per
    * user, reduced to an integer envelope. The window partitions on
    * user_id (hash-spread, no skewed key at any SF — a user's events are
    * bounded) and all outputs are exact BIGINT microseconds, so the gate
    * needs no float snapping. Equal-timestamp ties are harmless: the gap
    * MULTISET is determined by the sorted timestamp multiset alone, and
    * min/max/sum/count are multiset functions of it. */
  def eventDeltas(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
    Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .withColumn("gap_us", col("us") - lag(col("us"), 1).over(w))
      .groupBy(col("user_id"))
      .agg(count(col("gap_us")).as("n_gaps"),
        min(col("gap_us")).as("min_gap_us"),
        max(col("gap_us")).as("max_gap_us"),
        sum(col("gap_us")).as("sum_gap_us"))
      .filter(col("n_gaps") > 0)
  }

  val eventDeltasOracle: String =
    """SELECT user_id, count(gap_us) AS n_gaps,
      |  min(gap_us) AS min_gap_us, max(gap_us) AS max_gap_us,
      |  CAST(sum(gap_us) AS BIGINT) AS sum_gap_us
      |FROM (SELECT user_id,
      |        epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) AS gap_us
      |      FROM events)
      |GROUP BY user_id HAVING count(gap_us) > 0""".stripMargin

  /** R19: time-RANGE sliding window — each event's rolling count and
    * exact-decimal value sum over that user's preceding 10 minutes (the
    * rate-limit / rolling-exposure primitive; a RANGE frame, where R6 is
    * rows-framed top-N, R10 tumbling buckets, R17 lag). Deterministic
    * under timestamp ties by construction: a RANGE frame is a function
    * of the ORDER VALUE, so tied rows share one frame — no peer-order
    * sensitivity — and the sum is decimal-exact. The window partitions
    * on user_id: hash-spread, per-user data bounded, no global sort at
    * any SF. */
  def rangeWindow(spark: SparkSession, dir: String): DataFrame =
    rangeWindowOf(Tables.events(spark, dir))

  private[graft] def rangeWindowOf(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("tus"))
      .rangeBetween(-600000000L, 0L) // 10 min in micros, inclusive
    events
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("tus"), col("value"))
      .withColumn("n_in_window", count(lit(1)).over(w))
      .withColumn("roll_sum",
        round(sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 6))).over(w), 2)
          .cast("double"))
      .select(col("event_id"), col("user_id"), col("n_in_window"), col("roll_sum"))
  }

  val rangeWindowOracle: String =
    """SELECT event_id, user_id,
      |  count(*) OVER w AS n_in_window,
      |  CAST(round(sum(CAST(value AS DECIMAL(18,6))) OVER w, 2) AS DOUBLE) AS roll_sum
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |  RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)""".stripMargin

  /** R16: the explicit salted join ([[Skew.saltedJoin]]) gated against a
    * plain-join oracle — proof that salting is semantically invisible
    * (identical revenue per priority class, identical row multiplicity).
    * The orders side is replicated 16× (the salt fan-out) while lineitem
    * rows each take one salt, so a hot orderkey's lineitems spread over
    * 16 reducers instead of one. This is the fallback for the skew AQE
    * cannot fix: a single key whose rows exceed one executor even after
    * AQE's split, or a pipeline with AQE disabled (SURVEY §5). */
  def saltedRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    val ord = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority"))
    Skew.saltedJoin(li, ord, "l_orderkey", "o_orderkey")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        dsum(spark, col("l_extendedprice") * (lit(1) - col("l_discount")), 2).as("revenue"))
  }

  val saltedRevenueOracle: String =
    """SELECT o_orderpriority, count(*) AS n_items,
      |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))), 2) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority""".stripMargin

  /** Event types pivoted by R18 — explicit, in oracle column order: an
    * explicit value list keeps the output schema static (no extra
    * distinct-scan job, no schema drift if a type vanishes at some SF)
    * and is what a production pivot at scale should always do. */
  val PivotEventTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  /** R18: pivot — long-to-wide reshaping (per-cohort event-type revenue
    * matrix) via the DataFrame `pivot()` operator. Plan shape: pivot with
    * an explicit value list compiles to ONE hash aggregation over the
    * grouping key with a conditional-aggregate column per pivot value —
    * map-side combined, a single shuffle of one row per (cohort ×
    * 5 columns), never a row explosion; the DuckDB oracle spells that
    * same CASE WHEN formulation out. Decimal-exact sums via
    * [[dsum]]; absent cells are NULL on both engines. */
  def pivotEvents(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("cohort", col("user_id") % 50)
      .groupBy(col("cohort"))
      .pivot("event_type", PivotEventTypes)
      .agg(dsum(spark, col("value"), 2))

  val pivotEventsOracle: String = {
    val cols = PivotEventTypes.map(t =>
      s"""CAST(round(sum(CASE WHEN event_type = '$t' THEN CAST(value AS DECIMAL(38,6)) END), 2) AS DOUBLE) AS "$t"""")
    s"""SELECT user_id % 50 AS cohort,
       |  ${cols.mkString(",\n  ")}
       |FROM events GROUP BY 1""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pivot" -> pivotEvents,
    "q_range_window" -> rangeWindow,
    "q_salted_join" -> saltedRevenue,
    "q_event_deltas" -> eventDeltas,
    "q_pseudonymize" -> pseudonymize,
    "q_scan_filter" -> scanFilter,
    "q1_pricing_summary" -> pricingSummary,
    "q5_local_supplier" -> localSupplierVolume,
    "q3_shipping_revenue" -> shippingRevenue,
    "q_topk_orders" -> topkOrders,
    "q_window_topn" -> windowTopN,
    "q_rollup" -> rollupAgg,
    "q_cube" -> cubeAgg,
    "q_histogram" -> histogram,
    "q14_promo_revenue" -> promoRevenue,
    "q_asof_join" -> asofJoin,
    "q_sessionize" -> sessionize,
    "q_events_window" -> eventsWindow,
    "q_semi_anti" -> semiAnti)

  val oracles: Map[String, String] = Map(
    "q_pivot" -> pivotEventsOracle,
    "q_range_window" -> rangeWindowOracle,
    "q_salted_join" -> saltedRevenueOracle,
    "q_event_deltas" -> eventDeltasOracle,
    "q_pseudonymize" -> pseudonymizeOracle,
    "q_scan_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1999-01-01' AND l_quantity < 5""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(round(sum(CAST(l_quantity AS DECIMAL(38,6))), 2) AS DOUBLE) AS sum_qty,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(38,6))), 2) AS DOUBLE) AS sum_base_price,
        |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))), 2) AS DOUBLE) AS sum_disc_price,
        |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(38,6))), 2) AS DOUBLE) AS sum_charge,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / count(*), 4) AS avg_qty,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / count(*), 4) AS avg_price,
        |  round(CAST(sum(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE) / count(*), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q5_local_supplier" ->
      """SELECT n_name,
        |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))), 2) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name""".stripMargin,
    "q3_shipping_revenue" ->
      """SELECT o_orderkey, o_orderdate, o_orderpriority,
        |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))), 2) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1996-07-01'
        |  AND l_shipdate > TIMESTAMP '1996-07-01'
        |GROUP BY o_orderkey, o_orderdate, o_orderpriority""".stripMargin,
    "q_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q_window_topn" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
        |  CAST(round(sum(CAST(l_quantity AS DECIMAL(38,6))), 2) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "q_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
        |  CAST(round(sum(CAST(l_quantity AS DECIMAL(38,6))), 2) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,
    "q_histogram" ->
      """SELECT CAST(floor(o_totalprice / 20000) * 20000 AS BIGINT) AS bucket_lo,
        |  count(*) AS n_orders
        |FROM orders GROUP BY 1""".stripMargin,
    "q14_promo_revenue" ->
      """SELECT p_type,
        |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY p_type""".stripMargin,
    // Both event-ordering oracles sort by epoch_us(ts), not raw ts:
    // events.parquet is TIMESTAMP(NANOS) and Spark reads it truncated to
    // micros, so ordering the oracle at nano precision makes same-micro
    // ties resolve differently cross-engine (different prev row → different
    // as-of match / session boundary).
    // DuckDB sum() over integers yields HUGEINT, which pandas renders as
    // float64 ("4.0" vs Spark's "4" under the driver's value hash) — every
    // integer sum in an oracle must be CAST to BIGINT.
    "q_asof_join" ->
      """SELECT event_id, user_id, prior_click_id FROM (
        |  SELECT event_id, user_id, event_type,
        |    last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_click_id
        |  FROM events WHERE event_type IN ('purchase', 'click'))
        |WHERE event_type = 'purchase'""".stripMargin,
    "q_sessionize" ->
      """WITH t AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC) AS prev_us
        |  FROM events),
        |s AS (
        |  SELECT user_id, us,
        |    CAST(sum(CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY us ASC, event_id ASC
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM t)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(us) AS start_us, max(us) AS end_us
        |FROM s GROUP BY user_id, session_id""".stripMargin,
    "q_events_window" ->
      """SELECT event_type,
        |  CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start_s,
        |  count(*) AS n_events,
        |  CAST(round(sum(CAST(value AS DECIMAL(38,6))), 2) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q_semi_anti" ->
      """SELECT c_custkey, 'has_urgent' AS tag FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |UNION ALL
        |SELECT c_custkey, 'no_orders' AS tag FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin)
}
