package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated parquet tables.
  *
  * Each reader is a plain parquet scan; filters and projections applied by
  * callers reach the scan via Catalyst pushdown (verify with
  * `.explain("formatted")` → `PushedFilters` / `ReadSchema`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The events table stores `ts` as parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects. Read nanos as long (legacy conf) and convert
    * to a microsecond timestamp — truncation, matching DuckDB's epoch_us. */
  def eventsRaw(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    apply(s, d, "events")
  }

  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, timestamp_micros, expr}
    normalizeTs(eventsRaw(s, d))
  }

  /** Normalize the generator's `ts` column to a session-TZ (UTC)
    * TimestampType whatever physical type the parquet carries — the
    * driver has shipped both int64 NANOS (read as long under the legacy
    * conf, truncated to micros like DuckDB's epoch_us) and plain
    * TIMESTAMP[us] (NTZ under Spark's reader; the UTC-session cast keeps
    * the same instant). Downstream operators and the DuckDB oracles
    * (`epoch_us(ts)`) see identical microsecond values either way. */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, timestamp_micros, expr}
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
