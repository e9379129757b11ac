package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers — the co-located fact-fact join path (SURVEY
  * §5): writing both sides bucketed (and sorted) by the join key lets a
  * SortMergeJoin run with ZERO exchanges, because each task reads the
  * matching bucket files from both tables directly.
  *
  * At 100 TB this is the difference between re-shuffling the fact tables
  * on every join and paying the partitioning cost once at ingest:
  * `lineitem ⋈ orders` on orderkey becomes a scan-side merge.
  * BucketingSpec asserts the exchange-free plan shape.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key. With equal bucket
    * counts Catalyst plans a SortMergeJoin with no Exchange on either
    * side (verify with `.explain`). */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(left)
    val r = spark.table(right)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
