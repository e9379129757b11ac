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

  /** Point lookup against a bucketed table: an equality predicate on the
    * bucket key prunes the scan to the single matching bucket (the plan
    * shows `SelectedBucketsCount: 1 out of N`), so the lookup reads 1/N
    * of the files — the layout answer to the reference's indexed
    * `get_single_node`, where a plain parquet scan must read everything.
    * Per-bucket sort (`sortBy`) additionally lets parquet row-group
    * min/max stats skip pages inside the bucket.
    *
    * Requires `spark.sql.sources.bucketing.autoBucketedScan.enabled=false`
    * for lookup-only plans: the DisableUnnecessaryBucketedScan rule only
    * credits joins/aggregations with a bucketing benefit and would
    * otherwise fall back to a full scan, discarding the pruning. This
    * helper pins the conf for the lookup and restores it after planning —
    * which means the pruning holds for actions on the RETURNED frame
    * (its plan is fixed here); deriving a new plan from it later
    * (.select/.filter/.count chains) re-plans under the restored conf
    * and loses the pruning. Lookup-heavy workloads should set the conf
    * at session level instead. */
  def pointLookup(spark: SparkSession, table: String, key: String,
                  value: Long): DataFrame = {
    val confKey = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.getOption(confKey)
    spark.conf.set(confKey, "false")
    try {
      val t = spark.table(table)
      val df = t.filter(t(key) === value)
      df.queryExecution.executedPlan // force planning under the pinned conf
      df
    } finally prev match {
      case Some(v) => spark.conf.set(confKey, v)
      case None => spark.conf.unset(confKey)
    }
  }
}
