package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup: one untimed pass per query, so the timed pass measures
    // steady-state throughput (the scale-relevant number) rather than
    // first-touch janino/JIT compilation of each query's generated code —
    // which dominates at small SF and amortizes to zero on a real run.
    // Materialize via the noop sink, NOT count(): count() lets Catalyst
    // prune every unreferenced column, so per-row expression queries
    // (fingerprints, simhash, quality) would be timed as bare row counts.
    // noop forces full computation of all output columns.
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    ordered.foreach { case (_, fn) =>
      try run(fn) catch { case _: Throwable => () }
    }
    // Two timed passes, min per query: single-shot timings on shared
    // hosts absorb multi-second I/O stalls (dropped page cache, virtual
    // disk latency) that say nothing about the plan being measured.
    val results = ordered.map { case (name, fn) =>
      val secs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try run(fn) catch { case _: Throwable => () }
        (System.nanoTime() - t0) / 1e9
      }
      name -> secs.min
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
