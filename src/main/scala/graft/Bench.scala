package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-query resource profile accumulated from task-end events — the Spark
  * analog of the reference profiler's cpu_percent/memory sampling
  * (benchmark.py:60-99): executor CPU time is summed across tasks, peak
  * execution memory is the max any single task held. */
class QueryMetricsListener extends SparkListener {
  private val cpuNs = new AtomicLong(0L)
  private val peakMem = new AtomicLong(0L)

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    val m = taskEnd.taskMetrics
    if (m != null) {
      cpuNs.addAndGet(m.executorCpuTime)
      peakMem.getAndUpdate(p => math.max(p, m.peakExecutionMemory))
    }
  }

  /** (executor CPU seconds, peak single-task execution memory MB) since the
    * last snapshot; resets both counters. */
  def snapshot(): (Double, Double) = {
    val r = (cpuNs.getAndSet(0L) / 1e9, peakMem.getAndSet(0L) / 1048576.0)
    r
  }
}

object Bench {

  def jsonNum(d: Double): String = f"$d%.4f"

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new QueryMetricsListener
    spark.sparkContext.addSparkListener(listener)
    println(benchLine(spark, listener, sfDir))
    spark.stop()
  }

  /** Run every SparkEntry query at one SF; returns the driver-contract JSON
    * line. Failed queries are reported under "errors" and excluded from the
    * total instead of being silently timed as ~0 s successes. */
  def benchLine(spark: SparkSession, listener: QueryMetricsListener,
                sfDir: String,
                queries: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] =
                  SparkEntry.queries): String = {
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
    val ordered = queries.toSeq.sortBy(_._1)
    ordered.foreach { case (_, fn) =>
      try run(fn) catch { case _: Throwable => () }
      Reset.clear(spark) // reference bench semantics: clear between runs
    }
    // Two timed passes, min per query: single-shot timings on shared
    // hosts absorb multi-second I/O stalls (dropped page cache, virtual
    // disk latency) that say nothing about the plan being measured.
    listener.snapshot() // drop warmup-attributed metrics
    val results = ordered.map { case (name, fn) =>
      var err: Option[String] = None
      val secs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try run(fn) catch {
          case t: Throwable =>
            err = Some(Option(t.getMessage).getOrElse(t.getClass.getName)
              .replaceAll("[\"\\\\\n\r\t]", " ").take(200))
        }
        (System.nanoTime() - t0) / 1e9
      }
      // listener events are posted asynchronously; give the bus a moment
      // before attributing the snapshot to this query
      Thread.sleep(50)
      val (cpuS, peakMb) = listener.snapshot()
      Reset.clear(spark)
      (name, secs.min, cpuS, peakMb, err)
    }
    val ok = results.filter(_._5.isEmpty)
    val qs = ok.map { case (k, v, _, _, _) => s"\"$k\":${jsonNum(v)}" }
      .mkString("{", ",", "}")
    val cpu = ok.map { case (k, _, c, _, _) => s"\"$k\":${jsonNum(c)}" }
      .mkString("{", ",", "}")
    val mem = ok.map { case (k, _, _, m, _) => s"\"$k\":${jsonNum(m)}" }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, _, _, Some(e)) => s"\"$k\":\"$e\"" }
      .mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    s"""{"metric":"total","value":${jsonNum(total)},"unit":"sec","queries":$qs,""" +
      s""""cpu_s":$cpu,"peak_task_mem_mb":$mem,"errors":$errs,"sf":"$sfDir"}"""
  }
}
