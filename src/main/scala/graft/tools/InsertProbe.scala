package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Diagnostic harness for the per-op insert floor (S7): prints each
  * flavor's per-batch duration breakdown (walCommit / commitOffsets /
  * addBatch / queryPlanning, from StreamingQueryProgress), codegen
  * compile counts, and job/task totals — then times the SAME projection
  * and ingest-gate expression trees as plain 1-row batch queries with no
  * streaming machinery at all, which bounds Spark's irreducible per-query
  * planning+schedule+task cost for those trees. The delta between the
  * streamed and batch numbers is what micro-batching actually adds.
  *
  * This run backs the floor claims in PROGRESS.md: with the WAL shell
  * forks gone (see [[graft.streaming.NioCheckpointFileManager]]), a warm
  * singleton batch pays ~2 ms WAL + ~25 ms micro-batch machinery on top
  * of the per-query floor — the remaining per-op cost is plan-size-
  * driven (planning + task setup), constant in corpus size. */
object InsertProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(8)
    spark.sparkContext.setLogLevel("WARN")
    val durations = new java.util.concurrent.ConcurrentLinkedQueue[Map[String, Long]]()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        import scala.jdk.CollectionConverters._
        durations.add(e.progress.durationMs.asScala.view.mapValues(_.toLong).toMap)
      }
    })
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val jobMs = new java.util.concurrent.atomic.AtomicLong(0L)
    val taskMs = new java.util.concurrent.atomic.AtomicLong(0L)
    val tasks = new java.util.concurrent.atomic.AtomicInteger(0)
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobStart.put(e.jobId, System.nanoTime())
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        jobs.incrementAndGet()
        Option(jobStart.remove(e.jobId)).foreach(t0 => jobMs.addAndGet((System.nanoTime() - t0) / 1000000))
      }
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (e.taskInfo != null) taskMs.addAndGet(e.taskInfo.duration)
      }
    })
    val nOps = 32
    def compiles(): Long =
      org.apache.spark.metrics.source.CodegenMetrics.METRIC_COMPILATION_TIME.getCount
    for (pass <- 1 to 2; flavor <- Seq("edges", "stream")) {
      durations.clear()
      jobs.set(0); jobMs.set(0); taskMs.set(0); tasks.set(0)
      val c0 = compiles()
      val t0 = System.nanoTime()
      val df = if (flavor == "edges") graft.streaming.InsertBench.insertEdges(spark, nOps)
               else graft.streaming.InsertBench.insertStream(spark, nOps)
      val n = df.count()
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      import scala.jdk.CollectionConverters._
      val ds = durations.asScala.toSeq
      val steady = ds.drop(4)
      val keys = ds.flatMap(_.keys).distinct.sorted
      println(f"[$flavor pass $pass] TOTAL ${secs}%.2f s / $nOps ops ($n rows) = ${secs / nOps * 1000}%.1f ms/op over ${ds.size} batches, ${compiles() - c0} codegen compiles, ${jobs.get} jobs (${jobMs.get} ms wall), ${tasks.get} tasks (${taskMs.get} ms)")
      keys.foreach { k =>
        val vs = ds.map(_.getOrElse(k, 0L))
        val sv = steady.map(_.getOrElse(k, 0L))
        println(f"  $k%-25s mean=${vs.sum.toDouble / vs.size}%7.1f  steady=${if (sv.isEmpty) 0.0 else sv.sum.toDouble / sv.size}%7.1f  max=${vs.max}%5d")
      }
    }
    // floor probe: same shapes as the two flavors, no streaming machinery —
    // a static 1-row, 1-partition DataFrame through (a) bare projection,
    // (b) the full ingest gate, written to noop. Times the pure
    // plan+schedule+job cost per "op" for comparison.
    import org.apache.spark.sql.functions._
    def gateDf(i: Int) = {
      val one = spark.range(i, i + 1, 1, 1).select(col("id").as("value"))
      graft.streaming.DocStreams.ingestGate(
        one.select(graft.streaming.InsertBench.docExpr: _*))
    }
    for (flavor <- Seq("batch-bare", "batch-gate")) {
      for (pass <- 1 to 2) {
        val t0 = System.nanoTime()
        (0 until 32).foreach { i =>
          val one = spark.range(i, i + 1, 1, 1).select(col("id").as("value"))
          val df = if (flavor == "batch-bare")
            one.select(col("value").as("op_id"), (col("value") % 1000).as("src"),
              ((col("value") * 31 + 7) % 1000).as("dst"))
          else gateDf(i)
          df.write.mode("overwrite").format("noop").save()
        }
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"[$flavor pass $pass] ${secs / 32 * 1000}%.1f ms/op")
      }
    }
    // decomposition: cached-QueryExecution count (pure job schedule+exec)
    // vs fresh-plan count (adds analyze+optimize+plan+codegen-source)
    for (pass <- 1 to 2) {
      val cached = gateDf(0); cached.count()
      var t0 = System.nanoTime()
      (0 until 32).foreach(_ => cached.count())
      println(f"[gate-cached-count pass $pass] ${(System.nanoTime() - t0) / 32e6}%.1f ms/op")
      t0 = System.nanoTime()
      (0 until 32).foreach(i => gateDf(i).count())
      println(f"[gate-fresh-count pass $pass] ${(System.nanoTime() - t0) / 32e6}%.1f ms/op")
    }
    // poor-man's stack sampler over the fresh-plan loop: aggregate the
    // top interesting frame of every thread every ~3 ms
    {
      val hits = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
      @volatile var sampling = true
      val sampler = new Thread(() => {
        while (sampling) {
          val stacks = Thread.getAllStackTraces
          stacks.forEach { (t, frames) =>
            if (t.getState == Thread.State.RUNNABLE && frames.nonEmpty &&
                !t.getName.contains("sampler")) {
              val interesting = frames.find { f =>
                val c = f.getClassName
                c.startsWith("org.apache.spark") || c.startsWith("org.apache.hadoop") ||
                c.startsWith("graft") || c.startsWith("org.codehaus")
              }
              interesting.foreach { f =>
                val key = s"${f.getClassName}.${f.getMethodName}"
                hits.merge(key, 1, (a, b) => a + b)
              }
            }
          }
          Thread.sleep(3)
        }
      }, "probe-sampler")
      sampler.start()
      (0 until 64).foreach(i => gateDf(i).count())
      sampling = false
      sampler.join()
      import scala.jdk.CollectionConverters._
      println("[sampler] top frames over 64 fresh-plan gate counts:")
      hits.asScala.toSeq.sortBy(-_._2).take(25).foreach { case (k, v) =>
        println(f"  $v%5d  $k")
      }
    }
    spark.stop()
  }
}
