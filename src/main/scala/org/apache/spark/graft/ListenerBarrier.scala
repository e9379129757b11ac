package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Deterministic flush of the async listener bus — `listenerBus` is
  * package-private to org.apache.spark, so this one-file shim (the same
  * technique Spark's own test harness uses) exposes the barrier graft's
  * bench needs to attribute task metrics to the query that produced them.
  * Without it, a straggler task's SparkListenerTaskEnd can arrive after
  * the driver-side action returns and be credited to the NEXT query.
  */
object ListenerBarrier {
  def waitUntilEmpty(sc: SparkContext, timeoutMs: Long = 10000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}

/** Driver-side stall counters for the bench's per-pass attribution (r21,
  * after the r20 driver window burned +12 s of wall with executor CPU
  * flat and nothing in the artifact could say WHERE): cumulative driver
  * GC milliseconds (GarbageCollectorMXBeans — exact) and the cumulative
  * janino compilation count/time from Spark's CodegenMetrics (the
  * histogram's count is exact; `private[spark]`, hence this shim).
  * Deltas of these across a timed pass attribute a wall-vs-cpu gap to
  * driver GC or codegen churn instead of leaving it to inference. */
object DriverStall {
  def gcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.iterator.map(b => math.max(0L, b.getCollectionTime)).sum
  }

  def codegenCompileCount(): Long =
    org.apache.spark.metrics.source.CodegenMetrics.METRIC_COMPILATION_TIME.getCount
}
