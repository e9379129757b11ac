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
