package org.apache.spark.graft

import org.apache.spark.SparkContext

/** `SparkContext.listenerBus` is `private[spark]`; this shim exposes the
  * one call the bench needs — draining queued events so per-query
  * listener-counter deltas (spill attribution) are read AFTER every
  * `onTaskEnd` of the just-finished query has been delivered, not
  * whenever the async bus catches up. Same package-shim discipline as
  * the native expressions under `org.apache.spark.sql.graft`.
  */
object ListenerDrain {
  /** Block until the listener bus has delivered all queued events (or
    * the timeout passes — attribution then degrades to the old async
    * behavior rather than hanging the bench). */
  def drain(sc: SparkContext, timeoutMs: Long = 10000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: Throwable => () }
}
