package org.apache.spark.graftshim

import org.apache.spark.SparkContext

/** Deterministic synchronization with the ASYNC listener bus: block
  * until every event posted so far has been delivered to listeners.
  *
  * The diagnostics that collect executed plans / stage metrics via
  * listeners (`Profile --stages`, the bfs plan assertions) previously
  * used fixed `Thread.sleep`s, which are race-prone under load and can
  * silently truncate what the listener saw (r9 advice). The bus's own
  * `waitUntilEmpty` is `private[spark]`, hence this package-located
  * accessor — the standard pattern (spark-testing-base does the same);
  * nothing internal is modified, only waited on.
  */
object ListenerBusSync {
  def waitUntilEmpty(sc: SparkContext, timeoutMs: Long = 30000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
