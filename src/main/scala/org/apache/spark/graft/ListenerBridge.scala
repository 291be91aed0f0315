package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Visibility bridge into the context's listener bus (`SparkContext.
  * listenerBus` is `private[spark]`) — the ColumnBridge pattern one level
  * down. The bench's builder-work detector counts jobs via a listener, and
  * listener delivery is asynchronous: a job the builder just launched may
  * not have reached the counter when the builder returns. waitUntilEmpty
  * drains the bus synchronously (immediate no-op when idle), making the
  * count readable without the 120ms-minimum polling quiesce. */
object ListenerBridge {
  def waitUntilEmpty(sc: SparkContext, timeoutMs: Long = 30000): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
