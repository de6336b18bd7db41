package org.apache.spark

/** Listener-bus drain bridge. Bench attributes executor CPU / GC time to
  * individual queries via a SparkListener, but listener events are
  * delivered asynchronously — without a drain, a query's tail tasks are
  * billed to the NEXT query. `LiveListenerBus.waitUntilEmpty()` is the
  * exact primitive (Spark's own test suites use it) but it is
  * `private[spark]`, so this repo exposes the one call it needs from
  * inside the `org.apache.spark` package, mirroring GraftBridge's
  * Column⇄Expression seam. No Spark internals are modified.
  */
object GraftListenerBridge {
  def drain(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty(30000L)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
