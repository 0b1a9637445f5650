package org.apache.spark

/** Test-only bridge to `private[spark]` internals: lets specs drain the
  * async listener bus deterministically before counting jobs (the
  * zero-plan-time-jobs assertions), instead of sleep-polling the status
  * store. */
object GraftTestSparkBridge {
  def waitListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
