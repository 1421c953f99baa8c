package org.apache.spark

/** Test-only bridge to the private[spark] listener bus: deterministic
  * drain of async listener delivery (QueryExecutionListener events ride
  * the shared bus), replacing wall-clock settle sleeps in specs.
  */
object GraftListenerBridge {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
