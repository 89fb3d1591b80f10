package org.apache.spark

/**
 * Test-only escape hatch into `SparkContext.listenerBus` (private[spark]):
 * drains the async listener queue DETERMINISTICALLY, replacing the fixed
 * `Thread.sleep(500)` the zero-jobs pin used (ADVICE r19: delivery slower
 * than the sleep would let a construction-time job pass undetected,
 * weakening the plan-only contract the test exists to pin).
 */
object GraftListenerSync {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
