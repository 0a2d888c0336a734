package org.apache.spark

/** Test-only accessor: SparkListener events post asynchronously, so a
  * spec that reads listener state right after an action races the bus.
  * `waitUntilEmpty` is private[spark]; this one-liner lives in the
  * org.apache.spark package purely to expose it to the plan-audit
  * specs (never shipped in the library jar — test sources only). */
object GraftListenerFlush {
  def flush(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
