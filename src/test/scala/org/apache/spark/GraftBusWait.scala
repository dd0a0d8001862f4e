package org.apache.spark

/** Test-only bridge: QueryExecutionListener events ride the async
  * SparkListener bus, so a lint that attributes "which driver action fired
  * during THIS query's construction" must drain the bus between queries.
  * `listenerBus` is `private[spark]`; this shim exposes exactly the drain
  * call and nothing else. */
object GraftBusWait {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
