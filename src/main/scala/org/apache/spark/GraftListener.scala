package org.apache.spark

/** Test/tooling bridge into the private[spark] listener bus — the
  * metrics audit must see every task-end event for a query's jobs
  * before reading its accumulators (events post asynchronously).
  * Same pattern as [[org.apache.spark.sql.GraftSql]].
  */
object GraftListener {
  def drain(sc: SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
