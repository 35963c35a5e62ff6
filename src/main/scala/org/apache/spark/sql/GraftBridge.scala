package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column <-> Catalyst Expression bridge. `classic.ExpressionUtils` is
  * `private[sql]`, so this one-file shim (same package, our jar) is the
  * supported-API-shaped way to expose custom expressions as Columns.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Drain the listener bus so SparkListener-based job accounting in
    * tests is race-free (`listenerBus` is `private[spark]`). */
  def waitListenerBusEmpty(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
