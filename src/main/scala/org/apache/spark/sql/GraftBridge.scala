package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column <-> Catalyst Expression bridge. `classic.ExpressionUtils` is
  * `private[sql]`, so this one-file shim (same package, our jar) is the
  * supported-API-shaped way to expose custom expressions as Columns.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** `AbstractDataType` is `private[sql]`; expressions outside the sql
    * package re-export it through this alias to declare `inputTypes`
    * (analysis-time type checks + implicit casts for SQL callers). */
  type AbstractType = org.apache.spark.sql.types.AbstractDataType

  /** Drain the listener bus so SparkListener-based job accounting in
    * tests is race-free (`listenerBus` is `private[spark]`). */
  def waitListenerBusEmpty(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()

  /** Mutate the live SparkContext conf (`sc.conf` is `private[spark]`;
    * `getConf` only returns a clone). Used by tests to emulate
    * spark-submit-style static confs — e.g. spark.sql.extensions —
    * which SparkSession.getOrCreate reads from the CONTEXT conf when
    * reusing an existing context. */
  def setContextConf(sc: org.apache.spark.SparkContext,
                     key: String, value: Option[String]): Unit = value match {
    case Some(v) => sc.conf.set(key, v)
    case None    => sc.conf.remove(key)
  }
}
