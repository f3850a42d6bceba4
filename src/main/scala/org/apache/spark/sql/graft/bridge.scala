package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge for expressions that must carry driver-side
  * OBJECT references (e.g. accumulators in
  * [[graft.expressions.CapMeter]]) and therefore cannot ride the
  * name-based function registry the rest of graft's expressions use.
  * `ExpressionUtils` is `private[sql]` in Spark 4's classic API, so the
  * shim lives under the sql package — the standard OSS technique (same
  * access pattern frameless et al. use). Nothing here is stateful. */
object ExprBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
