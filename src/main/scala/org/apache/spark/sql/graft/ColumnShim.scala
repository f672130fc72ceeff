package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Column ⇄ Expression conversion `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`). This shim lives in the
  * `org.apache.spark.sql` namespace to expose exactly those two conversions
  * to the graft engine — the standard pattern for Catalyst-extending
  * libraries on Spark 4.x.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
