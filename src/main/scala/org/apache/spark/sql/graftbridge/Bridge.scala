package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into `private[sql]` API: converting between the public
  * [[Column]] and Catalyst [[Expression]] worlds is required to expose
  * custom codegen'd expressions as normal Columns (the same access pattern
  * every Spark extension library uses). Nothing else from the private
  * surface is touched. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
