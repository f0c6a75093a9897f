package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into Spark's classic Column <-> Expression converters,
  * which are `private[sql]` in Spark 4. This is the supported-by-convention
  * extension point for libraries that ship custom Catalyst expressions
  * without going through a FunctionRegistry round-trip.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
