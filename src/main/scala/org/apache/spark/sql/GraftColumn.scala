package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge from a Catalyst Expression to a user-facing Column (the Spark 4
  * column-node API keeps ExpressionUtils private[sql]; this shim is the
  * supported-pattern equivalent of what built-in functions do internally). */
object GraftColumn {
  def apply(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expr(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
