package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made the Expression<->Column bridge `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`). This engine's custom
  * Catalyst expressions need exactly that bridge, so expose it from inside
  * the `org.apache.spark.sql` package — the same technique third-party
  * Catalyst extensions use.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
