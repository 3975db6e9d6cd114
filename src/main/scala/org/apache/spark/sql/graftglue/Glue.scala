package org.apache.spark.sql.graftglue

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public `Column` API and Catalyst `Expression`s.
  *
  * Spark 4 moved the `Column(expr)` constructor behind
  * `org.apache.spark.sql.classic`; living inside the `org.apache.spark.sql`
  * package tree grants access to those `private[sql]` helpers (the same
  * pattern every Spark extension library uses).
  */
object Glue {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
