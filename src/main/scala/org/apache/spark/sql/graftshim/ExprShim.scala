package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column ⇄ Expression converters in Spark
  * 4.x's classic API. Lives inside the `org.apache.spark.sql` package
  * tree solely to gain access; the rest of the engine goes through this
  * one object (graft.functions.F.toColumn / toExpr).
  */
object ExprShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
