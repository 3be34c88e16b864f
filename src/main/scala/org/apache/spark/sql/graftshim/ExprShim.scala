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

  /** Register a function builder on an EXISTING session's registry
    * (sessionState is `private[sql]`; new sessions should prefer
    * `spark.sql.extensions=graft.GraftExtensions`). */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "built-in")

  /** True when the session's CacheManager holds no cached relations —
    * the invariant CacheHygieneSpec asserts after every query action
    * (`sharedState` is `private[sql]`, hence the shim). */
  def cacheIsEmpty(spark: org.apache.spark.sql.SparkSession): Boolean =
    spark.sharedState.cacheManager.isEmpty
}
