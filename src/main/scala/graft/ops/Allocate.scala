package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact proration — split a per-key integer total across the key's
  * rows proportionally to a weight, with NO cent ever lost or minted:
  * the largest-remainder (Hamilton) method.
  *
  * Per key: row i gets base_i = ⌊T·w_i / W⌋ plus one extra unit if its
  * remainder T·w_i mod W ranks among the L = T − Σ base_i largest
  * (ties broken by `tieCol` ascending — deterministic). Σ alloc ≡ T
  * by construction, all in Long arithmetic.
  *
  * Scale: two keyed windows (sum + rank) — parallel across keys, no
  * join, no iteration. Overflow budget: |T·w| must stay < 2⁶³; with
  * cents ≤ 1e13 and weights ≤ 1e5 that is 1e18 < 9.2e18 — callers
  * with wilder magnitudes pre-scale the weights.
  */
object Allocate {

  /** `df` must carry the per-key total on every row (`totalCol`,
    * integer units) and a positive integer weight. Adds `alloc`:
    * the row's exact share. Rows with weight 0 can only receive
    * remainder units (base 0). */
  def largestRemainder(df: DataFrame, keyCol: String, weightCol: String,
      totalCol: String, tieCol: String): DataFrame = {
    val k = Window.partitionBy(keyCol)
    val w = col(weightCol).cast("long")
    val t = col(totalCol).cast("long")
    val withBase = df
      .withColumn("__W", sum(w).over(k))
      .withColumn("__base", expr(s"($totalCol * $weightCol) div __W"))
      .withColumn("__rem", expr(s"($totalCol * $weightCol) % __W"))
    val ranked = withBase
      .withColumn("__left", t - sum(col("__base")).over(k))
      .withColumn("__rk", row_number().over(
        k.orderBy(col("__rem").desc, col(tieCol))))
    ranked.withColumn("alloc",
        col("__base") + when(col("__rk") <= col("__left"), 1L).otherwise(0L))
      .drop("__W", "__base", "__rem", "__left", "__rk")
  }
}
