package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** FIFO lot matching — inventory costing, tax-lot accounting, queue
  * attribution. Buys and sells are two sequenced flows per key; FIFO
  * says the i-th unit sold came from the i-th unit bought, so each
  * side becomes half-open CUMULATIVE-QUANTITY intervals
  * [cum−qty, cum) and a matched pair is simply an interval overlap:
  * no per-row iteration, no state machine.
  *
  * Scale design: the cumulative sums are per-key windows (parallel
  * across keys), and the pairing is an equi-join ON THE KEY with the
  * overlap predicate evaluated inside the hash match — never a
  * cartesian/range scan. Per key the pair count is ≤ buys + sells − 1
  * (consecutive-interval overlap is a merge, not a product), so
  * output stays linear in the input.
  */
object Fifo {

  /** Match `buys` to `sells` per `keyCol`, both ordered by `ordCol`
    * (must be unique per key within a side), quantities in `qtyCol`
    * (positive longs). Returns every buy column prefixed `b_`, every
    * sell column prefixed `s_`, plus `matched_qty` > 0. Unmatched
    * tail quantity (oversold or leftover stock) simply produces no
    * pair — audit it by comparing Σ matched_qty with either side. */
  def matchLots(buys: DataFrame, sells: DataFrame, keyCol: String,
      ordCol: String, qtyCol: String): DataFrame = {
    def cumSide(df: DataFrame, p: String): DataFrame = {
      val w = Window.partitionBy(col(keyCol)).orderBy(col(ordCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = df
        .withColumn("__hi", sum(col(qtyCol)).over(w))
        .withColumn("__lo", col("__hi") - col(qtyCol))
      cum.columns.foldLeft(cum)((d, c) => d.withColumnRenamed(c, p + c))
    }
    val b = cumSide(buys, "b_")
    val s = cumSide(sells, "s_")
    b.join(s, col(s"b_$keyCol") === col(s"s_$keyCol") &&
        col("b___lo") < col("s___hi") && col("s___lo") < col("b___hi"))
      .withColumn("matched_qty",
        least(col("b___hi"), col("s___hi")) - greatest(col("b___lo"), col("s___lo")))
      .drop("b___lo", "b___hi", "s___lo", "s___hi")
  }
}
