package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-order Markov transition profile over an ordered event feed:
  * for every (prev_state → next_state) pair, the observed count and an
  * integer-exact transition probability.
  *
  * Probabilities never cross the engine/oracle boundary as floats:
  * p_x1e4 = (n·10000) div Σ_next n — one integer division both engines
  * evaluate identically.
  *
  * Scale shape: ONE window shuffle keyed by the entity (each user's
  * event list sorts independently — partition size is bounded by the
  * hottest user, not the table), then one hash aggregate on the
  * (prev, next) pair with map-side combine, then a tiny broadcast-size
  * aggregate on prev for the denominators. The (prev, next) matrix is
  * |states|², not data-sized, so the final joins are trivially
  * broadcast.
  */
object Transitions {

  /** (prev_state, next_state, n, total_from, p_x1e4), one row per
    * observed transition. `tieCol` must make (key, ts, tie) a total
    * order or lag() is shuffle-order dependent. */
  def transitionCounts(df: DataFrame, keyCol: String, tsCol: String,
      stateCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val pairs = df
      .select(col(keyCol), col(tsCol), col(tieCol), col(stateCol))
      .withColumn("prev_state", lag(col(stateCol), 1).over(w))
      .filter(col("prev_state").isNotNull)
      .groupBy(col("prev_state"), col(stateCol).as("next_state"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy(col("prev_state"))
      .agg(sum(col("n")).as("total_from"))
    pairs.join(broadcast(totals), "prev_state")
      .withColumn("p_x1e4", expr("n * 10000L div total_from"))
      .select("prev_state", "next_state", "n", "total_from", "p_x1e4")
  }
}
