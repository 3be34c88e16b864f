package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance for algebraic aggregates:
  * keep a small per-key STATE (count / sum / min / max over an
  * integer-fixed-point measure), fold new batches into it with a
  * state-sized merge, and finalize derived values (avg) at read time.
  *
  * This is the batch twin of the streaming upsert store: at 100 TB the
  * point is that refresh cost is O(|new batch| + |state|), never a
  * rescan of history — the state rows are the only thing shuffled
  * (map-side-combined on the view key), and every component is a
  * commutative monoid so merge order, batch boundaries, and retries
  * cannot change the result. AVG is deliberately NOT stored — it is
  * not mergeable; it derives from (sum, count) in [[finalizeView]].
  */
object IncrementalAgg {

  /** Per-key partial state over a LONG measure column (fix the point
    * before calling — float sums are shuffle-order dependent and have
    * no exact merge). Columns: keys..., n, s, mn, mx. */
  def state(df: DataFrame, keyCols: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("s"),
        min(col(valueCol)).as("mn"), max(col(valueCol)).as("mx"))

  /** Fold any number of states into one — union + the same monoid
    * re-aggregated. Associative and commutative by construction. */
  def merge(states: Seq[DataFrame], keyCols: Seq[String]): DataFrame = {
    require(states.nonEmpty, "IncrementalAgg.merge: no states")
    states.reduce(_.unionByName(_))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("s")).as("s"),
        min(col("mn")).as("mn"), max(col("mx")).as("mx"))
  }

  /** Read-time finalization: derived avg as an integer fixed point
    * (s·scale div n — one integer division, oracle-exact). */
  def finalizeView(state: DataFrame, avgScale: Long = 100L): DataFrame =
    state.withColumn("avg_scaled", expr(s"s * ${avgScale}L div n"))

  // ---- COUNT(DISTINCT v): the non-algebraic aggregate ---------------

  /** COUNT(DISTINCT v) is not a monoid over (count) — it needs the
    * classic counting-IVM auxiliary state (keys..., v, mult): each
    * batch contributes per-(key, value) multiplicities, a retraction
    * contributes NEGATIVE ones, and a value belongs to the distinct
    * set iff its merged multiplicity is positive. State size is
    * O(distinct (key, value) pairs) — the minimum any exact
    * incremental distinct can hold; refresh shuffles state rows, not
    * history. (The approximate alternative at 100 TB is the mergeable
    * HLL state — `hll_distinct_parts` — which cannot retract; this is
    * the exact, retraction-capable twin.) */
  def distinctState(df: DataFrame, keyCols: Seq[String],
      valueCol: String, sign: Int = 1): DataFrame = {
    require(sign == 1 || sign == -1, s"distinctState: sign must be ±1, got $sign")
    df.groupBy((keyCols :+ valueCol).map(col): _*)
      .agg((count(lit(1)) * sign).as("mult"))
  }

  /** Fold distinct-states: value-wise multiplicity sum; zero rows are
    * dropped so the state never accumulates tombstones. */
  def mergeDistinct(states: Seq[DataFrame], keyCols: Seq[String],
      valueCol: String): DataFrame = {
    require(states.nonEmpty, "IncrementalAgg.mergeDistinct: no states")
    states.reduce(_.unionByName(_))
      .groupBy((keyCols :+ valueCol).map(col): _*)
      .agg(sum(col("mult")).as("mult"))
      .filter(col("mult") =!= 0L)
  }

  /** Read-time distinct count per key: values with positive merged
    * multiplicity. */
  def finalizeDistinct(state: DataFrame, keyCols: Seq[String]): DataFrame =
    state.filter(col("mult") > 0L)
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_distinct"))
}
