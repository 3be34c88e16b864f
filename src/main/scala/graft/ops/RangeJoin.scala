package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join — the second timeseries/numeric
  * operator Spark lacks natively (alongside [[AsOf]]): attach to each
  * point row every interval row with `lo <= point < hi`. A naive
  * formulation is a cross join + filter — O(|points|·|intervals|),
  * which Catalyst can only plan as BroadcastNestedLoopJoin and which
  * dies at scale the moment the interval side outgrows a broadcast.
  *
  * Binned equi-join instead: pick a bin width `w`, replicate each
  * interval to the bins it overlaps (`floor(lo/w) .. ceil(hi/w)-1`,
  * one `explode(sequence(...))`), map each point to its single bin
  * (`floor(p/w)`), equi-join on the bin, then apply the exact range
  * predicate as a post-join filter. Semantics are exactly the cross
  * join + filter; the plan is a hash-partitioned join.
  *
  * Scale shape: ONE shuffle keyed on the bin (or zero when the
  * replicated interval side still broadcasts — Catalyst decides).
  * Cost scales with Σ per-bin |points_b|·|intervals_b|, not the
  * global product; the replication factor is len/w + 1 per interval,
  * so `w` should sit near the median interval length. Skewed bins
  * (one bin holding most points) fall back to the same AQE skew-join
  * machinery as any hot equi-join key.
  */
object RangeJoin {

  /** points ⋈ intervals on `loCol <= pointCol < hiCol`, both sides
    * keyed into `binWidth`-sized bins. All three columns must be
    * numeric (cast doubles/longs alike); column sets must not collide
    * except `extraKeys`, which must exist on BOTH sides and join as
    * additional equi-keys — real range joins almost always carry one
    * (per-entity time intervals: user × validity window), and folding
    * the entity into the join key keeps each bin's candidate product
    * per-entity instead of corpus-wide. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      binWidth: Double, extraKeys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, s"pointInInterval: binWidth=$binWidth must be > 0")
    extraKeys.foreach { k =>
      require(points.columns.contains(k) && intervals.columns.contains(k),
        s"pointInInterval: extra key $k must exist on both sides")
    }
    require(!points.columns.filterNot(extraKeys.contains)
        .exists(intervals.columns.filterNot(extraKeys.contains).contains),
      "pointInInterval: point/interval column names collide")
    val bin = "_rj_bin"
    // interval [lo, hi) overlaps bin b = [b·w, (b+1)·w) iff
    // floor(lo/w) <= b <= ceil(hi/w)-1 in REAL arithmetic — but the
    // join key on the point side is computed in FLOATING POINT, and
    // when hi/w is exactly integral a point at hi−ulp can divide/round
    // up to exactly hi/w, landing in bin hi/w that ceil(hi/w)-1 never
    // replicated into: the equi-join drops a row the post-filter would
    // have kept. Replicate through floor(hi/w) instead — identical to
    // ceil(hi/w)-1 when hi/w is fractional, one extra (harmless,
    // post-filtered) copy when integral. Spark's 2-arg sequence runs
    // DESCENDING when start > stop, so an empty interval (hi <= lo)
    // must map to an empty array explicitly — explode then drops it,
    // matching the `lo <= p < hi` predicate (nothing matches).
    val loBin = floor(col(loCol) / binWidth).cast("long")
    val hiBin = greatest(floor(col(hiCol) / binWidth).cast("long"), loBin)
    val binned = intervals
      .withColumn(bin, explode(when(col(hiCol) > col(loCol),
        sequence(loBin, hiBin, lit(1L))).otherwise(array().cast("array<long>"))))
    points
      .withColumn(bin, floor(col(pointCol) / binWidth).cast("long"))
      .join(binned, bin +: extraKeys)
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop(bin)
  }

  /** Interval × interval overlap join: all pairs whose half-open
    * intervals truly intersect — `max(lLo,rLo) < min(lHi,rHi)`, i.e.
    * the pairwise predicate `lLo < rHi && rLo < lHi` restricted to
    * non-empty intervals (an empty `[x,x)` intersects nothing, even
    * where the bare predicate would claim otherwise). Same binning idea
    * as [[pointInInterval]], with both sides replicated to the bins
    * they cover — but a pair of long intervals now meets in EVERY
    * shared bin, so each pair is emitted only from the single bin
    * containing the overlap START `max(lLo, rLo)`: that bin is always
    * covered by both sides (the start lies inside both intervals),
    * making the dedup a cheap post-join predicate instead of a
    * `distinct` shuffle over the pair output.
    *
    * FP safety: `max(lLo, rLo)` is one side's own lo, whose bin that
    * side replicated by the identical `floor(lo/w)` computation; for
    * the other side, FP division is weakly monotone, so the start's
    * bin stays within `floor(lo/w)..floor(hi/w)` — no pair is lost to
    * rounding. Empty intervals (`hi <= lo`) replicate to no bins and
    * so never reach the join — which is what gives the true
    * intersection semantics above.
    *
    * Scale shape: ONE shuffle keyed on (bin, extraKeys); cost is
    * Σ per-bin |L_b|·|R_b|. As with [[pointInInterval]], fold any
    * natural entity key into `extraKeys` so a dense value range never
    * goes corpus-quadratic inside a bin. */
  def intervalOverlap(left: DataFrame, right: DataFrame,
      lLo: String, lHi: String, rLo: String, rHi: String,
      binWidth: Double, extraKeys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, s"intervalOverlap: binWidth=$binWidth must be > 0")
    extraKeys.foreach { k =>
      require(left.columns.contains(k) && right.columns.contains(k),
        s"intervalOverlap: extra key $k must exist on both sides")
    }
    require(!left.columns.filterNot(extraKeys.contains)
        .exists(right.columns.filterNot(extraKeys.contains).contains),
      "intervalOverlap: left/right column names collide")
    val bin = "_rj_bin"
    def binned(df: DataFrame, lo: String, hi: String): DataFrame = {
      val loBin = floor(col(lo) / binWidth).cast("long")
      val hiBin = greatest(floor(col(hi) / binWidth).cast("long"), loBin)
      df.withColumn(bin, explode(when(col(hi) > col(lo),
        sequence(loBin, hiBin, lit(1L))).otherwise(array().cast("array<long>"))))
    }
    binned(left, lLo, lHi)
      .join(binned(right, rLo, rHi), bin +: extraKeys)
      .filter(col(lLo) < col(rHi) && col(rLo) < col(lHi) &&
        col(bin) === floor(greatest(col(lLo), col(rLo)) / binWidth).cast("long"))
      .drop(bin)
  }
}
