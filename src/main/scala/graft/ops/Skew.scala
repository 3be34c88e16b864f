package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for large equi-joins (the 100 TB checklist item AQE
  * doesn't always cover — e.g. when the skewed side feeds an
  * aggregation AQE can't split, or on engines/configs without
  * AQE skew-join).
  *
  * `saltedJoin` spreads each hot key of the LEFT (large, skewed) side
  * over `salt` sub-partitions by appending a per-row salt drawn from a
  * keyed hash (deterministic → retry-idempotent), and replicates every
  * RIGHT-side row `salt` times so each sub-partition finds its match.
  * Join cardinality and results are identical to the plain equi-join;
  * only the partitioning of the shuffle changes — the hottest key's
  * rows now land on `salt` reducers instead of one.
  *
  * Cost model: right side inflates ×salt — use when the right side is
  * far smaller than the skewed key's row count (the usual dimension /
  * fact shape) but too big to broadcast outright. */
object Skew {

  /** Equi-join `left.join(right, keys)` with the left side salted
    * `salt` ways. Output columns = plain join's (salt column dropped). */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salt: Int,
      joinType: String = "inner"): DataFrame = {
    require(salt >= 1, s"salt must be >= 1, got $salt")
    // Right/full outer would emit each unmatched RIGHT row once per
    // salt replica — silently wrong. Salt the other side instead.
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti")
      .contains(joinType.toLowerCase.replaceAll("[_ ]", "")),
      s"saltedJoin supports inner/left joins only (got '$joinType'): " +
        "an outer right side would duplicate unmatched rows per salt replica")
    val saltCol = "__graft_salt"
    // Per-row salt = pure hash of the FULL row content: a function of
    // the row alone, so a task retry recomputes the identical salt —
    // retry-idempotence is structural, with no dependence on row
    // position or partition id. The salt VALUE never affects join
    // output either way (the right side carries every salt value).
    // Distribution caveat: byte-identical duplicate rows share a salt
    // bucket; a hot key whose rows are all identical won't spread —
    // dedup first, or that "skew" is really a cross-product problem.
    val l = left.withColumn(saltCol,
      pmod(hash(left.columns.map(col): _*), lit(salt)))
    val r = right.withColumn(saltCol,
      explode(array((0 until salt).map(lit): _*)))
    l.join(r, Seq(key, saltCol), joinType).drop(saltCol)
  }

  /** Convenience: top-k heaviest keys of a column with their counts —
    * the diagnosis step before choosing a salt factor. */
  def keyHistogram(df: DataFrame, key: String, k: Int = 20): DataFrame =
    df.groupBy(key).agg(count(lit(1)).as("n")).orderBy(desc("n"), col(key)).limit(k)

  /** Heuristic salt factor from the histogram: hot-key count over the
    * average per-partition row budget, clamped to [1, maxSalt]. */
  def suggestSalt(hotKeyRows: Long, rowsPerTask: Long, maxSalt: Int = 64): Int =
    math.max(1L, math.min(maxSalt.toLong, hotKeyRows / math.max(1L, rowsPerTask))).toInt
}
