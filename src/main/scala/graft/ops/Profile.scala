package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass column profiler — the engine-side generalization of the
  * reference's schema/preview inspection (it samples 1,000 rows in the
  * browser and eyeballs keys — reference: app/(contents)/compare/
  * page.tsx:192-196; components/FileUploader.tsx:520-544). A lake-scale
  * profile can't sample-and-eyeball: this computes, per column, the
  * null count, exact distinct count, and min/max in ONE aggregate pass
  * over the table (partial aggregation map-side; the multi-distinct
  * rewrite costs one Expand, not one job per column), then melts the
  * single result row into a (column, stats) row per column with
  * `stack` — no driver-side loop over columns, no N scans.
  */
object Profile {

  /** Profile `cols` of `df`. Output: one row per column —
    * (column_name, n_nulls, n_distinct, min_value, max_value), min/max
    * rendered as strings so heterogeneous column types share a schema
    * (callers profiling double columns should pre-round: string
    * rendering of floats is engine-specific). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile: need at least one column")
    // One struct of aggregates per column, melted with array+explode —
    // all DataFrame API, so a column name carrying a quote, backtick,
    // or dot never round-trips through SQL text (the previous
    // stack-based melt interpolated raw names into selectExpr and
    // mis-parsed such names). Still ONE aggregate pass: every struct
    // field is an aggregate over the same scan.
    val perCol = cols.map { c =>
      // backtick-quote the reference so a name containing dots or
      // backticks resolves as ONE column, not a nested-field path
      val ref = col(s"`${c.replace("`", "``")}`")
      struct(
        lit(c).as("column_name"),
        (count(lit(1)) - count(ref)).as("n_nulls"),
        count_distinct(ref).as("n_distinct"),
        min(ref).cast("string").as("min_value"),
        max(ref).cast("string").as("max_value"))
    }
    df.agg(array(perCol: _*).as("_prof"))
      .select(explode(col("_prof")).as("_s"))
      .select(col("_s.column_name"), col("_s.n_nulls"), col("_s.n_distinct"),
        col("_s.min_value"), col("_s.max_value"))
  }

  /** Equi-width histogram of a numeric column over [lo, hi): `nBins`
    * bins, the last bin additionally catching v = hi (the usual
    * closed-top convention); values outside [lo, hi] are COUNTED in
    * `n_out` rather than silently dropped — a distribution report that
    * hides out-of-range mass misleads. One aggregate pass; the bin
    * arithmetic (`floor((v − lo) · nBins / (hi − lo))` in doubles) is
    * a single IEEE expression both engines evaluate identically.
    * Output: (bin, n) per non-empty bin plus a (−1, n_out) row when
    * out-of-range values exist. */
  def histogram(df: DataFrame, c: String, lo: Double, hi: Double,
      nBins: Int): DataFrame = {
    require(nBins > 0 && hi > lo, s"histogram: [$lo, $hi) x $nBins")
    val v = col(c).cast("double")
    val bin = when(v < lo || v > hi, lit(-1))
      .otherwise(least(lit(nBins - 1),
        floor((v - lit(lo)) * lit(nBins.toDouble) / lit(hi - lo)).cast("int")))
    df.filter(v.isNotNull)
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"))
  }
}
