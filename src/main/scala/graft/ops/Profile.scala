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
    val aggs = cols.flatMap { c =>
      Seq(
        (count(lit(1)) - count(col(c))).as(s"${c}__nulls"),
        count_distinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { c =>
      s"'$c', `${c}__nulls`, `${c}__distinct`, `${c}__min`, `${c}__max`"
    }.mkString(", ")
    one.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS (column_name, n_nulls, n_distinct, min_value, max_value)")
  }
}
