package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the audit a pipeline runs
  * before promoting a 100 TB snapshot.
  *
  * Scale design: every ROW-LEVEL rule (not-null, range, set, regex)
  * compiles to one `sum(when(violated, 1))` term inside a SINGLE
  * aggregate pass over the table — k rules cost one scan, not k.
  * `Unique` adds one distinct-count aggregate (map-side partial
  * aggregation does the heavy lifting); `RefIntegrity` adds one
  * left-anti join against the dimension (broadcast when small). The
  * result is a tiny (rule, n_violations, n_rows) report.
  */
object Expectations {

  sealed trait Rule { def name: String }
  /** Row rule: `violated` is any Boolean Column over the table. */
  final case class RowRule(name: String, violated: Column) extends Rule
  /** n_violations = n_rows − distinct(cols): 0 iff the key is unique. */
  final case class Unique(name: String, cols: Seq[String]) extends Rule
  /** Rows whose `col` has no match in `dim(dimCol)` (nulls ignored —
    * pair with a not-null RowRule when nulls are also violations). */
  final case class RefIntegrity(name: String, col: String, dim: DataFrame,
      dimCol: String) extends Rule

  def notNull(c: String): Rule =
    RowRule(s"not_null:$c", col(c).isNull)
  def inRange(c: String, lo: Column, hi: Column): Rule =
    RowRule(s"in_range:$c", col(c).isNull || col(c) < lo || col(c) > hi)
  def inSet(c: String, values: Seq[String]): Rule =
    RowRule(s"in_set:$c", col(c).isNull || !col(c).isin(values: _*))
  def matches(c: String, regex: String): Rule =
    RowRule(s"matches:$c", col(c).isNull || !col(c).rlike(regex))

  /** Audit `df` against `rules` → (rule, n_violations, n_rows),
    * one row per rule, rule names caller-unique. */
  def audit(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "Expectations.audit: no rules")
    require(rules.map(_.name).distinct.size == rules.size,
      "Expectations.audit: duplicate rule names")
    val spark = df.sparkSession
    val rowRules = rules.collect { case r: RowRule => r }
    val reports = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    if (rowRules.nonEmpty) {
      // one scan, k sums + the row count
      val aggs = count(lit(1)).as("n_rows") +:
        rowRules.map(r => sum(when(r.violated, 1L).otherwise(0L)).as(r.name))
      val one = df.agg(aggs.head, aggs.tail: _*)
      reports += one.select(explode(map(
          rowRules.flatMap(r => Seq(lit(r.name), col(r.name))): _*))
          .as(Seq("rule", "n_violations")),
        col("n_rows"))
        .select(col("rule"), coalesce(col("n_violations"), lit(0L)).as("n_violations"),
          col("n_rows"))
    }
    rules.collect { case u: Unique => u }.foreach { u =>
      reports += df.agg(count(lit(1)).as("n_rows"),
          count_distinct(struct(u.cols.map(col): _*)).as("nd"))
        .select(lit(u.name).as("rule"),
          (col("n_rows") - col("nd")).as("n_violations"), col("n_rows"))
    }
    rules.collect { case r: RefIntegrity => r }.foreach { r =>
      // ONE scan of df: left join the deduped dimension key, count
      // orphans and rows in the same aggregate (an anti join would
      // need a second scan for the total)
      val dimKeys = r.dim.select(col(r.dimCol).as("__ref")).distinct()
      reports += df
        .join(dimKeys, col(r.col) === col("__ref"), "left_outer")
        .agg(sum(when(col(r.col).isNotNull && col("__ref").isNull, 1L)
            .otherwise(0L)).as("n_violations"),
          count(lit(1)).as("n_rows"))
        .select(lit(r.name).as("rule"),
          coalesce(col("n_violations"), lit(0L)).as("n_violations"), col("n_rows"))
    }
    reports.reduce(_ unionAll _)
  }
}
