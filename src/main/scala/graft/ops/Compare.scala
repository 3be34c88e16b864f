package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The Compare engine — keyed full-outer-join diff of two tables
  * (reference: app/(contents)/compare/page.tsx:201-338, the app's
  * flagship tool).
  *
  * Semantics lifted from the reference, re-expressed as one declarative
  * Spark plan:
  *
  *  - J1 `diffRows`: full outer join on the key; left-only → `deleted`,
  *    right-only → `added`, both sides → `same`/`changed`
  *    (compare/page.tsx:223-263).
  *  - J2/J3 equality: field values are compared as `''`-coerced strings
  *    (`String(v ?? '')` — compare/page.tsx:272-280, 384-394).
  *  - J4 `autoKey`: first column of A that also exists in B
  *    (compare/page.tsx:532-537).
  *  - P8: rows with a null key are dropped before diffing
  *    (compare/page.tsx:203-208).
  *  - A1 summary: added/deleted/changed/same counts (compare/page.tsx:232-262).
  *  - A5 distinct key union (compare/page.tsx:227-230).
  *  - R1 `explodeToFieldMismatches`: melt to one row per differing field
  *    (`changed`), or per field of the present side (`added`/`deleted`)
  *    (compare/page.tsx:288-338).
  *
  * Deliberate divergence (documented per SURVEY §7.4): the reference's
  * key maps are last-wins on duplicate keys — an insertion-order-dependent
  * behavior that has no deterministic distributed equivalent. This engine
  * assumes key-unique inputs; callers with duplicate keys should
  * pre-aggregate (e.g. `dedupKeysDeterministic`).
  *
  * Scale notes: the join is a plain equi full-outer join → Spark picks
  * sort-merge with both sides hash-partitioned on the key, the
  * scale-safe plan at 100 TB (no broadcast: both sides are "big" by
  * assumption; AQE may still downgrade to broadcast when one side turns
  * out tiny). The melt is a narrow `explode` over an already-joined row —
  * no extra shuffle. Summary is a partial+final hash aggregate on a
  * low-cardinality column (4 statuses) — negligible shuffle.
  */
object Compare {

  /** J4: default join key = first column of A present in B. */
  def autoKey(a: DataFrame, b: DataFrame): Option[String] = {
    val bCols = b.columns.toSet
    a.columns.find(bCols.contains)
  }

  /** Deterministic duplicate-key resolution (divergence from the
    * reference's insertion-order last-wins): keep the min row by the
    * full string image. One extra shuffle; opt-in. */
  def dedupKeysDeterministic(df: DataFrame, key: String): DataFrame = {
    val others = df.columns.filter(_ != key)
    val packed = struct(others.map(c => col(c)): _*)
    df.groupBy(col(key)).agg(min(packed).as("__row"))
      .select(col(key) +: others.map(c => col(s"__row.$c").as(c)): _*)
  }

  /** `''`-coerced string image of a field — the reference's universal
    * value coercion `String(v ?? '')` (P10). */
  private def strCol(df: DataFrame, f: String): Column =
    if (df.columns.contains(f)) coalesce(col(f).cast("string"), lit(""))
    else lit("")

  /** Union-of-columns field list, A-side order first (P1 analogue at
    * schema level; reference collectKeys, compare/page.tsx:192-196). */
  def unionFields(a: DataFrame, b: DataFrame, key: String): Seq[String] = {
    val aCols = a.columns.filter(_ != key).toSeq
    aCols ++ b.columns.filter(c => c != key && !aCols.contains(c)).toSeq
  }

  /** J1: row-level diff. Output: key column (original type, coalesced
    * across sides), `status` ∈ added|deleted|changed|same, and
    * `a_<field>` / `b_<field>` string-image columns for every field in
    * the union schema (absent side of added/deleted rows coerced to ''). */
  def diff(a: DataFrame, b: DataFrame, key: String): DataFrame = {
    val fields = unionFields(a, b, key)
    def side(df: DataFrame, p: String): DataFrame =
      df.filter(col(key).isNotNull) // P8
        .select(col(key).as("__k") +: lit(1).as(s"__${p}p") +:
          fields.map(f => strCol(df, f).as(s"${p}_$f")): _*)
    val j = side(a, "a").join(side(b, "b"), Seq("__k"), "full_outer")
    val allEqual = fields
      .map(f => col(s"a_$f") === col(s"b_$f"))
      .reduceOption(_ && _).getOrElse(lit(true))
    val status = when(col("__bp").isNull, "deleted")
      .when(col("__ap").isNull, "added")
      .when(allEqual, "same")
      .otherwise("changed")
    j.select(
      col("__k").as(key) +:
        status.as("status") +:
        fields.flatMap(f => Seq(
          coalesce(col(s"a_$f"), lit("")).as(s"a_$f"),
          coalesce(col(s"b_$f"), lit("")).as(s"b_$f"))): _*)
  }

  /** A1: diff summary counts by status. */
  def summary(diffed: DataFrame): DataFrame =
    diffed.groupBy("status").agg(count(lit(1)).as("cnt"))

  /** A5: distinct union of keys across both sides (single-row count). */
  def distinctKeyCount(a: DataFrame, b: DataFrame, key: String): DataFrame =
    a.filter(col(key).isNotNull).select(col(key))
      .union(b.filter(col(key).isNotNull).select(col(key)))
      .distinct().agg(count(lit(1)).as("n_keys"))

  /** R1: field-level mismatch melt over a `diff` output.
    * `changed` → one row per field where a ≠ b; `added`/`deleted` → one
    * row per field (other side ''); `same` → nothing.
    * Output: key, field, status, a_value, b_value — mirroring the
    * reference's export sheet columns (compare/page.tsx:344-381). */
  def mismatches(diffed: DataFrame, key: String): DataFrame = {
    val fields = diffed.columns.collect { case c if c.startsWith("a_") => c.stripPrefix("a_") }
    val items = array(fields.map(f =>
      struct(lit(f).as("field"), col(s"a_$f").as("a_value"), col(s"b_$f").as("b_value"))): _*)
    val picked = when(col("status") === "changed",
        filter(items, x => x("a_value") =!= x("b_value")))
      .when(col("status") === "added" || col("status") === "deleted", items)
      .otherwise(filter(items, _ => lit(false)))
    diffed
      .select(col(key), col("status"), explode(picked).as("m"))
      .select(col(key), col("m.field").as("field"), col("status"),
        col("m.a_value").as("a_value"), col("m.b_value").as("b_value"))
  }
}
