package graft.packs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryPack
import graft.core.Tables
import graft.ops.Compare

/** Oracle-checked queries for the Compare engine (SURVEY §2: J1-J4, A1,
  * A5, R1, P8, P10).
  *
  * The two sides are derived deterministically from `customer` so the
  * DuckDB oracle can rebuild the exact same pair:
  *   A = customer minus keys ≡ 3 (mod 10)            → those become `added`
  *   B = customer minus keys ≡ 5 (mod 13), with
  *       c_name perturbed on keys ≡ 0 (mod 7) and
  *       c_nationkey bumped on keys ≡ 0 (mod 5)      → `changed`
  * Only int/string columns participate — double→string formatting is not
  * portable across engines, so c_acctbal stays out of the diff fixture.
  */
object ComparePack extends QueryPack {

  private val key = "c_custkey"

  def pair(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val c = Tables.load(s, dir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"), col("c_mktsegment"))
    val a = c.filter(col("c_custkey") % 10 =!= 3)
    val b = c.filter(col("c_custkey") % 13 =!= 5).select(
      col("c_custkey"),
      when(col("c_custkey") % 7 === 0, concat(col("c_name"), lit("_x")))
        .otherwise(col("c_name")).as("c_name"),
      when(col("c_custkey") % 5 === 0, col("c_nationkey") + 1)
        .otherwise(col("c_nationkey")).as("c_nationkey"),
      col("c_mktsegment"))
    (a, b)
  }

  private def diffed(s: SparkSession, dir: String): DataFrame = {
    val (a, b) = pair(s, dir)
    Compare.diff(a, b, key)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "compare_diff" -> ((s, dir) => diffed(s, dir).orderBy(key)),
    "compare_summary" -> ((s, dir) =>
      Compare.summary(diffed(s, dir)).orderBy("status")),
    "compare_mismatches" -> ((s, dir) =>
      Compare.mismatches(diffed(s, dir), key).orderBy(key, "field")),
    "compare_distinct_keys" -> ((s, dir) => {
      val (a, b) = pair(s, dir)
      Compare.distinctKeyCount(a, b, key)
    }),
  )

  // Shared CTE prefix for the oracle SQL (DuckDB dialect).
  private val fields = Seq("c_name", "c_nationkey", "c_mktsegment")
  private def sstr(side: String, f: String) =
    s"COALESCE(CAST($side.$f AS VARCHAR), '')"
  private val cte =
    s"""WITH a AS (
       |  SELECT c_custkey, c_name, c_nationkey, c_mktsegment FROM customer
       |  WHERE c_custkey % 10 <> 3 AND c_custkey IS NOT NULL
       |), b AS (
       |  SELECT c_custkey,
       |    CASE WHEN c_custkey % 7 = 0 THEN c_name || '_x' ELSE c_name END AS c_name,
       |    CASE WHEN c_custkey % 5 = 0 THEN c_nationkey + 1 ELSE c_nationkey END AS c_nationkey,
       |    c_mktsegment
       |  FROM customer WHERE c_custkey % 13 <> 5 AND c_custkey IS NOT NULL
       |), d AS (
       |  SELECT COALESCE(a.c_custkey, b.c_custkey) AS c_custkey,
       |    CASE WHEN b.c_custkey IS NULL THEN 'deleted'
       |         WHEN a.c_custkey IS NULL THEN 'added'
       |         WHEN ${fields.map(f => s"${sstr("a", f)} = ${sstr("b", f)}").mkString(" AND ")}
       |           THEN 'same' ELSE 'changed' END AS status,
       |    ${fields.map(f => s"${sstr("a", f)} AS a_$f, ${sstr("b", f)} AS b_$f").mkString(",\n    ")}
       |  FROM a FULL OUTER JOIN b ON a.c_custkey = b.c_custkey
       |)""".stripMargin

  private def mismatchArm(f: String) =
    s"""SELECT c_custkey, '$f' AS field, status, a_$f AS a_value, b_$f AS b_value
       |FROM d WHERE (status = 'changed' AND a_$f <> b_$f) OR status IN ('added','deleted')""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "compare_diff" -> s"$cte SELECT * FROM d ORDER BY c_custkey",
    "compare_summary" ->
      s"$cte SELECT status, count(*) AS cnt FROM d GROUP BY status ORDER BY status",
    "compare_mismatches" ->
      s"$cte SELECT * FROM (${fields.map(mismatchArm).mkString(" UNION ALL ")}) ORDER BY c_custkey, field",
    "compare_distinct_keys" ->
      s"""$cte SELECT count(*) AS n_keys FROM (
         |  SELECT c_custkey FROM a UNION SELECT c_custkey FROM b)""".stripMargin,
  )
}
