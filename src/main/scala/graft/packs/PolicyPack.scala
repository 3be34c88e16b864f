package graft.packs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryPack
import graft.core.Tables
import graft.ops.Policy

/** Oracle-checked queries for the policy/tier surface (§2.12, F17).
  * The users fixture derives roles from customer segments; time logic
  * takes a fixed asOf instant (16:00 UTC = next-day KST, exercising the
  * timezone shift). The oracle precomputes the KST day constant so it
  * needs no timezone extension in DuckDB. */
object PolicyPack extends QueryPack {

  private val asOfUtc = "2024-02-15 16:00:00"
  // from_utc_timestamp('2024-02-15 16:00:00','Asia/Seoul') = 2024-02-16 01:00
  private val asOfKstDay = "2024-02-16"

  private def users(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "customer").select(
      col("c_custkey").as("uid"),
      when(col("c_mktsegment") === "BUILDING", "basic")
        .when(col("c_mktsegment") === "FURNITURE", "premium")
        .when(col("c_mktsegment") === "MACHINERY", "admin")
        .otherwise("free").as("role"),
      date_add(lit("2024-01-01").cast("date"), (col("c_custkey") % 60).cast("int"))
        .as("start_date"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "policy_tiers" -> ((s, dir) =>
      users(s, dir).select(col("uid"), col("role"),
        Policy.tierRank(col("role")).as("rank"),
        Policy.canUse(col("role"), lit("basic")).as("can_use_basic"),
        Policy.uploadQuota(col("role")).as("quota"))
        .orderBy("uid")),
    "policy_subscription" -> ((s, dir) => {
      val u = users(s, dir)
      val asOf = lit(asOfUtc).cast("timestamp")
      val end = Policy.derivedEnd(col("role"), col("start_date"))
      u.select(col("uid"), col("role"),
        date_format(col("start_date"), "yyyy-MM-dd").as("start_date"),
        date_format(end, "yyyy-MM-dd").as("end_date"),
        Policy.remainingDays(end, asOf).as("remaining_days"),
        coalesce(Policy.isExpired(end, asOf), lit(false)).as("expired"),
        date_format(Policy.clampEndAfterStart(end, col("start_date")), "yyyy-MM-dd")
          .as("clamped_end"))
        .orderBy("uid")
    }),
  )

  private val roleSql =
    """CASE WHEN c_mktsegment = 'BUILDING' THEN 'basic'
      |     WHEN c_mktsegment = 'FURNITURE' THEN 'premium'
      |     WHEN c_mktsegment = 'MACHINERY' THEN 'admin'
      |     ELSE 'free' END""".stripMargin
  private val rankSql =
    "CASE role WHEN 'free' THEN 0 WHEN 'basic' THEN 1 WHEN 'premium' THEN 2 WHEN 'admin' THEN 3 ELSE 0 END"

  val oracleSql: Map[String, String] = Map(
    "policy_tiers" ->
      s"""SELECT uid, role, CAST($rankSql AS INT) AS rank,
         |  $rankSql >= 1 AS can_use_basic,
         |  CAST(CASE WHEN role = 'free' THEN 1 WHEN role = 'admin' THEN 100 ELSE 10 END AS INT) AS quota
         |FROM (SELECT c_custkey AS uid, $roleSql AS role FROM customer)
         |ORDER BY uid""".stripMargin,
    "policy_subscription" ->
      s"""SELECT uid, role,
         |  strftime(start_date, '%Y-%m-%d') AS start_date,
         |  strftime(end_date, '%Y-%m-%d') AS end_date,
         |  CAST(date_diff('day', DATE '$asOfKstDay', end_date) + 1 AS INT) AS remaining_days,
         |  COALESCE(end_date < DATE '$asOfKstDay', FALSE) AS expired,
         |  strftime(CASE WHEN end_date < start_date THEN start_date ELSE end_date END,
         |    '%Y-%m-%d') AS clamped_end
         |FROM (SELECT c_custkey AS uid, role,
         |    start_date,
         |    CASE WHEN role IN ('basic', 'premium') THEN start_date + 30 ELSE NULL END AS end_date
         |  FROM (SELECT c_custkey, $roleSql AS role,
         |      DATE '2024-01-01' + CAST(c_custkey % 60 AS INT) AS start_date
         |    FROM customer))
         |ORDER BY uid""".stripMargin,
  )
}
