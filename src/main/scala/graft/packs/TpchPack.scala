package graft.packs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryPack
import graft.core.Tables

/** Sixth-session additions: the classic TPC-H *decorrelation* shapes —
  * queries whose textbook SQL is a correlated subquery (per-row scalar
  * aggregate, EXISTS chains, correlated MIN) re-expressed as the
  * aggregate-then-join plans a warehouse actually runs. These are the
  * shapes Catalyst's subquery decorrelation produces; declaring them
  * directly keeps every join an equi-join and every aggregate one
  * keyed shuffle with map-side partials — no per-row re-scan at any
  * scale.
  *
  * Exactness contract (same as the Q3/Q5 gates): money crosses engines
  * only as ×100 integer cents (floor(x*100+0.5)), quantities as ×100
  * integers, so no float aggregate order can flake the hash compare.
  */
object TpchPack extends QueryPack {

  private def cents(c: org.apache.spark.sql.Column) =
    floor(c * 100 + lit(0.5)).cast("long")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Q17 shape — "small-quantity revenue": textbook form filters
    // l_quantity < 0.2 * (SELECT avg(l_quantity) ... same part), a
    // correlated scalar subquery per lineitem. Decorrelated: ONE
    // aggregate builds (Σq, n) per part, joins back on the part key,
    // and the 0.2·avg comparison clears to the integer form
    // 5·q·n < Σq — no division, no float, no re-scan per row.
    "tpch_q17_small_qty" -> ((s, dir) => {
      val l = Tables.load(s, dir, "lineitem").select(col("l_partkey"),
        cents(col("l_quantity")).as("q2"),
        cents(col("l_extendedprice")).as("price_c"))
      val avg = l.groupBy("l_partkey")
        .agg(sum(col("q2")).as("sq2"), count(lit(1)).as("nl"))
      val p = Tables.load(s, dir, "part")
        .filter(col("p_brand").isin("Brand#21", "Brand#22"))
        .select("p_partkey", "p_brand")
      l.join(avg, "l_partkey")
        .filter(col("q2") * 5 * col("nl") < col("sq2"))
        .join(p, col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_small_lines"),
          sum(col("price_c")).as("revenue_x100"))
        .orderBy("p_brand")
    }),

    // Q18 shape — "large-volume orders": HAVING sum(quantity) over the
    // fact table gates which orders join the dimension side at all.
    // The aggregate runs FIRST (one shuffle on the order key, partials
    // map-side), so the join input is already the small filtered set —
    // never orders ⋈ lineitem before the filter.
    "tpch_q18_big_orders" -> ((s, dir) => {
      val big = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), cents(col("l_quantity")).as("q2"))
        .groupBy("l_orderkey").agg(sum(col("q2")).as("sum_q2"))
        .filter(col("sum_q2") > 250L * 100)
      val o = Tables.load(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      val c = Tables.load(s, dir, "customer").select("c_custkey", "c_name")
      big.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          cents(col("o_totalprice")).as("total_c"), col("sum_q2"))
        .orderBy(desc("sum_q2"), asc("o_orderkey"))
        .limit(100)
    }),

    // Q2 shape — "cheapest supplier per part": the textbook correlated
    // MIN (ps_supplycost = (SELECT min(...) WHERE same part)) as ONE
    // aggregate of min(struct(cost, suppkey)) — the struct min picks
    // the cheapest line AND resolves cost ties to the smallest suppkey
    // in the same pass, so no join-back-on-equality second scan and no
    // nondeterministic min_by. lineitem's extendedprice stands in for
    // ps_supplycost (the fixture has no partsupp table).
    "tpch_q2_min_cost_supplier" -> ((s, dir) => {
      val l = Tables.load(s, dir, "lineitem").select(col("l_partkey"),
        col("l_suppkey"), cents(col("l_extendedprice")).as("cost_c"))
      val pick = l.groupBy("l_partkey")
        .agg(min(struct(col("cost_c"), col("l_suppkey"))).as("m"))
        .select(col("l_partkey"), col("m.cost_c").as("min_cost_c"),
          col("m.l_suppkey").as("s_suppkey"))
      val p = Tables.load(s, dir, "part")
        .filter(col("p_size") <= 3).select("p_partkey", "p_size")
      val sup = Tables.load(s, dir, "supplier").select("s_suppkey", "s_name")
      pick.join(p, col("l_partkey") === col("p_partkey"))
        .join(sup, "s_suppkey")
        .select(col("p_partkey"), col("p_size"), col("min_cost_c"),
          col("s_suppkey"), col("s_name"))
        .orderBy("p_partkey")
    }),

    // Q21 shape — "sole supplier on multi-line orders": the textbook
    // EXISTS (another line, same order) AND NOT EXISTS (another line,
    // different supplier) pair collapses to per-order (count, min
    // supp, max supp) — one aggregate answers both quantifiers
    // (count≥2 ⟺ EXISTS another line; min=max ⟺ NOT EXISTS a second
    // supplier). The 25-row nation side broadcasts.
    "tpch_q21_sole_supplier" -> ((s, dir) => {
      val sole = Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_suppkey")
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("nl"), min("l_suppkey").as("smin"),
          max("l_suppkey").as("smax"))
        .filter(col("nl") >= 2 && col("smin") === col("smax"))
      val sup = Tables.load(s, dir, "supplier")
        .select("s_suppkey", "s_name", "s_nationkey")
      val n = Tables.load(s, dir, "nation").select("n_nationkey", "n_name")
      sole.groupBy(col("smin").as("s_suppkey"))
        .agg(count(lit(1)).as("n_sole_orders"))
        .join(sup, "s_suppkey")
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_name"),
          col("n_sole_orders"))
        .orderBy(desc("n_sole_orders"), asc("s_suppkey"))
    }),

    // Q16 shape — "supplier variety with an exclusion list": count
    // DISTINCT suppliers per (type, size) excluding a supplier
    // denylist (NOT IN subquery in the textbook form). The denylist is
    // tiny by construction → broadcast LEFT ANTI before the part join,
    // so excluded lines never reach the wide side of the plan.
    "tpch_q16_supplier_variety" -> ((s, dir) => {
      val bad = Tables.load(s, dir, "supplier")
        .filter(col("s_acctbal") < 0).select("s_suppkey")
      val p = Tables.load(s, dir, "part")
        .filter(col("p_brand") =!= "Brand#45").select("p_partkey", "p_type", "p_size")
      val l = Tables.load(s, dir, "lineitem").select("l_partkey", "l_suppkey")
      l.join(broadcast(bad), col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(p, col("l_partkey") === col("p_partkey"))
        .groupBy("p_type", "p_size")
        .agg(countDistinct("l_suppkey").as("supplier_cnt"))
        .orderBy(desc("supplier_cnt"), asc("p_type"), asc("p_size"))
    }),
    // Q22 shape — "idle rich customers": a correlated scalar subquery
    // (balance above the positive-balance average) plus NOT EXISTS
    // (no premium order — the fixture has essentially no order-less
    // customers, so the quantifier targets orders over 400k). The
    // global average is ONE 1-row aggregate broadcast back (the
    // comparison clears to bal·n > Σbal — no division), and the NOT
    // EXISTS is a keys-only LEFT ANTI join whose probe-side filter is
    // pushed into the orders scan.
    "tpch_q22_idle_rich" -> ((s, dir) => {
      val c = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"),
          cents(col("c_acctbal")).as("bal_c"))
      val avgPos = c.filter(col("bal_c") > 0)
        .agg(sum(col("bal_c")).as("sbal"), count(lit(1)).as("nbal"))
      val ords = Tables.load(s, dir, "orders")
        .filter(col("o_totalprice") > 400000).select("o_custkey")
      c.join(broadcast(avgPos))
        .filter(col("bal_c") * col("nbal") > col("sbal"))
        .join(ords, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("numcust"), sum(col("bal_c")).as("totacctbal_c"))
        .orderBy("c_nationkey")
    }),

    // Percent-of-parent hierarchy: each nation's order revenue as a
    // share of its region, and each region as a share of the grand
    // total — the drill-down ratio every BI rollup renders. Facts
    // aggregate FIRST to the 25-row nation grain; both parent shares
    // are windows over that bounded aggregate (the partitionless
    // window runs on 25 rows, never on facts), as ×1e4 integer bp.
    "share_of_parent" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val c = Tables.load(s, dir, "customer").select("c_custkey", "c_nationkey")
      val o = Tables.load(s, dir, "orders")
        .select(col("o_custkey"), cents(col("o_totalprice")).as("rev_c"))
      val n = Tables.load(s, dir, "nation")
        .join(Tables.load(s, dir, "region"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"), col("r_name"))
      val perNation = o.join(c, col("o_custkey") === col("c_custkey"))
        .groupBy("c_nationkey").agg(sum(col("rev_c")).as("rev_c"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      perNation
        .withColumn("region_rev_c", sum(col("rev_c")).over(
          Window.partitionBy(col("r_name"))))
        .withColumn("total_rev_c", sum(col("rev_c")).over(
          Window.partitionBy()))
        .select(col("r_name"), col("n_name"), col("rev_c"),
          // overflow margin (the supplier_abc lesson, audited): the
          // grand total must stay under ~9.2e14 cents for the ×1e4
          // products — sf1 sits at ~3.8e13 (24× headroom); a 100×
          // table needs the reduced-fraction/DECIMAL form
          expr("rev_c * 10000 DIV region_rev_c").as("nation_share_bp"),
          expr("region_rev_c * 10000 DIV total_rev_c").as("region_share_bp"))
        .orderBy("r_name", "n_name")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "tpch_q17_small_qty" ->
      """WITH l AS (SELECT l_partkey,
        |    CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS q2,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_c
        |  FROM lineitem),
        |a AS (SELECT l_partkey, CAST(SUM(q2) AS BIGINT) AS sq2, count(*) AS nl
        |  FROM l GROUP BY 1)
        |SELECT p.p_brand, count(*) AS n_small_lines,
        |  CAST(SUM(l.price_c) AS BIGINT) AS revenue_x100
        |FROM l JOIN a USING (l_partkey)
        |JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE l.q2 * 5 * a.nl < a.sq2
        |  AND p.p_brand IN ('Brand#21', 'Brand#22')
        |GROUP BY 1 ORDER BY p_brand""".stripMargin,
    "tpch_q18_big_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |    CAST(SUM(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_q2
        |  FROM lineitem GROUP BY 1 HAVING sum_q2 > 25000)
        |SELECT c.c_name, c.c_custkey, o.o_orderkey,
        |  strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |  CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS total_c,
        |  big.sum_q2
        |FROM big
        |JOIN orders o ON o.o_orderkey = big.l_orderkey
        |JOIN customer c ON c.c_custkey = o.o_custkey
        |ORDER BY sum_q2 DESC, o_orderkey LIMIT 100""".stripMargin,
    "tpch_q2_min_cost_supplier" ->
      """WITH c AS (SELECT l_partkey, l_suppkey,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cost_c
        |  FROM lineitem),
        |m AS (SELECT l_partkey, min(cost_c) AS min_cost_c FROM c GROUP BY 1),
        |pick AS (SELECT c.l_partkey, m.min_cost_c, min(c.l_suppkey) AS s_suppkey
        |  FROM c JOIN m ON c.l_partkey = m.l_partkey AND c.cost_c = m.min_cost_c
        |  GROUP BY 1, 2)
        |SELECT p.p_partkey, p.p_size, k.min_cost_c, k.s_suppkey, s.s_name
        |FROM pick k
        |JOIN part p ON p.p_partkey = k.l_partkey
        |JOIN supplier s ON s.s_suppkey = k.s_suppkey
        |WHERE p.p_size <= 3 ORDER BY p_partkey""".stripMargin,
    "tpch_q21_sole_supplier" ->
      """WITH sole AS (
        |  SELECT l_orderkey, count(*) AS nl,
        |    min(l_suppkey) AS smin, max(l_suppkey) AS smax
        |  FROM lineitem GROUP BY 1
        |  HAVING count(*) >= 2 AND min(l_suppkey) = max(l_suppkey)),
        |per AS (SELECT smin AS s_suppkey, count(*) AS n_sole_orders
        |  FROM sole GROUP BY 1)
        |SELECT per.s_suppkey, s.s_name, n.n_name, per.n_sole_orders
        |FROM per
        |JOIN supplier s ON s.s_suppkey = per.s_suppkey
        |JOIN nation n ON n.n_nationkey = s.s_nationkey
        |ORDER BY n_sole_orders DESC, per.s_suppkey""".stripMargin,
    "tpch_q22_idle_rich" ->
      """WITH c AS (SELECT c_custkey, c_nationkey,
        |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_c
        |  FROM customer),
        |a AS (SELECT CAST(SUM(bal_c) AS BIGINT) AS sbal, count(*) AS nbal
        |  FROM c WHERE bal_c > 0)
        |SELECT c.c_nationkey, count(*) AS numcust,
        |  CAST(SUM(c.bal_c) AS BIGINT) AS totacctbal_c
        |FROM c, a
        |WHERE c.bal_c * a.nbal > a.sbal
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        |GROUP BY 1 ORDER BY c_nationkey""".stripMargin,
    "share_of_parent" ->
      """WITH pn AS (
        |  SELECT c.c_nationkey, CAST(SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_c
        |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        |  GROUP BY 1),
        |j AS (SELECT r.r_name, n.n_name, pn.rev_c
        |  FROM pn JOIN nation n ON n.n_nationkey = pn.c_nationkey
        |  JOIN region r ON r.r_regionkey = n.n_regionkey),
        |w AS (SELECT r_name, n_name, rev_c,
        |    CAST(SUM(rev_c) OVER (PARTITION BY r_name) AS BIGINT) AS region_rev_c,
        |    CAST(SUM(rev_c) OVER () AS BIGINT) AS total_rev_c
        |  FROM j)
        |SELECT r_name, n_name, rev_c,
        |  CAST(rev_c * 10000 // region_rev_c AS BIGINT) AS nation_share_bp,
        |  CAST(region_rev_c * 10000 // total_rev_c AS BIGINT) AS region_share_bp
        |FROM w ORDER BY r_name, n_name""".stripMargin,
    "tpch_q16_supplier_variety" ->
      """SELECT p.p_type, p.p_size, count(DISTINCT l.l_suppkey) AS supplier_cnt
        |FROM lineitem l
        |JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE p.p_brand <> 'Brand#45'
        |  AND NOT EXISTS (SELECT 1 FROM supplier s
        |                  WHERE s.s_suppkey = l.l_suppkey AND s.s_acctbal < 0)
        |GROUP BY 1, 2 ORDER BY supplier_cnt DESC, p_type, p_size""".stripMargin,
  )
}
