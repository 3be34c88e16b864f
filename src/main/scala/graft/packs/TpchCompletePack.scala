package graft.packs

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryPack
import graft.core.Tables

/** Seventh-session additions: the REMAINING TPC-H query shapes — with
  * these twelve, every one of the 22 classic queries has a gated
  * engine twin (Q1 = agg_lineitem_pricing, Q3/Q5 in RelationalPack,
  * Q7 = tpch_q7_nation_flows, Q2/Q16/Q17/Q18/Q21/Q22 in TpchPack).
  * The fixture schema has no partsupp / l_shipmode / l_commitdate, so
  * each query keeps its textbook PLAN SHAPE (the thing that matters at
  * 100 TB) over the columns that exist; every adaptation is noted on
  * the query.
  *
  * Exactness contract (same as TpchPack): money crosses engines only
  * as ×100 integer cents, discounts as ×100 integer percent, so
  * revenue = price_c · (100 − disc_pct) is an EXACT ×1e4 integer and
  * no float aggregation order can flake the hash compare. Shares
  * divide by a pre-scaled denominator (total div 1e4) so the ×1e4
  * product that overflowed supplier_abc at sf1 never materializes.
  */
object TpchCompletePack extends QueryPack {

  private def cents(c: Column) = floor(c * 100 + lit(0.5)).cast("long")
  /** discount 0.00–0.10 → 0–10 as an integer percent. */
  private def pct(c: Column) = floor(c * 100 + lit(0.5)).cast("long")
  /** lineitem projected to the exact-integer revenue basis. */
  private def li(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem").select(
      col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
      col("l_shipdate"), col("l_returnflag"),
      cents(col("l_quantity")).as("q2"),
      cents(col("l_extendedprice")).as("price_c"),
      (cents(col("l_extendedprice")) * (lit(100) - pct(col("l_discount"))))
        .as("amt_x10000"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Q4 shape — "order priority checking": EXISTS(a late line) per
    // order. No l_commitdate/l_receiptdate in the fixture, so "late"
    // = shipped more than 60 days after the order date — which makes
    // the quantifier correlated on BOTH the key and the date. Plan:
    // one LEFT SEMI join (equi on the order key, the date residual
    // evaluated inside the join), then a 5-group aggregate — the
    // probe side never duplicates orders no matter how many lines
    // are late.
    "tpch_q4_order_priority" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select("o_orderkey", "o_orderpriority", "o_orderdate")
      val l = Tables.load(s, dir, "lineitem").select("l_orderkey", "l_shipdate")
      o.join(l, col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),

    // Q6 shape — "forecasting revenue change": the pure scan-side
    // query. The raw-double range prefilters (pushable to parquet
    // row groups) are a strict SUPERSET of the integer-basis
    // predicate both engines actually gate on, so pushdown and
    // exactness coexist: floor(d·100+0.5) ∈ [5,7] ⟹ d ∈ [0.045,
    // 0.0755] ⊂ (0.04, 0.08).
    "tpch_q6_forecast_revenue" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount") > 0.04 && col("l_discount") < 0.08 &&
          col("l_quantity") < 24)
        .select(cents(col("l_extendedprice")).as("price_c"),
          pct(col("l_discount")).as("disc_pct"))
        .filter(col("disc_pct") >= 5 && col("disc_pct") <= 7)
        .agg(sum(col("price_c") * col("disc_pct")).as("revenue_x10000"),
          count(lit(1)).as("n_lines"))
        .select("revenue_x10000", "n_lines")
    }),

    // Q8 shape — "national market share": of all PROMO-part revenue
    // per order year, the basis points sold by suppliers from one
    // nation. The share's conditional numerator and the total come
    // from ONE aggregate (no second scan); the ≤10k-row supplier→
    // nation map broadcasts. Denominator pre-scaled (div 1e4) so the
    // bp product never overflows INT64 at any sf.
    "tpch_q8_market_share" -> ((s, dir) => {
      val p = Tables.load(s, dir, "part")
        .filter(col("p_type") === "PROMO").select("p_partkey")
      val supNation = Tables.load(s, dir, "supplier")
        .join(Tables.load(s, dir, "nation"),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name"))
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
      li(s, dir)
        .join(p, col("l_partkey") === col("p_partkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supNation), col("l_suppkey") === col("s_suppkey"))
        .groupBy("o_year")
        .agg(sum(when(col("n_name") === "NATION_7", col("amt_x10000"))
            .otherwise(0L)).as("nation_amt"),
          sum(col("amt_x10000")).as("total_amt"))
        .select(col("o_year"), col("nation_amt"), col("total_amt"),
          expr("nation_amt DIV greatest(total_amt DIV 10000, 1)").as("share_bp"))
        .orderBy("o_year")
    }),

    // Q9 shape — "product type profit": profit = revenue − cost per
    // supplier nation per order year. No partsupp ⟹ cost = the
    // part's retail price × quantity (retail_c · q2 is the same
    // ×1e4 basis as amt_x10000, so profit stays one exact integer
    // subtraction). Star plan: fact joins each dimension on its own
    // key, nation map broadcast.
    "tpch_q9_product_profit" -> ((s, dir) => {
      val p = Tables.load(s, dir, "part")
        .select(col("p_partkey"), cents(col("p_retailprice")).as("retail_c"))
      val supNation = Tables.load(s, dir, "supplier")
        .join(Tables.load(s, dir, "nation"),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name"))
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
      li(s, dir)
        .join(p, col("l_partkey") === col("p_partkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supNation), col("l_suppkey") === col("s_suppkey"))
        .groupBy("n_name", "o_year")
        .agg(sum(col("amt_x10000") - col("retail_c") * col("q2"))
          .as("profit_x10000"))
        .orderBy("n_name", "o_year")
    }),

    // Q10 shape — "returned item reporting": top 20 customers by
    // revenue lost to returns in one year. The returnflag filter cuts
    // the fact FIRST; the per-customer aggregate runs before the
    // customer/nation dimensions join (aggregate-then-join, never
    // join-then-aggregate); final top-k is TakeOrderedAndProject.
    "tpch_q10_returned_revenue" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      val c = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
          cents(col("c_acctbal")).as("bal_c"))
      val n = Tables.load(s, dir, "nation").select("n_nationkey", "n_name")
      li(s, dir).filter(col("l_returnflag") === "R")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(sum(col("amt_x10000")).as("revenue_x10000"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("n_name"),
          col("bal_c"), col("revenue_x10000"))
        .orderBy(desc("revenue_x10000"), asc("c_custkey"))
        .limit(20)
    }),

    // Q11 shape — "important stock identification": parts whose
    // inventory value exceeds a fraction of the global total. The
    // textbook scalar subquery (sum over the whole table) is ONE
    // 1-row aggregate OF the per-part aggregate, broadcast back —
    // the fact scans once. Scale-invariant threshold (>110% of the
    // mean part value, cleared to 10·v·n > 11·Σv) instead of Q11's
    // absolute fraction, so the result is non-degenerate at every sf.
    "tpch_q11_important_parts" -> ((s, dir) => {
      val perPart = li(s, dir).groupBy("l_partkey")
        .agg(sum(col("price_c")).as("value_c"))
      val tot = perPart.agg(sum(col("value_c")).as("total_c"),
        count(lit(1)).as("n_parts"))
      perPart.join(broadcast(tot))
        .filter(col("value_c") * 10 * col("n_parts") > col("total_c") * 11)
        .select(col("l_partkey").as("p_partkey"), col("value_c"))
        .orderBy(desc("value_c"), asc("p_partkey"))
    }),

    // Q12 shape — "shipping delay vs priority": no l_shipmode, so the
    // classifier is the shipping DELAY band (days from order to ship
    // — exact integer datediff on date-cast timestamps). Both the
    // high- and low-priority counts come out of one conditional
    // aggregate; the join is the only shuffle.
    "tpch_q12_delay_priority" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
      val l = Tables.load(s, dir, "lineitem").select("l_orderkey", "l_shipdate")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(when(datediff(to_date(col("l_shipdate")),
            to_date(col("o_orderdate"))) < 30, "FAST")
          .when(datediff(to_date(col("l_shipdate")),
            to_date(col("o_orderdate"))) < 60, "MEDIUM")
          .otherwise("SLOW").as("delay_band"),
          col("o_orderpriority"))
        .groupBy("delay_band")
        .agg(sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
            .otherwise(1L)).as("low_line_count"))
        .orderBy("delay_band")
    }),

    // Q13 shape — "customer order-count distribution": LEFT OUTER so
    // order-less customers land in the c_count=0 bucket, the priority
    // filter standing in for the comment NOT LIKE. Two aggregates:
    // per-customer (shuffle on custkey), then the tiny count-of-
    // counts histogram.
    "tpch_q13_order_distribution" -> ((s, dir) => {
      val c = Tables.load(s, dir, "customer").select("c_custkey")
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderpriority") =!= "5-LOW")
        .select("o_custkey", "o_orderkey")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(desc("custdist"), desc("c_count"))
    }),

    // Q14 shape — "promotion effect": PROMO-part share of one ship
    // month's revenue, numerator and denominator from ONE conditional
    // aggregate over the part join; 1-row output.
    "tpch_q14_promo_share" -> ((s, dir) => {
      val p = Tables.load(s, dir, "part").select("p_partkey", "p_type")
      li(s, dir)
        .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .join(p, col("l_partkey") === col("p_partkey"))
        .agg(sum(when(col("p_type") === "PROMO", col("amt_x10000"))
            .otherwise(0L)).as("promo_amt"),
          sum(col("amt_x10000")).as("total_amt"))
        .select(col("promo_amt"), col("total_amt"),
          expr("promo_amt DIV greatest(total_amt DIV 10000, 1)").as("promo_bp"))
    }),

    // Q15 shape — "top supplier": revenue per supplier over one
    // quarter, then the textbook view-max equality as a 1-row max
    // aggregate broadcast back onto the per-supplier aggregate —
    // ties all surface, nothing nondeterministic.
    "tpch_q15_top_supplier" -> ((s, dir) => {
      val rev = li(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy("l_suppkey")
        .agg(sum(col("amt_x10000")).as("total_rev"))
      val mx = rev.agg(max(col("total_rev")).as("max_rev"))
      val sup = Tables.load(s, dir, "supplier").select("s_suppkey", "s_name")
      rev.join(broadcast(mx), col("total_rev") === col("max_rev"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_rev"))
        .orderBy("s_suppkey")
    }),

    // Q19 shape — "discounted revenue, disjunctive predicates": the
    // classic OR-of-ANDs join residual. Each side is PREFILTERED with
    // its own projection of the disjunction (brand/size bands on
    // part, the quantity-range union on lineitem — supersets Catalyst
    // cannot factor out itself), so the join inputs shrink before the
    // equi-join; the full three-branch residual then gates exactly.
    "tpch_q19_disjunctive_revenue" -> ((s, dir) => {
      val p = Tables.load(s, dir, "part")
        .filter((col("p_brand") === "Brand#12" && col("p_size").between(1, 15)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 25)) ||
          (col("p_brand") === "Brand#34" && col("p_size").between(1, 35)))
        .select("p_partkey", "p_brand", "p_size")
      val l = li(s, dir).filter(col("q2").between(100L, 3500L))
      val branch = (col("p_brand") === "Brand#12" &&
          col("p_size").between(1, 15) && col("q2").between(100L, 1100L)) ||
        (col("p_brand") === "Brand#23" &&
          col("p_size").between(1, 25) && col("q2").between(1000L, 2000L)) ||
        (col("p_brand") === "Brand#34" &&
          col("p_size").between(1, 35) && col("q2").between(2500L, 3500L))
      l.join(p, col("l_partkey") === col("p_partkey"))
        .filter(branch)
        .agg(sum(col("amt_x10000")).as("revenue_x10000"),
          count(lit(1)).as("n_lines"))
        .select("revenue_x10000", "n_lines")
    }),

    // Q20 shape — "suppliers with excess stock": the textbook
    // correlated half-of-total-quantity subquery, decorrelated to
    // per-(part, supplier) sums joined against per-part (total, #
    // suppliers) — "excess" = the supplier ships over 2× the mean
    // share of that part (scale-invariant, vs Q20's absolute 50%).
    // Only cold-named parts participate, filtered before any shuffle.
    "tpch_q20_excess_suppliers" -> ((s, dir) => {
      val cold = Tables.load(s, dir, "part")
        .filter(col("p_name").startsWith("cold")).select("p_partkey")
      val perPS = li(s, dir)
        .join(broadcast(cold), col("l_partkey") === col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(sum(col("q2")).as("sq2"))
      val perPart = perPS.groupBy(col("l_partkey").as("pk"))
        .agg(sum(col("sq2")).as("tq2"), count(lit(1)).as("n_supp"))
      val sup = Tables.load(s, dir, "supplier").select("s_suppkey", "s_name")
      perPS.join(perPart, col("l_partkey") === col("pk"))
        .filter(col("sq2") * col("n_supp") > col("tq2") * 2)
        .groupBy("l_suppkey")
        .agg(count(lit(1)).as("n_excess_parts"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_excess_parts"))
        .orderBy("s_suppkey")
    }),
  )

  private val amtSql =
    """CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) *
      |      (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "tpch_q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,
    "tpch_q6_forecast_revenue" ->
      """WITH b AS (SELECT
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_c,
        |    CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS disc_pct
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-01-01'
        |    AND l_discount > 0.04 AND l_discount < 0.08 AND l_quantity < 24)
        |SELECT CAST(SUM(price_c * disc_pct) AS BIGINT) AS revenue_x10000,
        |  count(*) AS n_lines
        |FROM b WHERE disc_pct BETWEEN 5 AND 7""".stripMargin,
    "tpch_q8_market_share" ->
      s"""WITH a AS (
        |  SELECT year(o.o_orderdate) AS o_year,
        |    CAST(SUM(CASE WHEN n.n_name = 'NATION_7'
        |      THEN $amtSql ELSE 0 END) AS BIGINT) AS nation_amt,
        |    CAST(SUM($amtSql) AS BIGINT) AS total_amt
        |  FROM lineitem l
        |  JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'PROMO'
        |  JOIN orders o ON o.o_orderkey = l.l_orderkey
        |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |  JOIN nation n ON n.n_nationkey = s.s_nationkey
        |  GROUP BY 1)
        |SELECT o_year, nation_amt, total_amt,
        |  CAST(nation_amt // greatest(total_amt // 10000, 1) AS BIGINT) AS share_bp
        |FROM a ORDER BY o_year""".stripMargin,
    "tpch_q9_product_profit" ->
      s"""SELECT n.n_name, year(o.o_orderdate) AS o_year,
        |  CAST(SUM($amtSql
        |    - CAST(floor(p.p_retailprice * 100 + 0.5) AS BIGINT)
        |      * CAST(floor(l.l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS profit_x10000
        |FROM lineitem l
        |JOIN part p ON p.p_partkey = l.l_partkey
        |JOIN orders o ON o.o_orderkey = l.l_orderkey
        |JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |JOIN nation n ON n.n_nationkey = s.s_nationkey
        |GROUP BY 1, 2 ORDER BY n_name, o_year""".stripMargin,
    "tpch_q10_returned_revenue" ->
      s"""SELECT c.c_custkey, c.c_name, n.n_name,
        |  CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT) AS bal_c,
        |  CAST(SUM($amtSql) AS BIGINT) AS revenue_x10000
        |FROM lineitem l
        |JOIN orders o ON o.o_orderkey = l.l_orderkey
        |JOIN customer c ON c.c_custkey = o.o_custkey
        |JOIN nation n ON n.n_nationkey = c.c_nationkey
        |WHERE l.l_returnflag = 'R'
        |  AND o.o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o.o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1, 2, 3, 4
        |ORDER BY revenue_x10000 DESC, c_custkey LIMIT 20""".stripMargin,
    "tpch_q11_important_parts" ->
      """WITH v AS (
        |  SELECT l_partkey,
        |    CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS value_c
        |  FROM lineitem GROUP BY 1),
        |t AS (SELECT CAST(SUM(value_c) AS BIGINT) AS total_c, count(*) AS n_parts
        |  FROM v)
        |SELECT v.l_partkey AS p_partkey, v.value_c
        |FROM v, t
        |WHERE v.value_c * 10 * t.n_parts > t.total_c * 11
        |ORDER BY value_c DESC, p_partkey""".stripMargin,
    "tpch_q12_delay_priority" ->
      """WITH b AS (
        |  SELECT CASE
        |      WHEN date_diff('day', CAST(o.o_orderdate AS DATE),
        |                     CAST(l.l_shipdate AS DATE)) < 30 THEN 'FAST'
        |      WHEN date_diff('day', CAST(o.o_orderdate AS DATE),
        |                     CAST(l.l_shipdate AS DATE)) < 60 THEN 'MEDIUM'
        |      ELSE 'SLOW' END AS delay_band,
        |    o.o_orderpriority
        |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey)
        |SELECT delay_band,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM b GROUP BY 1 ORDER BY delay_band""".stripMargin,
    "tpch_q13_order_distribution" ->
      """WITH pc AS (
        |  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        |  FROM customer c
        |  LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        |    AND o.o_orderpriority <> '5-LOW'
        |  GROUP BY 1)
        |SELECT c_count, count(*) AS custdist
        |FROM pc GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "tpch_q14_promo_share" ->
      s"""WITH a AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN p.p_type = 'PROMO'
        |      THEN $amtSql ELSE 0 END) AS BIGINT) AS promo_amt,
        |    CAST(SUM($amtSql) AS BIGINT) AS total_amt
        |  FROM lineitem l
        |  JOIN part p ON p.p_partkey = l.l_partkey
        |  WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
        |    AND l.l_shipdate < TIMESTAMP '1996-04-01')
        |SELECT promo_amt, total_amt,
        |  CAST(promo_amt // greatest(total_amt // 10000, 1) AS BIGINT) AS promo_bp
        |FROM a""".stripMargin,
    "tpch_q15_top_supplier" ->
      s"""WITH rev AS (
        |  SELECT l_suppkey, CAST(SUM($amtSql) AS BIGINT) AS total_rev
        |  FROM lineitem l
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY 1)
        |SELECT s.s_suppkey, s.s_name, rev.total_rev
        |FROM rev
        |JOIN supplier s ON s.s_suppkey = rev.l_suppkey
        |WHERE rev.total_rev = (SELECT max(total_rev) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "tpch_q19_disjunctive_revenue" ->
      s"""WITH l AS (SELECT l_partkey,
        |    CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS q2,
        |    $amtSql AS amt
        |  FROM lineitem)
        |SELECT CAST(SUM(l.amt) AS BIGINT) AS revenue_x10000,
        |  count(*) AS n_lines
        |FROM l JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
        |       AND l.q2 BETWEEN 100 AND 1100)
        |   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
        |       AND l.q2 BETWEEN 1000 AND 2000)
        |   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
        |       AND l.q2 BETWEEN 2500 AND 3500)""".stripMargin,
    "tpch_q20_excess_suppliers" ->
      """WITH ps AS (
        |  SELECT l.l_partkey, l.l_suppkey,
        |    CAST(SUM(CAST(floor(l.l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS sq2
        |  FROM lineitem l
        |  JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE 'cold%'
        |  GROUP BY 1, 2),
        |pt AS (SELECT l_partkey, CAST(SUM(sq2) AS BIGINT) AS tq2,
        |    count(*) AS n_supp
        |  FROM ps GROUP BY 1)
        |SELECT s.s_suppkey, s.s_name, x.n_excess_parts
        |FROM (SELECT ps.l_suppkey, count(*) AS n_excess_parts
        |      FROM ps JOIN pt ON pt.l_partkey = ps.l_partkey
        |      WHERE ps.sq2 * pt.n_supp > pt.tq2 * 2
        |      GROUP BY 1) x
        |JOIN supplier s ON s.s_suppkey = x.l_suppkey
        |ORDER BY s_suppkey""".stripMargin,
  )
}
