package graft.packs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QueryPack
import graft.core.Tables
import graft.ops.Graph

/** Fifth-session analytics additions: graph triangle features, dense
  * calendar spines, rolling distinct-user reach, time-weighted
  * averages, per-group mode, ML feature prep (min-max scaling, the
  * hashing trick), PMI collocations, and entity-resolution clustering.
  *
  * Same contract discipline as every pack: integer-exact or fixed-point
  * outputs, total ORDER BY, oracle aliases matching the Spark side.
  */
object InsightsPack extends QueryPack {

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  /** Epoch seconds (µs-truncated) — same image as DuckDB's
    * `epoch_us(ts) // 1000000`; cast absorbs TIMESTAMP_NTZ fixtures. */
  private def sec(c: org.apache.spark.sql.Column) =
    graft.ops.Resample.epochSec(c)

  /** Additive STL-lite over the dense hourly grid (shared by the
    * decomposition gate and the seasonal-aware anomaly gate): trend =
    * centered 25-h MA, seasonal = per hour-of-day mean of the
    * detrended series, remainder = the rest; all ×1e4 integers,
    * edge rows without a full window excluded. */
  private def stlFrame(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourly = Tables.load(s, dir, "events")
      .groupBy(col("event_type"),
        (sec(col("ts")) / 3600L).cast("long").as("hr"))
      .agg(count(lit(1)).as("n"))
    val dense = hourly.groupBy("event_type")
      .agg(min(col("hr")).as("h0"), max(col("hr")).as("h1"))
      .select(col("event_type"), explode(expr("sequence(h0, h1)")).as("hr"))
      .join(hourly, Seq("event_type", "hr"), "left")
      .na.fill(0L, Seq("n"))
    val w = Window.partitionBy("event_type").orderBy("hr")
      .rowsBetween(-12, 12)
    val det = dense
      .withColumn("wn", count(lit(1)).over(w))
      .withColumn("s25", sum(col("n")).over(w))
      .filter(col("wn") === 25L)
      .withColumn("trend_x1e4", expr("s25 * 10000L div 25"))
      .withColumn("det_x1e4", col("n") * 10000L - col("trend_x1e4"))
      .withColumn("hod", col("hr") % 24)
    val seas = det.groupBy("event_type", "hod")
      .agg(expr("sum(det_x1e4) div count(1)").as("seas_x1e4"))
    det.join(seas, Seq("event_type", "hod"))
      .select(col("event_type"), col("hr"), col("n"), col("trend_x1e4"),
        col("seas_x1e4"),
        (col("det_x1e4") - col("seas_x1e4")).as("remainder_x1e4"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Per-part triangle count over the CO-PURCHASE projection (parts
    // sharing an order) — the clustering-coefficient numerator on the
    // market-basket graph, computed with the degree-ordered
    // orientation (ops/Graph.scala) so wedge generation is O(m^1.5)
    // instead of Σ deg² on skewed graphs. Member fan-out is bounded
    // by basket size (≤7 lines/order), so the projection stays SPARSE
    // at every sf — the supplier-sharing-a-part projection this
    // replaced densified toward a complete graph as sf grew (Σ wedges
    // ~n³), which is exactly the degenerate input projectByMember's
    // contract tells callers to bound.
    "graph_triangles" -> ((s, dir) => {
      val po = Tables.load(s, dir, "lineitem")
        .filter(col("l_partkey") % 2 === 0)
        .select(col("l_partkey"), col("l_orderkey"))
      val edges = Graph.projectByMember(po, "l_partkey", "l_orderkey")
      Graph.triangleCounts(edges).orderBy("v")
    }),
    // Bounded-depth BFS over the same co-purchase projection: hop
    // distance (≤3) from the seed part set — per-round frontier
    // expansion equi-joins + min-fold (ops/Graph.bfsLevels), a bounded
    // plan with no driver fixpoint loop.
    "graph_bfs_levels" -> ((s, dir) => {
      val po = Tables.load(s, dir, "lineitem")
        .filter(col("l_partkey") % 2 === 0)
        .select(col("l_partkey"), col("l_orderkey"))
      val edges = Graph.projectByMember(po, "l_partkey", "l_orderkey")
      val seeds = po.select(col("l_partkey").as("v"))
        .filter(col("v") % 97 === 0).distinct()
      Graph.bfsLevels(edges, seeds, depth = 3).orderBy("v")
    }),

    // LOCF time-weighted average per user: each event's value is held
    // until the next event; the average weights by hold duration.
    // Fixed-point cents × integer seconds — exact in both engines.
    "events_time_weighted_avg" -> ((s, dir) => {
      val base = events(s, dir).select(
        col("user_id"), col("event_id"), sec(col("ts")).as("s"),
        floor(col("value") * 100 + 0.5).cast("long").as("v2"))
      val w = Window.partitionBy("user_id").orderBy("s", "event_id")
      base.withColumn("nsec", lead(col("s"), 1).over(w))
        .filter(col("nsec").isNotNull)
        .groupBy("user_id")
        .agg(sum(col("v2") * (col("nsec") - col("s"))).as("vdur_x100"),
          sum(col("nsec") - col("s")).as("dur_sec"))
        .filter(col("dur_sec") > 0)
        .withColumn("twa_x100", expr("vdur_x100 DIV dur_sec"))
        .orderBy("user_id")
    }),

    // Dense calendar spine × event-type dimension, zero-filled daily
    // counts — the "no missing bars in the chart" reporting op. The
    // spine is time-axis × tiny dim (broadcast); counts join on
    // (day, type). Bounded by span × |types| at any sf.
    "events_dense_daily" -> ((s, dir) => {
      val e = events(s, dir)
        .select(to_date(col("ts")).as("d"), col("event_type"))
      val span = e.agg(min(col("d")).as("lo"), max(col("d")).as("hi"))
      val days = span.select(explode(sequence(col("lo"), col("hi"))).as("d"))
      val types = e.select("event_type").distinct()
      val daily = e.groupBy("d", "event_type").agg(count(lit(1)).as("n0"))
      days.crossJoin(broadcast(types))
        .join(daily, Seq("d", "event_type"), "left")
        .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
          col("event_type"), coalesce(col("n0"), lit(0L)).as("n"))
        .orderBy("day", "event_type")
    }),

    // Trailing-7-day distinct-user reach (rolling WAU) per day —
    // computed LINEARLY: each (day, user) pair contributes to at most
    // 7 target days via explode, then one distinct + count. No range
    // join, no per-day rescan; at 100 TB the fan-out stays 7× the
    // distinct-pairs set (which is ≤ |users|·span).
    "events_rolling_wau" -> ((s, dir) => {
      val pairs = events(s, dir)
        .select(to_date(col("ts")).as("d"), col("user_id")).distinct()
      val span = events(s, dir).agg(max(to_date(col("ts"))).as("hi"))
      pairs.crossJoin(broadcast(span))
        .select(explode(sequence(col("d"),
          least(date_add(col("d"), 6), col("hi")))).as("day"), col("user_id"))
        .distinct()
        .groupBy("day").agg(count(lit(1)).as("wau7"))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"), col("wau7"))
        .orderBy("day")
    }),

    // Mode per group with a deterministic tie-break (highest count,
    // then lexicographically smallest value).
    "agg_mode" -> ((s, dir) => {
      val counts = Tables.load(s, dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(desc("n"), asc("o_orderpriority"))
      counts.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_orderstatus"), col("o_orderpriority").as("mode_priority"),
          col("n"))
        .orderBy("o_orderstatus")
    }),

    // Min-max feature scaling within segment, ppm fixed-point. Group
    // stats come from a window over the FULL table; the output is a
    // bounded key slice so the compare stays small at any sf.
    "features_minmax_scale" -> ((s, dir) => {
      val w = Window.partitionBy("c_mktsegment")
      Tables.load(s, dir, "customer")
        .withColumn("mn", min(col("c_acctbal")).over(w))
        .withColumn("mx", max(col("c_acctbal")).over(w))
        .filter(col("mx") > col("mn"))
        .select(col("c_custkey"), col("c_mktsegment"),
          floor((col("c_acctbal") - col("mn")) / (col("mx") - col("mn")) * 1e6 + 0.5)
            .cast("long").as("scaled_ppm"))
        .filter(col("c_custkey") < 500)
        .orderBy("c_custkey")
    }),

    // The hashing trick: md5-derived stable bucket for a categorical
    // column — the fixed-width feature encoding that needs no
    // vocabulary pass (and therefore no extra job at 100 TB).
    "features_hash_bucket" -> ((s, dir) =>
      Tables.load(s, dir, "part")
        .select((conv(substring(md5(col("p_type")), 1, 8), 16, 10)
          .cast("long") % 64).as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n"))
        .orderBy("bucket")),

    // PMI collocations over a bounded corpus slice: top bigrams by
    // count with the PMI score in integer ppm — all-integer math
    // (counts bounded by the doc_id slice, so no 2^63 overflow at any
    // sf). Tokenization mirrors text_top_terms (whitespace split,
    // empties dropped).
    "text_pmi_bigrams" -> ((s, dir) => {
      val toks = Tables.load(s, dir, "documents")
        .filter(col("doc_id") < 2000)
        .select(col("doc_id"),
          filter(split(col("text"), " "), t => t =!= "").as("l"))
      // slice+zip_with, not sequence(1, size-1): Spark's sequence
      // DESCENDS when stop < start, so a 1-token doc would fabricate a
      // bogus pair; zero-length slices are just empty.
      val bg = toks.select(explode(expr(
        "zip_with(slice(l, 1, size(l) - 1), slice(l, 2, size(l) - 1)," +
          " (a, b) -> struct(a AS w1, b AS w2))")).as("p"))
        .select(col("p.w1"), col("p.w2"))
      val uni = toks.select(explode(col("l")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c"))
      val tot = toks.select(size(col("l")).as("k")).agg(sum(col("k")).as("n_tokens"))
      val pair = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c_xy"))
        .filter(col("c_xy") >= 5)
      pair
        .join(uni.select(col("w").as("w1"), col("c").as("c_x")), "w1")
        .join(uni.select(col("w").as("w2"), col("c").as("c_y")), "w2")
        .crossJoin(broadcast(tot))
        .select(col("w1"), col("w2"), col("c_xy"),
          // overflow margin (the supplier_abc lesson, audited): the
          // product c_xy·n_tokens·1e6 stays under INT64 while
          // c_xy·n_tokens < 9.2e12 — sf1 sits at ~3e10 for the
          // hottest pair; a 100× corpus needs the DECIMAL form
          expr("(c_xy * n_tokens * 1000000) DIV (c_x * c_y)").as("pmi_ppm"))
        .orderBy(desc("c_xy"), asc("w1"), asc("w2"))
        .limit(20)
    }),

    // Hierarchy flatten + rollup (ops/Hierarchy.scala): synthetic
    // base-7 parent forest over customer keys (roots = keys < 7),
    // resolved by POINTER DOUBLING — ⌈log₂ depth⌉ equi-join rounds,
    // not depth — then an exact cents rollup per root.
    "hierarchy_rollup" -> ((s, dir) => {
      val cust = Tables.load(s, dir, "customer")
      val edges = cust.select(col("c_custkey").as("id"),
        when(col("c_custkey") < 7, lit(null).cast("long"))
          .otherwise(expr("c_custkey DIV 7")).as("parent"))
      val values = cust.select(col("c_custkey"),
        floor(col("c_acctbal") * 100 + 0.5).cast("long").as("v2"))
      val flat = graft.ops.Hierarchy.flattenToRoot(edges)
      graft.ops.Hierarchy.rollupByRoot(flat, values, "c_custkey", "v2")
        .withColumnRenamed("sum_x100", "bal_x100")
        .orderBy("root")
    }),

    // Running-peak drawdown over daily revenue — the change-surfacing
    // prefix-scan every finance/ops dashboard wants. Aggregate to the
    // bounded day axis FIRST (one shuffle over the fact table), then
    // the inherently-sequential running window runs over |days| rows,
    // not |orders| — that's what keeps a global ORDER BY window sane
    // at 100 TB.
    "orders_daily_drawdown" -> ((s, dir) => {
      val daily = Tables.load(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("rev_x100"))
      val w = Window.orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily
        .withColumn("cum_x100", sum(col("rev_x100")).over(w))
        .withColumn("peak_x100", max(col("cum_x100")).over(
          Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(date_format(col("d"), "yyyy-MM-dd").as("day"), col("rev_x100"),
          col("cum_x100"), col("peak_x100"),
          (col("peak_x100") - col("cum_x100")).as("dd_x100"))
        .orderBy("day")
    }),

    // Spatial radius join (ops/Geo.scala): all customer pairs within
    // 100 km on md5-derived synthetic coordinates (|lat| ≤ 30, so the
    // 1.5° grid cell spans ≥ 144 km of longitude everywhere — the
    // 3×3 neighborhood provably covers the radius). The oracle
    // cross-joins the same bounded slice; the engine's grid join must
    // find the identical pair set — recall 1.0 by construction, at
    // banded-join cost instead of n².
    "geo_radius_pairs" -> ((s, dir) => {
      def h(tag: String) =
        conv(substring(md5(concat(col("c_custkey").cast("string"),
          lit(tag))), 1, 15), 16, 10).cast("long")
      val pts = Tables.load(s, dir, "customer")
        .filter(col("c_custkey") < 3000)
        .select(col("c_custkey").as("k"),
          (h(":lat") % 6000 / 100.0 - 30).as("lat"),
          (h(":lon") % 6000 / 100.0 - 30).as("lon"))
      graft.ops.Geo.radiusJoinPairs(pts, maxMeters = 100000, cellDeg = 1.5)
        .orderBy("a_key", "b_key")
    }),

    // HyperLogLog distinct parts per return flag, next to the exact
    // count — the RAW estimator mode is exact integer math over the
    // register state, so DuckDB reproduces it bit-for-bit (corrected
    // mode, with its transcendental linear-counting branch, is
    // spec-gated in HllSpec instead). m=512 one-byte registers per
    // group regardless of scale.
    "hll_distinct_parts" -> ((s, dir) => {
      import graft.functions.{F, HllDistinct}
      val h = conv(substring(md5(concat(col("l_partkey").cast("string"),
        lit(":hll"))), 1, 15), 16, 10).cast("long")
      Tables.load(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_partkey"), h.as("h"))
        .groupBy("l_returnflag")
        .agg(count_distinct(col("l_partkey")).as("n_exact"),
          F.toColumn(HllDistinct(F.toExpr(col("h")), p = 9, corrected = false)
            .toAggregateExpression()).as("hll_est"))
        .orderBy("l_returnflag")
    }),

    // Entity resolution end-to-end: fuzzy candidate edges (deletion-
    // variant blocked edit-distance join, ops/Fuzzy.scala) → connected
    // components (llm/Dedup.dupClusters min-label propagation) →
    // per-cluster summary. The fixture's components have diameter ≤ 2
    // (dirty variants match every master in their ten-block), so the
    // SQL oracle's bounded 3-round min-propagation reaches the same
    // fixpoint the engine's iterate-to-convergence loop does.
    "er_cluster_customers" -> ((s, dir) => {
      val cust = Tables.load(s, dir, "customer").filter(col("c_nationkey") === 7)
      val shift = lit(10000000L)
      val master = cust.select(col("c_custkey").as("a_key"), col("c_name").as("a_name"))
      val dirty = cust.filter(col("c_custkey") % 3 === 0)
        .select((col("c_custkey") + shift).as("b_key"),
          concat(expr("substring(c_name, 1, length(c_name)-1)"), lit("X")).as("b_name"))
      val pairs = graft.ops.Fuzzy.editJoin(master, dirty, "a_name", "b_name", 1)
        .select(col("a_key").as("a"), col("b_key").as("b"))
      val clusters = graft.llm.Dedup.dupClusters(pairs)
      clusters.groupBy("cluster").agg(count(lit(1)).as("n_members"))
        .orderBy("cluster")
    }),

    // Peak concurrency per event type (ops/Sweep.scala): +1/−1 sweep
    // with deltas AGGREGATED TO THE TIME AXIS before the sequential
    // running sum — |type × distinct seconds| window rows, never
    // |events|. Intervals [sec, sec+300) mirror the coverage query.
    "events_peak_concurrency" -> ((s, dir) => {
      graft.ops.Sweep.peakConcurrency(
          events(s, dir).select(col("event_type"), sec(col("ts")).as("t")),
          "event_type", col("t"), durSec = 300L)
        .orderBy("event_type")
    }),

    // Cohort LTV curve: cohort = first-order month (year*12+month−1
    // integer, no locale-able formatting), age in months, cumulative
    // cents per cohort. Two hash shuffles over orders; the sequential
    // cumsum runs over |cohorts × ages| — bounded axis.
    "cohort_ltv" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders").select(col("o_custkey"),
        (year(to_date(col("o_orderdate"))) * 12 +
          month(to_date(col("o_orderdate"))) - 1).cast("long").as("ym"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("c"))
      val first = o.groupBy("o_custkey").agg(min(col("ym")).as("cym"))
      val monthly = o.join(first, "o_custkey")
        .groupBy(col("cym").as("cohort_ym"), (col("ym") - col("cym")).as("age_months"))
        .agg(count(lit(1)).as("n_orders"), sum(col("c")).as("rev_x100"))
      val w = Window.partitionBy("cohort_ym").orderBy("age_months")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      monthly.withColumn("cum_rev_x100", sum(col("rev_x100")).over(w))
        .orderBy("cohort_ym", "age_months")
    }),

    // 2-D Pareto frontier (skyline): parts nobody beats on BOTH price
    // (min) and size (max). Collapse to |distinct prices| levels
    // first, frontier = levels whose best size exceeds every strictly
    // cheaper level's running max, then join back for the member
    // parts. NOT EXISTS-free: the n² dominance test becomes one
    // bounded-axis window — the formulation that survives sf1, where
    // the quadratic oracle shape would not.
    "part_pareto_frontier" -> ((s, dir) => {
      val p = Tables.load(s, dir, "part").select(col("p_partkey"),
        floor(col("p_retailprice") * 100 + 0.5).cast("long").as("price_x100"),
        col("p_size").cast("long").as("size"))
      val lvl = p.groupBy("price_x100").agg(max(col("size")).as("best"))
      val w = Window.orderBy("price_x100")
        .rowsBetween(Window.unboundedPreceding, -1)
      val frontier = lvl.withColumn("prev", max(col("best")).over(w))
        .filter(col("prev").isNull || col("best") > col("prev"))
      p.join(frontier, "price_x100").filter(col("size") === col("best"))
        .select(col("p_partkey"), col("price_x100"), col("size").as("sz"))
        .orderBy("p_partkey")
    }),

    // Top-20 3-event paths: per-user ordered lead×2, then one count
    // shuffle over the trigram key. The per-user window is the only
    // sort and it parallelizes across users.
    "events_path_trigrams" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      events(s, dir)
        .select(col("user_id"), col("event_type").as("e1"),
          lead(col("event_type"), 1).over(w).as("e2"),
          lead(col("event_type"), 2).over(w).as("e3"))
        .filter(col("e2").isNotNull && col("e3").isNotNull)
        .groupBy("e1", "e2", "e3").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("e1"), col("e2"), col("e3"))
        .limit(20)
    }),

    // Session entry/exit matrix + bounce counts: 30-min-gap sessions
    // (same convention as events_sessionize_batch), entry/exit picked
    // by row_number from either end — no argmin/argmax engine
    // dependence — then one count shuffle over the (entry, exit) key.
    "events_entry_exit" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val flagged = events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
          when(lag(col("ts"), 1).over(w).isNull ||
              unix_millis(col("ts").cast("timestamp")) -
                unix_millis(lag(col("ts"), 1).over(w).cast("timestamp")) > 1800000L,
            1L).otherwise(0L).as("new_sess"))
        .withColumn("sess_no", sum(col("new_sess")).over(w))
      val sw = Window.partitionBy("user_id", "sess_no")
      val ordered = flagged
        .withColumn("rn_a", row_number().over(sw.orderBy(col("ts"), col("event_id"))))
        .withColumn("rn_d", row_number().over(sw.orderBy(col("ts").desc, col("event_id").desc)))
      ordered.groupBy("user_id", "sess_no")
        .agg(max(when(col("rn_a") === 1, col("event_type"))).as("entry_type"),
          max(when(col("rn_d") === 1, col("event_type"))).as("exit_type"),
          count(lit(1)).as("n_events"))
        .groupBy("entry_type", "exit_type")
        .agg(count(lit(1)).as("n_sessions"),
          sum(when(col("n_events") === 1, 1L).otherwise(0L)).as("n_bounces"))
        .orderBy("entry_type", "exit_type")
    }),

    // Exact weighted median: revenue-weighted median quantity per
    // return flag. Weight collapses to the |flag × quantity levels|
    // axis first, so the sequential cumsum is over ≤50 rows per flag
    // no matter the fact-table size; lower-median convention
    // (first level where 2·cum ≥ total).
    "stats_weighted_median" -> ((s, dir) => {
      val lvl = Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_quantity").cast("long").as("qty"))
        .agg(sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long")).as("w"))
      val p = Window.partitionBy("l_returnflag")
      val cum = lvl
        .withColumn("cw", sum(col("w")).over(p.orderBy("qty")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("tw", sum(col("w")).over(p))
      cum.filter(col("cw") * 2 >= col("tw"))
        .groupBy("l_returnflag").agg(min(col("qty")).as("wmedian_qty"))
        .orderBy("l_returnflag")
    }),

    // Convex geofence (ops/Geo.insideConvex): integer-centidegree
    // synthetic coords, CCW hexagon, all-Long cross products — the
    // predicate folds into the scan as codegen'd comparisons (no
    // join), and the bbox prefilter is what file-level min/max stats
    // would prune on at 100 TB.
    "geo_fence_contains" -> ((s, dir) => {
      def h(tag: String) =
        conv(substring(md5(concat(col("c_custkey").cast("string"),
          lit(tag))), 1, 15), 16, 10).cast("long")
      val hex = Seq((1500L, 0L), (750L, 1300L), (-750L, 1300L),
        (-1500L, 0L), (-750L, -1300L), (750L, -1300L))
      val pts = Tables.load(s, dir, "customer")
        .select(col("c_mktsegment"), (h(":x") % 6000 - 3000).as("x"),
          (h(":y") % 6000 - 3000).as("y"))
      pts.filter(graft.ops.Geo.bboxFilter(col("x"), col("y"), hex) &&
          graft.ops.Geo.insideConvex(col("x"), col("y"), hex))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n_inside"))
        .orderBy("c_mktsegment")
    }),

    // Data-quality expectations audit (ops/Expectations.scala): six
    // rules over orders in ONE scan for the row rules + one distinct
    // agg + one anti join — the pre-promotion gate for a snapshot.
    "dq_orders_expectations" -> ((s, dir) => {
      import graft.ops.Expectations
      val orders = Tables.load(s, dir, "orders")
      val cust = Tables.load(s, dir, "customer")
      Expectations.audit(orders, Seq(
        Expectations.notNull("o_custkey"),
        Expectations.inRange("o_totalprice", lit(0), lit(300000.0)),
        Expectations.inSet("o_orderstatus", Seq("O", "F", "P")),
        Expectations.matches("o_orderpriority", "^[1-5]-"),
        Expectations.Unique("unique:o_orderkey", Seq("o_orderkey")),
        Expectations.RefIntegrity("ref:o_custkey", "o_custkey", cust, "c_custkey"),
      )).orderBy("rule")
    }),

    // Debounce: drop events landing within 60 s of the PREVIOUS event
    // of the same (user, type) — the sensor/click noise filter. Gap is
    // measured against the previous raw event (window-expressible and
    // deterministic), not the previous kept one (inherently
    // sequential); the report counts kept/dropped per type.
    "events_debounce" -> ((s, dir) => {
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy(col("ts"), col("event_id"))
      events(s, dir)
        .select(col("event_type"),
          when(lag(col("ts"), 1).over(w).isNull ||
              unix_millis(col("ts").cast("timestamp")) -
                unix_millis(lag(col("ts"), 1).over(w).cast("timestamp")) > 60000L,
            1L).otherwise(0L).as("keep"))
        .groupBy("event_type")
        .agg(sum(col("keep")).as("n_kept"),
          sum(lit(1L) - col("keep")).as("n_dropped"))
        .orderBy("event_type")
    }),

    // Per-key rate limit: first 3 events per user per day survive —
    // row_number inside the (user, day) window, then one count
    // shuffle to the daily report. The cap is what an ingest tier
    // applies before an expensive enrichment at 100 TB.
    "events_rate_limit" -> ((s, dir) => {
      val base = events(s, dir).select(col("user_id"), col("event_id"),
        col("ts"), to_date(col("ts").cast("timestamp")).as("d"))
      val w = Window.partitionBy("user_id", "d").orderBy(col("ts"), col("event_id"))
      base.withColumn("rn", row_number().over(w))
        .groupBy(date_format(col("d"), "yyyy-MM-dd").as("day"))
        .agg(sum(when(col("rn") <= 3, 1L).otherwise(0L)).as("n_kept"),
          count(lit(1)).as("n_total"))
        .orderBy("day")
    }),

    // Late-arrival profile: lateness = how far behind the per-user
    // running max event-time an event lands, in ARRIVAL order — the
    // batch-side answer to "what watermark delay would this stream
    // need?". The fixture carries no arrival column (event_id is
    // time-ordered), so arrival is a deterministic md5 shuffle of
    // event_id — same derivation in the oracle. Bucketed report.
    "events_late_arrivals" -> ((s, dir) => {
      val arr = conv(substring(md5(col("event_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
      val w = Window.partitionBy("user_id").orderBy(col("arr"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      events(s, dir)
        .select(sec(col("ts")).as("t"), col("user_id"), col("event_id"),
          arr.as("arr"))
        .withColumn("late_sec",
          greatest(lit(0L), coalesce(max(col("t")).over(w) - col("t"), lit(0L))))
        .select(when(col("late_sec") === 0, "a_on_time")
          .when(col("late_sec") <= 60, "b_1_to_60s")
          .when(col("late_sec") <= 600, "c_61_to_600s")
          .otherwise("d_gt_600s").as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n"))
        .orderBy("bucket")
    }),

    // FIFO inventory costing (ops/Fifo.scala): 'F' lineitems restock,
    // 'O' lineitems consume; each sell month's cost of goods priced
    // at the FIFO-matched buy lots' unit cents. Cumulative-interval
    // overlap join on the part key — per-key pair count is linear
    // (merge, not product), and the windows parallelize across parts.
    // ord only needs to induce (shipdate, orderkey, linenumber) order
    // — its value never reaches the output.
    "fifo_cogs_monthly" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem").select(
          col("l_partkey").as("k"), col("l_linestatus"),
          col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("long").as("qty"),
          floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("cents"))
        .withColumn("ord",
          datediff(to_date(col("l_shipdate")), lit("1992-01-01").cast("date"))
              .cast("long") * 1000000000000L
            + col("l_orderkey") * 10L + col("l_linenumber"))
      val buys = li.filter(col("l_linestatus") === "F")
        .select(col("k"), col("ord"), col("qty"),
          expr("cents div qty").as("unit_x100"))
      val sells = li.filter(col("l_linestatus") === "O")
        .select(col("k"), col("ord"), col("qty"),
          substring(col("l_shipdate").cast("string"), 1, 7).as("m"))
      graft.ops.Fifo.matchLots(buys, sells, "k", "ord", "qty")
        .groupBy(col("s_m").as("sell_month"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("matched_qty")).as("qty_matched"),
          sum(col("matched_qty") * col("b_unit_x100")).as("cogs_x100"))
        .orderBy("sell_month")
    }),

    // Largest-remainder proration (ops/Allocate.scala): each order's
    // total cents split across its lineitems by quantity, Σ preserved
    // exactly — two keyed windows, zero joins beyond the fact↔order
    // equi-join. Bounded key slice keeps the compare small; the
    // allocation is per-order independent, so the filter commutes.
    "orders_penny_allocation" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem").filter(col("l_orderkey") < 200)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("long").as("qty"))
      val o = Tables.load(s, dir, "orders").filter(col("o_orderkey") < 200)
        .select(col("o_orderkey"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("total_x100"))
      val j = li.join(o, col("l_orderkey") === col("o_orderkey"))
      graft.ops.Allocate.largestRemainder(j, "l_orderkey", "qty",
          "total_x100", "l_linenumber")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("alloc").as("alloc_x100"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // Winsorization by EXACT rank percentiles: per return flag, clamp
    // price cents to [P05, P95] where the cut points are the values
    // at ceil-rank — three window passes sharing ONE exchange on the
    // flag, then a single aggregate. The ML feature-prep step that
    // kills outliers without a float quantile sketch.
    "features_winsorize" -> ((s, dir) => {
      val p = Window.partitionBy("l_returnflag")
      val v = Tables.load(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("v"))
        .withColumn("r", row_number().over(
          p.orderBy(col("v"), col("l_orderkey"), col("l_linenumber"))))
        .withColumn("n", count(lit(1)).over(p))
        .withColumn("lo", max(when(col("r") === expr("(n + 19) div 20"), col("v"))).over(p))
        .withColumn("hi", max(when(col("r") === expr("(19 * n + 19) div 20"), col("v"))).over(p))
      v.groupBy("l_returnflag")
        .agg(max(col("n")).as("n"), max(col("lo")).as("lo_x100"),
          max(col("hi")).as("hi_x100"),
          sum(least(greatest(col("v"), col("lo")), col("hi"))).as("sum_winsorized_x100"))
        .orderBy("l_returnflag")
    }),

    // Relational set-op coverage: INTERSECT / EXCEPT over the 1994 vs
    // 1995 buyer sets — Spark's dedicated set operators (hash
    // aggregate + join under the hood), not a hand-rolled outer join.
    "set_ops_customers" -> ((s, dir) => {
      def buyers(y: Int) = Tables.load(s, dir, "orders")
        .filter(year(to_date(col("o_orderdate"))) === y)
        .select(col("o_custkey")).distinct()
      val a = buyers(1994); val b = buyers(1995)
      def tag(t: String, df: DataFrame) =
        df.agg(count(lit(1)).as("n")).select(lit(t).as("cohort"), col("n"))
      tag("both", a.intersect(b))
        .unionAll(tag("only_1994", a.except(b)))
        .unionAll(tag("only_1995", b.except(a)))
        .orderBy("cohort")
    }),

    // Pre-flight self-join blowup estimate: Σ n_k² over the key's
    // frequency table IS the exact output cardinality of an equi-self-
    // join — the diagnostic to run BEFORE a pairwise dedup/similarity
    // pass decides whether it needs banding. One aggregate, no join.
    "join_cardinality_estimate" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .groupBy("l_partkey").agg(count(lit(1)).as("n"))
        .agg(count(lit(1)).as("n_keys"), max(col("n")).as("max_freq"),
          sum(col("n") * col("n")).as("selfjoin_pairs"))
    }),

    // Bitmap rollup: nation presence per market segment packed into
    // one BIGINT via bit_or(1 << nationkey) — the bitmap-index
    // building block (nationkey < 25 fits a word); popcount must
    // equal the exact distinct count.
    "agg_nation_bitmask" -> ((s, dir) => {
      Tables.load(s, dir, "customer")
        .groupBy("c_mktsegment")
        .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), c_nationkey))").as("nation_mask"),
          count_distinct(col("c_nationkey")).as("n_nations"))
        .withColumn("mask_popcount", expr("CAST(bit_count(nation_mask) AS BIGINT)"))
        .orderBy("c_mktsegment")
    }),

    // First-touch attribution: each purchase's value lands on its
    // session's ENTRY event type (30-min-gap sessions, same
    // convention as events_entry_exit) — the marketing-credit query.
    // Entry propagates inside the session window; one count shuffle.
    "events_attribution_first_touch" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val flagged = events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
          floor(col("value") * 100 + 0.5).cast("long").as("v_x100"),
          when(lag(col("ts"), 1).over(w).isNull ||
              unix_millis(col("ts").cast("timestamp")) -
                unix_millis(lag(col("ts"), 1).over(w).cast("timestamp")) > 1800000L,
            1L).otherwise(0L).as("new_sess"))
        .withColumn("sess_no", sum(col("new_sess")).over(w))
      val sw = Window.partitionBy("user_id", "sess_no")
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      flagged.withColumn("entry_type", first(col("event_type")).over(sw))
        .filter(col("event_type") === "purchase")
        .groupBy("entry_type")
        .agg(count(lit(1)).as("n_purchases"),
          sum(col("v_x100")).as("attributed_x100"))
        .orderBy("entry_type")
    }),

    // Linear multi-touch attribution: each session's purchase cents
    // split EQUALLY across the session's distinct event types,
    // penny-exact via the largest-remainder allocator (Σ credit ≡
    // Σ purchase cents structurally — no float split ever reconciles).
    // Same 30-min-gap sessions as first-touch; the allocator runs on
    // the |sessions × ≤|event types|| grid, never on raw events.
    // Sessions whose purchase total is ≤ 0 are excluded by contract
    // (integer-division allocation is defined for positive totals).
    // Markov removal-effect attribution (Attribution.markov*) — the
    // DATA-DRIVEN closer of the attribution family: journeys truncate
    // at first purchase, the transition matrix is metadata-sized and
    // iterates on the driver in exact x1e9 integers (40 fixed sweeps),
    // channels credited by how much absorption probability their
    // removal destroys.
    "events_attribution_markov" -> ((s, dir) => {
      val tr = graft.ops.Attribution.journeyTransitions(
        events(s, dir), "user_id", "ts", "event_id", "event_type", "purchase")
      graft.ops.Attribution.markovRemovalEffects(tr).orderBy("channel")
    }),
    "events_attribution_linear" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val sess = events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
          floor(col("value") * 100 + 0.5).cast("long").as("v_x100"),
          when(lag(col("ts"), 1).over(w).isNull ||
              unix_millis(col("ts").cast("timestamp")) -
                unix_millis(lag(col("ts"), 1).over(w).cast("timestamp")) > 1800000L,
            1L).otherwise(0L).as("new_sess"))
        .withColumn("sess_no", sum(col("new_sess")).over(w))
        .withColumn("sess_key", concat_ws("#", col("user_id"), col("sess_no")))
      val purch = sess.filter(col("event_type") === "purchase")
        .groupBy("sess_key").agg(sum(col("v_x100")).as("p_x100"))
        .filter(col("p_x100") > 0)
      val grid = sess.select("sess_key", "event_type").distinct()
        .join(purch, "sess_key").withColumn("one", lit(1L))
      graft.ops.Allocate.largestRemainder(grid, "sess_key", "one", "p_x100", "event_type")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_sessions"), sum(col("alloc")).as("credit_x100"))
        .orderBy("event_type")
    }),

    // Root-cause delta attribution: the revenue change between two
    // periods decomposed per segment and ranked by |contribution| —
    // the first question after any metric moves ("what drove it?").
    // Facts collapse to the |segments| grain in ONE conditional
    // aggregate (both periods in the same pass — never two scans);
    // the ranking window runs on that bounded aggregate.
    "insights_delta_attribution" -> ((s, dir) => {
      val c = Tables.load(s, dir, "customer").select("c_custkey", "c_mktsegment")
      val o = Tables.load(s, dir, "orders")
        .select(col("o_custkey"), year(col("o_orderdate")).as("y"),
          floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("p_c"))
        .filter(col("y").isin(1997, 1998))
      val per = o.join(c, col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(sum(when(col("y") === 1997, col("p_c")).otherwise(0L)).as("rev_a"),
          sum(when(col("y") === 1998, col("p_c")).otherwise(0L)).as("rev_b"))
        .withColumn("delta_c", col("rev_b") - col("rev_a"))
      per.withColumn("impact_rank",
          row_number().over(Window.orderBy(abs(col("delta_c")).desc,
            col("c_mktsegment"))).cast("long"))
        .orderBy("impact_rank")
    }),

    // Deterministic dictionary encoding (the StringIndexer shape):
    // codes by frequency rank (most frequent = 0, ties by value) over
    // the |distinct values| AGGREGATE — the window runs on the
    // dictionary, never the fact table; facts encode via ONE
    // broadcast equi-join. No fit/transform state object: the
    // dictionary IS a table, so it versions, audits and joins like
    // any other.
    "features_dict_encode" -> ((s, dir) => {
      val p = Tables.load(s, dir, "part")
      val dict = p.groupBy("p_brand").agg(count(lit(1)).as("n"))
        .withColumn("code",
          (row_number().over(Window.orderBy(desc("n"), asc("p_brand"))) - 1)
            .cast("long"))
      p.join(broadcast(dict.select("p_brand", "code")), "p_brand")
        .groupBy("code", "p_brand").agg(count(lit(1)).as("n_parts"))
        .orderBy("code")
    }),

    // Time-decay attribution — the third member of the family
    // (first-touch, linear, decay): each touch at or before the
    // session's LAST purchase gets weight 2^max(0, 5 − age/10min) —
    // integer halving per 10 minutes of age, so no float exp ever
    // crosses engines — and the session's purchase cents split by
    // largest remainder over those weights (Σ credit ≡ Σ purchase
    // cents structurally). Same 30-min sessions; the allocator grid is
    // |touches ≤ anchor|, tie-broken by event id.
    "events_attribution_decay" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val sess = events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
          sec(col("ts")).as("t"),
          floor(col("value") * 100 + 0.5).cast("long").as("v_x100"),
          when(lag(col("ts"), 1).over(w).isNull ||
              unix_millis(col("ts").cast("timestamp")) -
                unix_millis(lag(col("ts"), 1).over(w).cast("timestamp")) > 1800000L,
            1L).otherwise(0L).as("new_sess"))
        .withColumn("sess_no", sum(col("new_sess")).over(w))
        .withColumn("sess_key", concat_ws("#", col("user_id"), col("sess_no")))
      val anchors = sess.filter(col("event_type") === "purchase")
        .groupBy("sess_key")
        .agg(max(col("t")).as("anchor"), sum(col("v_x100")).as("p_x100"))
        .filter(col("p_x100") > 0)
      val touches = sess.select("sess_key", "event_id", "event_type", "t")
        .join(anchors, "sess_key")
        .filter(col("t") <= col("anchor"))
        .withColumn("wgt", expr(
          "shiftleft(CAST(1 AS BIGINT), CAST(greatest(0, 5 - (anchor - t) DIV 600) AS INT))"))
      graft.ops.Allocate.largestRemainder(touches, "sess_key", "wgt", "p_x100", "event_id")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_touches"), sum(col("alloc")).as("credit_x100"))
        .orderBy("event_type")
    }),

    // Inter-arrival time histogram per user stream, order-of-magnitude
    // buckets — the rate profile that sizes watermark and session-gap
    // parameters. One keyed window + one count shuffle.
    "events_interarrival_histogram" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      events(s, dir)
        .select(sec(col("ts")).as("t"), col("user_id"), col("event_id"),
          col("ts"))
        .withColumn("gap", col("t") - lag(col("t"), 1).over(
          Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))))
        .filter(col("gap").isNotNull)
        .select(when(col("gap") < 60, "a_lt_1m")
          .when(col("gap") < 600, "b_1m_to_10m")
          .when(col("gap") < 3600, "c_10m_to_1h")
          .when(col("gap") < 86400, "d_1h_to_1d")
          .otherwise("e_ge_1d").as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n"))
        .orderBy("bucket")
    }),

    // Native unpivot (melt) coverage: the wide per-flag aggregate
    // turned long via Dataset.unpivot — ids stay, three metric
    // columns become (metric, value_x100) pairs.
    "lineitem_unpivot_metrics" -> ((s, dir) => {
      val wide = Tables.load(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(sum(col("l_quantity").cast("long") * 100).as("sum_qty_x100"),
          sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long")).as("sum_price_x100"),
          sum(floor(col("l_discount") * 100 + 0.5).cast("long")).as("sum_disc_x100"))
      wide.unpivot(Array(col("l_returnflag")),
          Array(col("sum_qty_x100"), col("sum_price_x100"), col("sum_disc_x100")),
          "metric", "value_x100")
        .orderBy("l_returnflag", "metric")
    }),

    // Survivorship on top of the ER clusters (ops/Golden.scala): fuse
    // each cluster into one golden record — name from the highest-
    // priority source (masters beat dirty feeds, unique priority so
    // ties can't flap), balance by numeric max — ONE hash aggregate
    // for all fields, no per-field joins.
    "er_golden_record" -> ((s, dir) => {
      val cust = Tables.load(s, dir, "customer").filter(col("c_nationkey") === 7)
      val shift = lit(10000000L)
      val bal = floor(col("c_acctbal") * 100 + 0.5).cast("long")
      val mangled = concat(expr("substring(c_name, 1, length(c_name)-1)"), lit("X"))
      val master = cust.select(col("c_custkey").as("a_key"), col("c_name").as("a_name"))
      val dirty = cust.filter(col("c_custkey") % 3 === 0)
        .select((col("c_custkey") + shift).as("b_key"), mangled.as("b_name"))
      val pairs = graft.ops.Fuzzy.editJoin(master, dirty, "a_name", "b_name", 1)
        .select(col("a_key").as("a"), col("b_key").as("b"))
      val clusters = graft.llm.Dedup.dupClusters(pairs)
      val members = cust.select(col("c_custkey").as("id"), col("c_name").as("name"),
          bal.as("bal_x100"), lit(1L).as("src"))
        .unionAll(cust.filter(col("c_custkey") % 3 === 0)
          .select((col("c_custkey") + shift).as("id"), mangled.as("name"),
            (bal + 999L).as("bal_x100"), lit(2L).as("src")))
      members.join(clusters, "id")
        .groupBy("cluster")
        .agg(graft.ops.Golden.pickByPriority(
            col("src") * lit(100000000L) + col("id"), col("name")).as("golden_name"),
          max(col("bal_x100")).as("best_bal_x100"),
          count(lit(1)).as("n_members"))
        .orderBy("cluster")
    }),

    // AQP: 1/64 deterministic hash sample (md5-derived, so resample-
    // stable across runs AND engines), revenue estimate = 64 × sample
    // sum, audited against the exact total with basis-point error —
    // the "answer in 1/64th the scan" mode plus its own honesty
    // check. Both aggregates are one-pass; the sample predicate folds
    // into the scan.
    "aqp_sampled_revenue" -> ((s, dir) => {
      val cents = floor(col("l_extendedprice") * 100 + 0.5).cast("long")
      val h = conv(substring(md5(concat(col("l_orderkey").cast("string"),
        lit(":"), col("l_linenumber").cast("string"))), 1, 15), 16, 10).cast("long")
      val li = Tables.load(s, dir, "lineitem")
        .select(cents.as("c"), (h % 64).as("bucket"))
      li.agg(sum(col("c")).as("exact_x100"),
          sum(when(col("bucket") === 0, col("c"))).as("sample_x100"),
          sum(when(col("bucket") === 0, 1L).otherwise(0L)).as("n_sampled"),
          count(lit(1)).as("n_rows"))
        .select(col("exact_x100"), (col("sample_x100") * 64).as("est_x100"),
          col("n_sampled"), col("n_rows"),
          expr("(abs(sample_x100 * 64 - exact_x100) * 10000) div exact_x100")
            .as("err_bps"))
    }),

    // OHLC + VWAP bars: hourly open/high/low/close of the event value
    // stream plus the volume-weighted average (integer cents, floor
    // div). Open/close via min/max over (ts, event_id, v) structs —
    // one hash aggregate, no window, no sort; the downsampling shape
    // a market-data pipeline runs per instrument at scale.
    "events_ohlc_hourly" -> ((s, dir) => {
      val v = floor(col("value") * 100 + 0.5).cast("long")
      val base = events(s, dir).select(
        ((sec(col("ts")) / 3600L).cast("long") * 3600L).as("bar"),
        sec(col("ts")).as("t"), col("event_id"), v.as("v"))
      base.groupBy("bar")
        .agg(min(struct(col("t"), col("event_id"), col("v"))).getField("v").as("open_x100"),
          max(col("v")).as("high_x100"),
          min(col("v")).as("low_x100"),
          max(struct(col("t"), col("event_id"), col("v"))).getField("v").as("close_x100"),
          count(lit(1)).as("n"),
          expr("sum(v) div count(1)").as("vwap_x100"))
        .orderBy("bar")
    }),

    // SEASONAL-TREND DECOMPOSITION (additive STL-lite) of the hourly
    // event-count series per type: trend = centered 25-hour moving
    // average over the DENSIFIED grid (gap hours count 0, so the
    // window always spans 25 wall-clock hours), seasonal = per
    // hour-of-day mean of the detrended series, remainder = what's
    // left. Everything is ×1e4 integer fixed point (window sum ·1e4
    // div 25; both engines truncate toward zero), so the
    // decomposition is oracle-exact; edge rows without a full window
    // are excluded rather than padded. The seasonal table is
    // types×24 rows — broadcast back, no second corpus shuffle.
    "events_stl_decompose" -> ((s, dir) =>
      stlFrame(s, dir).orderBy("event_type", "hr")),

    // SEASONAL-AWARE ANOMALY FLAGS over the STL remainder: the rolling
    // z-score (events_rolling_anomaly) fires on every rush hour; here
    // trend and hour-of-day seasonality are subtracted FIRST and the
    // flag is the robust |remainder − median| > 5·MAD test (median and
    // MAD by the deterministic rank trick, exact integers) — only
    // hours that deviate from their OWN hour's normal flag. Output =
    // the anomalous hours plus the per-type robust scale that judged
    // them.
    "events_anomaly_stl" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      graft.core.Materialize.withCached(stlFrame(s, dir)) { stl =>
      def medianOf(df: DataFrame, c: String, out: String): DataFrame = {
        val w = Window.partitionBy("event_type").orderBy(col(c), col("hr"))
        df.withColumn("rn", row_number().over(w))
          .withColumn("cnt", count(lit(1)).over(Window.partitionBy("event_type")))
          .filter(col("rn") === expr("(cnt + 1L) div 2"))
          .select(col("event_type"), col(c).as(out))
      }
      val med = medianOf(stl, "remainder_x1e4", "med_x1e4")
      val dev = stl.join(broadcast(med), Seq("event_type"))
        .withColumn("adev_x1e4", abs(col("remainder_x1e4") - col("med_x1e4")))
      val mad = medianOf(dev, "adev_x1e4", "mad_x1e4")
      dev.join(broadcast(mad), Seq("event_type"))
        .filter(col("adev_x1e4") > col("mad_x1e4") * 5L)
        .select(col("event_type"), col("hr"), col("n"),
          col("remainder_x1e4"), col("med_x1e4"), col("mad_x1e4"),
          col("adev_x1e4"))
        .orderBy("event_type", "hr")
      }
    }),

    // FIFO leftover aging: stock bought but never consumed, by buy
    // month — the matched pairs aggregate per buy lot, a left join
    // back marks the unmatched tail. Complements fifo_cogs_monthly
    // off the same interval algebra.
    "fifo_unmatched_aging" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem").select(
          col("l_partkey").as("k"), col("l_linestatus"),
          col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("long").as("qty"))
        .withColumn("ord",
          datediff(to_date(col("l_shipdate")), lit("1992-01-01").cast("date"))
              .cast("long") * 1000000000000L
            + col("l_orderkey") * 10L + col("l_linenumber"))
      val buys = li.filter(col("l_linestatus") === "F")
        .select(col("k"), col("ord"), col("qty"),
          substring(col("l_shipdate").cast("string"), 1, 7).as("m"))
      val sells = li.filter(col("l_linestatus") === "O")
        .select(col("k"), col("ord"), col("qty"))
      val matched = graft.ops.Fifo.matchLots(buys, sells, "k", "ord", "qty")
        .groupBy(col("b_k").as("k"), col("b_ord").as("ord"))
        .agg(sum(col("matched_qty")).as("mq"))
      buys.join(matched, Seq("k", "ord"), "left_outer")
        .groupBy(col("m").as("buy_month"))
        .agg(sum(col("qty")).as("bought_qty"),
          sum(col("qty") - coalesce(col("mq"), lit(0L))).as("leftover_qty"))
        .orderBy("buy_month")
    }),

    // TPC-H Q7-shape nation trade flows: revenue shipped between the
    // buyer's nation and the supplier's nation, by year, for the
    // (7, 8) nation pair both directions. Exact ×1e4 revenue
    // (cents × (100 − disc_pct)); the two dim chains (customer→
    // nation, supplier→nation) broadcast, the lineitem↔orders spine
    // is the one big join.
    "tpch_q7_nation_flows" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem").select(col("l_orderkey"),
        col("l_suppkey"), col("l_shipdate"),
        (floor(col("l_extendedprice") * 100 + 0.5).cast("long") *
          (lit(100L) - floor(col("l_discount") * 100 + 0.5).cast("long"))).as("rev_x1e4"))
      val o = Tables.load(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val c = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey").as("cust_nation"))
      val su = Tables.load(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey").as("supp_nation"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
        .filter((col("supp_nation") === 7 && col("cust_nation") === 8) ||
          (col("supp_nation") === 8 && col("cust_nation") === 7))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(to_date(col("l_shipdate"))).cast("long").as("l_year"))
        .agg(count(lit(1)).as("n_lines"), sum(col("rev_x1e4")).as("revenue_x1e4"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // Supplier lead time: days from order date to line ship date —
    // the ops SLA metric. Exact integer min/max plus a ×100 floor-div
    // average per supplier for a bounded supplier slice; the
    // lineitem↔orders spine join is the scale path, the slice filter
    // only bounds the compare.
    "supplier_lead_time" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .filter(col("l_suppkey") < 30)
        .select(col("l_orderkey"), col("l_suppkey"), to_date(col("l_shipdate")).as("sd"))
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), to_date(col("o_orderdate")).as("od"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_suppkey"), datediff(col("sd"), col("od")).cast("long").as("lag_days"))
        .groupBy("l_suppkey")
        .agg(count(lit(1)).as("n_lines"), min(col("lag_days")).as("min_days"),
          max(col("lag_days")).as("max_days"),
          expr("(sum(lag_days) * 100) div count(1)").as("avg_days_x100"))
        .orderBy("l_suppkey")
    }),
  )

  val oracleSql: Map[String, String] = Map(

    "graph_triangles" ->
      """WITH sp AS (SELECT DISTINCT l_orderkey AS m, l_partkey AS s
        |      FROM lineitem WHERE l_partkey % 2 = 0),
        |e AS (SELECT DISTINCT a.s AS a, b.s AS b
        |      FROM sp a JOIN sp b ON a.m = b.m AND a.s < b.s),
        |t AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |      FROM e e1
        |      JOIN e e2 ON e1.a = e2.a AND e1.b < e2.b
        |      JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b)
        |SELECT v, count(*) AS n_triangles FROM (
        |  SELECT x AS v FROM t
        |  UNION ALL SELECT y FROM t
        |  UNION ALL SELECT z FROM t)
        |GROUP BY v ORDER BY v""".stripMargin,
    // same densified grid, same 25-row centered window with the
    // full-window guard, same truncating integer divisions
    "events_stl_decompose" ->
      """WITH hourly AS (SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 // 3600 AS hr,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |bounds AS (SELECT event_type, min(hr) AS h0, max(hr) AS h1
        |  FROM hourly GROUP BY 1),
        |grid AS (SELECT event_type, unnest(generate_series(h0, h1)) AS hr FROM bounds),
        |dense AS (SELECT g.event_type, g.hr, COALESCE(h.n, 0) AS n
        |  FROM grid g LEFT JOIN hourly h
        |    ON h.event_type = g.event_type AND h.hr = g.hr),
        |t AS (SELECT event_type, hr, n,
        |    count(*) OVER w AS wn, sum(n) OVER w AS s25
        |  FROM dense
        |  WINDOW w AS (PARTITION BY event_type ORDER BY hr
        |    ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
        |det AS (SELECT event_type, hr, n,
        |    CAST(s25 AS BIGINT) * 10000 // 25 AS trend_x1e4,
        |    n * 10000 - CAST(s25 AS BIGINT) * 10000 // 25 AS det_x1e4
        |  FROM t WHERE wn = 25),
        |seas AS (SELECT event_type, hr % 24 AS hod,
        |    CAST(sum(det_x1e4) AS BIGINT) // count(*) AS seas_x1e4
        |  FROM det GROUP BY 1, 2)
        |SELECT det.event_type, det.hr, CAST(det.n AS BIGINT) AS n,
        |  det.trend_x1e4, seas.seas_x1e4,
        |  det.det_x1e4 - seas.seas_x1e4 AS remainder_x1e4
        |FROM det JOIN seas
        |  ON seas.event_type = det.event_type AND seas.hod = det.hr % 24
        |ORDER BY det.event_type, det.hr""".stripMargin,
    // same STL chain, then median and MAD of the remainder by the
    // deterministic (value, hr) rank trick, flag |rem − med| > 5·MAD
    "events_anomaly_stl" ->
      """WITH hourly AS (SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 // 3600 AS hr,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |bounds AS (SELECT event_type, min(hr) AS h0, max(hr) AS h1
        |  FROM hourly GROUP BY 1),
        |grid AS (SELECT event_type, unnest(generate_series(h0, h1)) AS hr FROM bounds),
        |dense AS (SELECT g.event_type, g.hr, COALESCE(h.n, 0) AS n
        |  FROM grid g LEFT JOIN hourly h
        |    ON h.event_type = g.event_type AND h.hr = g.hr),
        |t AS (SELECT event_type, hr, n,
        |    count(*) OVER w AS wn, sum(n) OVER w AS s25
        |  FROM dense
        |  WINDOW w AS (PARTITION BY event_type ORDER BY hr
        |    ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
        |det AS (SELECT event_type, hr, n,
        |    n * 10000 - CAST(s25 AS BIGINT) * 10000 // 25 AS det_x1e4
        |  FROM t WHERE wn = 25),
        |seas AS (SELECT event_type, hr % 24 AS hod,
        |    CAST(sum(det_x1e4) AS BIGINT) // count(*) AS seas_x1e4
        |  FROM det GROUP BY 1, 2),
        |r AS (SELECT det.event_type, det.hr, det.n,
        |    det.det_x1e4 - seas.seas_x1e4 AS rem
        |  FROM det JOIN seas
        |    ON seas.event_type = det.event_type AND seas.hod = det.hr % 24),
        |med AS (SELECT event_type, rem AS med FROM (
        |    SELECT event_type, rem, hr,
        |      row_number() OVER (PARTITION BY event_type ORDER BY rem, hr) AS rn,
        |      count(*) OVER (PARTITION BY event_type) AS cnt FROM r)
        |  WHERE rn = (cnt + 1) // 2),
        |dev AS (SELECT r.event_type, r.hr, r.n, r.rem, med.med,
        |    abs(r.rem - med.med) AS adev
        |  FROM r JOIN med USING (event_type)),
        |mad AS (SELECT event_type, adev AS mad FROM (
        |    SELECT event_type, adev, hr,
        |      row_number() OVER (PARTITION BY event_type ORDER BY adev, hr) AS rn,
        |      count(*) OVER (PARTITION BY event_type) AS cnt FROM dev)
        |  WHERE rn = (cnt + 1) // 2)
        |SELECT d.event_type, d.hr, CAST(d.n AS BIGINT) AS n,
        |  d.rem AS remainder_x1e4, d.med AS med_x1e4, mad.mad AS mad_x1e4,
        |  d.adev AS adev_x1e4
        |FROM dev d JOIN mad USING (event_type)
        |WHERE d.adev > mad.mad * 5
        |ORDER BY d.event_type, d.hr""".stripMargin,
    // min over all ≤3-edge paths from the seeds ≡ the engine's
    // frontier-expansion BFS bounded at depth 3
    "graph_bfs_levels" ->
      """WITH RECURSIVE sp AS (SELECT DISTINCT l_orderkey AS m, l_partkey AS s
        |      FROM lineitem WHERE l_partkey % 2 = 0),
        |e AS (SELECT DISTINCT a.s AS a, b.s AS b
        |      FROM sp a JOIN sp b ON a.m = b.m AND a.s < b.s),
        |und AS (SELECT a AS x, b AS y FROM e UNION ALL SELECT b, a FROM e),
        |seeds AS (SELECT DISTINCT s AS v FROM sp WHERE s % 97 = 0),
        |reach(v, lvl) AS (
        |  SELECT v, 0 FROM seeds
        |  UNION
        |  SELECT u.y, r.lvl + 1 FROM reach r JOIN und u ON r.v = u.x WHERE r.lvl < 3)
        |SELECT v, CAST(min(lvl) AS BIGINT) AS lvl FROM reach
        |GROUP BY v ORDER BY v""".stripMargin,

    "events_time_weighted_avg" ->
      """WITH base AS (SELECT user_id, event_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS s,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS v2
        |  FROM events),
        |seg AS (SELECT user_id, v2, s,
        |    lead(s) OVER (PARTITION BY user_id ORDER BY s, event_id) AS nsec
        |  FROM base)
        |SELECT user_id,
        |  CAST(sum(v2 * (nsec - s)) AS BIGINT) AS vdur_x100,
        |  CAST(sum(nsec - s) AS BIGINT) AS dur_sec,
        |  CAST(sum(v2 * (nsec - s)) // sum(nsec - s) AS BIGINT) AS twa_x100
        |FROM seg WHERE nsec IS NOT NULL
        |GROUP BY user_id HAVING sum(nsec - s) > 0
        |ORDER BY user_id""".stripMargin,

    "events_dense_daily" ->
      """WITH span AS (SELECT min(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS lo,
        |    max(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS hi FROM events),
        |days AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
        |  FROM span),
        |types AS (SELECT DISTINCT event_type FROM events),
        |daily AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d, event_type,
        |    count(*) AS n0
        |  FROM events GROUP BY 1, 2)
        |SELECT strftime(dy.d, '%Y-%m-%d') AS day, t.event_type,
        |  CAST(coalesce(d2.n0, 0) AS BIGINT) AS n
        |FROM days dy CROSS JOIN types t
        |LEFT JOIN daily d2 ON d2.d = dy.d AND d2.event_type = t.event_type
        |ORDER BY day, t.event_type""".stripMargin,

    "events_rolling_wau" ->
      """WITH pairs AS (SELECT DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d, user_id
        |  FROM events),
        |hi AS (SELECT max(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS hi FROM events),
        |ex AS (SELECT DISTINCT
        |    CAST(unnest(generate_series(p.d, least(p.d + 6, h.hi), INTERVAL 1 DAY)) AS DATE) AS day,
        |    p.user_id
        |  FROM pairs p CROSS JOIN hi h)
        |SELECT strftime(day, '%Y-%m-%d') AS day, count(*) AS wau7
        |FROM ex GROUP BY day ORDER BY day""".stripMargin,

    "agg_mode" ->
      """SELECT o_orderstatus, o_orderpriority AS mode_priority, n FROM (
        |  SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |    row_number() OVER (PARTITION BY o_orderstatus
        |                       ORDER BY count(*) DESC, o_orderpriority) AS rn
        |  FROM orders GROUP BY 1, 2)
        |WHERE rn = 1 ORDER BY o_orderstatus""".stripMargin,

    "features_minmax_scale" ->
      """WITH s AS (SELECT c_custkey, c_mktsegment, c_acctbal,
        |    min(c_acctbal) OVER (PARTITION BY c_mktsegment) AS mn,
        |    max(c_acctbal) OVER (PARTITION BY c_mktsegment) AS mx
        |  FROM customer)
        |SELECT c_custkey, c_mktsegment,
        |  CAST(floor((c_acctbal - mn) / (mx - mn) * 1e6 + 0.5) AS BIGINT) AS scaled_ppm
        |FROM s WHERE mx > mn AND c_custkey < 500
        |ORDER BY c_custkey""".stripMargin,

    "features_hash_bucket" ->
      """SELECT CAST(('0x' || substr(md5(p_type), 1, 8)) AS BIGINT) % 64 AS bucket,
        |  count(*) AS n
        |FROM part GROUP BY 1 ORDER BY bucket""".stripMargin,

    "text_pmi_bigrams" ->
      """WITH toks AS (SELECT doc_id,
        |    list_filter(string_split(text, ' '), t -> t <> '') AS l
        |  FROM documents WHERE doc_id < 2000),
        |bg AS (SELECT l[i] AS w1, l[i+1] AS w2
        |  FROM toks, unnest(range(1, len(l))) AS t(i)),
        |uni AS (SELECT unnest(l) AS w FROM toks),
        |uc AS (SELECT w, count(*) AS c FROM uni GROUP BY w),
        |tot AS (SELECT count(*) AS n_tokens FROM uni),
        |pair AS (SELECT w1, w2, count(*) AS c_xy FROM bg GROUP BY 1, 2
        |  HAVING count(*) >= 5)
        |SELECT p.w1, p.w2, p.c_xy,
        |  (p.c_xy * t.n_tokens * 1000000) // (x.c * y.c) AS pmi_ppm
        |FROM pair p
        |JOIN uc x ON x.w = p.w1
        |JOIN uc y ON y.w = p.w2
        |CROSS JOIN tot t
        |ORDER BY p.c_xy DESC, p.w1, p.w2 LIMIT 20""".stripMargin,

    "hierarchy_rollup" ->
      """WITH RECURSIVE e AS (SELECT c_custkey AS id,
        |    CASE WHEN c_custkey < 7 THEN NULL ELSE c_custkey // 7 END AS parent,
        |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS v2
        |  FROM customer),
        |walk AS (
        |  SELECT id, id AS root, CAST(0 AS BIGINT) AS depth FROM e WHERE parent IS NULL
        |  UNION ALL
        |  SELECT e.id, w.root, w.depth + 1 FROM e JOIN walk w ON e.parent = w.id)
        |SELECT w.root, count(*) AS n_nodes,
        |  CAST(max(w.depth) AS BIGINT) AS max_depth,
        |  CAST(sum(e.v2) AS BIGINT) AS bal_x100
        |FROM walk w JOIN e ON e.id = w.id
        |GROUP BY w.root ORDER BY w.root""".stripMargin,

    "orders_daily_drawdown" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_x100
        |  FROM orders GROUP BY 1),
        |c AS (SELECT d, rev_x100,
        |    CAST(sum(rev_x100) OVER (ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_x100
        |  FROM daily),
        |p AS (SELECT d, rev_x100, cum_x100,
        |    CAST(max(cum_x100) OVER (ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS peak_x100
        |  FROM c)
        |SELECT strftime(d, '%Y-%m-%d') AS day, rev_x100, cum_x100, peak_x100,
        |  peak_x100 - cum_x100 AS dd_x100
        |FROM p ORDER BY day""".stripMargin,

    "geo_radius_pairs" ->
      """WITH pts AS (SELECT c_custkey AS k,
        |    CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || ':lat'), 1, 15)) AS BIGINT) % 6000 / 100.0 - 30 AS lat,
        |    CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || ':lon'), 1, 15)) AS BIGINT) % 6000 / 100.0 - 30 AS lon
        |  FROM customer WHERE c_custkey < 3000),
        |p AS (SELECT a.k AS a_key, b.k AS b_key,
        |    CAST(floor(2 * 6371000 * asin(sqrt(
        |      pow(sin(radians(b.lat - a.lat) / 2), 2) +
        |      cos(radians(a.lat)) * cos(radians(b.lat)) *
        |      pow(sin(radians(b.lon - a.lon) / 2), 2))) + 0.5) AS BIGINT) AS dist_m
        |  FROM pts a JOIN pts b ON a.k < b.k)
        |SELECT a_key, b_key, dist_m FROM p WHERE dist_m < 100000
        |ORDER BY a_key, b_key""".stripMargin,

    // register state mirrored relationally: bucket = top 9 bits,
    // rho = first '1' position in the 51-bit suffix via bin()/strpos,
    // harmonic sum scaled by 2^52 so every term is integral, and the
    // rational α_m — 7213·m/(10·(1000·m+1079)) — folded into one
    // HUGEINT floor division.
    "hll_distinct_parts" ->
      """WITH h AS (SELECT DISTINCT l_returnflag,
        |    CAST(('0x' || substr(md5(CAST(l_partkey AS VARCHAR) || ':hll'), 1, 15)) AS BIGINT) AS h
        |  FROM lineitem),
        |r AS (SELECT l_returnflag, h >> 51 AS bucket,
        |    CASE WHEN (h & 2251799813685247) = 0 THEN 52
        |         ELSE strpos(lpad(bin(h & 2251799813685247), 51, '0'), '1') END AS rho
        |  FROM h),
        |regs AS (SELECT l_returnflag, bucket, max(rho) AS reg FROM r GROUP BY 1, 2),
        |s AS (SELECT l_returnflag, count(*) AS nb,
        |    sum(CAST(1 AS HUGEINT) << (52 - reg)) AS numpart
        |  FROM regs GROUP BY 1),
        |ex AS (SELECT l_returnflag, count(DISTINCT l_partkey) AS n_exact
        |  FROM lineitem GROUP BY 1)
        |SELECT ex.l_returnflag, ex.n_exact,
        |  CAST((CAST(7213 AS HUGEINT) * 134217728 * 4503599627370496) //
        |    (10 * (512000 + 1079) *
        |      (s.numpart + (512 - s.nb) * CAST(4503599627370496 AS HUGEINT)))
        |    AS BIGINT) AS hll_est
        |FROM ex JOIN s USING (l_returnflag)
        |ORDER BY l_returnflag""".stripMargin,

    // 3 bounded min-propagation rounds ≡ the engine's fixpoint because
    // the fixture's components have diameter ≤ 2 (see the query note).
    "er_cluster_customers" ->
      """WITH cust AS (SELECT c_custkey, c_name FROM customer WHERE c_nationkey = 7),
        |dirty AS (SELECT c_custkey + 10000000 AS b_key,
        |    substr(c_name, 1, length(c_name)-1) || 'X' AS b_name
        |  FROM cust WHERE c_custkey % 3 = 0),
        |e AS (SELECT a.c_custkey AS x, d.b_key AS y
        |  FROM cust a JOIN dirty d ON levenshtein(a.c_name, d.b_name) <= 1),
        |edges AS (SELECT x, y FROM e UNION ALL SELECT y, x FROM e),
        |l0 AS (SELECT x AS id, least(x, min(y)) AS lbl FROM edges GROUP BY x),
        |l1 AS (SELECT e.x AS id, least(min(l.lbl), min(e.x)) AS lbl
        |  FROM edges e JOIN l0 l ON l.id = e.y GROUP BY e.x),
        |l2 AS (SELECT e.x AS id, least(min(l.lbl), min(e.x)) AS lbl
        |  FROM edges e JOIN l1 l ON l.id = e.y GROUP BY e.x),
        |l3 AS (SELECT e.x AS id, least(min(l.lbl), min(e.x)) AS lbl
        |  FROM edges e JOIN l2 l ON l.id = e.y GROUP BY e.x)
        |SELECT lbl AS cluster, count(*) AS n_members
        |FROM l3 GROUP BY lbl ORDER BY cluster""".stripMargin,

    "events_peak_concurrency" ->
      """WITH d AS (SELECT event_type AS k,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS t, 1 AS d FROM events
        |  UNION ALL
        |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 + 300, -1 FROM events),
        |g AS (SELECT k, t, CAST(sum(d) AS BIGINT) AS d FROM d GROUP BY k, t),
        |r AS (SELECT k, t, CAST(sum(d) OVER (PARTITION BY k ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS live FROM g),
        |m AS (SELECT k, max(live) AS peak FROM r GROUP BY k)
        |SELECT r.k AS event_type, m.peak, min(r.t) AS peak_at_sec
        |FROM r JOIN m ON r.k = m.k AND r.live = m.peak
        |GROUP BY 1, 2 ORDER BY event_type""".stripMargin,

    "cohort_ltv" ->
      """WITH o AS (SELECT o_custkey,
        |    CAST(year(CAST(o_orderdate AS DATE)) * 12
        |      + month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT) AS ym,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
        |  FROM orders),
        |f AS (SELECT o_custkey, min(ym) AS cym FROM o GROUP BY 1),
        |m AS (SELECT f.cym AS cohort_ym, o.ym - f.cym AS age_months,
        |    count(*) AS n_orders, CAST(sum(o.c) AS BIGINT) AS rev_x100
        |  FROM o JOIN f USING (o_custkey) GROUP BY 1, 2)
        |SELECT cohort_ym, age_months, n_orders, rev_x100,
        |  CAST(sum(rev_x100) OVER (PARTITION BY cohort_ym ORDER BY age_months
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_rev_x100
        |FROM m ORDER BY cohort_ym, age_months""".stripMargin,

    "part_pareto_frontier" ->
      """WITH p AS (SELECT p_partkey,
        |    CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS price_x100,
        |    CAST(p_size AS BIGINT) AS sz
        |  FROM part),
        |lvl AS (SELECT price_x100, max(sz) AS best FROM p GROUP BY 1),
        |f AS (SELECT price_x100, best, max(best) OVER (ORDER BY price_x100
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev FROM lvl)
        |SELECT p.p_partkey, p.price_x100, p.sz
        |FROM p JOIN f USING (price_x100)
        |WHERE (f.prev IS NULL OR f.best > f.prev) AND p.sz = f.best
        |ORDER BY p.p_partkey""".stripMargin,

    "events_path_trigrams" ->
      """WITH t AS (SELECT user_id, event_type AS e1,
        |    lead(event_type, 1) OVER w AS e2,
        |    lead(event_type, 2) OVER w AS e3
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT e1, e2, e3, count(*) AS n
        |FROM t WHERE e2 IS NOT NULL AND e3 IS NOT NULL
        |GROUP BY e1, e2, e3
        |ORDER BY n DESC, e1, e2, e3 LIMIT 20""".stripMargin,

    "events_entry_exit" ->
      """WITH f AS (SELECT user_id, event_id, ts, event_type,
        |    CASE WHEN lag(ts, 1) OVER w IS NULL
        |      OR epoch_ms(CAST(ts AS TIMESTAMP)) - epoch_ms(CAST(lag(ts, 1) OVER w AS TIMESTAMP)) > 1800000
        |      THEN 1 ELSE 0 END AS new_sess
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT user_id, event_id, ts, event_type,
        |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_no
        |  FROM f),
        |o AS (SELECT user_id, sess_no, event_type,
        |    row_number() OVER (PARTITION BY user_id, sess_no ORDER BY ts, event_id) AS rn_a,
        |    row_number() OVER (PARTITION BY user_id, sess_no ORDER BY ts DESC, event_id DESC) AS rn_d
        |  FROM s),
        |per AS (SELECT user_id, sess_no,
        |    max(CASE WHEN rn_a = 1 THEN event_type END) AS entry_type,
        |    max(CASE WHEN rn_d = 1 THEN event_type END) AS exit_type,
        |    count(*) AS n_events
        |  FROM o GROUP BY 1, 2)
        |SELECT entry_type, exit_type, count(*) AS n_sessions,
        |  CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces
        |FROM per GROUP BY 1, 2 ORDER BY entry_type, exit_type""".stripMargin,

    "stats_weighted_median" ->
      """WITH lvl AS (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty,
        |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS w
        |  FROM lineitem GROUP BY 1, 2),
        |c AS (SELECT l_returnflag, qty,
        |    CAST(sum(w) OVER (PARTITION BY l_returnflag ORDER BY qty
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cw,
        |    CAST(sum(w) OVER (PARTITION BY l_returnflag) AS BIGINT) AS tw
        |  FROM lvl)
        |SELECT l_returnflag, min(qty) AS wmedian_qty
        |FROM c WHERE cw * 2 >= tw
        |GROUP BY 1 ORDER BY l_returnflag""".stripMargin,

    "geo_fence_contains" ->
      """WITH pts AS (SELECT c_mktsegment,
        |    CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || ':x'), 1, 15)) AS BIGINT) % 6000 - 3000 AS x,
        |    CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || ':y'), 1, 15)) AS BIGINT) % 6000 - 3000 AS y
        |  FROM customer)
        |SELECT c_mktsegment, count(*) AS n_inside
        |FROM pts
        |WHERE (750 - 1500) * (y - 0) - (1300 - 0) * (x - 1500) >= 0
        |  AND (-750 - 750) * (y - 1300) - (1300 - 1300) * (x - 750) >= 0
        |  AND (-1500 - -750) * (y - 1300) - (0 - 1300) * (x - -750) >= 0
        |  AND (-750 - -1500) * (y - 0) - (-1300 - 0) * (x - -1500) >= 0
        |  AND (750 - -750) * (y - -1300) - (-1300 - -1300) * (x - -750) >= 0
        |  AND (1500 - 750) * (y - -1300) - (0 - -1300) * (x - 750) >= 0
        |GROUP BY 1 ORDER BY c_mktsegment""".stripMargin,

    "dq_orders_expectations" ->
      """WITH t AS (SELECT count(*) AS n FROM orders)
        |SELECT * FROM (
        |  SELECT 'not_null:o_custkey' AS rule,
        |    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
        |    (SELECT n FROM t) AS n_rows FROM orders
        |  UNION ALL
        |  SELECT 'in_range:o_totalprice',
        |    CAST(sum(CASE WHEN o_totalprice IS NULL OR o_totalprice < 0
        |      OR o_totalprice > 300000.0 THEN 1 ELSE 0 END) AS BIGINT),
        |    (SELECT n FROM t) FROM orders
        |  UNION ALL
        |  SELECT 'in_set:o_orderstatus',
        |    CAST(sum(CASE WHEN o_orderstatus IS NULL
        |      OR o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT),
        |    (SELECT n FROM t) FROM orders
        |  UNION ALL
        |  SELECT 'matches:o_orderpriority',
        |    CAST(sum(CASE WHEN o_orderpriority IS NULL
        |      OR NOT regexp_matches(o_orderpriority, '^[1-5]-') THEN 1 ELSE 0 END) AS BIGINT),
        |    (SELECT n FROM t) FROM orders
        |  UNION ALL
        |  SELECT 'unique:o_orderkey',
        |    (SELECT n FROM t) - count(DISTINCT o_orderkey), (SELECT n FROM t) FROM orders
        |  UNION ALL
        |  SELECT 'ref:o_custkey',
        |    (SELECT CAST(count(*) AS BIGINT) FROM orders o
        |      LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |      WHERE o.o_custkey IS NOT NULL AND c.c_custkey IS NULL),
        |    (SELECT n FROM t)
        |) ORDER BY rule""".stripMargin,

    "events_debounce" ->
      """WITH k AS (SELECT event_type,
        |    CASE WHEN lag(ts, 1) OVER w IS NULL
        |      OR epoch_ms(CAST(ts AS TIMESTAMP)) - epoch_ms(CAST(lag(ts, 1) OVER w AS TIMESTAMP)) > 60000
        |      THEN 1 ELSE 0 END AS keep
        |  FROM events WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id))
        |SELECT event_type, CAST(sum(keep) AS BIGINT) AS n_kept,
        |  CAST(sum(1 - keep) AS BIGINT) AS n_dropped
        |FROM k GROUP BY 1 ORDER BY event_type""".stripMargin,

    "events_rate_limit" ->
      """WITH b AS (SELECT user_id, event_id, ts, CAST(ts AS DATE) AS d FROM events),
        |r AS (SELECT d, row_number() OVER (PARTITION BY user_id, d ORDER BY ts, event_id) AS rn FROM b)
        |SELECT strftime(d, '%Y-%m-%d') AS day,
        |  CAST(sum(CASE WHEN rn <= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  count(*) AS n_total
        |FROM r GROUP BY d ORDER BY day""".stripMargin,

    "events_late_arrivals" ->
      """WITH base AS (SELECT user_id, event_id,
        |    CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT) AS arr,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS t FROM events),
        |l AS (SELECT greatest(0, coalesce(max(t) OVER (PARTITION BY user_id ORDER BY arr, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) - t, 0)) AS late_sec
        |  FROM base),
        |b AS (SELECT CASE WHEN late_sec = 0 THEN 'a_on_time'
        |    WHEN late_sec <= 60 THEN 'b_1_to_60s'
        |    WHEN late_sec <= 600 THEN 'c_61_to_600s'
        |    ELSE 'd_gt_600s' END AS bucket FROM l)
        |SELECT bucket, count(*) AS n FROM b GROUP BY 1 ORDER BY bucket""".stripMargin,

    "fifo_cogs_monthly" ->
      """WITH li AS (SELECT l_partkey AS k, l_linestatus,
        |    CAST(date_diff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE)) AS BIGINT)
        |      * 1000000000000 + l_orderkey * 10 + l_linenumber AS ord,
        |    CAST(l_quantity AS BIGINT) AS qty,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
        |    substr(CAST(l_shipdate AS VARCHAR), 1, 7) AS m
        |  FROM lineitem),
        |b AS (SELECT k, ord, qty, cents // qty AS unit_x100,
        |    CAST(sum(qty) OVER w AS BIGINT) AS hi,
        |    CAST(sum(qty) OVER w AS BIGINT) - qty AS lo
        |  FROM li WHERE l_linestatus = 'F'
        |  WINDOW w AS (PARTITION BY k ORDER BY ord
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |s AS (SELECT k, ord, qty, m,
        |    CAST(sum(qty) OVER w AS BIGINT) AS hi,
        |    CAST(sum(qty) OVER w AS BIGINT) - qty AS lo
        |  FROM li WHERE l_linestatus = 'O'
        |  WINDOW w AS (PARTITION BY k ORDER BY ord
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |p AS (SELECT s.m, least(b.hi, s.hi) - greatest(b.lo, s.lo) AS mq, b.unit_x100
        |  FROM b JOIN s ON b.k = s.k AND b.lo < s.hi AND s.lo < b.hi)
        |SELECT m AS sell_month, count(*) AS n_pairs,
        |  CAST(sum(mq) AS BIGINT) AS qty_matched,
        |  CAST(sum(mq * unit_x100) AS BIGINT) AS cogs_x100
        |FROM p GROUP BY 1 ORDER BY sell_month""".stripMargin,

    "orders_penny_allocation" ->
      """WITH li AS (SELECT l_orderkey AS k, l_linenumber AS tie,
        |    CAST(l_quantity AS BIGINT) AS w FROM lineitem WHERE l_orderkey < 200),
        |o AS (SELECT o_orderkey, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS t
        |  FROM orders WHERE o_orderkey < 200),
        |j AS (SELECT k, tie, w, t FROM li JOIN o ON k = o_orderkey),
        |b AS (SELECT k, tie, w, t, CAST(sum(w) OVER (PARTITION BY k) AS BIGINT) AS tw FROM j),
        |c AS (SELECT k, tie, t, (t * w) // tw AS base, (t * w) % tw AS rem FROM b),
        |d AS (SELECT k, tie, base,
        |    t - CAST(sum(base) OVER (PARTITION BY k) AS BIGINT) AS leftu,
        |    row_number() OVER (PARTITION BY k ORDER BY rem DESC, tie) AS rk FROM c)
        |SELECT k AS l_orderkey, tie AS l_linenumber,
        |  CAST(base + CASE WHEN rk <= leftu THEN 1 ELSE 0 END AS BIGINT) AS alloc_x100
        |FROM d ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "features_winsorize" ->
      """WITH v AS (SELECT l_returnflag, l_orderkey, l_linenumber,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v FROM lineitem),
        |r AS (SELECT l_returnflag, v,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY v, l_orderkey, l_linenumber) AS r,
        |    CAST(count(*) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
        |  FROM v),
        |c AS (SELECT l_returnflag, v, n,
        |    max(CASE WHEN r = (n + 19) // 20 THEN v END)
        |      OVER (PARTITION BY l_returnflag) AS lo,
        |    max(CASE WHEN r = (19 * n + 19) // 20 THEN v END)
        |      OVER (PARTITION BY l_returnflag) AS hi
        |  FROM r)
        |SELECT l_returnflag, max(n) AS n, max(lo) AS lo_x100, max(hi) AS hi_x100,
        |  CAST(sum(least(greatest(v, lo), hi)) AS BIGINT) AS sum_winsorized_x100
        |FROM c GROUP BY 1 ORDER BY l_returnflag""".stripMargin,

    "set_ops_customers" ->
      """SELECT * FROM (
        |  SELECT 'both' AS cohort, count(*) AS n FROM (
        |    SELECT o_custkey FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1994
        |    INTERSECT
        |    SELECT o_custkey FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1995)
        |  UNION ALL
        |  SELECT 'only_1994', count(*) FROM (
        |    SELECT o_custkey FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1994
        |    EXCEPT
        |    SELECT o_custkey FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1995)
        |  UNION ALL
        |  SELECT 'only_1995', count(*) FROM (
        |    SELECT o_custkey FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1995
        |    EXCEPT
        |    SELECT o_custkey FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1994)
        |) ORDER BY cohort""".stripMargin,

    "join_cardinality_estimate" ->
      """WITH f AS (SELECT l_partkey, count(*) AS n FROM lineitem GROUP BY 1)
        |SELECT count(*) AS n_keys, max(n) AS max_freq,
        |  CAST(sum(n * n) AS BIGINT) AS selfjoin_pairs FROM f""".stripMargin,

    "agg_nation_bitmask" ->
      """SELECT c_mktsegment,
        |  CAST(bit_or(CAST(1 AS BIGINT) << c_nationkey) AS BIGINT) AS nation_mask,
        |  count(DISTINCT c_nationkey) AS n_nations,
        |  CAST(bit_count(bit_or(CAST(1 AS BIGINT) << c_nationkey)) AS BIGINT) AS mask_popcount
        |FROM customer GROUP BY 1 ORDER BY c_mktsegment""".stripMargin,

    "insights_delta_attribution" ->
      """WITH per AS (
        |  SELECT c.c_mktsegment,
        |    CAST(SUM(CASE WHEN year(o.o_orderdate) = 1997
        |      THEN CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS rev_a,
        |    CAST(SUM(CASE WHEN year(o.o_orderdate) = 1998
        |      THEN CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS rev_b
        |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        |  WHERE year(o.o_orderdate) IN (1997, 1998)
        |  GROUP BY 1)
        |SELECT c_mktsegment, rev_a, rev_b, rev_b - rev_a AS delta_c,
        |  CAST(row_number() OVER (ORDER BY abs(rev_b - rev_a) DESC, c_mktsegment)
        |    AS BIGINT) AS impact_rank
        |FROM per ORDER BY impact_rank""".stripMargin,
    "features_dict_encode" ->
      """WITH d AS (SELECT p_brand, count(*) AS n FROM part GROUP BY 1),
        |c AS (SELECT p_brand,
        |    CAST(row_number() OVER (ORDER BY n DESC, p_brand) - 1 AS BIGINT) AS code
        |  FROM d)
        |SELECT c.code, p.p_brand, count(*) AS n_parts
        |FROM part p JOIN c ON c.p_brand = p.p_brand
        |GROUP BY 1, 2 ORDER BY code""".stripMargin,
    "events_attribution_decay" ->
      """WITH f AS (SELECT user_id, event_id, ts, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS t,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS v_x100,
        |    CASE WHEN lag(ts, 1) OVER w IS NULL
        |      OR epoch_ms(CAST(ts AS TIMESTAMP)) - epoch_ms(CAST(lag(ts, 1) OVER w AS TIMESTAMP)) > 1800000
        |      THEN 1 ELSE 0 END AS new_sess
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT *, CAST(user_id AS VARCHAR) || '#' ||
        |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS VARCHAR) AS sess_key FROM f),
        |a AS (SELECT sess_key, max(t) AS anchor, CAST(SUM(v_x100) AS BIGINT) AS p_x100
        |  FROM s WHERE event_type = 'purchase' GROUP BY 1 HAVING SUM(v_x100) > 0),
        |touch AS (SELECT s.sess_key, s.event_id AS tie, s.event_type, a.p_x100 AS t_total,
        |    CAST(1 AS BIGINT) << CAST(greatest(0, 5 - (a.anchor - s.t) // 600) AS INT) AS w
        |  FROM s JOIN a USING (sess_key) WHERE s.t <= a.anchor),
        |b AS (SELECT sess_key, tie, event_type, w, t_total,
        |    CAST(sum(w) OVER (PARTITION BY sess_key) AS BIGINT) AS tw FROM touch),
        |c AS (SELECT sess_key, tie, event_type, t_total,
        |    (t_total * w) // tw AS base, (t_total * w) % tw AS rem FROM b),
        |d AS (SELECT sess_key, tie, event_type, base,
        |    t_total - CAST(sum(base) OVER (PARTITION BY sess_key) AS BIGINT) AS leftu,
        |    row_number() OVER (PARTITION BY sess_key ORDER BY rem DESC, tie) AS rk FROM c)
        |SELECT event_type, count(*) AS n_touches,
        |  CAST(SUM(base + CASE WHEN rk <= leftu THEN 1 ELSE 0 END) AS BIGINT) AS credit_x100
        |FROM d GROUP BY 1 ORDER BY event_type""".stripMargin,
    // the same journey cut, transition counts, and 40 integer sweeps;
    // zero-weight self-loops keep the recursive aggregate dense, and
    // the removed channel's value is clamped inside the CASE — bit-
    // identical to the driver-side integer fixpoint
    "events_attribution_markov" ->
      """WITH RECURSIVE ordv AS (SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |fp AS (SELECT user_id, min(rn) AS prn FROM ordv
        |  WHERE event_type = 'purchase' GROUP BY 1),
        |pre AS (SELECT o.user_id, o.event_type, o.rn
        |  FROM ordv o LEFT JOIN fp ON fp.user_id = o.user_id
        |  WHERE o.event_type <> 'purchase' AND (fp.prn IS NULL OR o.rn < fp.prn)),
        |steps AS (SELECT COALESCE(lag(event_type) OVER
        |      (PARTITION BY user_id ORDER BY rn), 'START') AS s,
        |    event_type AS t FROM pre),
        |lastch AS (SELECT user_id, arg_max(event_type, rn) AS lastc
        |  FROM pre GROUP BY 1),
        |usr AS (SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
        |  FROM events GROUP BY 1),
        |term AS (SELECT COALESCE(l.lastc, 'START') AS s,
        |    CASE WHEN u.conv = 1 THEN 'CONV' ELSE 'NULL' END AS t
        |  FROM usr u LEFT JOIN lastch l ON l.user_id = u.user_id),
        |cnt AS (SELECT s, t, count(*) AS c FROM (
        |  SELECT s, t FROM steps UNION ALL SELECT s, t FROM term) GROUP BY 1, 2),
        |outs AS (SELECT s, CAST(sum(c) AS BIGINT) AS o FROM cnt GROUP BY 1),
        |bse AS (SELECT s, CAST(SUM(CASE WHEN t = 'CONV' THEN c ELSE 0 END)
        |    * 1000000000 AS BIGINT) AS b FROM cnt GROUP BY s),
        |trans AS (SELECT s, t, c FROM cnt WHERE t NOT IN ('CONV', 'NULL')
        |  UNION ALL SELECT s, s, 0 FROM outs),
        |chans AS (SELECT DISTINCT ch FROM (
        |    SELECT s AS ch FROM cnt UNION ALL SELECT t AS ch FROM cnt)
        |  WHERE ch NOT IN ('START', 'CONV', 'NULL')),
        |variants AS (SELECT 'none' AS rm UNION ALL SELECT ch FROM chans),
        |it(rm, k, s, p) AS (
        |  SELECT v.rm, 0, o.s, CAST(0 AS BIGINT) FROM variants v CROSS JOIN outs o
        |  UNION ALL
        |  SELECT it.rm, it.k + 1, tr.s,
        |    CAST((MIN(bse.b) + SUM(tr.c *
        |        CASE WHEN tr.t = it.rm THEN 0 ELSE it.p END)) // MIN(outs.o) AS BIGINT)
        |  FROM it
        |  JOIN trans tr ON tr.t = it.s
        |  JOIN outs ON outs.s = tr.s
        |  JOIN bse ON bse.s = tr.s
        |  WHERE it.k < 40
        |  GROUP BY it.rm, it.k, tr.s),
        |pf AS (SELECT p FROM it WHERE rm = 'none' AND k = 40 AND s = 'START'),
        |re AS (SELECT rm AS channel, (SELECT p FROM pf) AS p_full_x1e9,
        |    p AS p_removed_x1e9,
        |    CASE WHEN (SELECT p FROM pf) = 0 THEN CAST(0 AS BIGINT)
        |      ELSE ((SELECT p FROM pf) - p) * 1000000 // (SELECT p FROM pf) END
        |      AS removal_x1e6
        |  FROM it WHERE rm <> 'none' AND k = 40 AND s = 'START')
        |SELECT channel, p_full_x1e9, p_removed_x1e9, removal_x1e6,
        |  CASE WHEN CAST(SUM(removal_x1e6) OVER () AS BIGINT) = 0
        |    THEN CAST(0 AS BIGINT)
        |    ELSE removal_x1e6 * 1000000
        |      // CAST(SUM(removal_x1e6) OVER () AS BIGINT) END
        |    AS share_x1e6
        |FROM re ORDER BY channel""".stripMargin,
    "events_attribution_linear" ->
      """WITH f AS (SELECT user_id, event_id, ts, event_type,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS v_x100,
        |    CASE WHEN lag(ts, 1) OVER w IS NULL
        |      OR epoch_ms(CAST(ts AS TIMESTAMP)) - epoch_ms(CAST(lag(ts, 1) OVER w AS TIMESTAMP)) > 1800000
        |      THEN 1 ELSE 0 END AS new_sess
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT *, CAST(user_id AS VARCHAR) || '#' ||
        |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS VARCHAR) AS sess_key FROM f),
        |p AS (SELECT sess_key, CAST(SUM(v_x100) AS BIGINT) AS p_x100 FROM s
        |  WHERE event_type = 'purchase' GROUP BY 1 HAVING SUM(v_x100) > 0),
        |t AS (SELECT DISTINCT sess_key, event_type FROM s),
        |g AS (SELECT t.sess_key, t.event_type, p.p_x100,
        |    count(*) OVER (PARTITION BY t.sess_key) AS W,
        |    row_number() OVER (PARTITION BY t.sess_key ORDER BY t.event_type) AS rk
        |  FROM t JOIN p USING (sess_key)),
        |a AS (SELECT event_type,
        |    p_x100 // W + (CASE WHEN rk <= p_x100 % W THEN 1 ELSE 0 END) AS alloc
        |  FROM g)
        |SELECT event_type, count(*) AS n_sessions,
        |  CAST(SUM(alloc) AS BIGINT) AS credit_x100
        |FROM a GROUP BY 1 ORDER BY event_type""".stripMargin,
    "events_attribution_first_touch" ->
      """WITH f AS (SELECT user_id, event_id, ts, event_type,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS v_x100,
        |    CASE WHEN lag(ts, 1) OVER w IS NULL
        |      OR epoch_ms(CAST(ts AS TIMESTAMP)) - epoch_ms(CAST(lag(ts, 1) OVER w AS TIMESTAMP)) > 1800000
        |      THEN 1 ELSE 0 END AS new_sess
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_no FROM f),
        |e AS (SELECT *, first_value(event_type) OVER (PARTITION BY user_id, sess_no
        |    ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS entry_type
        |  FROM s)
        |SELECT entry_type, count(*) AS n_purchases,
        |  CAST(sum(v_x100) AS BIGINT) AS attributed_x100
        |FROM e WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY entry_type""".stripMargin,

    "events_interarrival_histogram" ->
      """WITH g AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 1000000
        |      - lag(epoch_us(CAST(ts AS TIMESTAMP)) // 1000000, 1)
        |        OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
        |  FROM events),
        |b AS (SELECT CASE WHEN gap < 60 THEN 'a_lt_1m'
        |    WHEN gap < 600 THEN 'b_1m_to_10m'
        |    WHEN gap < 3600 THEN 'c_10m_to_1h'
        |    WHEN gap < 86400 THEN 'd_1h_to_1d'
        |    ELSE 'e_ge_1d' END AS bucket
        |  FROM g WHERE gap IS NOT NULL)
        |SELECT bucket, count(*) AS n FROM b GROUP BY 1 ORDER BY bucket""".stripMargin,

    "lineitem_unpivot_metrics" ->
      """WITH wide AS (SELECT l_returnflag,
        |    CAST(sum(CAST(l_quantity AS BIGINT) * 100) AS BIGINT) AS sum_qty_x100,
        |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_price_x100,
        |    CAST(sum(CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_disc_x100
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, metric, value_x100 FROM (
        |  SELECT l_returnflag, 'sum_qty_x100' AS metric, sum_qty_x100 AS value_x100 FROM wide
        |  UNION ALL
        |  SELECT l_returnflag, 'sum_price_x100', sum_price_x100 FROM wide
        |  UNION ALL
        |  SELECT l_returnflag, 'sum_disc_x100', sum_disc_x100 FROM wide)
        |ORDER BY l_returnflag, metric""".stripMargin,

    // Same bounded 3-round propagation as er_cluster_customers (the
    // fixture's components have diameter ≤ 2), then survivorship.
    "er_golden_record" ->
      """WITH cust AS (SELECT c_custkey, c_name,
        |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal
        |  FROM customer WHERE c_nationkey = 7),
        |dirty AS (SELECT c_custkey + 10000000 AS b_key,
        |    substr(c_name, 1, length(c_name)-1) || 'X' AS b_name,
        |    bal + 999 AS b_bal
        |  FROM cust WHERE c_custkey % 3 = 0),
        |e AS (SELECT a.c_custkey AS x, d.b_key AS y
        |  FROM cust a JOIN dirty d ON levenshtein(a.c_name, d.b_name) <= 1),
        |edges AS (SELECT x, y FROM e UNION ALL SELECT y, x FROM e),
        |l0 AS (SELECT x AS id, least(x, min(y)) AS lbl FROM edges GROUP BY x),
        |l1 AS (SELECT e.x AS id, least(min(l.lbl), min(e.x)) AS lbl
        |  FROM edges e JOIN l0 l ON l.id = e.y GROUP BY e.x),
        |l2 AS (SELECT e.x AS id, least(min(l.lbl), min(e.x)) AS lbl
        |  FROM edges e JOIN l1 l ON l.id = e.y GROUP BY e.x),
        |l3 AS (SELECT e.x AS id, least(min(l.lbl), min(e.x)) AS lbl
        |  FROM edges e JOIN l2 l ON l.id = e.y GROUP BY e.x),
        |mem AS (SELECT c_custkey AS id, c_name AS name, bal, 1 AS src FROM cust
        |  UNION ALL SELECT b_key, b_name, b_bal, 2 FROM dirty),
        |m AS (SELECT l3.lbl AS cluster, mem.id, mem.name, mem.bal, mem.src
        |  FROM l3 JOIN mem ON mem.id = l3.id)
        |SELECT cluster,
        |  arg_min(name, src * 100000000 + id) AS golden_name,
        |  CAST(max(bal) AS BIGINT) AS best_bal_x100,
        |  count(*) AS n_members
        |FROM m GROUP BY 1 ORDER BY cluster""".stripMargin,

    "aqp_sampled_revenue" ->
      """WITH li AS (SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS c,
        |    CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || ':'
        |      || CAST(l_linenumber AS VARCHAR)), 1, 15)) AS BIGINT) % 64 AS bucket
        |  FROM lineitem),
        |a AS (SELECT CAST(sum(c) AS BIGINT) AS exact_x100,
        |    CAST(sum(CASE WHEN bucket = 0 THEN c END) AS BIGINT) AS sample_x100,
        |    CAST(sum(CASE WHEN bucket = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
        |    count(*) AS n_rows FROM li)
        |SELECT exact_x100, sample_x100 * 64 AS est_x100, n_sampled, n_rows,
        |  (abs(sample_x100 * 64 - exact_x100) * 10000) // exact_x100 AS err_bps
        |FROM a""".stripMargin,

    "events_ohlc_hourly" ->
      """WITH base AS (SELECT
        |    (epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 // 3600) * 3600 AS bar,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS t, event_id,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
        |  FROM events)
        |SELECT bar,
        |  first(v ORDER BY t, event_id) AS open_x100,
        |  max(v) AS high_x100,
        |  min(v) AS low_x100,
        |  last(v ORDER BY t, event_id) AS close_x100,
        |  count(*) AS n,
        |  CAST(sum(v) AS BIGINT) // count(*) AS vwap_x100
        |FROM base GROUP BY bar ORDER BY bar""".stripMargin,

    "fifo_unmatched_aging" ->
      """WITH li AS (SELECT l_partkey AS k, l_linestatus,
        |    CAST(date_diff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE)) AS BIGINT)
        |      * 1000000000000 + l_orderkey * 10 + l_linenumber AS ord,
        |    CAST(l_quantity AS BIGINT) AS qty,
        |    substr(CAST(l_shipdate AS VARCHAR), 1, 7) AS m
        |  FROM lineitem),
        |b AS (SELECT k, ord, qty, m,
        |    CAST(sum(qty) OVER w AS BIGINT) AS hi,
        |    CAST(sum(qty) OVER w AS BIGINT) - qty AS lo
        |  FROM li WHERE l_linestatus = 'F'
        |  WINDOW w AS (PARTITION BY k ORDER BY ord
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |s AS (SELECT k, ord, qty,
        |    CAST(sum(qty) OVER w AS BIGINT) AS hi,
        |    CAST(sum(qty) OVER w AS BIGINT) - qty AS lo
        |  FROM li WHERE l_linestatus = 'O'
        |  WINDOW w AS (PARTITION BY k ORDER BY ord
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |mp AS (SELECT b.k, b.ord,
        |    CAST(sum(least(b.hi, s.hi) - greatest(b.lo, s.lo)) AS BIGINT) AS mq
        |  FROM b JOIN s ON b.k = s.k AND b.lo < s.hi AND s.lo < b.hi
        |  GROUP BY 1, 2)
        |SELECT b.m AS buy_month, CAST(sum(b.qty) AS BIGINT) AS bought_qty,
        |  CAST(sum(b.qty - coalesce(mp.mq, 0)) AS BIGINT) AS leftover_qty
        |FROM b LEFT JOIN mp ON b.k = mp.k AND b.ord = mp.ord
        |GROUP BY 1 ORDER BY buy_month""".stripMargin,

    "tpch_q7_nation_flows" ->
      """SELECT s.s_nationkey AS supp_nation, c.c_nationkey AS cust_nation,
        |  CAST(year(CAST(l.l_shipdate AS DATE)) AS BIGINT) AS l_year,
        |  count(*) AS n_lines,
        |  CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
        |    * (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT))) AS BIGINT) AS revenue_x1e4
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |WHERE (s.s_nationkey = 7 AND c.c_nationkey = 8)
        |   OR (s.s_nationkey = 8 AND c.c_nationkey = 7)
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "supplier_lead_time" ->
      """WITH j AS (SELECT l.l_suppkey,
        |    CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
        |      CAST(l.l_shipdate AS DATE)) AS BIGINT) AS lag_days
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE l.l_suppkey < 30)
        |SELECT l_suppkey, count(*) AS n_lines,
        |  min(lag_days) AS min_days, max(lag_days) AS max_days,
        |  (CAST(sum(lag_days) AS BIGINT) * 100) // count(*) AS avg_days_x100
        |FROM j GROUP BY 1 ORDER BY l_suppkey""".stripMargin,
  )
}
