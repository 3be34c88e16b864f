package graft.packs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryPack
import graft.core.Tables
import graft.ops.{Resample, Stats}

/** Time-series regularization + distribution scoring over the events /
  * lineitem feeds: fixed-step LOCF resampling, trailing range-frame
  * rolling aggregates, and group-wise z-score outlier flags.
  *
  * The resample/rolling fixtures restrict to `user_id < 40` — the
  * sf1 generator shifts user ids per copy, so the filtered slice (and
  * with it the oracle compare) stays the SAME bounded size at every
  * scale factor while the operators underneath still scan the full
  * feed the filter is pushed into.
  */
object TimeSeriesPack extends QueryPack {

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events").filter(col("user_id") < 40)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Hourly LOCF resample per user: grid from per-key min/max bucket,
    // latest-in-bucket value, gaps filled carried-forward.
    "events_resample_locf" -> ((s, dir) =>
      Resample.resampleLocf(events(s, dir), "user_id", "ts", "value",
          "event_id", stepSec = 3600L)
        .orderBy("user_id", "bucket")),
    // Linear-interpolation resample on the same hourly grid: gap
    // buckets take the fixed-point weighted mean of the nearest
    // observed neighbors (integer div — values are non-negative, so
    // truncation ≡ floor in both engines); edges back-/forward-fill.
    "events_resample_lerp" -> ((s, dir) =>
      Resample.resampleLerp(events(s, dir), "user_id", "ts", "value",
          "event_id", stepSec = 3600L)
        .orderBy("user_id", "bucket")),
    // Trailing 1-hour rolling count + exact fixed-point sum per user,
    // RANGE frame over integer epoch seconds (same-second peers
    // aggregate symmetrically in both engines).
    "window_rolling_range" -> ((s, dir) =>
      Resample.rollingRange(events(s, dir), "user_id", "ts", "value",
          "event_id", windowSec = 3600L)
        .orderBy("user_id", "sec", "event_id")),
    // Group-wise z-score outliers over the FULL lineitem table
    // (decimal-exact moments, fixed IEEE tree), emitted for a bounded
    // key slice so the compare stays small at any sf.
    "stats_outliers" -> ((s, dir) =>
      Stats.outlierScores(Tables.load(s, dir, "lineitem"),
          "l_returnflag", "l_extendedprice", thresholdX1e4 = 15000L)
        .filter(col("l_orderkey") < 400)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("z_x1e4"), col("is_outlier"))
        .orderBy("l_orderkey", "l_linenumber")),
    // Group-wise Pearson correlation from decimal-exact moments (the
    // float built-in is shuffle-order dependent; this is reproducible).
    "agg_corr" -> ((s, dir) =>
      Stats.corrGroups(Tables.load(s, dir, "lineitem"),
          "l_returnflag", "l_quantity", "l_extendedprice")
        .orderBy("l_returnflag")),
    // Retention cohorts: users grouped by first-seen day, counted on
    // each later active day offset — the engagement matrix every
    // product-analytics stack computes. Pure integer counts; output
    // bounded by span² regardless of sf.
    "events_retention_cohort" -> ((s, dir) => {
      val days = Tables.load(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      val cohorts = days.groupBy("user_id").agg(min(col("d")).as("cohort_day"))
      days.join(cohorts, Seq("user_id"))
        .groupBy(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
          datediff(col("d"), col("cohort_day")).as("offset_days"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy("cohort_day", "offset_days")
    }),
    // Conversion funnel: of all users, how many ever viewed, and how
    // many purchased within 1 h of their FIRST view — the sequenced
    // two-stage funnel (ordering matters: a purchase before the first
    // view does not convert).
    "events_funnel" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val total = ev.agg(countDistinct(col("user_id")).as("users_total"))
      val firstView = ev.filter(col("event_type") === "view")
        .groupBy("user_id")
        .agg(min(graft.ops.Resample.epochSec(col("ts"))).as("vsec"))
      val viewed = firstView.agg(count(lit(1)).as("users_viewed"))
      val converted = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), graft.ops.Resample.epochSec(col("ts")).as("psec"))
        .join(firstView, Seq("user_id"))
        .filter(col("psec") >= col("vsec") && col("psec") <= col("vsec") + 3600L)
        .agg(countDistinct(col("user_id")).as("users_converted"))
      total.join(viewed).join(converted)
    }),
    // MATCH_RECOGNIZE-lite sequence pattern per occurrence: for EVERY
    // `view`, does a `purchase` follow within 10 minutes with NO
    // `error` strictly between the view and that FIRST purchase?
    // (Greedy-first semantics: an error before the first subsequent
    // purchase kills the match even if a later purchase exists.)
    // One per-user window pass — ORDER BY t DESC with a RANGE frame
    // ending at 1 PRECEDING gives each event the min purchase/error
    // instant among STRICTLY-LATER events (integer µs, so range -1 ≡
    // strict), no per-pattern self-join, no explode; the only shuffle
    // is the per-user partition the sessionize family already uses.
    "events_pattern_match" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("t").desc)
        .rangeBetween(Window.unboundedPreceding, -1)
      val e = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts").cast("timestamp")).as("t"))
      val nexts = e
        .withColumn("next_p",
          min(when(col("event_type") === "purchase", col("t"))).over(w))
        .withColumn("next_e",
          min(when(col("event_type") === "error", col("t"))).over(w))
      val matched = col("event_type") === "view" &&
        col("next_p").isNotNull &&
        col("next_p") - col("t") <= 600L * 1000000L &&
        (col("next_e").isNull || col("next_e") >= col("next_p"))
      nexts.select(col("user_id"),
          when(col("event_type") === "view", 1L).otherwise(0L).as("is_v"),
          when(matched, 1L).otherwise(0L).as("is_m"),
          when(matched, col("next_p") - col("t")).as("lat"))
        .groupBy("user_id")
        .agg(sum(col("is_v")).as("n_views"),
          sum(col("is_m")).as("n_conv"),
          coalesce(min(col("lat")), lit(-1L)).as("min_lat_us"))
        .orderBy("user_id")
    }),
    // Week-over-week movers: per-type weekly counts, lag window, delta
    // + integer fixed-point percent change ((cur−prev)·1e4 div prev).
    "events_top_movers" -> ((s, dir) => {
      val weekly = Tables.load(s, dir, "events")
        .groupBy(col("event_type"),
          weekofyear(col("ts")).cast("int").as("wk"))
        .agg(count(lit(1)).as("n"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("wk")
      weekly.select(col("event_type"), col("wk"), col("n"),
          lag(col("n"), 1).over(w).as("prev_n"))
        .withColumn("delta", col("n") - col("prev_n"))
        .withColumn("pct_x1e4",
          expr("CASE WHEN prev_n IS NULL OR prev_n = 0 THEN NULL " +
            "ELSE ((n - prev_n) * 10000L) div prev_n END"))
        .orderBy("event_type", "wk")
    }),
    // Share of total: per-flag revenue share as integer fixed point of
    // exact decimal sums — the percent-of-total every report needs,
    // computed with one aggregate + a 1-row broadcast (never a
    // partitionless window over the fact table).
    "agg_share_of_total" -> ((s, dir) => {
      val per = Tables.load(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg((sum(col("l_extendedprice").cast("decimal(18,2)")) * 100)
          .cast("long").as("rev_c"))   // exact integer cents
      val tot = per.agg(sum(col("rev_c")).as("tot_c"))
      per.join(broadcast(tot))
        .select(col("l_returnflag"),
          expr("(rev_c * 10000L) div tot_c").as("share_x1e4"))
        .orderBy("l_returnflag")
    }),
    // Conversion-time distribution: seconds from each user's first
    // view to their first purchase AT-OR-AFTER it; p50/p90 cross as
    // scale4 (the agg_percentiles interpolation contract).
    "events_conversion_time" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val fv = ev.filter(col("event_type") === "view").groupBy("user_id")
        .agg(min(Resample.epochSec(col("ts"))).as("vsec"))
      val fp = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), Resample.epochSec(col("ts")).as("psec"))
        .join(fv, Seq("user_id"))
        .filter(col("psec") >= col("vsec"))
        .groupBy("user_id").agg(min(col("psec") - col("vsec")).as("lag_sec"))
      fp.agg(count(lit(1)).as("n_converted"),
        graft.functions.F.scale4(expr("percentile(lag_sec, 0.5D)")).as("p50_x1e4"),
        graft.functions.F.scale4(expr("percentile(lag_sec, 0.9D)")).as("p90_x1e4"))
    }),
    // Keyword-in-context: ±24-char windows around a term, extracted
    // with a Java∩RE2-shared pattern so the oracle runs it verbatim;
    // narrow projection + posexplode, no shuffle.
    "text_kwic" -> ((s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(regexp_extract_all(col("text"),
            lit(".{0,24}\\bspark\\b.{0,24}"), lit(0))).as(Seq("hit_no", "ctx")))
        .filter(col("doc_id") < 100)
        .orderBy("doc_id", "hit_no")),
    // Chi-square independence of event_type × user cohort (user_id%3):
    // per-cell fixed-point terms from exact-count doubles, integer-
    // summed — float sum order never touches the result.
    "stats_chi2" -> ((s, dir) =>
      Stats.chi2Independence(
        Tables.load(s, dir, "events")
          .select(col("event_type"), (col("user_id") % 3).as("cohort")),
        "event_type", "cohort")),
    // Deterministic fixed-N per-group sample: row_number over the
    // keyed-hash order — stable under retries, exactly n per group
    // (fewer iff the group is smaller).
    "sample_fixed_n" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("c_mktsegment")
        .orderBy(graft.functions.F.hash32(col("c_custkey"), "s7", "fixn"),
          col("c_custkey"))
      Tables.load(s, dir, "customer")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("c_mktsegment"), col("rn"), col("c_custkey"))
        .orderBy("c_mktsegment", "rn")
    }),
    // Deterministic string aggregation: sorted-distinct list as one
    // string — collect_set is unordered by contract, so the sort is
    // what makes the result reproducible (and oracle-matchable).
    "agg_stringagg" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders").select("o_orderstatus", "o_custkey")
      val c = Tables.load(s, dir, "customer").select("c_custkey", "c_mktsegment")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy("o_orderstatus")
        .agg(array_join(array_sort(collect_set(col("c_mktsegment"))), ",")
          .as("segments"))
        .orderBy("o_orderstatus")
    }),
    // Interval-union coverage (dwell time): each event opens a 5-min
    // presence window; overlapping/touching windows merge into
    // islands (classic gaps-and-islands: new island iff start >
    // running max end over PRECEDING rows), total covered seconds per
    // user. Pure integer epoch algebra, two keyed windows + two
    // aggregates — one shuffle on the key.
    "events_coverage_seconds" -> ((s, dir) => {
      val horizon = 300L
      val base = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          Resample.epochSec(col("ts")).as("sec"))
        .withColumn("end", col("sec") + horizon)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("sec"), col("event_id"))
      val prevMax = max(col("end")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1))
      val flagged = base.withColumn("new_island",
        when(prevMax.isNull || col("sec") > prevMax, 1L).otherwise(0L))
      flagged.withColumn("island", sum(col("new_island")).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        .groupBy("user_id", "island")
        .agg(min(col("sec")).as("lo"), max(col("end")).as("hi"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_islands"),
          sum(col("hi") - col("lo")).as("covered_sec"))
        .orderBy("user_id")
    }),
    // Hot-key histogram (Skew.keyHistogram): the pre-mitigation skew
    // diagnostic — top-10 hottest keys with integer-fixed-point share
    // of total.
    "skew_key_histogram" -> ((s, dir) => {
      val total = Tables.load(s, dir, "events").count()
      graft.ops.Skew.keyHistogram(Tables.load(s, dir, "events"), "user_id", 10)
        .select(col("user_id"), col("n"),
          expr(s"(n * 10000L) div ${total}L").as("share_x1e4"))
    }),
    // Integer-exact trailing-window anomaly flags: the cleared-form
    // z² > k² test over ×100 fixed-point rolling moments — never a
    // float, so the flags are bit-stable under any shuffle order.
    "events_rolling_anomaly" -> ((s, dir) =>
      Resample.rollingAnomaly(events(s, dir), "user_id", "ts", "value",
          "event_id", windowSec = 7200L, k = 2L, minN = 3L)
        .orderBy("user_id", "sec", "event_id")),
    // Activity heatmap: ISO weekday × hour counts — Spark weekday()
    // (0=Mon) + 1 aligns with DuckDB isodow (1=Mon); never the
    // 1=Sunday dayofweek() trap.
    "events_heatmap_dow_hour" -> ((s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy((expr("weekday(ts)") + 1).cast("int").as("iso_dow"),
          hour(col("ts")).cast("int").as("hod"))
        .agg(count(lit(1)).as("n"))
        .orderBy("iso_dow", "hod")),
    // Exact weighted average (price weighted by quantity) — decimal
    // sums, double once, scale4 across the boundary.
    "agg_weighted_avg" -> ((s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            col("l_quantity").cast("decimal(18,2)")).as("swx"),
          sum(col("l_quantity").cast("decimal(18,2)")).as("sw"))
        .select(col("l_returnflag"),
          graft.functions.F.scale4(
            col("swx").cast("double") / col("sw").cast("double")).as("wavg_x1e4"))
        .orderBy("l_returnflag")),
    // Deterministic argmax: the event carrying each type's maximum
    // value — max over (value, event_id) STRUCTS, so ties resolve by
    // the id instead of nondeterministically (the max_by trap).
    "agg_argmax" -> ((s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy("event_type")
        .agg(max(struct(col("value"), col("event_id"))).as("m"))
        .select(col("event_type"), col("m.event_id").as("event_id"),
          col("m.value").as("value"))
        .orderBy("event_type")),
    // Sequence-gap detection (islands & gaps), scale-safe form: an id
    // starts a gap iff id−1 exists and id doesn't — ONE equi-anti-join
    // on id+1, never a partitionless window over the whole sequence.
    // The fixture deliberately removes every 97th id, so the expected
    // gaps are known at every sf.
    "events_id_gaps" -> ((s, dir) => {
      val present = Tables.load(s, dir, "events")
        .select(col("event_id")).filter(col("event_id") % 97 =!= 0)
      val maxId = present.agg(max(col("event_id")).as("mx"))
      val gapStarts = present
        .select((col("event_id") + 1L).as("gap_start"))
        .join(present.withColumnRenamed("event_id", "gap_start"),
          Seq("gap_start"), "left_anti")
      gapStarts.join(broadcast(maxId))
        .filter(col("gap_start") <= col("mx"))
        .select("gap_start")
        .orderBy("gap_start")
    }),
    // Daily acquisition curve: new users per first-seen day + running
    // cumulative total. The running sum is a partitionless window — on
    // the ALREADY-AGGREGATED day table (≤ span rows at any sf), where
    // it is the correct tool, not a scale hazard.
    "events_cumulative_users" -> ((s, dir) => {
      val firstDay = Tables.load(s, dir, "events")
        .groupBy("user_id")
        .agg(min(to_date(col("ts"))).as("d"))
      val daily = firstDay.groupBy("d")
        .agg(count(lit(1)).as("n_new"))
      val w = org.apache.spark.sql.expressions.Window.orderBy("d")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      daily.select(date_format(col("d"), "yyyy-MM-dd").as("day"),
          col("n_new"), sum(col("n_new")).over(w).as("n_cumulative"))
        .orderBy("day")
    }),
    // Robust spread: median absolute deviation per return flag — the
    // two-pass percentile recipe with the intermediate median
    // fixed-pointed so both engines derive deviations from the same
    // double.
    "stats_mad" -> ((s, dir) =>
      Stats.madGroups(Tables.load(s, dir, "lineitem"),
          "l_returnflag", "l_extendedprice")
        .orderBy("l_returnflag")),
    // Top-k per group: row_number window + rank filter — the grouped
    // twin of topk_orders (which is global TakeOrderedAndProject).
    "topk_per_group" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_orderstatus")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      Tables.load(s, dir, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 5)
        .select(col("o_orderstatus"), col("rn"), col("o_orderkey"), col("o_totalprice"))
        .orderBy("o_orderstatus", "rn")
    }),
    // Null-safe join (<=>): per-k counts of two event types FULL-joined
    // with null-safe key equality, so the null-key groups pair up
    // instead of disappearing — the semantics a plain equi-join
    // silently drops.
    "join_null_safe" -> ((s, dir) => {
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.IntegerType)))
      val ev = Tables.load(s, dir, "events")
        .select(col("event_type"), from_json(col("props"), schema).getField("k").as("k"))
      val a = ev.filter(col("event_type") === "click")
        .groupBy("k").agg(count(lit(1)).as("n_click"))
      val b = ev.filter(col("event_type") === "view")
        .groupBy("k").agg(count(lit(1)).as("n_view"))
        .withColumnRenamed("k", "kb")
      a.join(b, col("k") <=> col("kb"), "full_outer")
        .select(coalesce(col("k"), col("kb")).as("k"),
          coalesce(col("n_click"), lit(0L)).as("n_click"),
          coalesce(col("n_view"), lit(0L)).as("n_view"))
        .orderBy(asc_nulls_first("k"))
    }),
    // Rank-position windows: percent_rank / cume_dist per order status
    // (ties share ranks in both engines; values are tie-order
    // independent, crossed as scale4 fixed point).
    "window_percent_rank" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_orderstatus").orderBy(col("o_totalprice"))
      Tables.load(s, dir, "orders")
        .filter(col("o_custkey") < 100)
        .select(col("o_orderkey"), col("o_orderstatus"),
          graft.functions.F.scale4(percent_rank().over(w)).as("pr_x1e4"),
          graft.functions.F.scale4(cume_dist().over(w)).as("cd_x1e4"))
        .orderBy("o_orderkey")
    }),
    // Longest consecutive-day activity streak per user — gaps-and-
    // islands over the collapsed (user, day) set; dates cross the
    // oracle boundary as formatted strings.
    "events_streaks" -> ((s, dir) =>
      graft.ops.Streaks.longestDailyStreak(
          Tables.load(s, dir, "events"), "user_id", "ts")
        .select(col("user_id"), col("n_active_days"), col("best_streak"),
          date_format(col("streak_start"), "yyyy-MM-dd").as("streak_start"),
          date_format(col("streak_end"), "yyyy-MM-dd").as("streak_end"))
        .orderBy("user_id")),
    // First-order Markov transition matrix of event types per user
    // timeline: counts + integer fixed-point transition probability.
    "events_markov" -> ((s, dir) =>
      graft.ops.Transitions.transitionCounts(
          Tables.load(s, dir, "events"), "user_id", "ts", "event_type",
          "event_id")
        .orderBy("prev_state", "next_state")),
    // Equi-count quartile profile of account balances — SQL ntile(4)
    // semantics without the single-task global window (range-
    // partitioned rank + closed-form bucket id). Exact decimal
    // endpoints/sums crossed as integer cents.
    "agg_quartiles" -> ((s, dir) =>
      Stats.ntileProfile(Tables.load(s, dir, "customer"),
          "c_acctbal", Seq("c_custkey"), k = 4)
        .select(col("bucket"),
          col("n_rows"),
          (col("x_min") * 100).cast("long").as("min_c"),
          (col("x_max") * 100).cast("long").as("max_c"),
          (col("x_sum") * 100).cast("long").as("sum_c"))
        .orderBy("bucket")),
    // Order→ship handoff in BUSINESS days — closed-form weekday
    // arithmetic on epoch days (no calendar table, no UDF, stays in
    // codegen), histogrammed over the full join.
    "lineitem_business_days" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), to_date(col("o_orderdate")).as("od"))
      val l = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), to_date(col("l_shipdate")).as("sd"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy(graft.ops.Dates.businessDaysBetween(col("od"), col("sd"))
          .as("bdays"))
        .agg(count(lit(1)).as("n_items"))
        .orderBy("bdays")
    }),
    // Incremental materialized view: per (type, hour) moments built
    // from two DISJOINT batches and merged state-to-state — the
    // refresh path that never rescans history. The oracle is the full
    // recompute the merge must equal.
    // JOIN-view delta maintenance (the join complement of the
    // aggregate matview): V = orders ⋈ customer refreshed after both
    // sides receive arrivals. delta = dO⋈C_old ∪ O_old⋈dC ∪ dO⋈dC —
    // history only ever joins a delta. initial-view ∪ delta must
    // equal the full recompute (the oracle), penny-exact.
    "matview_join_delta" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("price_c"))
      val c = Tables.load(s, dir, "customer")
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
      val (oOld, dO) = (o.filter(col("o_orderkey") % 5 =!= 0),
        o.filter(col("o_orderkey") % 5 === 0))
      val (cOld, dC) = (c.filter(col("o_custkey") % 7 =!= 0),
        c.filter(col("o_custkey") % 7 === 0))
      val initial = oOld.join(cOld, Seq("o_custkey"))
      graft.ops.IncrementalJoin
        .refresh(initial, oOld, dO, cOld, dC, Seq("o_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), sum(col("price_c")).as("sum_c"))
        .orderBy("c_mktsegment")
    }),
    "matview_incremental" -> ((s, dir) => {
      val base = Tables.load(s, dir, "events")
        .select(col("event_id"), col("event_type"),
          Resample.epochSec(col("ts")).as("sec"),
          floor(col("value") * 100 + lit(0.5)).cast("long").as("v_x100"))
        .withColumn("hr", expr("sec div 3600")).drop("sec")
      val keys = Seq("event_type", "hr")
      val s1 = graft.ops.IncrementalAgg.state(
        base.filter(col("event_id") % 2 === 0), keys, "v_x100")
      val s2 = graft.ops.IncrementalAgg.state(
        base.filter(col("event_id") % 2 =!= 0), keys, "v_x100")
      graft.ops.IncrementalAgg.finalizeView(
          graft.ops.IncrementalAgg.merge(Seq(s1, s2), keys), avgScale = 100L)
        .select(col("event_type"), col("hr"), col("n"),
          col("s").as("sum_x100"), col("mn").as("min_x100"),
          col("mx").as("max_x100"), col("avg_scaled").as("avg_x1e4"))
        .orderBy("event_type", "hr")
    }),
    // Exact COUNT(DISTINCT) maintenance WITH RETRACTIONS — the
    // counting-IVM auxiliary state (ops/IncrementalAgg
    // distinctState/mergeDistinct/finalizeDistinct): two insert
    // batches fold value-wise multiplicities, a retraction batch
    // (every 10th event) folds NEGATIVE ones, and a user stays in a
    // cell's distinct set only while some non-retracted event keeps
    // their multiplicity positive. Refresh shuffles O(state) =
    // distinct (key, value) pairs, never history; `hll_distinct_parts`
    // is the approximate no-retraction twin of this exact path.
    "matview_distinct_delta" -> ((s, dir) => {
      import graft.ops.IncrementalAgg
      val ev = Tables.load(s, dir, "events")
        .select(col("event_id"), col("event_type"), col("user_id"),
          Resample.epochSec(col("ts")).as("sec"))
        .withColumn("hr", expr("sec div 3600")).drop("sec")
      val keys = Seq("event_type", "hr")
      val ins1 = IncrementalAgg.distinctState(
        ev.filter(col("event_id") % 2 === 0), keys, "user_id")
      val ins2 = IncrementalAgg.distinctState(
        ev.filter(col("event_id") % 2 =!= 0), keys, "user_id")
      val retr = IncrementalAgg.distinctState(
        ev.filter(col("event_id") % 10 === 0), keys, "user_id", sign = -1)
      IncrementalAgg.finalizeDistinct(
          IncrementalAgg.mergeDistinct(Seq(ins1, ins2, retr), keys, "user_id"),
          keys)
        .orderBy("event_type", "hr")
    }),
    // POISSON BOOTSTRAP of the mean (Chamandy et al. 2012 — the
    // distributed bootstrap): resample b draws each row with
    // multiplicity ~ Poisson(1) via a keyed-hash uniform against the
    // integer CDF — deterministic, seedless, and needing NO global
    // row index (n-of-n with-replacement sampling wants a random
    // lookup per draw; Poissonization factorizes per row, so the
    // whole B-resample ensemble is one explode + one map-side-combined
    // aggregate). Per-resample effective n and integer-cents mean;
    // the spread across the 32 rows IS the sampling distribution.
    "stats_poisson_bootstrap" -> ((s, dir) => {
      val thresholds = Seq(1580030168L, 3160060337L, 3950075421L, 4213413783L)
      val rows = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"),
          floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("cents"))
        .withColumn("b", explode(expr("sequence(0L, 31L)")))
      val u = graft.llm.Dedup.hash32(
        concat(col("o_orderkey").cast("string"), lit("_"),
          col("b").cast("string")), "boot")
      val mult = when(u < thresholds(0), 0L).when(u < thresholds(1), 1L)
        .when(u < thresholds(2), 2L).when(u < thresholds(3), 3L).otherwise(4L)
      rows.withColumn("mult", mult)
        .groupBy("b")
        .agg(sum(col("mult")).as("n_eff"),
          sum(col("mult") * col("cents")).as("sum_c"))
        .withColumn("mean_c", expr("sum_c div n_eff"))
        .orderBy("b")
    }),
    // Holt linear-trend forecast (Forecast.holtLinear) over the dense
    // hourly count series per event type — STL's forward-looking
    // sibling: level + trend folded per series with ×1e4 integer
    // state, 3-hour forecast horizon. Series length is bounded by the
    // observation window (hours), not the row count; the per-hour
    // aggregate collapses the feed before anything is collected.
    "events_holt_forecast" -> ((s, dir) => {
      val hourly = Tables.load(s, dir, "events")
        .groupBy(col("event_type"),
          (graft.ops.Resample.epochSec(col("ts")) / 3600L).cast("long").as("hr"))
        .agg(count(lit(1)).as("n"))
      val dense = hourly.groupBy("event_type")
        .agg(min(col("hr")).as("h0"), max(col("hr")).as("h1"))
        .select(col("event_type"), explode(expr("sequence(h0, h1)")).as("hr"))
        .join(hourly, Seq("event_type", "hr"), "left")
        .na.fill(0L, Seq("n"))
      graft.ops.Forecast.holtLinear(dense, "event_type", "hr", "n")
        .orderBy("event_type")
    }),
    // Holt forecast WITH the empirical P90 one-step-error band
    // (Forecast.holtLinearWithBand): point forecasts invite
    // over-reaction; the band is the exact rank-ceil(0.9n) in-sample
    // error — no distributional assumption, no IEEE quantile.
    "events_holt_interval" -> ((s, dir) => {
      val hourly = Tables.load(s, dir, "events")
        .groupBy(col("event_type"),
          (graft.ops.Resample.epochSec(col("ts")) / 3600L).cast("long").as("hr"))
        .agg(count(lit(1)).as("n"))
      val dense = hourly.groupBy("event_type")
        .agg(min(col("hr")).as("h0"), max(col("hr")).as("h1"))
        .select(col("event_type"), explode(expr("sequence(h0, h1)")).as("hr"))
        .join(hourly, Seq("event_type", "hr"), "left")
        .na.fill(0L, Seq("n"))
      graft.ops.Forecast.holtLinearWithBand(dense, "event_type", "hr", "n")
        .orderBy("event_type")
    }),
    // CUSUM drift monitor (Forecast.cusum) over the same dense hourly
    // series: sustained excess over the per-series mean accumulates
    // toward the 4mu alarm line with mu/8 slack — the sequential
    // changepoint detector a per-point z-score can't replicate.
    "events_cusum_alarm" -> ((s, dir) => {
      val hourly = Tables.load(s, dir, "events")
        .groupBy(col("event_type"),
          (graft.ops.Resample.epochSec(col("ts")) / 3600L).cast("long").as("hr"))
        .agg(count(lit(1)).as("n"))
      val dense = hourly.groupBy("event_type")
        .agg(min(col("hr")).as("h0"), max(col("hr")).as("h1"))
        .select(col("event_type"), explode(expr("sequence(h0, h1)")).as("hr"))
        .join(hourly, Seq("event_type", "hr"), "left")
        .na.fill(0L, Seq("n"))
      graft.ops.Forecast.cusum(dense, "event_type", "hr", "n",
          slackDiv = 8, hMult = 4)
        .orderBy("event_type")
    }),
    // Theil–Sen robust trend (Forecast.theilSen) over the same dense
    // hourly grid: median of all pairwise slopes — the outlier-proof
    // sibling of agg_linreg's OLS and holtLinear's smoothed trend.
    // Pairs are grid² per type and the grid is TIME-bounded.
    "events_theil_sen" -> ((s, dir) => {
      val hourly = Tables.load(s, dir, "events")
        .groupBy(col("event_type"),
          (graft.ops.Resample.epochSec(col("ts")) / 3600L).cast("long").as("hr"))
        .agg(count(lit(1)).as("n"))
      val dense = hourly.groupBy("event_type")
        .agg(min(col("hr")).as("h0"), max(col("hr")).as("h1"))
        .select(col("event_type"), explode(expr("sequence(h0, h1)")).as("hr"))
        .join(hourly, Seq("event_type", "hr"), "left")
        .na.fill(0L, Seq("n"))
      graft.ops.Forecast.theilSen(dense, "event_type", "hr", "n")
        .withColumnRenamed("k", "event_type")
        .orderBy("event_type")
    }),
    // STREAMING CUSUM (EventsStream.mergeCusumIntoState) — the first
    // order-dependent streaming state: batch 1 (feed below the median
    // hour) calibrates mu/slack/h, batch 2 folds the monitored tail
    // carrying (s, n_alarms, max_s) through the versioned store. The
    // oracle recomputes the same calibrate-then-monitor contract in
    // one pass.
    "events_cusum_stream" -> ((s, dir) =>
      graft.streaming.EventsStream.cusumViaFileSink(s, dir)),
    // STREAMING Holt (EventsStream.mergeHoltIntoState): the forecaster
    // twin of the streaming CUSUM — (level, trend) folds across
    // micro-batches; FOLD CONTINUITY means the final state equals the
    // single-shot Holt over each type's dense series extended to the
    // global last hour, which is what the oracle recomputes.
    "events_holt_stream" -> ((s, dir) =>
      graft.streaming.EventsStream.holtViaFileSink(s, dir)),
    // Kaplan-Meier time-to-conversion (Survival.kaplanMeier): days
    // from a user's first event to their first purchase, RIGHT-
    // CENSORED at the feed's end for users who never converted —
    // never dropped (biases survival down), never counted as
    // converted (biases it up). One curve per first-day-of-week
    // cohort; the day-of-week is integer epoch arithmetic so both
    // engines bucket identically.
    "events_kaplan_meier" -> ((s, dir) => {
      val secs = graft.ops.Resample.epochSec(col("ts"))
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type"), secs.as("sec"))
      val perUser = ev.groupBy("user_id").agg(
        min(col("sec")).as("t0"),
        min(when(col("event_type") === "purchase", col("sec"))).as("tc"))
      val gmax = ev.agg(max(col("sec")).as("gm"))
      val obs = perUser.crossJoin(broadcast(gmax))
        .select(expr("(t0 div 86400) % 7").as("dow"),
          when(col("tc").isNotNull, expr("(tc - t0) div 86400"))
            .otherwise(expr("(gm - t0) div 86400")).as("obs_t"),
          when(col("tc").isNotNull, 1L).otherwise(0L).as("ev"))
      graft.ops.Survival.kaplanMeier(obs, "dow", "obs_t", "ev")
        .withColumnRenamed("t", "t_days")
        .orderBy("dow", "t_days")
    }),
    // Nelson-Aalen cumulative hazard over the SAME observations — the
    // additive sibling: per-time d/n terms truncate to x1e6 integers
    // then cumulative-sum through one window, no fold at all.
    "events_nelson_aalen" -> ((s, dir) => {
      val secs = graft.ops.Resample.epochSec(col("ts"))
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type"), secs.as("sec"))
      val perUser = ev.groupBy("user_id").agg(
        min(col("sec")).as("t0"),
        min(when(col("event_type") === "purchase", col("sec"))).as("tc"))
      val gmax = ev.agg(max(col("sec")).as("gm"))
      val obs = perUser.crossJoin(broadcast(gmax))
        .select(expr("(t0 div 86400) % 7").as("dow"),
          when(col("tc").isNotNull, expr("(tc - t0) div 86400"))
            .otherwise(expr("(gm - t0) div 86400")).as("obs_t"),
          when(col("tc").isNotNull, 1L).otherwise(0L).as("ev"))
      graft.ops.Survival.nelsonAalen(obs, "dow", "obs_t", "ev")
        .withColumnRenamed("t", "t_days")
        .orderBy("dow", "t_days")
    }),
    // Restricted mean survival time to 14 days — the area under the
    // KM step function: the one-number "average days un-converted in
    // the first two weeks" summary, exact time-x1e6 integer area.
    "events_rmst" -> ((s, dir) => {
      val secs = graft.ops.Resample.epochSec(col("ts"))
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type"), secs.as("sec"))
      val perUser = ev.groupBy("user_id").agg(
        min(col("sec")).as("t0"),
        min(when(col("event_type") === "purchase", col("sec"))).as("tc"))
      val gmax = ev.agg(max(col("sec")).as("gm"))
      val obs = perUser.crossJoin(broadcast(gmax))
        .select(expr("(t0 div 86400) % 7").as("dow"),
          when(col("tc").isNotNull, expr("(tc - t0) div 86400"))
            .otherwise(expr("(gm - t0) div 86400")).as("obs_t"),
          when(col("tc").isNotNull, 1L).otherwise(0L).as("ev"))
      graft.ops.Survival.rmst(obs, "dow", "obs_t", "ev", tau = 14L)
        .orderBy("dow")
    }),
  )

  /** Shared event-slice CTE: integer epoch seconds + scale4 value. */
  private val evBase =
    """SELECT event_id, user_id,
      |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS sec,
      |    CAST(floor(value * 1e4 + 0.5) AS BIGINT) AS v_x1e4
      |  FROM events WHERE user_id < 40""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // The Holt fold as a recursive CTE: identical dense grid, identical
    // (y0, y1-y0) seed, identical ×1e4 integer recurrence — `//` and
    // Spark's `div` both truncate toward zero, negatives included.
    "events_holt_forecast" ->
      """WITH RECURSIVE hourly AS (SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 // 3600 AS hr,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |bounds AS (SELECT event_type, min(hr) AS h0, max(hr) AS h1
        |  FROM hourly GROUP BY 1),
        |grid AS (SELECT event_type, unnest(generate_series(h0, h1)) AS hr FROM bounds),
        |dense AS (SELECT g.event_type, g.hr, COALESCE(h.n, 0) AS n
        |  FROM grid g LEFT JOIN hourly h
        |    ON h.event_type = g.event_type AND h.hr = g.hr),
        |ord AS (SELECT event_type, n,
        |    row_number() OVER (PARTITION BY event_type ORDER BY hr) AS t,
        |    count(*) OVER (PARTITION BY event_type) AS nh
        |  FROM dense),
        |s(event_type, nh, t, l, b) AS (
        |  SELECT o0.event_type, o0.nh, CAST(1 AS BIGINT),
        |    o0.n * 10000, COALESCE(o1.n - o0.n, 0) * 10000
        |  FROM ord o0 LEFT JOIN ord o1
        |    ON o1.event_type = o0.event_type AND o1.t = 2
        |  WHERE o0.t = 1
        |  UNION ALL
        |  SELECT s.event_type, s.nh, s.t + 1,
        |    (8 * o.n * 10000 + 2 * (s.l + s.b)) // 10,
        |    (3 * ((8 * o.n * 10000 + 2 * (s.l + s.b)) // 10 - s.l)
        |      + 7 * s.b) // 10
        |  FROM s JOIN ord o ON o.event_type = s.event_type AND o.t = s.t + 1
        |  WHERE s.t < s.nh)
        |SELECT event_type, nh AS n_obs, l AS level_x1e4, b AS trend_x1e4,
        |  l + b AS fc1_x1e4, l + 2 * b AS fc2_x1e4, l + 3 * b AS fc3_x1e4
        |FROM s WHERE t = nh ORDER BY event_type""".stripMargin,
    // the KM recursion restricted to t <= 14, then the step-function
    // area via lag + one aggregate, flat tail to the horizon
    "events_rmst" ->
      """WITH RECURSIVE secs AS (SELECT user_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS sec FROM events),
        |pu AS (SELECT user_id, min(sec) AS t0,
        |    min(CASE WHEN event_type = 'purchase' THEN sec END) AS tc
        |  FROM secs GROUP BY 1),
        |gm AS (SELECT max(sec) AS gm FROM secs),
        |obs AS (SELECT (t0 // 86400) % 7 AS dow,
        |    CASE WHEN tc IS NOT NULL THEN (tc - t0) // 86400
        |         ELSE (gm.gm - t0) // 86400 END AS obs_t,
        |    CASE WHEN tc IS NOT NULL THEN 1 ELSE 0 END AS ev
        |  FROM pu, gm),
        |byt AS (SELECT dow, obs_t, count(*) AS leave,
        |    CAST(sum(ev) AS BIGINT) AS d
        |  FROM obs GROUP BY 1, 2),
        |risk AS (SELECT dow, obs_t, d,
        |    CAST(sum(leave) OVER (PARTITION BY dow) AS BIGINT)
        |      - CAST(COALESCE(sum(leave) OVER (PARTITION BY dow ORDER BY obs_t
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS n_risk
        |  FROM byt),
        |evt AS (SELECT dow, obs_t, d, n_risk,
        |    row_number() OVER (PARTITION BY dow ORDER BY obs_t) AS i,
        |    count(*) OVER (PARTITION BY dow) AS ni
        |  FROM risk WHERE d > 0),
        |km(dow, i, ni, t, n, d, sv) AS (
        |  SELECT dow, i, ni, obs_t, n_risk, d,
        |    CAST(1000000 AS BIGINT) * (n_risk - d) // n_risk
        |  FROM evt WHERE i = 1
        |  UNION ALL
        |  SELECT e.dow, e.i, e.ni, e.obs_t, e.n_risk, e.d,
        |    km.sv * (e.n_risk - e.d) // e.n_risk
        |  FROM km JOIN evt e ON e.dow = km.dow AND e.i = km.i + 1
        |  WHERE km.i < km.ni),
        |kmr AS (SELECT dow, t, sv FROM km WHERE t <= 14),
        |lagd AS (SELECT dow, t, sv,
        |    COALESCE(lag(t) OVER (PARTITION BY dow ORDER BY t), 0) AS prev_t,
        |    COALESCE(lag(sv) OVER (PARTITION BY dow ORDER BY t), 1000000) AS prev_s
        |  FROM kmr),
        |area AS (SELECT dow,
        |    CAST(sum(prev_s * (t - prev_t)) AS BIGINT)
        |      + max_by(sv, t) * (14 - max(t)) AS rmst_in
        |  FROM lagd GROUP BY dow),
        |dows AS (SELECT DISTINCT dow FROM obs)
        |SELECT d.dow,
        |  COALESCE(a.rmst_in, CAST(14 * 1000000 AS BIGINT)) AS rmst_x1e6
        |FROM dows d LEFT JOIN area a ON a.dow = d.dow
        |ORDER BY d.dow""".stripMargin,
    // same observations and risk sets; the hazard is a plain window
    // cumsum of the truncated x1e6 terms — no recursion needed
    "events_nelson_aalen" ->
      """WITH secs AS (SELECT user_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS sec FROM events),
        |pu AS (SELECT user_id, min(sec) AS t0,
        |    min(CASE WHEN event_type = 'purchase' THEN sec END) AS tc
        |  FROM secs GROUP BY 1),
        |gm AS (SELECT max(sec) AS gm FROM secs),
        |obs AS (SELECT (t0 // 86400) % 7 AS dow,
        |    CASE WHEN tc IS NOT NULL THEN (tc - t0) // 86400
        |         ELSE (gm.gm - t0) // 86400 END AS obs_t,
        |    CASE WHEN tc IS NOT NULL THEN 1 ELSE 0 END AS ev
        |  FROM pu, gm),
        |byt AS (SELECT dow, obs_t, count(*) AS leave,
        |    CAST(sum(ev) AS BIGINT) AS d
        |  FROM obs GROUP BY 1, 2),
        |risk AS (SELECT dow, obs_t, d,
        |    CAST(sum(leave) OVER (PARTITION BY dow) AS BIGINT)
        |      - CAST(COALESCE(sum(leave) OVER (PARTITION BY dow ORDER BY obs_t
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS n_risk
        |  FROM byt),
        |terms AS (SELECT dow, obs_t, d, n_risk,
        |    d * 1000000 // n_risk AS term
        |  FROM risk WHERE d > 0)
        |SELECT dow, obs_t AS t_days, n_risk, d AS n_events,
        |  CAST(sum(term) OVER (PARTITION BY dow ORDER BY obs_t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS hazard_x1e6
        |FROM terms ORDER BY dow, t_days""".stripMargin,
    // same per-user first/conversion/censor times, same risk-set
    // window, the survival product as a recursive CTE with one
    // truncating x1e6 division per event time — the engine's fold
    "events_kaplan_meier" ->
      """WITH RECURSIVE secs AS (SELECT user_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS sec FROM events),
        |pu AS (SELECT user_id, min(sec) AS t0,
        |    min(CASE WHEN event_type = 'purchase' THEN sec END) AS tc
        |  FROM secs GROUP BY 1),
        |gm AS (SELECT max(sec) AS gm FROM secs),
        |obs AS (SELECT (t0 // 86400) % 7 AS dow,
        |    CASE WHEN tc IS NOT NULL THEN (tc - t0) // 86400
        |         ELSE (gm.gm - t0) // 86400 END AS obs_t,
        |    CASE WHEN tc IS NOT NULL THEN 1 ELSE 0 END AS ev
        |  FROM pu, gm),
        |byt AS (SELECT dow, obs_t, count(*) AS leave,
        |    CAST(sum(ev) AS BIGINT) AS d
        |  FROM obs GROUP BY 1, 2),
        |risk AS (SELECT dow, obs_t, d,
        |    CAST(sum(leave) OVER (PARTITION BY dow) AS BIGINT)
        |      - CAST(COALESCE(sum(leave) OVER (PARTITION BY dow ORDER BY obs_t
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS n_risk
        |  FROM byt),
        |evt AS (SELECT dow, obs_t, d, n_risk,
        |    row_number() OVER (PARTITION BY dow ORDER BY obs_t) AS i,
        |    count(*) OVER (PARTITION BY dow) AS ni
        |  FROM risk WHERE d > 0),
        |km(dow, i, ni, t, n, d, sv) AS (
        |  SELECT dow, i, ni, obs_t, n_risk, d,
        |    CAST(1000000 AS BIGINT) * (n_risk - d) // n_risk
        |  FROM evt WHERE i = 1
        |  UNION ALL
        |  SELECT e.dow, e.i, e.ni, e.obs_t, e.n_risk, e.d,
        |    km.sv * (e.n_risk - e.d) // e.n_risk
        |  FROM km JOIN evt e ON e.dow = km.dow AND e.i = km.i + 1
        |  WHERE km.i < km.ni)
        |SELECT dow, t AS t_days, n AS n_risk, d AS n_events, sv AS surv_x1e6
        |FROM km ORDER BY dow, t_days""".stripMargin,
    // the single-shot Holt recursion with every type's grid extended
    // to the GLOBAL last hour (what fold continuity across the two
    // micro-batches produces); same seed, same ×1e4 recurrence
    "events_holt_stream" ->
      """WITH RECURSIVE hourly AS (SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 // 3600 AS hr,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |gmax AS (SELECT max(hr) AS h1 FROM hourly),
        |bounds AS (SELECT event_type, min(hr) AS h0 FROM hourly GROUP BY 1),
        |grid AS (SELECT b.event_type, unnest(generate_series(b.h0, g.h1)) AS hr
        |  FROM bounds b, gmax g),
        |dense AS (SELECT g.event_type, g.hr, COALESCE(h.n, 0) AS n
        |  FROM grid g LEFT JOIN hourly h
        |    ON h.event_type = g.event_type AND h.hr = g.hr),
        |ord AS (SELECT event_type, n,
        |    row_number() OVER (PARTITION BY event_type ORDER BY hr) AS t,
        |    count(*) OVER (PARTITION BY event_type) AS nh
        |  FROM dense),
        |s(event_type, nh, t, l, b) AS (
        |  SELECT o0.event_type, o0.nh, CAST(1 AS BIGINT),
        |    o0.n * 10000, COALESCE(o1.n - o0.n, 0) * 10000
        |  FROM ord o0 LEFT JOIN ord o1
        |    ON o1.event_type = o0.event_type AND o1.t = 2
        |  WHERE o0.t = 1
        |  UNION ALL
        |  SELECT s.event_type, s.nh, s.t + 1,
        |    (8 * o.n * 10000 + 2 * (s.l + s.b)) // 10,
        |    (3 * ((8 * o.n * 10000 + 2 * (s.l + s.b)) // 10 - s.l)
        |      + 7 * s.b) // 10
        |  FROM s JOIN ord o ON o.event_type = s.event_type AND o.t = s.t + 1
        |  WHERE s.t < s.nh)
        |SELECT event_type, nh AS n_obs, l AS level_x1e4, b AS trend_x1e4,
        |  l + b AS fc1_x1e4, l + 2 * b AS fc2_x1e4, l + 3 * b AS fc3_x1e4
        |FROM s WHERE t = nh ORDER BY event_type""".stripMargin,
    // same dense grid, same pair relation, the median as the VALUE at
    // deterministic rank (n+1)//2 under the fully-keyed order — exact
    // rational-to-double slope division is IEEE-identical
    "events_theil_sen" ->
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
        |p AS (SELECT a.event_type,
        |    CAST(b.n - a.n AS DOUBLE) / CAST(b.hr - a.hr AS DOUBLE) AS slope,
        |    a.hr AS h1, b.hr AS h2
        |  FROM dense a JOIN dense b
        |    ON b.event_type = a.event_type AND b.hr > a.hr),
        |med AS (SELECT event_type, cnt AS n_pairs,
        |    CAST(FLOOR(slope * 1000000 + 0.5) AS BIGINT) AS slope_x1e6
        |  FROM (SELECT event_type, slope,
        |      row_number() OVER (PARTITION BY event_type ORDER BY slope, h1, h2) AS rn,
        |      count(*) OVER (PARTITION BY event_type) AS cnt
        |    FROM p) WHERE rn = (cnt + 1) // 2),
        |mn AS (SELECT event_type, n AS median_y
        |  FROM (SELECT event_type, n,
        |      row_number() OVER (PARTITION BY event_type ORDER BY n, hr) AS rn,
        |      count(*) OVER (PARTITION BY event_type) AS cnt
        |    FROM dense) WHERE rn = (cnt + 1) // 2)
        |SELECT med.event_type, med.n_pairs, med.slope_x1e6, mn.median_y
        |FROM med JOIN mn ON mn.event_type = med.event_type
        |ORDER BY med.event_type""".stripMargin,
    // the calibrate-then-monitor contract in one pass: parameters from
    // the dense prefix below the median hour (up to the prefix's last
    // OBSERVED hour), the recurrence over the dense tail after it
    "events_cusum_stream" ->
      """WITH RECURSIVE hourly AS (SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 // 3600 AS hr,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |g AS (SELECT (min(hr) + max(hr) + 1) // 2 AS split FROM hourly),
        |b1max AS (SELECT max(hr) AS m FROM hourly, g WHERE hr < split),
        |b2max AS (SELECT max(hr) AS m FROM hourly, g WHERE hr >= split),
        |cal0 AS (SELECT event_type, min(hr) AS h0 FROM hourly, g
        |  WHERE hr < split GROUP BY 1),
        |calgrid AS (SELECT c.event_type, unnest(generate_series(c.h0, b1max.m)) AS hr
        |  FROM cal0 c, b1max),
        |caldense AS (SELECT cg.event_type, cg.hr, COALESCE(h.n, 0) AS n
        |  FROM calgrid cg LEFT JOIN hourly h
        |    ON h.event_type = cg.event_type AND h.hr = cg.hr),
        |prm AS (SELECT event_type,
        |    CAST(sum(n) AS BIGINT) * 10000 // count(*) AS mu,
        |    CAST(sum(n) AS BIGINT) * 10000 // count(*) // 8 AS slack,
        |    GREATEST(4 * (CAST(sum(n) AS BIGINT) * 10000 // count(*)), 1) AS h
        |  FROM caldense GROUP BY 1),
        |mongrid AS (SELECT p.event_type,
        |    unnest(generate_series(b1max.m + 1, b2max.m)) AS hr
        |  FROM prm p, b1max, b2max),
        |mondense AS (SELECT mg.event_type, mg.hr, COALESCE(h.n, 0) AS n
        |  FROM mongrid mg LEFT JOIN hourly h
        |    ON h.event_type = mg.event_type AND h.hr = mg.hr),
        |nhs AS (SELECT event_type, count(*) AS nh FROM mondense GROUP BY 1),
        |ordm AS (SELECT event_type, n,
        |    row_number() OVER (PARTITION BY event_type ORDER BY hr) AS t
        |  FROM mondense),
        |r(event_type, t, s, na, mx) AS (
        |  SELECT event_type, CAST(0 AS BIGINT), CAST(0 AS BIGINT),
        |    CAST(0 AS BIGINT), CAST(0 AS BIGINT) FROM prm
        |  UNION ALL
        |  SELECT r.event_type, r.t + 1,
        |    CASE WHEN GREATEST(0, r.s + o.n * 10000 - p.mu - p.slack) >= p.h
        |      THEN CAST(0 AS BIGINT)
        |      ELSE GREATEST(0, r.s + o.n * 10000 - p.mu - p.slack) END,
        |    r.na + (CASE WHEN GREATEST(0, r.s + o.n * 10000 - p.mu - p.slack) >= p.h
        |      THEN 1 ELSE 0 END),
        |    GREATEST(r.mx, GREATEST(0, r.s + o.n * 10000 - p.mu - p.slack))
        |  FROM r
        |  JOIN prm p ON p.event_type = r.event_type
        |  JOIN nhs ON nhs.event_type = r.event_type
        |  JOIN ordm o ON o.event_type = r.event_type AND o.t = r.t + 1
        |  WHERE r.t < nhs.nh)
        |SELECT r.event_type, p.mu AS mu_x1e4, nhs.nh AS n_obs,
        |  r.na AS n_alarms, r.mx AS max_s_x1e4, r.s AS final_s_x1e4
        |FROM r
        |JOIN prm p ON p.event_type = r.event_type
        |JOIN nhs ON nhs.event_type = r.event_type
        |WHERE r.t = nhs.nh ORDER BY r.event_type""".stripMargin,
    // the Holt recursion already materializes (t, l, b) per step — the
    // one-step errors are a join of state t with observation t+1, and
    // the band is the value at deterministic rank ceil(0.9n)
    "events_holt_interval" ->
      """WITH RECURSIVE hourly AS (SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 // 3600 AS hr,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |bounds AS (SELECT event_type, min(hr) AS h0, max(hr) AS h1
        |  FROM hourly GROUP BY 1),
        |grid AS (SELECT event_type, unnest(generate_series(h0, h1)) AS hr FROM bounds),
        |dense AS (SELECT g.event_type, g.hr, COALESCE(h.n, 0) AS n
        |  FROM grid g LEFT JOIN hourly h
        |    ON h.event_type = g.event_type AND h.hr = g.hr),
        |ord AS (SELECT event_type, n,
        |    row_number() OVER (PARTITION BY event_type ORDER BY hr) AS t,
        |    count(*) OVER (PARTITION BY event_type) AS nh
        |  FROM dense),
        |s(event_type, nh, t, l, b) AS (
        |  SELECT o0.event_type, o0.nh, CAST(1 AS BIGINT),
        |    o0.n * 10000, COALESCE(o1.n - o0.n, 0) * 10000
        |  FROM ord o0 LEFT JOIN ord o1
        |    ON o1.event_type = o0.event_type AND o1.t = 2
        |  WHERE o0.t = 1
        |  UNION ALL
        |  SELECT s.event_type, s.nh, s.t + 1,
        |    (8 * o.n * 10000 + 2 * (s.l + s.b)) // 10,
        |    (3 * ((8 * o.n * 10000 + 2 * (s.l + s.b)) // 10 - s.l)
        |      + 7 * s.b) // 10
        |  FROM s JOIN ord o ON o.event_type = s.event_type AND o.t = s.t + 1
        |  WHERE s.t < s.nh),
        |err AS (SELECT s.event_type, s.t + 1 AS t,
        |    abs(o.n * 10000 - (s.l + s.b)) AS e
        |  FROM s JOIN ord o ON o.event_type = s.event_type AND o.t = s.t + 1),
        |band AS (SELECT event_type, ne, e AS band FROM (
        |    SELECT event_type, e, t,
        |      row_number() OVER (PARTITION BY event_type ORDER BY e, t) AS rn,
        |      count(*) OVER (PARTITION BY event_type) AS ne
        |    FROM err) WHERE rn = GREATEST((ne * 9 + 9) // 10, 1)),
        |fin AS (SELECT event_type, nh, l, b FROM s WHERE t = nh)
        |SELECT f.event_type, f.nh AS n_obs,
        |  CAST(COALESCE(band.ne, 0) AS BIGINT) AS n_err,
        |  f.l AS level_x1e4, f.b AS trend_x1e4, f.l + f.b AS fc1_x1e4,
        |  COALESCE(band.band, 0) AS band_p90_x1e4,
        |  f.l + f.b - COALESCE(band.band, 0) AS fc1_lo_x1e4,
        |  f.l + f.b + COALESCE(band.band, 0) AS fc1_hi_x1e4
        |FROM fin f LEFT JOIN band ON band.event_type = f.event_type
        |ORDER BY f.event_type""".stripMargin,
    // The CUSUM fold as a recursive CTE: same dense grid, same
    // mu/slack/h derivation, same max-0 / reset-on-alarm recurrence;
    // the pre-reset value feeds all three state fields.
    "events_cusum_alarm" ->
      """WITH RECURSIVE hourly AS (SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 // 3600 AS hr,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |bounds AS (SELECT event_type, min(hr) AS h0, max(hr) AS h1
        |  FROM hourly GROUP BY 1),
        |grid AS (SELECT event_type, unnest(generate_series(h0, h1)) AS hr FROM bounds),
        |dense AS (SELECT g.event_type, g.hr, COALESCE(h.n, 0) AS n
        |  FROM grid g LEFT JOIN hourly h
        |    ON h.event_type = g.event_type AND h.hr = g.hr),
        |prm AS (SELECT event_type, count(*) AS nh,
        |    CAST(sum(n) AS BIGINT) * 10000 // count(*) AS mu,
        |    CAST(sum(n) AS BIGINT) * 10000 // count(*) // 8 AS slack,
        |    GREATEST(4 * (CAST(sum(n) AS BIGINT) * 10000 // count(*)), 1) AS h
        |  FROM dense GROUP BY 1),
        |ord AS (SELECT event_type, n,
        |    row_number() OVER (PARTITION BY event_type ORDER BY hr) AS t
        |  FROM dense),
        |r(event_type, t, s, na, mx) AS (
        |  SELECT event_type, CAST(0 AS BIGINT), CAST(0 AS BIGINT),
        |    CAST(0 AS BIGINT), CAST(0 AS BIGINT) FROM prm
        |  UNION ALL
        |  SELECT r.event_type, r.t + 1,
        |    CASE WHEN GREATEST(0, r.s + o.n * 10000 - p.mu - p.slack) >= p.h
        |      THEN CAST(0 AS BIGINT)
        |      ELSE GREATEST(0, r.s + o.n * 10000 - p.mu - p.slack) END,
        |    r.na + (CASE WHEN GREATEST(0, r.s + o.n * 10000 - p.mu - p.slack) >= p.h
        |      THEN 1 ELSE 0 END),
        |    GREATEST(r.mx, GREATEST(0, r.s + o.n * 10000 - p.mu - p.slack))
        |  FROM r
        |  JOIN prm p ON p.event_type = r.event_type
        |  JOIN ord o ON o.event_type = r.event_type AND o.t = r.t + 1
        |  WHERE r.t < p.nh)
        |SELECT r.event_type, p.nh AS n_obs, p.mu AS mu_x1e4,
        |  r.na AS n_alarms, r.mx AS max_s_x1e4, r.s AS final_s_x1e4
        |FROM r JOIN prm p ON p.event_type = r.event_type
        |WHERE r.t = p.nh ORDER BY r.event_type""".stripMargin,
    "events_resample_locf" ->
      s"""WITH base AS ($evBase),
         |obs AS (
         |  SELECT *, (sec // 3600) * 3600 AS bucket,
         |    row_number() OVER (PARTITION BY user_id, (sec // 3600) * 3600
         |                       ORDER BY sec DESC, event_id DESC) AS rn
         |  FROM base),
         |per_bucket AS (
         |  SELECT user_id, bucket, count(*) AS n_events,
         |    max(CASE WHEN rn = 1 THEN v_x1e4 END) AS v_x1e4
         |  FROM obs GROUP BY 1, 2),
         |bounds AS (
         |  SELECT user_id, min(bucket) AS mnb, max(bucket) AS mxb
         |  FROM per_bucket GROUP BY 1),
         |grid AS (
         |  SELECT user_id, unnest(generate_series(mnb, mxb, 3600)) AS bucket
         |  FROM bounds),
         |j AS (
         |  SELECT g.user_id, g.bucket,
         |    coalesce(p.n_events, 0) AS n_events,
         |    CASE WHEN p.v_x1e4 IS NULL THEN 1 ELSE 0 END AS filled,
         |    p.v_x1e4
         |  FROM grid g LEFT JOIN per_bucket p
         |    ON g.user_id = p.user_id AND g.bucket = p.bucket)
         |SELECT user_id, bucket, n_events, filled,
         |  last_value(v_x1e4 IGNORE NULLS) OVER (
         |    PARTITION BY user_id ORDER BY bucket
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_locf_x1e4
         |FROM j ORDER BY user_id, bucket""".stripMargin,
    "events_resample_lerp" ->
      s"""WITH base AS ($evBase),
         |obs AS (
         |  SELECT *, (sec // 3600) * 3600 AS bucket,
         |    row_number() OVER (PARTITION BY user_id, (sec // 3600) * 3600
         |                       ORDER BY sec DESC, event_id DESC) AS rn
         |  FROM base),
         |per_bucket AS (
         |  SELECT user_id, bucket, count(*) AS n_events,
         |    max(CASE WHEN rn = 1 THEN v_x1e4 END) AS v_x1e4
         |  FROM obs GROUP BY 1, 2),
         |bounds AS (
         |  SELECT user_id, min(bucket) AS mnb, max(bucket) AS mxb
         |  FROM per_bucket GROUP BY 1),
         |grid AS (
         |  SELECT user_id, unnest(generate_series(mnb, mxb, 3600)) AS bucket
         |  FROM bounds),
         |j AS (
         |  SELECT g.user_id, g.bucket,
         |    coalesce(p.n_events, 0) AS n_events,
         |    CASE WHEN p.v_x1e4 IS NULL THEN 1 ELSE 0 END AS filled,
         |    p.v_x1e4
         |  FROM grid g LEFT JOIN per_bucket p
         |    ON g.user_id = p.user_id AND g.bucket = p.bucket),
         |nb AS (
         |  SELECT user_id, bucket, n_events, filled,
         |    last_value(v_x1e4 IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY bucket
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS vp,
         |    last_value(CASE WHEN v_x1e4 IS NOT NULL THEN bucket END IGNORE NULLS)
         |      OVER (PARTITION BY user_id ORDER BY bucket
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bp,
         |    first_value(v_x1e4 IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY bucket
         |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS vn,
         |    first_value(CASE WHEN v_x1e4 IS NOT NULL THEN bucket END IGNORE NULLS)
         |      OVER (PARTITION BY user_id ORDER BY bucket
         |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS bn
         |  FROM j)
         |SELECT user_id, bucket, n_events, filled,
         |  CASE WHEN vp IS NULL THEN vn
         |       WHEN vn IS NULL THEN vp
         |       WHEN bn = bp THEN vp
         |       ELSE (vp * (bn - bucket) + vn * (bucket - bp)) // (bn - bp)
         |  END AS v_lerp_x1e4
         |FROM nb ORDER BY user_id, bucket""".stripMargin,
    "window_rolling_range" ->
      s"""WITH base AS ($evBase)
         |SELECT event_id, user_id, sec,
         |  count(*) OVER w AS n_win,
         |  CAST(sum(v_x1e4) OVER w AS BIGINT) AS sum_v_x1e4
         |FROM base
         |WINDOW w AS (PARTITION BY user_id ORDER BY sec
         |             RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
         |ORDER BY user_id, sec, event_id""".stripMargin,
    // replays the identical cleared-form IEEE tree over exact moments:
    // z = (n·x − Σx) / sqrt(n·Σx² − (Σx)²)
    "stats_outliers" ->
      """WITH m AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sx,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |        CAST(l_extendedprice AS DECIMAL(18,2))) AS sxx
        |  FROM lineitem GROUP BY 1)
        |SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
        |  CASE WHEN CAST(m.n AS DOUBLE) * CAST(m.sxx AS DOUBLE) -
        |            CAST(m.sx AS DOUBLE) * CAST(m.sx AS DOUBLE) <= 0
        |    THEN NULL
        |    ELSE CAST(floor(
        |      (CAST(m.n AS DOUBLE) * CAST(l.l_extendedprice AS DOUBLE) -
        |       CAST(m.sx AS DOUBLE)) /
        |      sqrt(CAST(m.n AS DOUBLE) * CAST(m.sxx AS DOUBLE) -
        |           CAST(m.sx AS DOUBLE) * CAST(m.sx AS DOUBLE)) * 1e4 + 0.5)
        |      AS BIGINT) END AS z_x1e4,
        |  CASE WHEN CAST(m.n AS DOUBLE) * CAST(m.sxx AS DOUBLE) -
        |            CAST(m.sx AS DOUBLE) * CAST(m.sx AS DOUBLE) <= 0 THEN 0
        |    WHEN abs(CAST(floor(
        |      (CAST(m.n AS DOUBLE) * CAST(l.l_extendedprice AS DOUBLE) -
        |       CAST(m.sx AS DOUBLE)) /
        |      sqrt(CAST(m.n AS DOUBLE) * CAST(m.sxx AS DOUBLE) -
        |           CAST(m.sx AS DOUBLE) * CAST(m.sx AS DOUBLE)) * 1e4 + 0.5)
        |      AS BIGINT)) > 15000 THEN 1 ELSE 0 END AS is_outlier
        |FROM lineitem l JOIN m ON l.l_returnflag = m.l_returnflag
        |WHERE l.l_orderkey < 400
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    // replays corrGroups' fixed tree: exact decimal moments, one
    // double conversion each, num / sqrt(vx·vy), floor ×1e6
    "agg_corr" ->
      """WITH m AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
        |    sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy,
        |    sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, n,
        |  CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <= 0
        |         OR CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) <= 0
        |    THEN NULL
        |    ELSE CAST(floor(
        |      (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |      sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |           (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
        |      * 1e6 + 0.5) AS BIGINT) END AS corr_x1e6
        |FROM m ORDER BY l_returnflag""".stripMargin,
    "events_retention_cohort" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d FROM events),
        |cohorts AS (SELECT user_id, min(d) AS cohort_day FROM days GROUP BY 1)
        |SELECT strftime(c.cohort_day, '%Y-%m-%d') AS cohort_day,
        |  CAST(date_diff('day', c.cohort_day, d.d) AS INTEGER) AS offset_days,
        |  count(DISTINCT d.user_id) AS n_users
        |FROM days d JOIN cohorts c USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort_day, offset_days""".stripMargin,
    "events_funnel" ->
      """WITH fv AS (
        |  SELECT user_id, min(epoch_us(CAST(ts AS TIMESTAMP)) // 1000000) AS vsec
        |  FROM events WHERE event_type = 'view' GROUP BY 1),
        |conv AS (
        |  SELECT count(DISTINCT e.user_id) AS users_converted
        |  FROM events e JOIN fv USING (user_id)
        |  WHERE e.event_type = 'purchase'
        |    AND epoch_us(CAST(e.ts AS TIMESTAMP)) // 1000000 BETWEEN fv.vsec AND fv.vsec + 3600)
        |SELECT (SELECT count(DISTINCT user_id) FROM events) AS users_total,
        |  (SELECT count(*) FROM fv) AS users_viewed,
        |  users_converted
        |FROM conv""".stripMargin,
    // same desc-ordered strictly-later RANGE frames, same µs integers
    "events_pattern_match" ->
      """WITH e AS (SELECT user_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS t FROM events),
        |w AS (SELECT user_id, event_type, t,
        |    min(CASE WHEN event_type = 'purchase' THEN t END) OVER
        |      (PARTITION BY user_id ORDER BY t DESC
        |       RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS next_p,
        |    min(CASE WHEN event_type = 'error' THEN t END) OVER
        |      (PARTITION BY user_id ORDER BY t DESC
        |       RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS next_e
        |  FROM e),
        |m AS (SELECT user_id,
        |    CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS is_v,
        |    CASE WHEN event_type = 'view' AND next_p IS NOT NULL
        |      AND next_p - t <= 600000000
        |      AND (next_e IS NULL OR next_e >= next_p) THEN 1 ELSE 0 END AS is_m,
        |    CASE WHEN event_type = 'view' AND next_p IS NOT NULL
        |      AND next_p - t <= 600000000
        |      AND (next_e IS NULL OR next_e >= next_p) THEN next_p - t END AS lat
        |  FROM w)
        |SELECT user_id, CAST(SUM(is_v) AS BIGINT) AS n_views,
        |  CAST(SUM(is_m) AS BIGINT) AS n_conv,
        |  COALESCE(min(lat), -1) AS min_lat_us
        |FROM m GROUP BY user_id ORDER BY user_id""".stripMargin,
    "events_top_movers" ->
      """WITH weekly AS (
        |  SELECT event_type,
        |    CAST(weekofyear(CAST(ts AS TIMESTAMP)) AS INTEGER) AS wk,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, wk, n,
        |  lag(n) OVER w AS prev_n,
        |  n - lag(n) OVER w AS delta,
        |  CASE WHEN lag(n) OVER w IS NULL OR lag(n) OVER w = 0 THEN NULL
        |    ELSE ((n - lag(n) OVER w) * 10000) // lag(n) OVER w END AS pct_x1e4
        |FROM weekly
        |WINDOW w AS (PARTITION BY event_type ORDER BY wk)
        |ORDER BY event_type, wk""".stripMargin,
    "agg_share_of_total" ->
      """WITH per AS (
        |  SELECT l_returnflag,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS rev_c
        |  FROM lineitem GROUP BY 1),
        |tot AS (SELECT CAST(sum(rev_c) AS BIGINT) AS tot_c FROM per)
        |SELECT l_returnflag, (rev_c * 10000) // tot_c AS share_x1e4
        |FROM per CROSS JOIN tot ORDER BY l_returnflag""".stripMargin,
    "events_conversion_time" ->
      """WITH fv AS (
        |  SELECT user_id, min(epoch_us(CAST(ts AS TIMESTAMP)) // 1000000) AS vsec
        |  FROM events WHERE event_type = 'view' GROUP BY 1),
        |lags AS (
        |  SELECT e.user_id,
        |    min(epoch_us(CAST(e.ts AS TIMESTAMP)) // 1000000 - fv.vsec) AS lag_sec
        |  FROM events e JOIN fv USING (user_id)
        |  WHERE e.event_type = 'purchase'
        |    AND epoch_us(CAST(e.ts AS TIMESTAMP)) // 1000000 >= fv.vsec
        |  GROUP BY 1)
        |SELECT count(*) AS n_converted,
        |  CAST(floor(quantile_cont(lag_sec, 0.5) * 1e4 + 0.5) AS BIGINT) AS p50_x1e4,
        |  CAST(floor(quantile_cont(lag_sec, 0.9) * 1e4 + 0.5) AS BIGINT) AS p90_x1e4
        |FROM lags""".stripMargin,
    "text_kwic" ->
      """WITH m AS (
        |  SELECT doc_id, regexp_extract_all(text, '.{0,24}\bspark\b.{0,24}') AS hits
        |  FROM documents WHERE doc_id < 100)
        |SELECT doc_id,
        |  CAST(unnest(generate_series(1, len(hits))) - 1 AS INTEGER) AS hit_no,
        |  unnest(hits) AS ctx
        |FROM m WHERE len(hits) > 0
        |ORDER BY doc_id, hit_no""".stripMargin,
    "stats_chi2" ->
      """WITH cells AS (
        |  SELECT event_type AS a, user_id % 3 AS b, count(*) AS o
        |  FROM events GROUP BY 1, 2),
        |ra AS (SELECT a, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY 1),
        |cb AS (SELECT b, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY 1),
        |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n,
        |    count(DISTINCT a) AS ka, count(DISTINCT b) AS kb FROM cells),
        |t AS (SELECT cells.o, ra.r, cb.c, tot.n, tot.ka, tot.kb,
        |    CAST(floor(
        |      (CAST(cells.o AS DOUBLE) * CAST(tot.n AS DOUBLE) -
        |       CAST(ra.r AS DOUBLE) * CAST(cb.c AS DOUBLE)) *
        |      (CAST(cells.o AS DOUBLE) * CAST(tot.n AS DOUBLE) -
        |       CAST(ra.r AS DOUBLE) * CAST(cb.c AS DOUBLE)) * 1e4 /
        |      (CAST(ra.r AS DOUBLE) * CAST(cb.c AS DOUBLE) * CAST(tot.n AS DOUBLE)))
        |      AS BIGINT) AS term
        |  FROM cells JOIN ra USING (a) JOIN cb USING (b) CROSS JOIN tot)
        |SELECT any_value(n) AS n, CAST((any_value(ka) - 1) * (any_value(kb) - 1) AS BIGINT) AS dof,
        |  CAST(sum(term) AS BIGINT) AS chi2_x1e4
        |FROM t""".stripMargin,
    "sample_fixed_n" ->
      """SELECT c_mktsegment, rn, c_custkey FROM (
        |  SELECT c_mktsegment, c_custkey,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY CAST(CONCAT('0x', substr(md5(CAST(c_custkey AS VARCHAR) || ':s7:fixn'), 1, 8)) AS BIGINT),
        |        c_custkey) AS rn
        |  FROM customer)
        |WHERE rn <= 3 ORDER BY c_mktsegment, rn""".stripMargin,
    "agg_stringagg" ->
      """SELECT o_orderstatus,
        |  string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY o_orderstatus""".stripMargin,
    "events_coverage_seconds" ->
      """WITH base AS (SELECT user_id, event_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS sec,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 + 300 AS e
        |  FROM events),
        |f AS (SELECT user_id, sec, e,
        |    CASE WHEN max(e) OVER (PARTITION BY user_id ORDER BY sec, event_id
        |                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |           OR sec > max(e) OVER (PARTITION BY user_id ORDER BY sec, event_id
        |                                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      THEN 1 ELSE 0 END AS new_island,
        |    event_id
        |  FROM base),
        |isl AS (SELECT user_id, sec, e,
        |    CAST(sum(new_island) OVER (PARTITION BY user_id ORDER BY sec, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS island
        |  FROM f),
        |per AS (SELECT user_id, island, min(sec) AS lo, max(e) AS hi
        |  FROM isl GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_islands,
        |  CAST(sum(hi - lo) AS BIGINT) AS covered_sec
        |FROM per GROUP BY 1 ORDER BY user_id""".stripMargin,
    "skew_key_histogram" ->
      """SELECT user_id, count(*) AS n,
        |  (count(*) * 10000) // (SELECT count(*) FROM events) AS share_x1e4
        |FROM events GROUP BY user_id
        |ORDER BY n DESC, user_id LIMIT 10""".stripMargin,
    "events_rolling_anomaly" ->
      s"""WITH base AS (SELECT event_id, user_id,
         |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS sec,
         |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS v2
         |  FROM events WHERE user_id < 40),
         |st AS (SELECT event_id, user_id, sec, v2,
         |    count(*) OVER w AS n,
         |    CAST(sum(v2) OVER w AS BIGINT) AS s,
         |    CAST(sum(v2 * v2) OVER w AS BIGINT) AS q
         |  FROM base
         |  WINDOW w AS (PARTITION BY user_id ORDER BY sec
         |               RANGE BETWEEN 7199 PRECEDING AND CURRENT ROW))
         |SELECT event_id, user_id, sec, n AS n_win, v2 AS v_x100,
         |  CASE WHEN n >= 3 AND (n * v2 - s) * (n * v2 - s) > 4 * (n * q - s * s)
         |    THEN 1 ELSE 0 END AS is_anomaly
         |FROM st ORDER BY user_id, sec, event_id""".stripMargin,
    "events_heatmap_dow_hour" ->
      """SELECT CAST(isodow(CAST(ts AS TIMESTAMP)) AS INTEGER) AS iso_dow,
        |  CAST(EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) AS INTEGER) AS hod,
        |  count(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY iso_dow, hod""".stripMargin,
    "agg_weighted_avg" ->
      """SELECT l_returnflag,
        |  CAST(floor(
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) /
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |    * 1e4 + 0.5) AS BIGINT) AS wavg_x1e4
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,
    "agg_argmax" ->
      """SELECT event_type, event_id, value FROM (
        |  SELECT event_type, event_id, value,
        |    row_number() OVER (PARTITION BY event_type
        |                       ORDER BY value DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1 ORDER BY event_type""".stripMargin,
    "events_id_gaps" ->
      """WITH present AS (SELECT event_id FROM events WHERE event_id % 97 <> 0)
        |SELECT p.event_id + 1 AS gap_start
        |FROM present p
        |WHERE NOT EXISTS (SELECT 1 FROM present q WHERE q.event_id = p.event_id + 1)
        |  AND p.event_id + 1 <= (SELECT max(event_id) FROM present)
        |ORDER BY gap_start""".stripMargin,
    "events_cumulative_users" ->
      """WITH fd AS (
        |  SELECT user_id, min(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS d
        |  FROM events GROUP BY 1),
        |daily AS (SELECT d, count(*) AS n_new FROM fd GROUP BY 1)
        |SELECT strftime(d, '%Y-%m-%d') AS day, n_new,
        |  CAST(sum(n_new) OVER (ORDER BY d
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_cumulative
        |FROM daily ORDER BY day""".stripMargin,
    // same two-pass recipe: scale4 the median, derive deviations from
    // med_x1e4/1e4, scale4 the second percentile
    "stats_mad" ->
      """WITH m AS (
        |  SELECT l_returnflag,
        |    CAST(floor(quantile_cont(l_extendedprice, 0.5) * 1e4 + 0.5) AS BIGINT) AS med_x1e4
        |  FROM lineitem GROUP BY 1)
        |SELECT l.l_returnflag, m.med_x1e4,
        |  CAST(floor(quantile_cont(abs(l.l_extendedprice - CAST(m.med_x1e4 AS DOUBLE) / 1e4), 0.5)
        |    * 1e4 + 0.5) AS BIGINT) AS mad_x1e4
        |FROM lineitem l JOIN m USING (l_returnflag)
        |GROUP BY 1, 2 ORDER BY l_returnflag""".stripMargin,
    "topk_per_group" ->
      """SELECT o_orderstatus, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderstatus, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderstatus
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 5 ORDER BY o_orderstatus, rn""".stripMargin,
    "join_null_safe" ->
      """WITH ev AS (SELECT event_type,
        |    CAST(json_extract(props, '$.k') AS INTEGER) AS k FROM events),
        |a AS (SELECT k, count(*) AS n_click FROM ev WHERE event_type = 'click' GROUP BY 1),
        |b AS (SELECT k, count(*) AS n_view FROM ev WHERE event_type = 'view' GROUP BY 1)
        |SELECT COALESCE(a.k, b.k) AS k,
        |  COALESCE(a.n_click, 0) AS n_click,
        |  COALESCE(b.n_view, 0) AS n_view
        |FROM a FULL JOIN b ON a.k IS NOT DISTINCT FROM b.k
        |ORDER BY k NULLS FIRST""".stripMargin,
    "window_percent_rank" ->
      """SELECT o_orderkey, o_orderstatus,
        |  CAST(floor(percent_rank() OVER w * 1e4 + 0.5) AS BIGINT) AS pr_x1e4,
        |  CAST(floor(cume_dist() OVER w * 1e4 + 0.5) AS BIGINT) AS cd_x1e4
        |FROM orders WHERE o_custkey < 100
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice)
        |ORDER BY o_orderkey""".stripMargin,
    // same islands algebra: epochday − row_number constant per run;
    // best = longest, earliest start on ties
    "events_streaks" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d
        |  FROM events),
        |isl AS (
        |  SELECT user_id, d,
        |    CAST(d - DATE '1970-01-01' AS BIGINT)
        |      - row_number() OVER (PARTITION BY user_id ORDER BY d) AS island
        |  FROM days),
        |per AS (
        |  SELECT user_id, island, count(*) AS len,
        |    min(d) AS s, max(d) AS e
        |  FROM isl GROUP BY 1, 2),
        |best AS (
        |  SELECT user_id, len, s, e,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY len DESC, s ASC) AS rk,
        |    CAST(sum(len) OVER (PARTITION BY user_id) AS BIGINT) AS n_active_days
        |  FROM per)
        |SELECT user_id, n_active_days, len AS best_streak,
        |  strftime(s, '%Y-%m-%d') AS streak_start,
        |  strftime(e, '%Y-%m-%d') AS streak_end
        |FROM best WHERE rk = 1 ORDER BY user_id""".stripMargin,
    "events_markov" ->
      """WITH p AS (
        |  SELECT event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |                          ORDER BY CAST(ts AS TIMESTAMP), event_id)
        |      AS prev_state
        |  FROM events),
        |pairs AS (
        |  SELECT prev_state, event_type AS next_state, count(*) AS n
        |  FROM p WHERE prev_state IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT prev_state, CAST(sum(n) AS BIGINT) AS total_from
        |  FROM pairs GROUP BY 1)
        |SELECT prev_state, next_state, n, total_from,
        |  (n * 10000) // total_from AS p_x1e4
        |FROM pairs JOIN tot USING (prev_state)
        |ORDER BY prev_state, next_state""".stripMargin,
    // the built-in ntile IS the spec the closed form reproduces
    "agg_quartiles" ->
      """WITH b AS (
        |  SELECT CAST(ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS INTEGER)
        |      AS bucket,
        |    CAST(c_acctbal AS DECIMAL(18,2)) AS x
        |  FROM customer)
        |SELECT bucket, count(*) AS n_rows,
        |  CAST(min(x) * 100 AS BIGINT) AS min_c,
        |  CAST(max(x) * 100 AS BIGINT) AS max_c,
        |  CAST(sum(x) * 100 AS BIGINT) AS sum_c
        |FROM b GROUP BY 1 ORDER BY bucket""".stripMargin,
    // the same closed form: epoch day 0 = Thursday, W(e) = weekdays in
    // [0,e) = 5·(e div 7) + prefix[e mod 7]; bdays = W(e2+1) − W(e1+1)
    "lineitem_business_days" ->
      """WITH j AS (
        |  SELECT CAST(CAST(CAST(o_orderdate AS TIMESTAMP) AS DATE)
        |           - DATE '1970-01-01' AS BIGINT) + 1 AS e1,
        |    CAST(CAST(CAST(l_shipdate AS TIMESTAMP) AS DATE)
        |           - DATE '1970-01-01' AS BIGINT) + 1 AS e2
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |w AS (SELECT
        |    5 * ((e1 - e1 % 7) // 7) +
        |      (CASE e1 % 7 WHEN 1 THEN 1 WHEN 2 THEN 2 WHEN 3 THEN 2
        |        WHEN 4 THEN 2 WHEN 5 THEN 3 WHEN 6 THEN 4 ELSE 0 END) AS w1,
        |    5 * ((e2 - e2 % 7) // 7) +
        |      (CASE e2 % 7 WHEN 1 THEN 1 WHEN 2 THEN 2 WHEN 3 THEN 2
        |        WHEN 4 THEN 2 WHEN 5 THEN 3 WHEN 6 THEN 4 ELSE 0 END) AS w2
        |  FROM j)
        |SELECT CAST(w2 - w1 AS BIGINT) AS bdays, count(*) AS n_items
        |FROM w GROUP BY 1 ORDER BY bdays""".stripMargin,
    // the full recompute the join-delta refresh must equal
    "matview_join_delta" ->
      """SELECT c_mktsegment, count(*) AS n,
        |  CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_c
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // the full recompute the incremental merge must equal
    "matview_incremental" ->
      """WITH base AS (
        |  SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 // 3600 AS hr,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
        |  FROM events)
        |SELECT event_type, hr, count(*) AS n,
        |  CAST(sum(v) AS BIGINT) AS sum_x100,
        |  min(v) AS min_x100, max(v) AS max_x100,
        |  (CAST(sum(v) AS BIGINT) * 100) // count(*) AS avg_x1e4
        |FROM base GROUP BY 1, 2 ORDER BY event_type, hr""".stripMargin,
    // ground truth = recompute over the non-retracted events; the
    // engine must reach it through the ±multiplicity state fold
    "matview_distinct_delta" ->
      """SELECT event_type,
        |  epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 // 3600 AS hr,
        |  count(DISTINCT user_id) AS n_distinct
        |FROM events WHERE event_id % 10 <> 0
        |GROUP BY 1, 2 ORDER BY event_type, hr""".stripMargin,
    // same md5-slice uniform, same integer Poisson(1) CDF thresholds
    "stats_poisson_bootstrap" ->
      """WITH bs AS (SELECT CAST(unnest(generate_series(0, 31)) AS BIGINT) AS b),
        |r AS (SELECT o_orderkey,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders),
        |x AS (SELECT bs.b, r.cents,
        |    CAST(CONCAT('0x', substr(md5(
        |      CAST(r.o_orderkey AS VARCHAR) || '_' || CAST(bs.b AS VARCHAR) || ':boot'),
        |      1, 8)) AS BIGINT) AS u
        |  FROM r CROSS JOIN bs),
        |m AS (SELECT b, cents,
        |    CASE WHEN u < 1580030168 THEN 0 WHEN u < 3160060337 THEN 1
        |         WHEN u < 3950075421 THEN 2 WHEN u < 4213413783 THEN 3
        |         ELSE 4 END AS mult
        |  FROM x)
        |SELECT b, CAST(SUM(mult) AS BIGINT) AS n_eff,
        |  CAST(SUM(mult * cents) AS BIGINT) AS sum_c,
        |  CAST(SUM(mult * cents) // SUM(mult) AS BIGINT) AS mean_c
        |FROM m GROUP BY b ORDER BY b""".stripMargin,
  )
}
