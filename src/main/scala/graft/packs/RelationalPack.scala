package graft.packs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QueryPack
import graft.core.Tables

/** Core relational surface the reference exposes implicitly (SURVEY §2.5
  * A1-A6, §2.6 O1-O4, §2.7/P1, P9) plus the TPC-H-ish breadth the engine
  * needs as a general analytics library.
  *
  * Determinism rules (see QueryPack): double sums go through
  * DECIMAL(18,2) so engine and oracle agree bit-for-bit; every output has
  * a total order.
  *
  * Scale notes per query are inline; the common theme: aggregations are
  * partial+final hash aggregates; small dimension joins are broadcast;
  * top-k queries compile to TakeOrderedAndProject (no global sort).
  */
object RelationalPack extends QueryPack {

  private def dsum(c: String) =
    round(sum(col(c).cast("decimal(18,2)")), 2).cast("double")
  private def dsum2(c: org.apache.spark.sql.Column) =
    round(sum(c.cast("decimal(18,2)")), 2).cast("double")
  private def dsumSql(c: String) =
    s"CAST(ROUND(SUM(CAST($c AS DECIMAL(18,2))), 2) AS DOUBLE)"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1 shape: scan-filter-agg; filter + pruning push into parquet.
    "agg_lineitem_pricing" -> ((s, dir) =>
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum("l_quantity").as("sum_qty"),
          dsum("l_extendedprice").as("sum_price"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")),

    // Orders ⋈ customer → per-segment rollup. customer is the smaller
    // side but both scale with SF → sort-merge on the key; AQE may
    // broadcast at small SF. Aggregate keyed on a 5-value segment.
    "join_orders_customer_segment" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer").select("c_custkey", "c_mktsegment")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"), dsum("o_totalprice").as("revenue"))
        .orderBy("c_mktsegment")
    }),

    // Broadcast-join demo: nation is O(25) rows at every SF — the
    // explicit broadcast keeps the plan shuffle-free on the build side.
    "join_customer_nation_count" -> ((s, dir) => {
      val c = Tables.load(s, dir, "customer")
      val n = Tables.load(s, dir, "nation")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy("n_name").agg(count(lit(1)).as("n_customers"))
        .orderBy("n_name")
    }),

    // O1+O2: top-k compiles to TakeOrderedAndProject — per-partition
    // heap + driver merge, no global sort even at 100 TB.
    "topk_orders" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .limit(100)),

    // A4: row counts per input.
    "count_rows_per_table" -> ((s, dir) => {
      val counts = Seq("customer", "orders", "lineitem", "supplier", "part")
        .map(t => Tables.load(s, dir, t).agg(count(lit(1)).as("n_rows"))
          .select(lit(t).as("tbl"), col("n_rows")))
      counts.reduce(_ unionAll _).orderBy("tbl")
    }),

    // P9 predicate filter + grouped rollup over the events stream table.
    "agg_events_by_type" -> ((s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), dsum("value").as("total_value"))
        .orderBy("event_type")),

    // §2.11 batch analogue of the windowed stream agg: per-hour counts.
    // The hour is emitted as a formatted string — raw timestamps don't
    // cross the engine/oracle boundary portably (ns vs µs repr).
    "events_hourly" -> ((s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00:00").as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy("hour", "event_type")),

    // 100-TB skew path: events→type-dim equi-join where the key has
    // only a handful of distinct values — every key is hot. saltedJoin
    // spreads each key over 8 sub-partitions (right side replicated
    // per salt); the decimal aggregate must hash-match the plain SQL
    // join, proving salting changes partitioning, never results.
    "skew_salted_join" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val dim = ev.select("event_type").distinct()
        .withColumn("type_weight", length(col("event_type")).cast("long"))
      graft.ops.Skew.saltedJoin(ev, dim, "event_type", salt = 8)
        .groupBy("event_type", "type_weight")
        .agg(count(lit(1)).as("n"), dsum("value").as("total_value"))
        .orderBy("event_type")
    }),

    // §2.11 oracle gate for the DEPLOYABLE streaming path: the same
    // hourly aggregate as events_hourly, but computed by runToFiles
    // (file source → watermarked window agg → exactly-once parquet
    // sink) and batch-read back from the sink. Hash-matching the batch
    // twin's oracle proves the streaming pipeline end-to-end.
    "events_hourly_stream" -> ((s, dir) =>
      graft.streaming.EventsStream.hourlyViaFileSink(s, dir)),

    // §2.11 streaming ingest-dedup: the whole feed redelivered as a
    // second micro-batch (at-least-once source), deduplicated by
    // dropDuplicatesWithinWatermark through the exactly-once file
    // sink — per-type counts must equal the plain batch aggregate.
    "events_dedup_stream" -> ((s, dir) =>
      graft.streaming.EventsStream.dedupViaFileSink(s, dir)),

    // §2.11 custom state: per-user sessionization through
    // mapGroupsWithState (one micro-batch → one Session row per user;
    // counts + spans mirror the batch aggregate).
    "events_sessionize_stream" -> ((s, dir) =>
      graft.streaming.EventsStream.sessionizeViaMemory(s, dir)),

    // §2.11 complete-mode re-rank (the Firestore notices top-50): two
    // micro-batches through groupBy → orderBy → limit into a memory
    // sink; the final snapshot must hash-match the batch
    // orderBy×2+limit twin.
    "events_notice_rerank_stream" -> ((s, dir) =>
      graft.streaming.EventsStream.topUsersViaMemory(s, dir)),

    // §2.11 EVENT-TIME custom state: gap sessionization through
    // flatMapGroupsWithState + EventTimeTimeout — sessions close when
    // the WATERMARK passes last-event + 30 min, emit exactly once
    // (Append mode → real file sink), and must reproduce the batch
    // gap-sessionization twin aggregated per user.
    "events_sessionize_et_stream" -> ((s, dir) =>
      graft.streaming.EventsStream.sessionizeEventTimeViaFileSink(s, dir)),

    // §2.11 built-in session windows: the declarative session_window
    // aggregate (vs the flatMapGroupsWithState custom sessionizer of
    // events_sessionize_et_stream) — closed sessions through the file
    // sink must reproduce the batch gap-split with session_window's
    // own >= gap boundary and end = last_ts + gap.
    "events_session_window_stream" -> ((s, dir) =>
      graft.streaming.EventsStream.sessionWindowViaFileSink(s, dir)),

    // §2.11 sliding (hopping) windows: 2-hour windows every hour —
    // each event lands in exactly two window slots; counts must match
    // the batch identity over both covering window starts.
    "events_sliding_stream" -> ((s, dir) =>
      graft.streaming.EventsStream.slidingViaFileSink(s, dir)),

    // §2.11 × K8: CDC-style streaming materialization — foreachBatch
    // merges each micro-batch's per-key latest rows into a versioned
    // keyed store, last-writer-wins by EVENT time (idempotent under
    // at-least-once redelivery). Batch 2 is an updates feed touching
    // every key; the state must equal the window-top-1 of the union.
    "events_stream_upsert" -> ((s, dir) =>
      graft.streaming.EventsStream.latestStateViaFileSink(s, dir)),

    // §2.11 × sketches: streaming distinct-user estimation with
    // MERGEABLE KMV state — per-hour min-k sketches merged across
    // micro-batches by pure set union (O(k) state per hour forever;
    // a streaming count(distinct) would hold every key). Batch 2 is a
    // full REDELIVERY (new event ids, same users): set semantics must
    // absorb it, so the state equals the single-shot sketch of the
    // original feed — the oracle mirrors that single-shot algebra.
    "events_kmv_stream" -> ((s, dir) =>
      graft.streaming.EventsStream.kmvStateViaFileSink(s, dir)),

    // §2.11 × sketches, additive twin: streaming per-(hour, type)
    // FREQUENCY estimation with mergeable Count-Min state. The feed
    // arrives in two DISJOINT micro-batches (event_id parity), so the
    // counter-additive merge must reproduce the exact full-feed counts
    // — the oracle is the plain GROUP BY count, which also proves the
    // d=3/w=1024 estimate is collision-free on this key domain.
    "events_cms_stream" -> ((s, dir) =>
      graft.streaming.EventsStream.cmsStateViaFileSink(s, dir)),

    // §2.11 × stats: streaming anomaly flags from mergeable moment
    // state — per-hour (n, Σc, Σc²) added across micro-batches, the
    // z-score test with division and sqrt multiplied away so both
    // engines branch on identical integers. Disjoint halves must
    // reproduce the batch recompute exactly.
    "events_anomaly_stream" -> ((s, dir) =>
      graft.streaming.EventsStream.anomalyViaFileSink(s, dir)),

    // §2.11 observability: per-batch progress records must conserve
    // the input — Σ numInputRows over every trigger equals the exact
    // feed row count (a dropped or double-read file breaks it).
    "events_stream_progress" -> ((s, dir) =>
      graft.streaming.EventsStream.progressAuditViaFileSink(s, dir)),

    // §2.11 CHAINED stateful operators: ingest-dedup → hourly window
    // agg in ONE streaming query over a redelivered feed — counts must
    // equal the batch aggregate of the unduplicated feed (a dropped
    // dedup would double them).
    "events_stream_pipeline" -> ((s, dir) =>
      graft.streaming.EventsStream.dedupHourlyViaFileSink(s, dir)),

    // §2.11 stream-STATIC join: stateless per-batch broadcast of the
    // customer dimension against the event feed — no watermark, no
    // join state; unmatched rows (the sentinels) prove the LEFT miss
    // path emits. Aggregate must equal the batch left-join twin.
    "events_stream_enrich" -> ((s, dir) =>
      graft.streaming.EventsStream.enrichViaFileSink(s, dir)),

    // §2.11 stream-stream join: watermarked purchase×view interval
    // self-join through the exactly-once file sink — inner matches
    // emit as they arrive; the watermark bounds join state. The
    // oracle is the plain batch interval join.
    "events_stream_join" -> ((s, dir) =>
      graft.streaming.EventsStream.purchaseViewJoinViaFileSink(s, dir)),

    // §2.11 stream-stream LEFT-OUTER join: unmatched purchases emit
    // null-padded only after the watermark passes their window —
    // sentinel micro-batches advance both branches' watermarks so the
    // bounded run completes. Oracle: the batch left join.
    "events_stream_join_outer" -> ((s, dir) =>
      graft.streaming.EventsStream.purchaseViewJoinOuterViaFileSink(s, dir)),

    // §2.11 stream-stream FULL-outer interval join — both sides'
    // unmatched rows null-pad after the watermark clears their window;
    // the batch FULL JOIN with the identical interval condition is the
    // oracle.
    "events_stream_join_full" -> ((s, dir) =>
      graft.streaming.EventsStream.purchaseViewJoinFullViaFileSink(s, dir)),

    // SCD2 temporal build: each purchase becomes a validity interval
    // [ts, next ts) per user via ONE keyed window lead() — the
    // slowly-changing-dimension shape every warehouse derives from an
    // event stream. Integer/timestamp-only, no FP anywhere.
    "events_scd2" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.load(s, dir, "events").filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"),
          lead(col("ts"), 1).over(w).as("next_ts"))
        .select(col("user_id"), col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("valid_from"),
          date_format(col("next_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("valid_to"),
          col("next_ts").isNull.as("is_current"))
        .orderBy("user_id", "valid_from", "event_id")
    }),

    // SCD2 dimension lookup: each VIEW joins the purchase version
    // valid at its instant — the warehouse fact→dimension-version
    // pattern, composed from the SCD2 build (lead() intervals) and the
    // keyed binned range join (user_id as equi-key, day-sized time
    // bins; the open current version capped past max view time so its
    // bin replication stays bounded). One window shuffle + one
    // equi-join — no as-of machinery needed once intervals exist.
    "events_scd2_lookup" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val w = Window.partitionBy("dim_user").orderBy(col("pts"), col("dim_event_id"))
      val dayUs = 86400L * 1000 * 1000
      val cap = ev.agg(max(unix_micros(col("ts").cast("timestamp"))))
        .head.getLong(0) + 1
      val dims = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("dim_user"), col("event_id").as("dim_event_id"),
          unix_micros(col("ts").cast("timestamp")).as("pts"))
        .select(col("dim_user").as("user_id"), col("dim_event_id"),
          col("pts").as("lo"),
          coalesce(lead(col("pts"), 1).over(w), lit(cap)).as("hi"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_id"),
          unix_micros(col("ts").cast("timestamp")).as("vt"))
      graft.ops.RangeJoin.pointInInterval(views, dims, "vt", "lo", "hi",
          binWidth = dayUs.toDouble, extraKeys = Seq("user_id"))
        .select(col("user_id"), col("view_id"), col("dim_event_id"))
        .orderBy("user_id", "view_id", "dim_event_id")
    }),

    // Batch gap-sessionization (the batch twin of
    // events_sessionize_stream's custom state): new-session flag from
    // a lag() gap test, session number from the running sum of flags —
    // two passes of the SAME keyed window, one shuffle total. 30-min
    // gap; durations in whole seconds (integer millis DIV — no FP).
    "events_sessionize_batch" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      // cast NTZ→TIMESTAMP before unix_millis: regenerated parquet (sf1,
      // real deployments) types ts as TIMESTAMP_NTZ, which unix_millis
      // rejects; the session timezone is pinned UTC so the cast is
      // value-stable across fixtures
      val flagged = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"),
          when(lag(col("ts"), 1).over(w).isNull ||
              unix_millis(col("ts").cast("timestamp")) -
                unix_millis(lag(col("ts"), 1).over(w).cast("timestamp")) > 1800000L,
            1L).otherwise(0L).as("new_sess"))
      flagged.withColumn("sess_no", sum(col("new_sess")).over(w))
        .groupBy("user_id", "sess_no")
        .agg(count(lit(1)).as("n_events"),
          ((unix_millis(max(col("ts")).cast("timestamp")) -
            unix_millis(min(col("ts")).cast("timestamp")))
            .divide(lit(1000))).cast("long").as("duration_sec"))
        .orderBy("user_id", "sess_no")
    }),

    // As-of join (most-recent-prior view per purchase, per user) —
    // the timeseries operator Spark lacks natively, composed as a
    // union + keyed carry-forward window (ops/AsOf.scala). Views
    // dedupe to max event_id per (user, ts) first: ASOF tie-breaking
    // among equal timestamps is engine-defined, so the right side must
    // be unique per instant for a bit-stable oracle.
    "events_asof_join" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts").as("vts"))
        .agg(max(col("event_id")).as("view_event_id"))
      graft.ops.AsOf.joinAsOf(purchases, views, "user_id", "ts", "vts",
          Seq("view_event_id"))
        .select(col("user_id"), col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts"),
          col("view_event_id"))
        .orderBy("user_id", "event_id")
    }),

    // As-of with a 1-hour tolerance (pandas merge_asof(tolerance)):
    // the most-recent-prior view still wins, but a match older than
    // the bound is nulled — a stale observation is not a match.
    "events_asof_tolerance" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts").as("vts"))
        .agg(max(col("event_id")).as("view_event_id"))
      // NTZ-safe: cast before unix_micros (see events_sessionize_batch)
      graft.ops.AsOf.joinAsOfWithin(purchases, views, "user_id", "ts", "vts",
          Seq("view_event_id"),
          (lt, rt) => unix_micros(lt.cast("timestamp")) -
            unix_micros(rt.cast("timestamp")) <= 3600L * 1000 * 1000)
        .select(col("user_id"), col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts"),
          col("view_event_id"))
        .orderBy("user_id", "event_id")
    }),

    // Forward as-of (next view at-or-after each purchase) — the mirror
    // direction, same one-shuffle construction traversed descending;
    // DuckDB's native ASOF with vts >= ts is the independent check.
    "events_asof_forward" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts").as("vts"))
        .agg(max(col("event_id")).as("view_event_id"))
      graft.ops.AsOf.joinAsOfForward(purchases, views, "user_id", "ts", "vts",
          Seq("view_event_id"))
        .select(col("user_id"), col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts"),
          col("view_event_id"))
        .orderBy("user_id", "event_id")
    }),

    // As-of join null-timestamp lock: ~1/7 of right rows get a NULL
    // vts (deterministic on view_event_id), and ASOF semantics say a
    // null timestamp can never be a most-recent-prior match. Pinned by
    // DuckDB's native ASOF JOIN (null never satisfies vts <= ts); the
    // pre-fix carry-forward window instead sorted nulls FIRST and bled
    // their payload into left rows with no genuine prior match.
    "events_asof_nulls" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("view_event_id"))
        .select(col("user_id"),
          when(pmod(col("view_event_id"), lit(7)) === 0, lit(null))
            .otherwise(col("ts")).as("vts"),
          col("view_event_id"))
      graft.ops.AsOf.joinAsOf(purchases, views, "user_id", "ts", "vts",
          Seq("view_event_id"))
        .select(col("user_id"), col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts"),
          col("view_event_id"))
        .orderBy("user_id", "event_id")
    }),

    // Nearest as-of (merge_asof direction='nearest'): the closer of
    // the prior and next view wins, ties backward. Completes the
    // direction family; still ONE shuffle — both carry directions are
    // windows over the same key partitioning. Oracle composes DuckDB's
    // backward and forward native ASOF joins with the same tie rule.
    "events_asof_nearest" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts").as("vts"))
        .agg(max(col("event_id")).as("view_event_id"))
      graft.ops.AsOf.joinAsOfNearest(purchases, views, "user_id", "ts", "vts",
          Seq("view_event_id"))
        .select(col("user_id"), col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts"),
          col("view_event_id"))
        .orderBy("user_id", "event_id")
    }),

    // §2.13 custom TypedImperativeAggregate: KMV distinct-count sketch
    // (k smallest distinct keyed-md5 hashes; O(k) state per group at
    // any scale) next to the exact count it approximates. The sketch
    // is integer-deterministic, so the oracle reproduces the ESTIMATE
    // bit-for-bit — a correctness gate no HLL-based approx could pass.
    "kmv_distinct_segments" -> ((s, dir) => {
      import graft.functions.{F, KmvDistinct}
      val h = conv(substring(md5(concat(col("c_custkey").cast("string"),
        lit(":kmv"))), 1, 15), 16, 10).cast("long")
      Tables.load(s, dir, "customer")
        .select(col("c_mktsegment"), col("c_custkey"), h.as("h"))
        .groupBy("c_mktsegment")
        .agg(count_distinct(col("c_custkey")).as("n_exact"),
          F.toColumn(KmvDistinct(F.toExpr(col("h")), 64)
            .toAggregateExpression()).as("n_kmv"))
        .orderBy("c_mktsegment")
    }),

    // KMV SET ALGEBRA — segment audience overlap from two mergeable
    // sketches (functions.KmvSketch): est(∪) from the combined min-k,
    // est(∩) = (matching fraction of the union sketch) × est(∪). Each
    // segment costs O(k) state however many users it has; the exact
    // intersection rides along as the audit column. 40-bit hash space
    // so every estimator step stays in exact long arithmetic
    // ((k−1)·2⁴⁰ ≈ 6.9e13 — the 60-bit space would force decimal
    // division and its cross-engine rounding hazards).
    "kmv_segment_overlap" -> ((s, dir) => {
      import graft.functions.{F, KmvSketch}
      val h = conv(substring(md5(concat(col("user_id").cast("string"),
        lit(":kvo"))), 1, 10), 16, 10).cast("long")
      val ev = Tables.load(s, dir, "events")
      val sk = ev.filter(col("event_type").isin("purchase", "view"))
        .select(col("event_type"), h.as("h"))
        .groupBy("event_type")
        .agg(F.toColumn(KmvSketch(F.toExpr(col("h")), 64)
          .toAggregateExpression()).as("sk"))
      val a = sk.filter(col("event_type") === "purchase").select(col("sk").as("ska"))
      val b = sk.filter(col("event_type") === "view").select(col("sk").as("skb"))
      val exact = ev.filter(col("event_type") === "purchase")
        .select("user_id").distinct()
        .join(ev.filter(col("event_type") === "view")
          .select("user_id").distinct(), "user_id")
        .agg(count(lit(1)).as("n_exact_inter"))
      a.crossJoin(b).crossJoin(exact) // three 1-row sides
        .withColumn("ku", expr("slice(array_sort(array_union(ska, skb)), 1, 64)"))
        .withColumn("nk", size(col("ku")))
        .withColumn("hk", expr("element_at(ku, nk)"))
        .withColumn("est_union", when(col("nk") < 64, col("nk").cast("long"))
          .otherwise(expr("63 * 1099511627776 DIV hk")))
        .withColumn("rho", expr(
          "size(filter(ku, x -> array_contains(ska, x) AND array_contains(skb, x)))"))
        .withColumn("est_inter", expr("rho * est_union DIV nk"))
        .select(col("n_exact_inter"), col("rho").cast("long").as("rho"),
          col("est_union"), col("est_inter"))
    }),

    // §2.13 quantile sketch sibling of kmv_distinct: deterministic
    // hash-min-k row sample per group (O(k) state, mergeable capped
    // set union), nearest-rank quantiles over the sample's values in
    // exact integer math. Every group exceeds k=256 even at sf0.001,
    // so the capped-sample path is what's gated.
    "kmv_quantiles_price" -> ((s, dir) => {
      import graft.functions.{F, KmvQuantiles}
      val h = conv(substring(md5(concat(col("o_orderkey").cast("string"),
        lit(":kq"))), 1, 15), 16, 10).cast("long")
      val v = floor(col("o_totalprice") * 100).cast("long")
      Tables.load(s, dir, "orders")
        .select(col("o_orderpriority"), h.as("h"), v.as("v"))
        .groupBy("o_orderpriority")
        .agg(F.toColumn(KmvQuantiles(F.toExpr(col("h")), F.toExpr(col("v")),
          256, Seq(0.25, 0.5, 0.75)).toAggregateExpression()).as("ps"))
        .select(col("o_orderpriority"),
          element_at(col("ps"), 1).as("p25_cents"),
          element_at(col("ps"), 2).as("p50_cents"),
          element_at(col("ps"), 3).as("p75_cents"))
        .orderBy("o_orderpriority")
    }),

    // O1 multi-key sort + O2 limit (the notices query shape:
    // orderBy pinned desc, createdAt desc limit 50).
    "multikey_sort_limit" -> ((s, dir) =>
      Tables.load(s, dir, "events")
        .select(col("event_id"), col("event_type"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts"))
        .orderBy(desc("event_type"), desc("ts"), asc("event_id"))
        .limit(50)),

    // O4: deterministic "shuffle" — rank by a keyed hash instead of
    // Math.random() so retries/oracle agree (same divergence rationale
    // as the masking functions). Ranked via Rank.globalRowNumber
    // (range-partitioned sort + partition offsets), not a partitionless
    // window — the window variant funnels the whole table through one
    // task at scale.
    "shuffle_rank" -> ((s, dir) => {
      val hashed = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), md5(col("c_custkey").cast("string")).as("h"))
      graft.ops.Rank.globalRowNumber(hashed, Seq(col("h"), col("c_custkey")))
        .select("c_custkey", "rn")
        .orderBy("c_custkey")
    }),

    // P1: union-of-keys schema merge — columns missing on one side
    // become '' (reference unionKeys + defval '').
    "union_schema_merge" -> ((s, dir) => {
      val a = Tables.load(s, dir, "customer")
        .select(col("c_name").as("name"), col("c_mktsegment").as("segment"),
          lit("customer").as("side"))
      val b = Tables.load(s, dir, "supplier")
        .select(col("s_name").as("name"), lit("supplier").as("side"))
      a.unionByName(b, allowMissingColumns = true)
        .na.fill("", Seq("segment"))
        .orderBy("side", "name")
    }),

    // A5 basic distinct.
    "distinct_mktsegments" -> ((s, dir) =>
      Tables.load(s, dir, "customer").select("c_mktsegment").distinct()
        .orderBy("c_mktsegment")),

    // Range (point-in-interval) join via binned equi-join
    // (ops/RangeJoin.scala): overlapping price bands × orders. The
    // naive plan is BroadcastNestedLoopJoin (cross × filter); the
    // binned form is a plain hash join keyed on floor(price/width),
    // which survives an interval side too big to broadcast.
    "range_join_bands" -> ((s, dir) => {
      val bands = s.range(20).select(col("id").as("band"),
        (col("id") * 25000.0).as("lo"), (col("id") * 25000.0 + 40000.0).as("hi"))
      val pts = Tables.load(s, dir, "orders").select("o_orderkey", "o_totalprice")
      graft.ops.RangeJoin.pointInInterval(pts, bands, "o_totalprice", "lo", "hi",
          binWidth = 25000.0)
        .groupBy("band")
        .agg(count(lit(1)).as("n_orders"), dsum("o_totalprice").as("sum_price"))
        .orderBy("band")
    }),

    // Interval × interval overlap join (ops/RangeJoin.intervalOverlap):
    // price-similarity pairs within a brand — parts whose ±5 price
    // windows overlap (⇔ |Δprice| < 10). The naive plan is a per-brand
    // cross × inequality filter (BNL); the binned form is a hash join
    // on (bin, brand), each pair deduped by the overlap-start bin
    // predicate instead of a distinct shuffle. The brand extra-key
    // keeps a dense price range entity-local, never corpus-quadratic.
    "range_join_overlap" -> ((s, dir) => {
      val p = Tables.load(s, dir, "part").filter(col("p_size") <= 10)
      val a = p.select(col("p_partkey").as("a_key"), col("p_brand"),
        (col("p_retailprice") - 5.0).as("a_lo"), (col("p_retailprice") + 5.0).as("a_hi"))
      val b = p.select(col("p_partkey").as("b_key"), col("p_brand"),
        (col("p_retailprice") - 5.0).as("b_lo"), (col("p_retailprice") + 5.0).as("b_hi"))
      graft.ops.RangeJoin.intervalOverlap(
          a, b, "a_lo", "a_hi", "b_lo", "b_hi", binWidth = 10.0,
          extraKeys = Seq("p_brand"))
        .filter(col("a_key") < col("b_key"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_pairs"),
          dsum2(greatest(col("b_lo"), col("a_lo")) - least(col("b_lo"), col("a_lo"))).as("sum_gap"))
        .orderBy("p_brand")
    }),

    // Hierarchical aggregate: ROLLUP + grouping_id — one shuffle
    // computes all levels (Expand feeds a single hash aggregate).
    "agg_rollup" -> ((s, dir) =>
      Tables.load(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(grouping_id().as("gid"), dsum("l_quantity").as("sum_qty"),
          count(lit(1)).as("n"))
        .select("l_returnflag", "l_linestatus", "gid", "sum_qty", "n")
        .orderBy("gid", "l_returnflag", "l_linestatus")),

    // CUBE sibling of the rollup: all 2^n grouping combinations from
    // the same Expand-into-one-hash-aggregate plan — the (flag)-only
    // and (status)-only marginals rollup can't produce. Still ONE
    // shuffle regardless of the number of grouping sets.
    "agg_cube" -> ((s, dir) =>
      Tables.load(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(grouping_id().as("gid"), dsum("l_quantity").as("sum_qty"),
          count(lit(1)).as("n"))
        .select("l_returnflag", "l_linestatus", "gid", "sum_qty", "n")
        .orderBy("gid", "l_returnflag", "l_linestatus")),

    // Explicit GROUPING SETS — the two DISJOINT marginals ((flag),
    // (status)) that neither rollup (hierarchical) nor this pair's
    // cube (which adds the cross and grand total) would emit alone.
    // Same Expand-into-one-hash-aggregate plan, one shuffle.
    "agg_grouping_sets" -> ((s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupingSets(Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
          col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().as("gid"), dsum("l_quantity").as("sum_qty"),
          count(lit(1)).as("n"))
        .select("l_returnflag", "l_linestatus", "gid", "sum_qty", "n")
        .orderBy("gid", "l_returnflag", "l_linestatus")),

    // Window navigation surface: first/last/nth over the full-frame
    // per-user window — one row per user (rn = 1 off the same sort),
    // so the gate output is |users|-bounded at any sf.
    "window_navigation" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.load(s, dir, "events")
        .select(col("user_id"),
          row_number().over(w).as("rn"),
          first(col("event_type")).over(wf).as("first_type"),
          last(col("event_type")).over(wf).as("last_type"),
          nth_value(col("event_type"), 2).over(wf).as("second_type"),
          count(lit(1)).over(wf).as("n_events"))
        .filter(col("rn") === 1).drop("rn")
        .orderBy("user_id")
    }),

    // Market-basket association: distinct (order, part), per-order
    // self-join bounded by items-per-order (≤21 pairs from 7 lines),
    // pair support + integer fixed-point lift against the part
    // marginals. Top-50 by support with a total tiebreak.
    "market_basket_pairs" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .groupBy("ok", "pk").agg(count(lit(1)).as("_n")).drop("_n")
      val nOrders = li.select("ok").distinct().count()
      val pc = li.groupBy("pk").agg(count(lit(1)).as("np"))
      val a = li.select(col("ok"), col("pk").as("part_a"))
      val b = li.select(col("ok"), col("pk").as("part_b"))
      a.join(b, Seq("ok"))
        .filter(col("part_a") < col("part_b"))
        .groupBy("part_a", "part_b").agg(count(lit(1)).as("n_ab"))
        .join(pc.withColumnRenamed("pk", "part_a")
          .withColumnRenamed("np", "na"), Seq("part_a"))
        .join(pc.withColumnRenamed("pk", "part_b")
          .withColumnRenamed("np", "nb"), Seq("part_b"))
        .withColumn("lift_x1e4",
          expr(s"n_ab * ${nOrders}L * 10000L div (na * nb)"))
        .select("part_a", "part_b", "n_ab", "lift_x1e4")
        .orderBy(desc("n_ab"), asc("part_a"), asc("part_b"))
        .limit(50)
    }),

    // TPC-H Q3 shape: segment-filtered customers ⋈ unshipped orders ⋈
    // future-shipping lineitems, revenue = Σ price·(1−discount) as an
    // EXACT ×1e4 integer (cents × (100 − disc_pct) — no float sum
    // crosses the boundary). Filters sit on every scan (pushed), the
    // segment side reduces before the join, top-10 is
    // TakeOrderedAndProject.
    "tpch_q3_priority" -> ((s, dir) => {
      val cutoff = lit("1998-01-01").cast("timestamp")
      val c = Tables.load(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      val l = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") > cutoff)
        .select(col("l_orderkey"),
          (floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long") *
            (lit(100L) - floor(col("l_discount") * 100 + lit(0.5)).cast("long")))
            .as("rev_x1e4"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          col("o_orderpriority"))
        .agg(sum(col("rev_x1e4")).as("revenue_x1e4"))
        .orderBy(desc("revenue_x1e4"), asc("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5 shape: five-way star join — local (customer-nation =
    // supplier-nation) 1996 revenue per ASIA nation. The region→nation
    // slice broadcasts (25 rows); the nationkey equality filters the
    // supplier join; facts shuffle once per key.
    "tpch_q5_region_volume" -> ((s, dir) => {
      val asia = Tables.load(s, dir, "nation")
        .join(Tables.load(s, dir, "region"),
          col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .select(col("n_nationkey"), col("n_name"))
      val c = Tables.load(s, dir, "customer").select("c_custkey", "c_nationkey")
      val sup = Tables.load(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val o = Tables.load(s, dir, "orders")
        .filter(year(col("o_orderdate")) === 1996)
        .select("o_orderkey", "o_custkey")
      val l = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"),
          (floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long") *
            (lit(100L) - floor(col("l_discount") * 100 + lit(0.5)).cast("long")))
            .as("rev_x1e4"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(sup, l("l_suppkey") === sup("s_suppkey") &&
          col("c_nationkey") === sup("s_nationkey"))
        .join(broadcast(asia), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("rev_x1e4")).as("revenue_x1e4"))
        .orderBy(desc("revenue_x1e4"), asc("n_name"))
    }),

    // RFM segmentation: per-customer (recency, frequency, monetary)
    // quartile codes via the scale-safe ntile assignment (three rank
    // passes over the |customers| aggregate, never the fact table),
    // counted per 3-digit cell.
    "customer_rfm" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .select(col("o_custkey"), to_date(col("o_orderdate")).as("d"),
          floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("p_c"))
      val per = o.groupBy("o_custkey")
        .agg(max(col("d")).as("last_d"), count(lit(1)).as("freq"),
          sum(col("p_c")).as("monetary_c"))
      val maxD = per.agg(max(col("last_d")).as("mxd"))
      val withR = per.join(broadcast(maxD))
        .withColumn("recency_days", datediff(col("mxd"), col("last_d")).cast("long"))
      graft.ops.Stats.rfmSegments(withR, "o_custkey", "recency_days",
          "freq", "monetary_c", k = 4)
        .orderBy("rfm_code")
    }),

    // ABC / Pareto classification of suppliers by exact ×1e4 revenue:
    // cumulative-share classes (A ≤ 80 %, B ≤ 95 %, C rest) summarized
    // per class.
    "supplier_abc" -> ((s, dir) => {
      val per = Tables.load(s, dir, "lineitem")
        .groupBy(col("l_suppkey"))
        .agg(sum(floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long") *
            (lit(100L) - floor(col("l_discount") * 100 + lit(0.5)).cast("long")))
          .as("rev"))
      graft.ops.Stats.abcClassify(per, "l_suppkey", "rev")
        .groupBy("abc_class")
        .agg(count(lit(1)).as("n_suppliers"), sum(col("rev")).as("revenue_x1e4"))
        .orderBy("abc_class")
    }),

    // Existence joins — the reference derives added/deleted classes
    // from its full-outer diff (SURVEY §2.4); here they are first-class
    // LEFT SEMI / LEFT ANTI plans. The probe side streams; the build
    // side is the filtered orders projection (one column), so the
    // hash table holds keys only — at 100 TB the filter and the
    // single-column projection push into the parquet scan and the
    // join never materializes non-key order columns.
    "join_semi_urgent" -> ((s, dir) => {
      val urgent = Tables.load(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
      Tables.load(s, dir, "customer")
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n_customers"))
        .orderBy("c_mktsegment")
    }),
    "join_anti_urgent" -> ((s, dir) => {
      val urgent = Tables.load(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
      Tables.load(s, dir, "customer")
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n_customers"))
        .orderBy("c_mktsegment")
    }),

    // Fuzzy (edit-distance) join — ops/Fuzzy.editJoin: a dirty batch
    // of corrupted names (last char -> 'X') linked back to the master
    // table within Levenshtein 1. SymSpell deletion-variant candidates
    // make it ONE equi-join shuffle; the exact levenshtein confirms
    // candidates only. The naive plan (DuckDB's, and Catalyst's if
    // asked directly) is a nested-loop over |master|x|dirty|.
    "fuzzy_join_names" -> ((s, dir) => {
      val cust = Tables.load(s, dir, "customer").filter(col("c_nationkey") === 7)
      val master = cust.select(col("c_custkey").as("a_key"), col("c_name").as("a_name"))
      val dirty = cust.filter(col("c_custkey") % 3 === 0)
        .select(col("c_custkey").as("b_key"),
          concat(expr("substring(c_name, 1, length(c_name)-1)"), lit("X")).as("b_name"))
      graft.ops.Fuzzy.editJoin(master, dirty, "a_name", "b_name", 1)
        .groupBy("b_key")
        .agg(count(lit(1)).as("n_matches"), min("a_key").as("min_a_key"),
          sum(levenshtein(col("a_name"), col("b_name"))).as("sum_dist"))
        .orderBy("b_key")
    }),

    // Sorted-neighborhood ER blocking (Fuzzy.sortedNeighborhood,
    // Hernández–Stolfo): TWO passes — raw name and reversed name — so
    // a prefix-block boundary in one pass is interior in the other
    // (the published multi-pass answer to distributed SNM), union of
    // window candidates, exact levenshtein ≤ 1 verification, canonical
    // (a < b) dedup. Same master + dirty-copies fixture as the
    // deletion-variant join, a different candidate generator.
    "er_sorted_neighborhood" -> ((s, dir) => {
      val cust = Tables.load(s, dir, "customer")
        .filter(col("c_nationkey") === 7)
        .select(col("c_custkey").as("k"), col("c_name").as("v"))
      val recs = cust.unionAll(cust.filter(col("k") % 3 === 0)
        .select((col("k") + 100000).as("k"),
          concat(expr("substring(v, 1, length(v)-1)"), lit("X")).as("v")))
      val p1 = graft.ops.Fuzzy.sortedNeighborhood(recs, "k", "v", 5, 4)
      val p2 = graft.ops.Fuzzy.sortedNeighborhood(
        recs.select(col("k"), reverse(col("v")).as("v")), "k", "v", 5, 4)
      p1.unionAll(p2)
        .select(least(col("a_key"), col("b_key")).as("a"),
          greatest(col("a_key"), col("b_key")).as("b"),
          levenshtein(col("a_val"), col("b_val")).as("dist"))
        .filter(col("dist") <= 1)
        .distinct()
        .orderBy("a", "b")
    }),

    // Pivot with an explicit value list (never the implicit-distinct
    // variant — that one runs a blocking distinct job before planning,
    // a driver round-trip you don't want at 100 TB). Missing cells are
    // 0 to match the oracle's FILTER counts.
    "pivot_event_types" -> ((s, dir) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      Tables.load(s, dir, "events")
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
        .na.fill(0, types)
        .orderBy("day")
    }),

    // Analytic-function breadth on a properly keyed window (never a
    // partitionless orderBy — that funnels the table through one
    // task): row_number / lag / lead / ntile per customer, ordered by
    // a deterministic (date, key) pair.
    "window_suite" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.load(s, dir, "orders").select(
        col("o_orderkey"), col("o_custkey"),
        row_number().over(w).cast("long").as("rn"),
        lag("o_totalprice", 1).over(w).as("prev_price"),
        lead("o_totalprice", 1).over(w).as("next_price"),
        ntile(4).over(w).cast("long").as("quartile"))
        .orderBy("o_custkey", "rn")
    }),

    // Exact interpolated percentiles (Spark `percentile`, a single
    // partial+final aggregate — no sort job). ONE array-percentage
    // call, not three scalar ones: each scalar percentile(…) is its
    // own aggregate function with its own per-group value buffer, so
    // the three-expression form built and merged the (value → count)
    // map three times (measured 3.1 s → 1.5 s at sf0.1; values
    // bit-identical, same interpolation from the same buffer).
    // Crossing the oracle boundary as scale4 fixed-point longs absorbs
    // the two engines' ulp-level interpolation differences.
    "agg_percentiles" -> ((s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(expr("percentile(l_extendedprice, array(0.25D, 0.5D, 0.95D))").as("ps"))
        .select(col("l_returnflag"),
          graft.functions.F.scale4(element_at(col("ps"), 1)).as("p25"),
          graft.functions.F.scale4(element_at(col("ps"), 2)).as("p50"),
          graft.functions.F.scale4(element_at(col("ps"), 3)).as("p95"))
        .orderBy("l_returnflag")),

    // Equi-depth feature binning (the quantile bucketizer): global
    // quartile boundaries come from ONE percentile aggregate (a 1-row
    // result broadcast back), facts bucketize with a narrow integer
    // CASE — never an ntile window over the corpus, which would be a
    // global sort at scale. Boundaries cross engines as scale4
    // integers (×1e4) and values as cents×100, so the bin compare is
    // integer-exact — no interpolation-ULP flake at bin edges.
    "features_quantile_bins" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_extendedprice"),
          floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long").as("price_c"))
      val bounds = li.agg(
        expr("percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D))").as("ps"))
        .select(
          graft.functions.F.scale4(element_at(col("ps"), 1)).as("q1"),
          graft.functions.F.scale4(element_at(col("ps"), 2)).as("q2"),
          graft.functions.F.scale4(element_at(col("ps"), 3)).as("q3"))
      li.crossJoin(broadcast(bounds))
        .select(col("l_returnflag"), col("price_c"),
          when(col("price_c") * 100 <= col("q1"), 1)
            .when(col("price_c") * 100 <= col("q2"), 2)
            .when(col("price_c") * 100 <= col("q3"), 3)
            .otherwise(4).as("bin"))
        .groupBy("l_returnflag", "bin")
        .agg(count(lit(1)).as("n"), sum(col("price_c")).as("sum_c"))
        .orderBy("l_returnflag", "bin")
    }),

    // §2.13 sketch surface, join-pruning form: bloom_build aggregates
    // the SMALL side's keys (partial merge = bitwise OR), the few-KB
    // filter lands on the driver and probes the BIG side as a LITERAL
    // scan filter before the shuffle — at 100 TB the rows that can't
    // join never leave their scan partition. (A crossJoin-with-one-row
    // formulation lets Catalyst hoist the probe above the join —
    // PlanShapeSpec locks the scan-side placement.) False positives
    // pass through to the exact semi-join, so results (and the oracle:
    // the plain semi-join) are unchanged.
    "bloom_prefilter_join" -> ((s, dir) => {
      import graft.functions.Bloom
      val hot = Tables.load(s, dir, "orders")
        .filter(col("o_totalprice") > 400000.0).select("o_custkey")
      val bf = Bloom.buildFilter(hot, "o_custkey", numBits = 1 << 16, numHashes = 5)
      val pre = Tables.load(s, dir, "customer")
        .filter(Bloom.mightContain(bf, col("c_custkey")))
      val hotD = hot.distinct()
      pre.join(hotD, pre("c_custkey") === hotD("o_custkey"), "left_semi")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_customers"), dsum("c_acctbal").as("sum_bal"))
        .orderBy("c_mktsegment")
    }),

    // Bucketed co-located join: both sides pre-hashed into the same 8
    // buckets on the join key at WRITE time, so the join itself plans
    // with zero Exchange operators (PlanShapeSpec locks this). The
    // at-scale contract: pay the shuffle once when the table lands,
    // amortize it over every subsequent join on that key.
    "join_bucketed_colocated" -> ((s, dir) => {
      // per-run scratch + table token: concurrent harness runs on one
      // machine must not collide on paths or catalog names
      val scratch = graft.core.Scratch.dir("graft_bucketed").toString
      val tok = graft.core.Scratch.token()
      graft.ops.Bucketing.writeBucketed(
        Tables.load(s, dir, "orders").select("o_orderkey", "o_orderpriority"),
        s"graft_orders_bkt_$tok", s"$scratch/orders", 8, "o_orderkey")
      graft.ops.Bucketing.writeBucketed(
        Tables.load(s, dir, "lineitem")
          .select(col("l_orderkey").as("o_orderkey"), col("l_extendedprice")),
        s"graft_lineitem_bkt_$tok", s"$scratch/lineitem", 8, "o_orderkey")
      graft.ops.Bucketing.colocatedJoin(s,
        s"graft_orders_bkt_$tok", s"graft_lineitem_bkt_$tok", "o_orderkey")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"), dsum("l_extendedprice").as("sum_price"))
        .orderBy("o_orderpriority")
    }),

    // Hive-style partition pruning: events laid out as
    // event_type=<v>/... at write time, so the predicate on the
    // partition column never touches the other partitions' files AT
    // PLANNING TIME (PartitionFilters in the scan — locked by
    // PlanShapeSpec). At 100 TB this is the difference between
    // scanning one directory and scanning the lake; the agg result is
    // oracle-identical to filtering the unpartitioned table.
    "scan_partition_pruned" -> ((s, dir) => {
      val out = graft.core.Scratch.dir("graft_part")
        .resolve("events_by_type").toString
      Tables.load(s, dir, "events")
        .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
        .write.mode("overwrite").partitionBy("event_type").parquet(out)
      s.read.parquet(out)
        .filter(col("event_type") === "purchase")
        .groupBy("day")
        .agg(count(lit(1)).as("n"), dsum("value").as("total_value"))
        .orderBy("day")
    }),

    // Null-skew guard: in a LEFT join over a nullable key, null keys
    // can never match — yet an unguarded plan still ships them
    // through the shuffle, where they all hash to ONE partition (the
    // classic null-hot-spot). Segregate: the not-null slice joins,
    // the null slice takes a NARROW null-padded branch that never
    // touches the exchange, and a union reassembles LEFT semantics
    // exactly. PlanShapeSpec locks the isnotnull filter + Union.
    "join_null_skew_guard" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events").select(
        when(col("event_id") % 5 === 0, lit(null).cast("long"))
          .otherwise(col("user_id")).as("k"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("v_c"))
      val dim = Tables.load(s, dir, "customer")
        .filter(col("c_custkey") < 100)
        .select(col("c_custkey").as("k"), col("c_mktsegment"))
      val matched = e.filter(col("k").isNotNull).join(dim, Seq("k"), "left")
      val nulls = e.filter(col("k").isNull)
        .withColumn("c_mktsegment", lit(null).cast("string"))
      matched.unionByName(nulls)
        .groupBy(coalesce(col("c_mktsegment"), lit("<unmatched>")).as("segment"))
        .agg(count(lit(1)).as("n_events"), sum(col("v_c")).as("value_c"))
        .orderBy("segment")
    }),

    // Explicit join-strategy control: a dim too big to broadcast
    // safely at 100 TB but small enough to hash per partition — the
    // SHUFFLE_HASH hint skips BOTH the broadcast OOM risk AND the
    // sort-merge join's double sort (the strategy Spark picks
    // unhinted once the dim passes the broadcast threshold).
    // PlanShapeSpec locks the ShuffledHashJoin.
    "join_shuffle_hash_hint" -> ((s, dir) => {
      val c = Tables.load(s, dir, "customer")
        .select("c_custkey", "c_mktsegment").hint("SHUFFLE_HASH")
      val o = Tables.load(s, dir, "orders")
        .select(col("o_custkey"),
          floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("p_c"))
      o.join(c, col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"), sum(col("p_c")).as("revenue_c"))
        .orderBy("c_mktsegment")
    }),

    // DYNAMIC partition pruning: the fact side is partitioned by
    // order year, the dim side's surviving years are only known at
    // RUNTIME (a filter on nation derives them), and Catalyst injects
    // the dim's year set into the fact scan's partition filters as a
    // dynamicpruning subquery — so the fact scan reads only the
    // partitions the join can use, without any static predicate. The
    // static sibling is scan_partition_pruned; PlanShapeSpec locks the
    // dynamicpruningexpression in this plan.
    "scan_dpp_join" -> ((s, dir) => {
      val out = graft.core.Scratch.dir("graft_dpp")
        .resolve("orders_by_year").toString
      Tables.load(s, dir, "orders")
        .withColumn("o_year", year(col("o_orderdate")))
        .write.mode("overwrite").partitionBy("o_year").parquet(out)
      val fact = s.read.parquet(out)
        .select(col("o_year"),
          floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("rev_c"))
      val dim = Tables.load(s, dir, "nation")
        .filter(col("n_name").isin("NATION_14", "NATION_17"))
        .select((lit(1995) + col("n_nationkey") % 4).as("y"))
        .distinct()
      fact.join(dim, col("o_year") === col("y"))
        .groupBy("y")
        .agg(count(lit(1)).as("n_orders"), sum(col("rev_c")).as("rev_c"))
        .orderBy("y")
    }),

    // Z-order clustering: events rewritten ordered along a Morton
    // curve over (day-of-month, hour-of-day), so every output file's
    // min/max footer covers a small RECTANGLE of the 2-D plane and a
    // box predicate skips most files (ZOrderSpec measures the skip
    // rate vs a shuffled layout). The query itself is the box
    // aggregate, oracle-identical to filtering the raw table — the
    // layout changes cost, never answers.
    // File-skipping manifest (ops/FileIndex): orders range-clustered
    // on o_orderkey into 16 files + a per-file min/max index; the read
    // consults ONLY the manifest to drop files outside the key range
    // (FileIndexSpec locks that most files are skipped), then applies
    // the residual predicate. Oracle recomputes from the original.
    "fileindex_pruned_scan" -> ((s, dir) => {
      val out = graft.core.Scratch.dir("graft_fidx").resolve("orders").toString
      graft.ops.FileIndex.writeIndexed(
        Tables.load(s, dir, "orders")
          .select("o_orderkey", "o_orderstatus", "o_totalprice"),
        out, "o_orderkey", partitions = 16)
      graft.ops.FileIndex.readPruned(s, out, lit(1000L), lit(5000L))
        .filter(col("o_orderkey").between(1000L, 5000L))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), dsum("o_totalprice").as("total"))
        .orderBy("o_orderstatus")
    }),
    // Index an EXISTING table from parquet FOOTERS only — the
    // metadata-cost manifest builder: stats come from row-group
    // headers (KBs per file, read in executor tasks), never a second
    // data pass. The pruned aggregate must equal the plain filtered
    // aggregate, proving the footer lo/hi agree with the bytes on
    // disk; FileIndexSpec separately audits the manifest itself
    // (row-group row counts sum to the table count, lo/hi match a
    // recomputed per-file min/max).
    "fileindex_footer_scan" -> ((s, dir) => {
      val out = graft.core.Scratch.dir("graft_ffoot").resolve("orders").toString
      Tables.load(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .repartitionByRange(16, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey")
        .write.mode("overwrite").parquet(out)
      graft.ops.FileIndex.readFooterPruned(s, out, "o_orderkey", 1000L, 5000L)
        .filter(col("o_orderkey").between(1000L, 5000L))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), dsum("o_totalprice").as("total"))
        .orderBy("o_orderstatus")
    }),
    // Point lookup on a NON-cluster column via the per-file bloom
    // manifest: orders laid out by o_orderkey, looked up by o_custkey
    // — min/max can't prune that, the bloom can. The oracle is the
    // plain filter (bloom pruning is result-invariant: false
    // positives only admit files the residual filter then empties).
    "fileindex_bloom_scan" -> ((s, dir) => {
      val out = graft.core.Scratch.dir("graft_fbloom").resolve("orders").toString
      graft.ops.FileIndex.writeIndexedBloom(
        Tables.load(s, dir, "orders")
          .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"),
        out, "o_orderkey", "o_custkey", partitions = 16)
      graft.ops.FileIndex.readPrunedBloom(s, out, 97L)
        .filter(col("o_custkey") === 97L)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), dsum("o_totalprice").as("total"))
        .orderBy("o_orderstatus")
    }),
    "zorder_skipping" -> ((s, dir) => {
      import graft.functions.ZOrderKey
      val out = graft.core.Scratch.dir("graft_zorder")
        .resolve("events").toString
      val dims = Tables.load(s, dir, "events").select(
        dayofmonth(col("ts")).as("dom"), hour(col("ts")).as("hod"),
        col("event_type"), col("value"))
      dims.withColumn("zk", ZOrderKey(col("dom"), col("hod")))
        .repartitionByRange(8, col("zk"))
        .sortWithinPartitions("zk")
        .drop("zk")
        .write.mode("overwrite").parquet(out)
      s.read.parquet(out)
        .filter(col("dom").between(5, 10) && col("hod").between(6, 11))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), dsum("value").as("total_value"))
        .orderBy("event_type")
    }),
    // Hilbert-clustered layout + box scan: same write-sort-scan shape
    // as zorder_skipping but keyed by the Hilbert curve
    // (functions/Hilbert.scala) — no diagonal jumps, so consecutive
    // key ranges cover tighter rectangles and box predicates touch
    // fewer files at the same file count (HilbertSpec measures it).
    // Correctness is layout-independent: the oracle is the plain
    // filter aggregate.
    "hilbert_skipping" -> ((s, dir) => {
      import graft.functions.HilbertKey
      val out = graft.core.Scratch.dir("graft_hilbert")
        .resolve("events").toString
      val dims = Tables.load(s, dir, "events").select(
        dayofmonth(col("ts")).as("dom"), hour(col("ts")).as("hod"),
        col("event_type"), col("value"))
      dims.withColumn("hk", HilbertKey(col("dom"), col("hod")))
        .repartitionByRange(8, col("hk"))
        .sortWithinPartitions("hk")
        .drop("hk")
        .write.mode("overwrite").parquet(out)
      s.read.parquet(out)
        .filter(col("dom").between(12, 20) && col("hod").between(0, 5))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), dsum("value").as("total_value"))
        .orderBy("event_type")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "agg_lineitem_pricing" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${dsumSql("l_quantity")} AS sum_qty,
         |  ${dsumSql("l_extendedprice")} AS sum_price,
         |  count(*) AS n
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
         |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "join_orders_customer_segment" ->
      s"""SELECT c_mktsegment, count(*) AS n_orders, ${dsumSql("o_totalprice")} AS revenue
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "join_bucketed_colocated" ->
      s"""SELECT o_orderpriority, count(*) AS n_items, ${dsumSql("l_extendedprice")} AS sum_price
         |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "scan_partition_pruned" ->
      s"""SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
         |  count(*) AS n, ${dsumSql("value")} AS total_value
         |FROM events WHERE event_type = 'purchase'
         |GROUP BY 1 ORDER BY day""".stripMargin,
    // plain LEFT JOIN — the segregated union must be semantically
    // invisible
    "join_null_skew_guard" ->
      """WITH e AS (SELECT CASE WHEN event_id % 5 = 0 THEN NULL ELSE user_id END AS k,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS v_c FROM events),
        |d AS (SELECT c_custkey AS k, c_mktsegment FROM customer WHERE c_custkey < 100)
        |SELECT coalesce(d.c_mktsegment, '<unmatched>') AS segment,
        |  count(*) AS n_events, CAST(SUM(e.v_c) AS BIGINT) AS value_c
        |FROM e LEFT JOIN d ON e.k = d.k
        |GROUP BY 1 ORDER BY segment""".stripMargin,
    "join_shuffle_hash_hint" ->
      """SELECT c.c_mktsegment, count(*) AS n_orders,
        |  CAST(SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_c
        |FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        |GROUP BY 1 ORDER BY c_mktsegment""".stripMargin,
    "scan_dpp_join" ->
      """WITH dim AS (SELECT DISTINCT 1995 + n_nationkey % 4 AS y
        |  FROM nation WHERE n_name IN ('NATION_14', 'NATION_17'))
        |SELECT d.y, count(*) AS n_orders,
        |  CAST(SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_c
        |FROM orders o JOIN dim d ON year(o.o_orderdate) = d.y
        |GROUP BY 1 ORDER BY y""".stripMargin,
    "fileindex_pruned_scan" ->
      s"""SELECT o_orderstatus, count(*) AS n, ${dsumSql("o_totalprice")} AS total
         |FROM orders WHERE o_orderkey BETWEEN 1000 AND 5000
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "fileindex_bloom_scan" ->
      s"""SELECT o_orderstatus, count(*) AS n, ${dsumSql("o_totalprice")} AS total
         |FROM orders WHERE o_custkey = 97
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // footer pruning is result-invariant like the other manifests
    "fileindex_footer_scan" ->
      s"""SELECT o_orderstatus, count(*) AS n, ${dsumSql("o_totalprice")} AS total
         |FROM orders WHERE o_orderkey BETWEEN 1000 AND 5000
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "zorder_skipping" ->
      s"""SELECT event_type, count(*) AS n, ${dsumSql("value")} AS total_value
         |FROM events
         |WHERE EXTRACT(day FROM CAST(ts AS TIMESTAMP)) BETWEEN 5 AND 10
         |  AND EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) BETWEEN 6 AND 11
         |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "hilbert_skipping" ->
      s"""SELECT event_type, count(*) AS n, ${dsumSql("value")} AS total_value
         |FROM events
         |WHERE EXTRACT(day FROM CAST(ts AS TIMESTAMP)) BETWEEN 12 AND 20
         |  AND EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) BETWEEN 0 AND 5
         |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "join_customer_nation_count" ->
      """SELECT n_name, count(*) AS n_customers
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "topk_orders" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin,
    "count_rows_per_table" ->
      """SELECT * FROM (
        |  SELECT 'customer' AS tbl, count(*) AS n_rows FROM customer UNION ALL
        |  SELECT 'orders', count(*) FROM orders UNION ALL
        |  SELECT 'lineitem', count(*) FROM lineitem UNION ALL
        |  SELECT 'supplier', count(*) FROM supplier UNION ALL
        |  SELECT 'part', count(*) FROM part) ORDER BY tbl""".stripMargin,
    "agg_events_by_type" ->
      s"""SELECT event_type, count(*) AS n, ${dsumSql("value")} AS total_value
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "events_hourly" ->
      """SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:00:00') AS hour,
        |  event_type, count(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    "events_hourly_stream" ->
      """SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:00:00') AS hour,
        |  event_type, count(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    // final complete-mode snapshot ≡ batch top-k by exact decimal total
    "events_notice_rerank_stream" ->
      """SELECT user_id,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_value,
        |  count(*) AS n_events
        |FROM events GROUP BY user_id
        |ORDER BY total_value DESC, user_id LIMIT 50""".stripMargin,
    // the streamed enrichment must equal the plain batch left join
    "events_stream_enrich" ->
      s"""SELECT c.c_mktsegment AS segment, count(*) AS n_events,
         |  ${dsumSql("e.value")} AS total_value
         |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
         |GROUP BY 1 ORDER BY segment""".stripMargin,
    // chained dedup→window: identical to the plain hourly aggregate —
    // the redelivered copies must vanish inside the streaming query
    "events_stream_pipeline" ->
      """SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:00:00') AS hour,
        |  event_type, count(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    // the deduplicated stream must equal the plain batch aggregate —
    // one surviving copy per event despite the full redelivery
    "events_dedup_stream" ->
      """SELECT event_type, count(*) AS n
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,
    // one session row per user (single micro-batch, timeout off):
    // count + millisecond-floor time span mirror the batch aggregate
    "events_sessionize_stream" ->
      """SELECT user_id, CAST(count(*) AS INT) AS n_events,
        |  (epoch_ms(max(CAST(ts AS TIMESTAMP))) - epoch_ms(min(CAST(ts AS TIMESTAMP)))) // 1000
        |    AS duration_sec
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    // DuckDB's native ASOF JOIN is the independent semantics check for
    // the union+window construction
    "events_asof_join" ->
      """WITH p AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, ts AS vts, max(event_id) AS view_event_id
        |  FROM events WHERE event_type = 'view' GROUP BY 1, 2)
        |SELECT p.user_id, p.event_id,
        |  strftime(CAST(p.ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS ts,
        |  v.view_event_id
        |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.vts <= p.ts
        |ORDER BY p.user_id, p.event_id""".stripMargin,
    // one lead() window, formatted timestamps, null next = current
    "events_scd2" ->
      """SELECT user_id, event_id,
        |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
        |  strftime(CAST(lead(ts) OVER w AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
        |  (lead(ts) OVER w IS NULL) AS is_current
        |FROM events WHERE event_type = 'purchase'
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, valid_from, event_id""".stripMargin,
    // fact→dimension-version: each view against the purchase interval
    // containing it (lead() validity windows per user; open current
    // version unbounded above)
    "events_scd2_lookup" ->
      """WITH p AS (SELECT user_id, event_id AS dim_event_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS lo,
        |    lead(epoch_us(CAST(ts AS TIMESTAMP))) OVER
        |      (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS hi
        |  FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, event_id AS view_id, epoch_us(CAST(ts AS TIMESTAMP)) AS vt
        |  FROM events WHERE event_type = 'view')
        |SELECT v.user_id AS user_id, v.view_id, p.dim_event_id
        |FROM v JOIN p ON v.user_id = p.user_id
        |  AND v.vt >= p.lo AND (p.hi IS NULL OR v.vt < p.hi)
        |ORDER BY v.user_id, view_id, dim_event_id""".stripMargin,
    // lag-gap flag → running-sum session number → per-session aggregate
    "events_sessionize_batch" ->
      """WITH g AS (SELECT user_id, event_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR epoch_ms(CAST(ts AS TIMESTAMP)) - epoch_ms(CAST(lag(ts) OVER w AS TIMESTAMP)) > 1800000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT user_id, event_id, ts,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sess_no FROM g)
        |SELECT user_id, CAST(sess_no AS BIGINT) AS sess_no, count(*) AS n_events,
        |  (epoch_ms(max(CAST(ts AS TIMESTAMP))) - epoch_ms(min(CAST(ts AS TIMESTAMP)))) // 1000 AS duration_sec
        |FROM s GROUP BY user_id, sess_no ORDER BY user_id, sess_no""".stripMargin,
    // the event-time streaming sessionizer's twin: the SAME per-session
    // CTE as events_sessionize_batch, re-aggregated per user (the
    // stream emits one row per CLOSED session; the gate groups them)
    "events_sessionize_et_stream" ->
      """WITH g AS (SELECT user_id, event_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR epoch_ms(CAST(ts AS TIMESTAMP)) - epoch_ms(CAST(lag(ts) OVER w AS TIMESTAMP)) > 1800000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT user_id, event_id, ts,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sess_no FROM g),
        |per_sess AS (SELECT user_id, sess_no, count(*) AS n_events,
        |    (epoch_ms(max(CAST(ts AS TIMESTAMP))) - epoch_ms(min(CAST(ts AS TIMESTAMP)))) // 1000 AS duration_sec
        |  FROM s GROUP BY user_id, sess_no)
        |SELECT user_id, count(*) AS n_sessions,
        |  CAST(SUM(n_events) AS BIGINT) AS n_events,
        |  CAST(SUM(duration_sec) AS BIGINT) AS total_duration_sec
        |FROM per_sess GROUP BY user_id ORDER BY user_id""".stripMargin,
    // session_window's twin: gap split at > 30 min (exactly-gap events
    // MERGE — spec-locked inclusive boundary), end = last event + gap
    "events_session_window_stream" ->
      """WITH g AS (SELECT user_id, event_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(CAST(lag(ts) OVER w AS TIMESTAMP)) > 1800000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT user_id, ts,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sess_no FROM g)
        |SELECT user_id,
        |  strftime(min(CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S.%f') AS sess_start,
        |  strftime(max(CAST(ts AS TIMESTAMP)) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S.%f') AS sess_end,
        |  count(*) AS n_events
        |FROM s GROUP BY user_id, sess_no
        |ORDER BY user_id, sess_start""".stripMargin,

    // the sliding-window twin: a 2h/1h window at start W holds events
    // with trunc(ts) in {W, W+1h} — i.e. each event contributes to
    // window starts trunc(ts) and trunc(ts)-1h
    "events_sliding_stream" ->
      """WITH w AS (
        |  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS ws, event_type FROM events
        |  UNION ALL
        |  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) - INTERVAL 1 HOUR, event_type FROM events)
        |SELECT strftime(ws, '%Y-%m-%d %H:00:00') AS win_start, event_type, count(*) AS n
        |FROM w GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin,
    // the CDC materialization's twin: latest row per user over the
    // original feed unioned with the +1 h / doubled-value updates feed
    "events_stream_upsert" ->
      """WITH feed AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value FROM events
        |  UNION ALL
        |  SELECT user_id, CAST(ts AS TIMESTAMP) + INTERVAL 1 HOUR,
        |    event_id + 1000000, value * 2 FROM events),
        |r AS (SELECT *, row_number() OVER (
        |    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn FROM feed)
        |SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts, event_id, value
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin,
    // single-shot per-hour KMV mirror: the redelivered batch adds no
    // new users, so the streamed state must reduce to exactly this
    "events_kmv_stream" ->
      """WITH h AS (SELECT DISTINCT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H') AS hour,
        |    CAST(CONCAT('0x', substr(md5(CAST(user_id AS VARCHAR) || ':kmw'), 1, 10)) AS BIGINT) AS h
        |  FROM events),
        |rk AS (SELECT hour, h,
        |    row_number() OVER (PARTITION BY hour ORDER BY h) AS rn FROM h),
        |keep AS (SELECT hour, h FROM rk WHERE rn <= 64),
        |agg AS (SELECT hour, count(*) AS nk, max(h) AS hk FROM keep GROUP BY 1)
        |SELECT hour, CAST(nk AS BIGINT) AS nk,
        |  CAST(CASE WHEN nk < 64 THEN nk
        |       ELSE 63 * 1099511627776 // hk END AS BIGINT) AS est_users
        |FROM agg ORDER BY hour""".stripMargin,
    // the integer-algebra z-score recompute the merged moments must equal
    "events_anomaly_stream" ->
      """WITH m AS (
        |  SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H') AS hour,
        |    count(*) AS n,
        |    CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS s,
        |    CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)
        |           * CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS q
        |  FROM events GROUP BY 1),
        |g AS (SELECT CAST(SUM(n) AS BIGINT) AS gn, CAST(SUM(s) AS BIGINT) AS gs,
        |    CAST(SUM(q) AS BIGINT) AS gq FROM m)
        |SELECT hour, CAST(n AS BIGINT) AS n, s // n AS mean_c,
        |  gs // gn AS gmean_c,
        |  (s // n - gs // gn) * (s // n - gs // gn) >
        |    4 * (gq // gn - (gs // gn) * (gs // gn)) AS is_anomaly
        |FROM m, g ORDER BY hour""".stripMargin,
    // progress accounting conserves the feed
    "events_stream_progress" ->
      """SELECT 'input_rows' AS metric, CAST(count(*) AS BIGINT) AS value
        |FROM events""".stripMargin,
    // additive-CMS state mirror: disjoint batches merged counter-wise
    // must equal the exact full-feed counts (no collision at w=1024)
    "events_cms_stream" ->
      """SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H') AS hour,
        |  event_type, CAST(count(*) AS BIGINT) AS n_est
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    // the stream-stream join's batch twin: same interval condition
    "events_stream_join" ->
      """SELECT p.user_id, p.event_id AS purchase_id, v.event_id AS view_id
        |FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase') p
        |JOIN (SELECT user_id, event_id, ts FROM events WHERE event_type = 'view') v
        |  ON p.user_id = v.user_id
        | AND v.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
        |ORDER BY p.user_id, purchase_id, view_id""".stripMargin,
    // left-outer twin: null-padded rows for match-less purchases
    "events_stream_join_outer" ->
      """SELECT p.user_id, p.event_id AS purchase_id, v.event_id AS view_id
        |FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT user_id, event_id, ts FROM events WHERE event_type = 'view') v
        |  ON p.user_id = v.user_id
        | AND v.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
        |ORDER BY p.user_id, purchase_id, view_id""".stripMargin,
    // full outer: both unmatched sides null-pad, key coalesced
    "events_stream_join_full" ->
      """SELECT COALESCE(p.user_id, v.user_id) AS user_id,
        |  p.event_id AS purchase_id, v.event_id AS view_id
        |FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase') p
        |FULL JOIN (SELECT user_id, event_id, ts FROM events WHERE event_type = 'view') v
        |  ON p.user_id = v.user_id
        | AND v.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
        |ORDER BY user_id, purchase_id, view_id""".stripMargin,
    // tolerance: the prior match nulls out beyond the 1-hour bound
    "events_asof_tolerance" ->
      """WITH p AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, ts AS vts, max(event_id) AS view_event_id
        |  FROM events WHERE event_type = 'view' GROUP BY 1, 2)
        |SELECT p.user_id, p.event_id,
        |  strftime(CAST(p.ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS ts,
        |  CASE WHEN CAST(p.ts AS TIMESTAMP) - CAST(v.vts AS TIMESTAMP) <= INTERVAL 1 HOUR
        |       THEN v.view_event_id END AS view_event_id
        |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.vts <= p.ts
        |ORDER BY p.user_id, p.event_id""".stripMargin,
    // forward direction: smallest vts >= ts
    "events_asof_forward" ->
      """WITH p AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, ts AS vts, max(event_id) AS view_event_id
        |  FROM events WHERE event_type = 'view' GROUP BY 1, 2)
        |SELECT p.user_id, p.event_id,
        |  strftime(CAST(p.ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS ts,
        |  v.view_event_id
        |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.vts >= p.ts
        |ORDER BY p.user_id, p.event_id""".stripMargin,
    // null-vts lock: DuckDB ASOF never matches a NULL timestamp, so
    // any carry-forward leak from the nulled rows mismatches here
    "events_asof_nulls" ->
      """WITH p AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'),
        |v0 AS (SELECT user_id, ts, max(event_id) AS view_event_id
        |  FROM events WHERE event_type = 'view' GROUP BY 1, 2),
        |v AS (SELECT user_id,
        |    CASE WHEN view_event_id % 7 = 0 THEN NULL ELSE ts END AS vts,
        |    view_event_id FROM v0)
        |SELECT p.user_id, p.event_id,
        |  strftime(CAST(p.ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS ts,
        |  v.view_event_id
        |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.vts <= p.ts
        |ORDER BY p.user_id, p.event_id""".stripMargin,
    // nearest = the closer of DuckDB's native backward and forward
    // ASOF matches, ties backward — the same rule the engine applies
    "events_asof_nearest" ->
      """WITH p AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, ts AS vts, max(event_id) AS view_event_id
        |  FROM events WHERE event_type = 'view' GROUP BY 1, 2),
        |b AS (SELECT p.user_id, p.event_id, p.ts, v.vts AS bts, v.view_event_id AS bid
        |  FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.vts <= p.ts),
        |f AS (SELECT p.user_id, p.event_id, v.vts AS fts, v.view_event_id AS fid
        |  FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.vts >= p.ts)
        |SELECT b.user_id, b.event_id,
        |  strftime(CAST(b.ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS ts,
        |  CASE WHEN b.bid IS NOT NULL AND (f.fid IS NULL OR
        |         CAST(b.ts AS TIMESTAMP) - CAST(b.bts AS TIMESTAMP)
        |           <= CAST(f.fts AS TIMESTAMP) - CAST(b.ts AS TIMESTAMP))
        |       THEN b.bid ELSE f.fid END AS view_event_id
        |FROM b JOIN f ON b.user_id = f.user_id AND b.event_id = f.event_id
        |ORDER BY b.user_id, b.event_id""".stripMargin,
    // mirrors KmvDistinct exactly: k-th smallest distinct 60-bit hash
    // via a row_number window, estimate in HUGEINT floor division
    "kmv_distinct_segments" ->
      """WITH h AS (SELECT DISTINCT c_mktsegment,
        |    CAST(CONCAT('0x', substr(md5(CAST(c_custkey AS VARCHAR) || ':kmv'), 1, 15)) AS BIGINT) AS h
        |  FROM customer),
        |ranked AS (SELECT c_mktsegment, h,
        |    row_number() OVER (PARTITION BY c_mktsegment ORDER BY h) AS rn FROM h),
        |agg AS (SELECT c_mktsegment, count(*) AS nh,
        |    max(CASE WHEN rn = 64 THEN h END) AS hk FROM ranked GROUP BY 1),
        |ex AS (SELECT c_mktsegment, count(DISTINCT c_custkey) AS n_exact FROM customer GROUP BY 1)
        |SELECT ex.c_mktsegment, ex.n_exact,
        |  CASE WHEN agg.nh < 64 THEN agg.nh
        |       ELSE CAST(CAST(63 AS HUGEINT) * 1152921504606846976 // agg.hk AS BIGINT) END AS n_kmv
        |FROM ex JOIN agg USING (c_mktsegment) ORDER BY c_mktsegment""".stripMargin,
    // mirror of the KMV set algebra: per-segment min-64 via
    // row_number, union sketch = min-64 of the merged kept sets, rho
    // counts union-sketch hashes present in BOTH kept sets, identical
    // integer estimator arms
    "kmv_segment_overlap" ->
      """WITH h AS (SELECT DISTINCT event_type,
        |    CAST(CONCAT('0x', substr(md5(CAST(user_id AS VARCHAR) || ':kvo'), 1, 10)) AS BIGINT) AS h
        |  FROM events WHERE event_type IN ('purchase', 'view')),
        |rk AS (SELECT event_type, h,
        |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn FROM h),
        |keep AS (SELECT event_type, h FROM rk WHERE rn <= 64),
        |uni AS (SELECT DISTINCT h FROM keep),
        |urk AS (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM uni),
        |ku AS (SELECT h FROM urk WHERE rn <= 64),
        |st AS (SELECT count(*) AS nk, max(h) AS hk,
        |    CAST(SUM(CASE WHEN EXISTS (SELECT 1 FROM keep a
        |          WHERE a.event_type = 'purchase' AND a.h = ku.h)
        |        AND EXISTS (SELECT 1 FROM keep b
        |          WHERE b.event_type = 'view' AND b.h = ku.h)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS rho
        |  FROM ku),
        |ex AS (SELECT count(*) AS n_exact_inter FROM
        |  (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase') p
        |  JOIN (SELECT DISTINCT user_id FROM events WHERE event_type = 'view') v
        |  USING (user_id))
        |SELECT ex.n_exact_inter, st.rho,
        |  CASE WHEN st.nk < 64 THEN st.nk
        |       ELSE 63 * 1099511627776 // st.hk END AS est_union,
        |  st.rho * (CASE WHEN st.nk < 64 THEN st.nk
        |       ELSE 63 * 1099511627776 // st.hk END) // st.nk AS est_inter
        |FROM ex, st""".stripMargin,
    // mirrors KmvQuantiles: DISTINCT (group, hash, value) pairs, the
    // k=256 smallest by (hash, value) via a row_number window, then
    // nearest-rank picks values[1 + floor(q*(m-1))] over the sample
    "kmv_quantiles_price" ->
      """WITH h AS (SELECT DISTINCT o_orderpriority,
        |    CAST(CONCAT('0x', substr(md5(CAST(o_orderkey AS VARCHAR) || ':kq'), 1, 15)) AS BIGINT) AS h,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) AS v
        |  FROM orders),
        |ranked AS (SELECT o_orderpriority, v,
        |    row_number() OVER (PARTITION BY o_orderpriority ORDER BY h, v) AS rn FROM h),
        |samp AS (SELECT o_orderpriority, v FROM ranked WHERE rn <= 256),
        |rv AS (SELECT o_orderpriority, v,
        |    row_number() OVER (PARTITION BY o_orderpriority ORDER BY v) AS r,
        |    count(*) OVER (PARTITION BY o_orderpriority) AS m FROM samp)
        |SELECT o_orderpriority,
        |  max(CASE WHEN r = 1 + CAST(floor(CAST(0.25 AS DOUBLE) * (m - 1)) AS BIGINT) THEN v END) AS p25_cents,
        |  max(CASE WHEN r = 1 + CAST(floor(CAST(0.5 AS DOUBLE) * (m - 1)) AS BIGINT) THEN v END) AS p50_cents,
        |  max(CASE WHEN r = 1 + CAST(floor(CAST(0.75 AS DOUBLE) * (m - 1)) AS BIGINT) THEN v END) AS p75_cents
        |FROM rv GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,
    "skew_salted_join" ->
      s"""WITH dim AS (
         |  SELECT DISTINCT event_type, CAST(length(event_type) AS BIGINT) AS type_weight
         |  FROM events)
         |SELECT e.event_type, d.type_weight, count(*) AS n, ${dsumSql("value")} AS total_value
         |FROM events e JOIN dim d USING (event_type)
         |GROUP BY 1, 2 ORDER BY e.event_type""".stripMargin,
    "multikey_sort_limit" ->
      """SELECT event_id, event_type,
        |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS ts
        |FROM events
        |ORDER BY event_type DESC, ts DESC, event_id ASC LIMIT 50""".stripMargin,
    "shuffle_rank" ->
      """SELECT c_custkey,
        |  row_number() OVER (ORDER BY md5(CAST(c_custkey AS VARCHAR)), c_custkey) AS rn
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "union_schema_merge" ->
      """SELECT * FROM (
        |  SELECT c_name AS name, c_mktsegment AS segment, 'customer' AS side FROM customer
        |  UNION ALL
        |  SELECT s_name, '', 'supplier' FROM supplier) ORDER BY side, name""".stripMargin,
    "distinct_mktsegments" ->
      "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment",
    // semantics check for the binned construction: DuckDB runs the
    // plain interval predicate join
    "range_join_bands" ->
      s"""SELECT b.band, count(*) AS n_orders, ${dsumSql("o.o_totalprice")} AS sum_price
         |FROM (SELECT k AS band, k*25000.0 AS lo, k*25000.0+40000.0 AS hi
         |      FROM (SELECT unnest(range(20)) AS k)) b
         |JOIN orders o ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
         |GROUP BY b.band ORDER BY b.band""".stripMargin,
    // semantics check for the binned overlap construction: DuckDB runs
    // the plain inequality self-join. The gap expression repeats the
    // engine's exact FP steps ((p-5.0) diffs, not raw price diffs) so
    // both sides round the identical double into DECIMAL(18,2).
    "range_join_overlap" ->
      """SELECT a.p_brand, count(*) AS n_pairs,
        |  CAST(ROUND(SUM(CAST(
        |    greatest(a.p_retailprice-5.0, b.p_retailprice-5.0)
        |    - least(a.p_retailprice-5.0, b.p_retailprice-5.0)
        |    AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_gap
        |FROM part a JOIN part b
        |  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        |  AND (a.p_retailprice-5.0) < (b.p_retailprice+5.0)
        |  AND (b.p_retailprice-5.0) < (a.p_retailprice+5.0)
        |WHERE a.p_size <= 10 AND b.p_size <= 10
        |GROUP BY a.p_brand ORDER BY a.p_brand""".stripMargin,
    "agg_rollup" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
         |  ${dsumSql("l_quantity")} AS sum_qty, count(*) AS n
         |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin,
    "agg_cube" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
         |  ${dsumSql("l_quantity")} AS sum_qty, count(*) AS n
         |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
         |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin,
    "agg_grouping_sets" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
         |  ${dsumSql("l_quantity")} AS sum_qty, count(*) AS n
         |FROM lineitem
         |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
         |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin,
    "window_navigation" ->
      """SELECT user_id, first_type, last_type, second_type, n_events FROM (
        |  SELECT user_id,
        |    row_number() OVER w AS rn,
        |    first_value(event_type) OVER wf AS first_type,
        |    last_value(event_type) OVER wf AS last_type,
        |    nth_value(event_type, 2) OVER wf AS second_type,
        |    count(*) OVER wf AS n_events
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id),
        |    wf AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "market_basket_pairs" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |n AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_orders FROM li),
        |pc AS (SELECT pk, count(*) AS np FROM li GROUP BY 1),
        |pairs AS (
        |  SELECT a.pk AS part_a, b.pk AS part_b, count(*) AS n_ab
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2)
        |SELECT part_a, part_b, n_ab,
        |  (n_ab * n.n_orders * 10000) // (pa.np * pb.np) AS lift_x1e4
        |FROM pairs
        |JOIN pc pa ON pairs.part_a = pa.pk
        |JOIN pc pb ON pairs.part_b = pb.pk
        |CROSS JOIN n
        |ORDER BY n_ab DESC, part_a, part_b LIMIT 50""".stripMargin,
    "tpch_q3_priority" ->
      """SELECT l_orderkey,
        |  strftime(CAST(CAST(o_orderdate AS TIMESTAMP) AS DATE), '%Y-%m-%d')
        |    AS o_orderdate,
        |  o_orderpriority,
        |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) *
        |           (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
        |    AS BIGINT) AS revenue_x1e4
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND CAST(o_orderdate AS TIMESTAMP) < TIMESTAMP '1998-01-01'
        |  AND CAST(l_shipdate AS TIMESTAMP) > TIMESTAMP '1998-01-01'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue_x1e4 DESC, l_orderkey LIMIT 10""".stripMargin,
    "tpch_q5_region_volume" ->
      """SELECT n_name,
        |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) *
        |           (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
        |    AS BIGINT) AS revenue_x1e4
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND EXTRACT(year FROM CAST(o_orderdate AS TIMESTAMP)) = 1996
        |GROUP BY 1 ORDER BY revenue_x1e4 DESC, n_name""".stripMargin,
    // ntile(4) with the identical (metric, id) total orders — the
    // negation flip mirrors rfmSegments exactly
    "customer_rfm" ->
      """WITH o AS (SELECT o_custkey,
        |    CAST(CAST(o_orderdate AS TIMESTAMP) AS DATE) AS d,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS p_c
        |  FROM orders),
        |per AS (SELECT o_custkey, max(d) AS last_d, count(*) AS freq,
        |    CAST(sum(p_c) AS BIGINT) AS mon
        |  FROM o GROUP BY 1),
        |mx AS (SELECT max(last_d) AS mxd FROM per),
        |r AS (SELECT o_custkey,
        |    CAST(ntile(4) OVER (ORDER BY CAST(date_diff('day', last_d, mx.mxd) AS BIGINT), o_custkey) AS INTEGER) AS r_q,
        |    CAST(ntile(4) OVER (ORDER BY -freq, o_custkey) AS INTEGER) AS f_q,
        |    CAST(ntile(4) OVER (ORDER BY -mon, o_custkey) AS INTEGER) AS m_q
        |  FROM per, mx)
        |SELECT CAST(r_q * 100 + f_q * 10 + m_q AS INTEGER) AS rfm_code,
        |  count(*) AS n_entities
        |FROM r GROUP BY 1 ORDER BY rfm_code""".stripMargin,
    "supplier_abc" ->
      """WITH per AS (
        |  SELECT l_suppkey,
        |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) *
        |             (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
        |      AS BIGINT) AS rev
        |  FROM lineitem GROUP BY 1),
        |tot AS (SELECT CAST(sum(rev) AS BIGINT) AS t FROM per),
        |c AS (SELECT rev,
        |    CAST(sum(rev) OVER (ORDER BY rev DESC, l_suppkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM per),
        |cl AS (SELECT rev,
        |    CASE WHEN cum * 5 <= t.t * 4 THEN 'A'
        |         WHEN cum * 20 <= t.t * 19 THEN 'B'
        |         ELSE 'C' END AS abc_class
        |  FROM c, tot t)
        |SELECT abc_class, count(*) AS n_suppliers,
        |  CAST(sum(rev) AS BIGINT) AS revenue_x1e4
        |FROM cl GROUP BY 1 ORDER BY abc_class""".stripMargin,
    "join_semi_urgent" ->
      """SELECT c_mktsegment, count(*) AS n_customers FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "join_anti_urgent" ->
      """SELECT c_mktsegment, count(*) AS n_customers FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    // the oracle states the SEMANTICS as the plain distance join;
    // DuckDB nested-loops it (fine at oracle scale), the engine runs
    // the deletion-variant equi-join instead
    "fuzzy_join_names" ->
      """SELECT b.b_key, count(*) AS n_matches, min(a.c_custkey) AS min_a_key,
        |  CAST(sum(levenshtein(a.c_name, b.b_name)) AS BIGINT) AS sum_dist
        |FROM customer a JOIN
        |  (SELECT c_custkey AS b_key,
        |          substr(c_name, 1, length(c_name)-1) || 'X' AS b_name
        |   FROM customer WHERE c_nationkey = 7 AND c_custkey % 3 = 0) b
        |  ON levenshtein(a.c_name, b.b_name) <= 1
        |WHERE a.c_nationkey = 7
        |GROUP BY b.b_key ORDER BY b.b_key""".stripMargin,
    // same prefix blocks, per-block rank windows (rn diff <= w-1 self
    // join — the lead() fan-out's relational twin), both passes,
    // exact-distance verify, canonical dedup
    "er_sorted_neighborhood" ->
      """WITH cust AS (SELECT c_custkey AS k, c_name AS v FROM customer
        |  WHERE c_nationkey = 7),
        |recs AS (SELECT k, v FROM cust
        |  UNION ALL
        |  SELECT k + 100000, substr(v, 1, length(v)-1) || 'X'
        |  FROM cust WHERE k % 3 = 0),
        |p1 AS (SELECT k, v, substr(v, 1, 4) AS blk,
        |    row_number() OVER (PARTITION BY substr(v, 1, 4) ORDER BY v, k) AS rn
        |  FROM recs),
        |pairs1 AS (SELECT a.k AS ak, b.k AS bk, a.v AS av, b.v AS bv
        |  FROM p1 a JOIN p1 b ON a.blk = b.blk
        |    AND b.rn > a.rn AND b.rn <= a.rn + 4),
        |rev AS (SELECT k, reverse(v) AS v FROM recs),
        |p2 AS (SELECT k, v, substr(v, 1, 4) AS blk,
        |    row_number() OVER (PARTITION BY substr(v, 1, 4) ORDER BY v, k) AS rn
        |  FROM rev),
        |pairs2 AS (SELECT a.k AS ak, b.k AS bk, a.v AS av, b.v AS bv
        |  FROM p2 a JOIN p2 b ON a.blk = b.blk
        |    AND b.rn > a.rn AND b.rn <= a.rn + 4),
        |alls AS (SELECT * FROM pairs1 UNION ALL SELECT * FROM pairs2)
        |SELECT DISTINCT least(ak, bk) AS a, greatest(ak, bk) AS b,
        |  CAST(levenshtein(av, bv) AS INT) AS dist
        |FROM alls WHERE ak <> bk AND levenshtein(av, bv) <= 1
        |ORDER BY a, b""".stripMargin,
    "pivot_event_types" ->
      """SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
        |  count(*) FILTER (WHERE event_type='click') AS click,
        |  count(*) FILTER (WHERE event_type='error') AS error,
        |  count(*) FILTER (WHERE event_type='purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type='signup') AS signup,
        |  count(*) FILTER (WHERE event_type='view') AS view
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,
    "window_suite" ->
      """SELECT o_orderkey, o_custkey,
        |  row_number() OVER w AS rn,
        |  lag(o_totalprice) OVER w AS prev_price,
        |  lead(o_totalprice) OVER w AS next_price,
        |  ntile(4) OVER w AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, rn""".stripMargin,
    "agg_percentiles" ->
      """SELECT l_returnflag,
        |  CAST(floor(quantile_cont(l_extendedprice, 0.25)*1e4 + 0.5) AS BIGINT) AS p25,
        |  CAST(floor(quantile_cont(l_extendedprice, 0.5)*1e4 + 0.5) AS BIGINT) AS p50,
        |  CAST(floor(quantile_cont(l_extendedprice, 0.95)*1e4 + 0.5) AS BIGINT) AS p95
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,
    // equi-depth bins: same scale4 boundaries, same integer compare
    "features_quantile_bins" ->
      """WITH b AS (SELECT
        |    CAST(floor(quantile_cont(l_extendedprice, 0.25)*1e4 + 0.5) AS BIGINT) AS q1,
        |    CAST(floor(quantile_cont(l_extendedprice, 0.5)*1e4 + 0.5) AS BIGINT) AS q2,
        |    CAST(floor(quantile_cont(l_extendedprice, 0.75)*1e4 + 0.5) AS BIGINT) AS q3
        |  FROM lineitem),
        |f AS (SELECT l_returnflag,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_c
        |  FROM lineitem)
        |SELECT l_returnflag,
        |  CASE WHEN price_c * 100 <= q1 THEN 1
        |       WHEN price_c * 100 <= q2 THEN 2
        |       WHEN price_c * 100 <= q3 THEN 3 ELSE 4 END AS bin,
        |  count(*) AS n, CAST(sum(price_c) AS BIGINT) AS sum_c
        |FROM f, b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // the bloom prefilter is result-invariant: the oracle is the exact
    // semi-join with no filter at all
    "bloom_prefilter_join" ->
      s"""SELECT c.c_mktsegment, count(*) AS n_customers, ${dsumSql("c.c_acctbal")} AS sum_bal
         |FROM customer c
         |WHERE EXISTS (SELECT 1 FROM orders o
         |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0)
         |GROUP BY 1 ORDER BY c.c_mktsegment""".stripMargin,
  )
}
