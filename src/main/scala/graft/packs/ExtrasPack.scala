package graft.packs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
import graft.QueryPack
import graft.core.{Flatten, Tables}
import graft.ops.{Compare, KeyedUpsert}

/** Remaining oracle-checked §2 rows: mismatch count (A6), keyed write
  * semantics (K8), nested-struct flatten (R3), JSON stringify (F21). */
object ExtrasPack extends QueryPack {

  private def customer(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "customer")

  /** K8 fixture: keys ≡ 0 (mod 3) get updated names; keys ≡ 0 (mod
    * 100) are re-inserted shifted past max(c_custkey) (new documents).
    * The shift is DERIVED, not a constant: a fixed 100000 collided
    * with real keys once the fixture scaled past sf0.1 — the engine
    * then (correctly) upserts where the oracle's UNION ALL assumes an
    * append, and the row counts diverge. */
  private def updates(s: SparkSession, dir: String): DataFrame = {
    val c = customer(s, dir)
    // max+1, not max: custkey 0 exists, and 0 + max would collide with
    // the real max-key row
    val shift = c.agg(max(col("c_custkey"))).head.getLong(0) + 1
    c.filter(col("c_custkey") % 3 === 0)
      .withColumn("c_name", concat(lit("UPD_"), col("c_name")))
      .unionAll(c.filter(col("c_custkey") % 100 === 0)
        .withColumn("c_custkey", col("c_custkey") + shift))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A6: mismatch row count off the compare melt.
    "compare_mismatch_count" -> ((s, dir) => {
      val (a, b) = ComparePack.pair(s, dir)
      Compare.mismatches(Compare.diff(a, b, "c_custkey"), "c_custkey")
        .agg(count(lit(1)).as("n_mismatches"))
    }),
    // K8: overwrite-by-key upsert (updates win; new keys appended).
    "keyed_upsert" -> ((s, dir) =>
      KeyedUpsert.upsert(customer(s, dir), updates(s, dir), "c_custkey")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")),
    // K8: setDoc(merge) — null update cells keep existing values.
    "keyed_upsert_merge" -> ((s, dir) => {
      val u = customer(s, dir).filter(col("c_custkey") % 5 === 0)
        .select(col("c_custkey"), concat(lit("M_"), col("c_name")).as("c_name"),
          col("c_nationkey"), col("c_acctbal"),
          lit(null).cast("string").as("c_mktsegment"))
      KeyedUpsert.upsertMerge(customer(s, dir), u, "c_custkey")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    }),
    // K8: deleteDoc — anti-join on the key set.
    "keyed_delete" -> ((s, dir) => {
      val keys = customer(s, dir).filter(col("c_custkey") % 7 === 0).select("c_custkey")
      KeyedUpsert.delete(customer(s, dir), keys, "c_custkey")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    }),
    // R3 + S6: JSON column → struct → dot-path flatten.
    "flatten_props" -> ((s, dir) => {
      val schema = StructType(Seq(StructField("k", IntegerType)))
      val parsed = Tables.load(s, dir, "events")
        .select(col("event_id"), from_json(col("props"), schema).as("props"))
      Flatten(parsed).withColumnRenamed("props.k", "k")
        .orderBy("event_id")
    }),
    // F21: canonical JSON stringify of a struct.
    "json_stringify" -> ((s, dir) =>
      Tables.load(s, dir, "nation")
        .select(col("n_nationkey"),
          to_json(struct(col("n_nationkey"), col("n_name"))).as("doc"))
        .orderBy("n_nationkey")),
    // P2/P3 at engine scale: one-pass per-column profile (nulls,
    // exact distincts, min/max) — the lake-side replacement for the
    // reference's 1000-row browser sampling.
    "profile_columns" -> ((s, dir) =>
      graft.ops.Profile.profile(
        Tables.load(s, dir, "customer"),
        Seq("c_custkey", "c_name", "c_nationkey", "c_mktsegment"))
        .orderBy("column_name")),
    // Group-wise linear regression (ops/Stats.linregGroups): price vs
    // quantity per return flag, closed form over DECIMAL-exact moments
    // (float sums would be shuffle-order dependent and unmatchable) —
    // the oracle replays the identical expression tree.
    "agg_linreg" -> ((s, dir) =>
      graft.ops.Stats.linregGroups(
          Tables.load(s, dir, "lineitem"),
          "l_returnflag", "l_quantity", "l_extendedprice")
        .orderBy("l_returnflag")),
    // Distribution profile: 12 equi-width bins of l_quantity over
    // [0, 60), out-of-range counted under bin -1 (none here — the
    // fixture range is within bounds, locking the no-silent-drop
    // contract trivially true).
    "profile_histogram" -> ((s, dir) =>
      graft.ops.Profile.histogram(
          Tables.load(s, dir, "lineitem"), "l_quantity", 0.0, 60.0, 12)
        .orderBy("bin")),
    // Lake maintenance: fragment documents into 64 tiny files (a
    // streaming sink's worth of debris), compact back to ~4 MB
    // outputs, and prove the rewrite is lossless — the aggregate over
    // the compacted table must equal the aggregate over the original.
    // Referential-integrity audit: orphan counts per FK edge via LEFT
    // ANTI joins (keys-only build sides — the same shape as the
    // semi/anti join gates). The orders→customer edge is broken
    // DELIBERATELY: every 300th order re-keyed past max(c_custkey),
    // with the shift DERIVED like the upsert fixture's, so the audit
    // must count exactly the injected orphans at every sf; the
    // lineitem→orders edge stays intact and must report zero.
    "audit_referential" -> ((s, dir) => {
      val cust = Tables.load(s, dir, "customer")
      val ords = Tables.load(s, dir, "orders")
      val li = Tables.load(s, dir, "lineitem")
      val shift = cust.agg(max(col("c_custkey"))).head.getLong(0) + 1
      val broken = ords.select("o_orderkey", "o_custkey")
        .withColumn("o_custkey",
          when(col("o_orderkey") % 300 === 0, col("o_custkey") + shift)
            .otherwise(col("o_custkey")))
      val orphanOrders = broken.join(cust,
          broken("o_custkey") === cust("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("n"))
        .select(lit("orders_without_customer").as("fk_edge"), col("n"))
      val orphanLines = li.select("l_orderkey").join(ords,
          li("l_orderkey") === ords("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("n"))
        .select(lit("lineitem_without_order").as("fk_edge"), col("n"))
      orphanLines.unionAll(orphanOrders).orderBy("fk_edge")
    }),
    // Benford-style data quality: leading-digit distribution of order
    // totals, derived through exact integer/string ops (no log10
    // float) — the screening pass that flags fabricated numerics.
    "profile_benford" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .select(substring(floor(col("o_totalprice")).cast("long").cast("string"), 1, 1)
          .as("lead_digit"))
        .groupBy("lead_digit").agg(count(lit(1)).as("n"))
        .orderBy("lead_digit")),
    // Write-Audit-Publish — the lakehouse promotion pattern: the
    // candidate lands in STAGING, the expectations audit runs on the
    // staged files (not the source — what you audit must be what you
    // publish), and only a clean audit promotes it via an atomic
    // directory rename (at scale: a table-format pointer swap, the
    // same single-writer metadata operation). Consumers read only
    // the published path, so a failing audit leaves the previous
    // table intact — no torn reads at any scale. Output = the
    // published table's per-status aggregate + the audit verdict.
    "wap_publish" -> ((s, dir) => {
      import graft.ops.Expectations
      val base = graft.core.Scratch.dir("graft_wap")
      val staging = base.resolve("staging")
      val published = base.resolve("published")
      Tables.load(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .write.mode("overwrite").parquet(staging.toString)
      val audit = Expectations.audit(s.read.parquet(staging.toString), Seq(
        Expectations.notNull("o_custkey"),
        Expectations.inSet("o_orderstatus", Seq("O", "F", "P")),
        Expectations.Unique("unique:o_orderkey", Seq("o_orderkey"))))
        .agg(count(lit(1)).as("n_rules"),
          sum(col("n_violations")).as("n_violations"))
      val Array(nRules, nViolations) =
        audit.head.toSeq.map(_.asInstanceOf[Long]).toArray
      if (nViolations == 0L)
        java.nio.file.Files.move(staging, published)
      require(java.nio.file.Files.exists(published),
        s"wap_publish: audit failed ($nViolations violations) — staging not promoted")
      s.read.parquet(published.toString)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")).as("total_c"))
        .withColumn("audit_rules", lit(nRules))
        .withColumn("audit_violations", lit(nViolations))
        .orderBy("o_orderstatus")
    }),
    // WAP under MULTI-WRITER contention (ops/Wap.scala): two stagers
    // observe the same head (v0), race the compare-and-swap, exactly
    // one installs v1; the loser rebases on the new head and lands v2.
    // The published snapshot is therefore the LOSER's candidate — a
    // deterministic interleaving of the protocol the WapSpec race test
    // exercises with real threads. Output = per-status aggregate over
    // the final snapshot + the commit-log facts as literal columns.
    "wap_publish_cas" -> ((s, dir) => {
      import graft.ops.Wap
      val table = graft.core.Scratch.dir("graft_wap_cas").resolve("tbl").toString
      val orders = Tables.load(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      // writer A candidates only the open orders; writer B the full table
      val aPath = Wap.stage(orders.filter(col("o_orderstatus") === "O"), table, "writerA")
      val bPath = Wap.stage(orders, table, "writerB")
      val v0 = Wap.currentVersion(table) // both writers read version 0
      val aV = Wap.tryPublish(table, v0, aPath) // A wins the CAS → v1
      val bConflicted =
        try { Wap.tryPublish(table, v0, bPath); false }
        catch { case _: Wap.Conflict => true } // B's CAS must fail
      require(aV == 1L && bConflicted, "wap_publish_cas: protocol violated")
      val bV = Wap.publishWithRetry(table, bPath) // rebase → v2
      Wap.readPublished(s, table)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")).as("total_c"))
        .withColumn("final_version", lit(bV))
        .withColumn("conflicts", lit(if (bConflicted) 1L else 0L))
        .orderBy("o_orderstatus")
    }),
    // TIME TRAVEL over the WAP commit log (ops/Wap.scala
    // readVersion): v1 = every third order, v2 = the full table; the
    // query reads the table AS OF v1 after v2 is already head —
    // resolving the historical manifest is O(1) metadata, the data
    // directory was never rewritten. Output = per-status aggregate of
    // the v1 snapshot, with the version facts as literals.
    "wap_time_travel" -> ((s, dir) => {
      import graft.ops.Wap
      val table = graft.core.Scratch.dir("graft_wap_tt").resolve("tbl").toString
      val orders = Tables.load(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      Wap.publishWithRetry(table,
        Wap.stage(orders.filter(col("o_orderkey") % 3 === 0), table, "v1data"))
      Wap.publishWithRetry(table, Wap.stage(orders, table, "v2data"))
      val head = Wap.currentVersion(table)
      Wap.readVersion(s, table, 1L)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")).as("total_c"))
        .withColumn("as_of_version", lit(1L))
        .withColumn("head_version", lit(head))
        .orderBy("o_orderstatus")
    }),
    // ROLLBACK: v2 turns out bad, v3 re-publishes v1's data path —
    // history stays append-only (v2's manifest remains auditable,
    // time travel to it still works), but the HEAD read atomically
    // flips back to the v1 snapshot. Output = per-status aggregate of
    // the head after rollback (≡ v1 content) + the version facts.
    "wap_rollback" -> ((s, dir) => {
      import graft.ops.Wap
      val table = graft.core.Scratch.dir("graft_wap_rb").resolve("tbl").toString
      val orders = Tables.load(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      Wap.publishWithRetry(table,
        Wap.stage(orders.filter(col("o_orderkey") % 3 === 0), table, "good"))
      Wap.publishWithRetry(table,
        Wap.stage(orders.filter(col("o_orderkey") % 2 === 0), table, "bad"))
      val head = Wap.rollbackTo(table, 1L)
      require(head == 3L, s"wap_rollback: expected head v3, got v$head")
      Wap.readPublished(s, table)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")).as("total_c"))
        .withColumn("head_version", lit(head))
        .orderBy("o_orderstatus")
    }),
    // EXPIRE/VACUUM (Wap.expireBefore) — the retention close of the
    // lifecycle: v1 (third-keys), v2 (even-keys), v3 = rollback to v1
    // (SHARES v1's data path), v4 (fifth-keys); expiring below v3 must
    // tombstone v1+v2, reclaim ONLY v2's directory (v1's survives via
    // the v3 reference), keep v3 time-travelable and v1 loudly
    // unreadable. Output = the v3 snapshot aggregate + the facts.
    "wap_expire" -> ((s, dir) => {
      import graft.ops.Wap
      val table = graft.core.Scratch.dir("graft_wap_exp").resolve("tbl").toString
      val orders = Tables.load(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      Wap.publishWithRetry(table,
        Wap.stage(orders.filter(col("o_orderkey") % 3 === 0), table, "v1data"))
      Wap.publishWithRetry(table,
        Wap.stage(orders.filter(col("o_orderkey") % 2 === 0), table, "v2data"))
      Wap.rollbackTo(table, 1L) // v3 re-references v1's path
      Wap.publishWithRetry(table,
        Wap.stage(orders.filter(col("o_orderkey") % 5 === 0), table, "v4data"))
      val (nExpired, nReclaimed) = Wap.expireBefore(table, keepFrom = 3L)
      val v1Unreadable =
        try { Wap.readVersion(s, table, 1L); false }
        catch { case _: IllegalStateException => true }
      require(v1Unreadable, "wap_expire: expired v1 must not be readable")
      Wap.readVersion(s, table, 3L)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")).as("total_c"))
        .withColumn("head_version", lit(Wap.currentVersion(table)))
        .withColumn("n_expired", lit(nExpired))
        .withColumn("n_reclaimed", lit(nReclaimed))
        .orderBy("o_orderstatus")
    }),
    // CHANGE DATA FEED between two published versions (ops/Wap.scala
    // changesBetween): v1 drops every 5th order, v2 drops every 3rd
    // and bumps every 7th order's price — the keyed full-outer diff
    // classifies each key insert/delete/update/unchanged. The join
    // shuffles by the key (co-partitioned, executor-only); output =
    // per-class row count + cents of the surviving-side price, the
    // reconciliation summary a downstream consumer replays.
    "wap_changes_feed" -> ((s, dir) => {
      import graft.ops.Wap
      val table = graft.core.Scratch.dir("graft_wap_cdf").resolve("tbl").toString
      val orders = Tables.load(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      Wap.publishWithRetry(table,
        Wap.stage(orders.filter(col("o_orderkey") % 5 =!= 0), table, "v1"))
      val v2 = orders.filter(col("o_orderkey") % 3 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 7 === 0, col("o_totalprice") + lit(10.0))
            .otherwise(col("o_totalprice")))
      Wap.publishWithRetry(table, Wap.stage(v2, table, "v2"))
      Wap.changesBetween(s, table, 1L, 2L, Seq("o_orderkey"))
        .groupBy("change_type")
        .agg(count(lit(1)).as("n"),
          sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")).as("total_c"))
        .orderBy("change_type")
    }),
    // Order-independent table fingerprint: Σ of per-row 32-bit digests
    // + row count per group — proves two table copies identical
    // without sorting or co-locating either side (the replication /
    // migration audit primitive). ONE hash aggregate; any row order,
    // any partitioning yields the same sum, so the comparison is two
    // tiny result sets, not a row-level join. Floats enter the digest
    // only as ×100 integer cents — a double-formatting difference
    // can't flip the checksum.
    "table_checksum" -> ((s, dir) => {
      val rowStr = concat_ws("|",
        col("l_orderkey").cast("string"), col("l_linenumber").cast("string"),
        floor(col("l_quantity") * 100 + lit(0.5)).cast("long").cast("string"),
        floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long").cast("string"),
        col("l_returnflag"))
      Tables.load(s, dir, "lineitem")
        .select(col("l_returnflag"), graft.llm.Dedup.hash32(rowStr, "ck").as("h"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_rows"), sum(col("h")).as("checksum"))
        .orderBy("l_returnflag")
    }),
    // The checksum audit APPLIED: reconcile two copies of a table —
    // copy B carries an injected one-cent corruption on the 'R' rows
    // of every 1000th order — by comparing per-group fingerprints.
    // Only the corrupted group surfaces; no row-level join between
    // the copies ever runs (at 100 TB the copies may live in
    // different systems — each side ships 3 rows, not a table).
    "table_checksum_diff" -> ((s, dir) => {
      def fingerprint(priceAdj: org.apache.spark.sql.Column) = {
        val li = Tables.load(s, dir, "lineitem")
          .withColumn("price_c",
            floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long") + priceAdj)
        val rowStr = concat_ws("|",
          col("l_orderkey").cast("string"), col("l_linenumber").cast("string"),
          floor(col("l_quantity") * 100 + lit(0.5)).cast("long").cast("string"),
          col("price_c").cast("string"), col("l_returnflag"))
        li.select(col("l_returnflag"), graft.llm.Dedup.hash32(rowStr, "ck").as("h"))
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"), sum(col("h")).as("ck"))
      }
      val a = fingerprint(lit(0L))
        .select(col("l_returnflag"), col("n").as("n_a"), col("ck").as("ck_a"))
      val b = fingerprint(
          when(col("l_returnflag") === "R" && col("l_orderkey") % 1000 === 0, 1L)
            .otherwise(0L))
        .select(col("l_returnflag"), col("n").as("n_b"), col("ck").as("ck_b"))
      a.join(b, Seq("l_returnflag"), "full_outer")
        .select(col("l_returnflag"), col("n_a"), col("n_b"),
          (col("n_a") === col("n_b") && col("ck_a") === col("ck_b")).as("checksums_match"))
        .orderBy("l_returnflag")
    }),
    // Distribution drift between release periods: 12-bin quantity
    // histograms for 1995 vs 1996 shipments, per-bin shares as ×1e4
    // integer bp, per-bin L1 gap — the PSI-style drift check without
    // the float logarithm (ln(p/q) would ULP-flake across engines;
    // the L1 distance ranks drifting bins identically). Facts
    // collapse to ≤12 rows per period in ONE aggregate; the share
    // windows run on that bounded grid.
    "drift_l1_quantity" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val li = Tables.load(s, dir, "lineitem")
        .select(year(col("l_shipdate")).as("y"),
          least(lit(11), floor(col("l_quantity") * 12 / 60).cast("int")).as("bin"))
        .filter(col("y").isin(1995, 1996))
      li.groupBy("bin")
        .agg(sum(when(col("y") === 1995, 1L).otherwise(0L)).as("n_a"),
          sum(when(col("y") === 1996, 1L).otherwise(0L)).as("n_b"))
        .withColumn("t_a", sum(col("n_a")).over(Window.partitionBy()))
        .withColumn("t_b", sum(col("n_b")).over(Window.partitionBy()))
        .select(col("bin"), col("n_a"), col("n_b"),
          expr("n_a * 10000 DIV t_a").as("bp_a"),
          expr("n_b * 10000 DIV t_b").as("bp_b"))
        .withColumn("l1_bp", abs(col("bp_a") - col("bp_b")))
        .orderBy("bin")
    }),
    // Two-sample Kolmogorov–Smirnov drift statistic, exact integers:
    // D = max over distinct values v of |#A≤v · n_b − #B≤v · n_a|,
    // reported both raw and as ×1e4 of the normalized D. The facts
    // collapse to the |distinct quantity cents| grain (≤ ~5001 rows —
    // continuous data would bin first, same as the L1 gate) in ONE
    // aggregate; the cumulative window then runs over that bounded
    // relation, never the corpus. Products stay under INT64: cum ≤ 1e7
    // rows × counts ≤ 1e7 → ≤ 1e14. The max-CDF-gap complements the
    // per-bin L1 report: KS localizes nothing but bounds the whole
    // distribution shift with one number a release gate can threshold.
    "drift_ks_quantity" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val li = Tables.load(s, dir, "lineitem")
        .select(year(col("l_shipdate")).as("y"),
          floor(col("l_quantity") * 100 + lit(0.5)).cast("long").as("qc"))
        .filter(col("y").isin(1995, 1996))
      val byV = li.groupBy("qc")
        .agg(sum(when(col("y") === 1995, 1L).otherwise(0L)).as("n_a"),
          sum(when(col("y") === 1996, 1L).otherwise(0L)).as("n_b"))
      val w = Window.orderBy("qc")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      byV
        .withColumn("t_a", sum(col("n_a")).over(Window.partitionBy()))
        .withColumn("t_b", sum(col("n_b")).over(Window.partitionBy()))
        .withColumn("c_a", sum(col("n_a")).over(w))
        .withColumn("c_b", sum(col("n_b")).over(w))
        .withColumn("gap", abs(col("c_a") * col("t_b") - col("c_b") * col("t_a")))
        .agg(max(col("t_a")).as("n_a"), max(col("t_b")).as("n_b"),
          max(col("gap")).as("d_num"))
        .select(col("n_a"), col("n_b"), col("d_num"),
          expr("d_num * 10000 DIV (n_a * n_b)").as("d_x1e4"))
    }),
    "compact_roundtrip" -> ((s, dir) => {
      val base = graft.core.Scratch.dir("graft_compact").toString
      Tables.load(s, dir, "documents").select("doc_id", "source", "n_chars")
        .repartition(64).write.mode("overwrite").parquet(s"$base/frag")
      graft.ops.Compact.compacted(s, s"$base/frag", s"$base/packed", targetBytes = 4L << 20)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).cast("long").as("sum_chars"))
        .orderBy("source")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "compare_mismatch_count" -> {
      // reuse the ComparePack CTE: count of its mismatch arms
      val base = ComparePack.oracleSql("compare_mismatches")
      s"SELECT count(*) AS n_mismatches FROM ($base)"
    },
    "keyed_upsert" ->
      """SELECT c_custkey,
        |  CASE WHEN c_custkey % 3 = 0 THEN 'UPD_' || c_name ELSE c_name END AS c_name,
        |  c_mktsegment
        |FROM customer
        |UNION ALL
        |SELECT c_custkey + (SELECT max(c_custkey) + 1 FROM customer), c_name, c_mktsegment
        |FROM customer WHERE c_custkey % 100 = 0
        |ORDER BY c_custkey""".stripMargin,
    "audit_referential" ->
      """SELECT 'lineitem_without_order' AS fk_edge,
        |  (SELECT count(*) FROM lineitem l
        |   WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS n
        |UNION ALL
        |SELECT 'orders_without_customer',
        |  (SELECT count(*) FROM (
        |     SELECT o_orderkey,
        |       CASE WHEN o_orderkey % 300 = 0
        |         THEN o_custkey + (SELECT max(c_custkey) + 1 FROM customer)
        |         ELSE o_custkey END AS o_custkey
        |     FROM orders) b
        |   WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = b.o_custkey))
        |ORDER BY fk_edge""".stripMargin,
    "profile_benford" ->
      """SELECT substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS lead_digit,
        |  count(*) AS n
        |FROM orders GROUP BY 1 ORDER BY lead_digit""".stripMargin,
    "keyed_upsert_merge" ->
      """SELECT c_custkey,
        |  CASE WHEN c_custkey % 5 = 0 THEN 'M_' || c_name ELSE c_name END AS c_name,
        |  c_mktsegment
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "keyed_delete" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey % 7 <> 0 ORDER BY c_custkey""".stripMargin,
    "flatten_props" ->
      """SELECT event_id, CAST(json_extract(props, '$.k') AS INT) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "json_stringify" ->
      """SELECT n_nationkey,
        |  to_json(struct_pack(n_nationkey := n_nationkey, n_name := n_name)) AS doc
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    // same decimal moments, same double-conversion points, same IEEE
    // expression order
    "agg_linreg" ->
      """WITH m AS (SELECT l_returnflag, count(*) AS n,
        |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
        |    sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy,
        |    sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS sxx
        |  FROM lineitem GROUP BY l_returnflag),
        |d AS (SELECT l_returnflag, n,
        |    CAST(n * sxy - sx * sy AS DOUBLE) AS num,
        |    CAST(n * sxx - sx * sx AS DOUBLE) AS den,
        |    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
        |  FROM m)
        |SELECT l_returnflag, n,
        |  CASE WHEN den = 0 THEN NULL
        |    ELSE CAST(FLOOR((num / den) * 1000000 + 0.5) AS BIGINT) END AS slope_x1e6,
        |  CASE WHEN den = 0 THEN NULL
        |    ELSE CAST(FLOOR(((syd - (num / den) * sxd) / n) * 1000000 + 0.5) AS BIGINT) END
        |    AS intercept_x1e6
        |FROM d ORDER BY l_returnflag""".stripMargin,
    // same single IEEE bin expression; -1 arm mirrors the out-of-range
    // counting contract
    "profile_histogram" ->
      """SELECT CAST(CASE WHEN v < 0.0 OR v > 60.0 THEN -1
        |    ELSE LEAST(11, CAST(FLOOR((v - 0.0) * 12.0 / 60.0) AS INT)) END AS INT) AS bin,
        |  count(*) AS n
        |FROM (SELECT CAST(l_quantity AS DOUBLE) AS v FROM lineitem
        |      WHERE l_quantity IS NOT NULL)
        |GROUP BY 1 ORDER BY bin""".stripMargin,
    "profile_columns" -> {
      val per = Seq("c_custkey", "c_name", "c_nationkey", "c_mktsegment").map { c =>
        s"""SELECT '$c' AS column_name,
           |  count(*) - count($c) AS n_nulls,
           |  count(DISTINCT $c) AS n_distinct,
           |  CAST(min($c) AS VARCHAR) AS min_value,
           |  CAST(max($c) AS VARCHAR) AS max_value FROM customer""".stripMargin
      }
      per.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
    },
    "compact_roundtrip" ->
      """SELECT source, count(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "table_checksum" ->
      """SELECT l_returnflag, count(*) AS n_rows,
        |  CAST(SUM(CAST(CONCAT('0x', substr(md5(
        |    CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR) || '|' ||
        |    CAST(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS VARCHAR) || '|' ||
        |    CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS VARCHAR) || '|' ||
        |    l_returnflag || ':ck'), 1, 8)) AS BIGINT)) AS BIGINT) AS checksum
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,
    // the audit passes by construction on this fixture, so published
    // ≡ candidate; 3 rules, 0 violations ride along as literals
    "wap_publish" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        |  CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_c,
        |  CAST(3 AS BIGINT) AS audit_rules,
        |  CAST(0 AS BIGINT) AS audit_violations
        |FROM orders GROUP BY 1 ORDER BY o_orderstatus""".stripMargin,
    // the loser's (full-table) candidate is the final snapshot at v2
    // after exactly one conflict
    "wap_publish_cas" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        |  CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_c,
        |  CAST(2 AS BIGINT) AS final_version,
        |  CAST(1 AS BIGINT) AS conflicts
        |FROM orders GROUP BY 1 ORDER BY o_orderstatus""".stripMargin,
    // v1 staged every third order; the as-of read sees exactly that
    // subset even though v2 (the full table) is head
    "wap_time_travel" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        |  CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_c,
        |  CAST(1 AS BIGINT) AS as_of_version,
        |  CAST(2 AS BIGINT) AS head_version
        |FROM orders WHERE o_orderkey % 3 = 0
        |GROUP BY 1 ORDER BY o_orderstatus""".stripMargin,
    // after the rollback the head (v3) points at v1's data again
    "wap_rollback" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        |  CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_c,
        |  CAST(3 AS BIGINT) AS head_version
        |FROM orders WHERE o_orderkey % 3 = 0
        |GROUP BY 1 ORDER BY o_orderstatus""".stripMargin,
    // v3 ≡ v1's data = the third-keys slice; head v4, two versions
    // tombstoned, one directory reclaimed (v1's survives via v3)
    "wap_expire" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        |  CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_c,
        |  CAST(4 AS BIGINT) AS head_version,
        |  CAST(2 AS BIGINT) AS n_expired,
        |  CAST(1 AS BIGINT) AS n_reclaimed
        |FROM orders WHERE o_orderkey % 3 = 0
        |GROUP BY 1 ORDER BY o_orderstatus""".stripMargin,
    // mirror the two snapshot definitions, full-outer join on the key,
    // classify with IS DISTINCT FROM (null-safe, same as the engine's
    // <=> negation), aggregate per class
    "wap_changes_feed" ->
      """WITH a AS (SELECT o_orderkey, o_orderstatus, o_totalprice
        |    FROM orders WHERE o_orderkey % 5 <> 0),
        |b AS (SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 10.0
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM orders WHERE o_orderkey % 3 <> 0),
        |d AS (SELECT
        |    CASE WHEN a.o_orderkey IS NULL THEN 'insert'
        |         WHEN b.o_orderkey IS NULL THEN 'delete'
        |         WHEN a.o_orderstatus IS DISTINCT FROM b.o_orderstatus
        |           OR a.o_totalprice IS DISTINCT FROM b.o_totalprice THEN 'update'
        |         ELSE 'unchanged' END AS change_type,
        |    COALESCE(b.o_totalprice, a.o_totalprice) AS p
        |  FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey)
        |SELECT change_type, count(*) AS n,
        |  CAST(SUM(CAST(floor(p * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_c
        |FROM d GROUP BY 1 ORDER BY change_type""".stripMargin,
    "table_checksum_diff" ->
      """WITH rows_a AS (SELECT l_returnflag,
        |    CAST(CONCAT('0x', substr(md5(
        |      CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR) || '|' ||
        |      CAST(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS VARCHAR) || '|' ||
        |      CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS VARCHAR) || '|' ||
        |      l_returnflag || ':ck'), 1, 8)) AS BIGINT) AS h
        |  FROM lineitem),
        |rows_b AS (SELECT l_returnflag,
        |    CAST(CONCAT('0x', substr(md5(
        |      CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR) || '|' ||
        |      CAST(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS VARCHAR) || '|' ||
        |      CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) +
        |        (CASE WHEN l_returnflag = 'R' AND l_orderkey % 1000 = 0 THEN 1 ELSE 0 END)
        |        AS VARCHAR) || '|' ||
        |      l_returnflag || ':ck'), 1, 8)) AS BIGINT) AS h
        |  FROM lineitem),
        |a AS (SELECT l_returnflag, count(*) AS n_a, CAST(SUM(h) AS BIGINT) AS ck_a
        |  FROM rows_a GROUP BY 1),
        |b AS (SELECT l_returnflag, count(*) AS n_b, CAST(SUM(h) AS BIGINT) AS ck_b
        |  FROM rows_b GROUP BY 1)
        |SELECT a.l_returnflag, a.n_a, b.n_b,
        |  (a.n_a = b.n_b AND a.ck_a = b.ck_b) AS checksums_match
        |FROM a FULL OUTER JOIN b USING (l_returnflag)
        |ORDER BY l_returnflag""".stripMargin,
    // the same exact-integer max-CDF-gap, windowed over distinct cents
    "drift_ks_quantity" ->
      """WITH b AS (SELECT year(l_shipdate) AS y,
        |    CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS qc
        |  FROM lineitem WHERE year(l_shipdate) IN (1995, 1996)),
        |g AS (SELECT qc,
        |    CAST(SUM(CASE WHEN y = 1995 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN y = 1996 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        |  FROM b GROUP BY 1),
        |w AS (SELECT qc, n_a, n_b,
        |    CAST(SUM(n_a) OVER () AS BIGINT) AS t_a,
        |    CAST(SUM(n_b) OVER () AS BIGINT) AS t_b,
        |    CAST(SUM(n_a) OVER (ORDER BY qc
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c_a,
        |    CAST(SUM(n_b) OVER (ORDER BY qc
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c_b
        |  FROM g)
        |SELECT max(t_a) AS n_a, max(t_b) AS n_b,
        |  CAST(max(abs(c_a * t_b - c_b * t_a)) AS BIGINT) AS d_num,
        |  CAST(max(abs(c_a * t_b - c_b * t_a)) * 10000
        |    // (max(t_a) * max(t_b)) AS BIGINT) AS d_x1e4
        |FROM w""".stripMargin,
    "drift_l1_quantity" ->
      """WITH b AS (SELECT year(l_shipdate) AS y,
        |    least(11, CAST(floor(l_quantity * 12 / 60) AS INT)) AS bin
        |  FROM lineitem WHERE year(l_shipdate) IN (1995, 1996)),
        |g AS (SELECT bin,
        |    CAST(SUM(CASE WHEN y = 1995 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN y = 1996 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        |  FROM b GROUP BY 1),
        |w AS (SELECT bin, n_a, n_b,
        |    CAST(SUM(n_a) OVER () AS BIGINT) AS t_a,
        |    CAST(SUM(n_b) OVER () AS BIGINT) AS t_b
        |  FROM g)
        |SELECT bin, n_a, n_b,
        |  CAST(n_a * 10000 // t_a AS BIGINT) AS bp_a,
        |  CAST(n_b * 10000 // t_b AS BIGINT) AS bp_b,
        |  CAST(abs(n_a * 10000 // t_a - n_b * 10000 // t_b) AS BIGINT) AS l1_bp
        |FROM w ORDER BY bin""".stripMargin,
  )
}
