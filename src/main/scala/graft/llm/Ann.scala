package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Two tiers:
  *  - `cosineTopK` — brute-force baseline: broadcast the (small) query
  *    set against the corpus; cosine via codegen'd higher-order array
  *    functions (zip_with + aggregate), no UDFs; per-query top-k via a
  *    qid-partitioned window rank. Cost O(|q|·|corpus|) — correct for
  *    small |q|, the exact-recall baseline.
  *  - `ivfTopK` — the scale path, a real IVF built in-engine:
  *      1. `seedCentroids`: deterministic init — the n corpus vectors
  *         with the smallest keyed md5 (top-n by hash compiles to
  *         TakeOrderedAndProject, no global sort);
  *      2. `lloydStep` × iters: k-means refinement as DataFrame
  *         aggregations. Component sums accumulate in **integer
  *         fixed-point** (floor(v·1e6) summed as longs) — integer
  *         addition is order-independent, so centroids are bit-identical
  *         regardless of partitioning, task retries, or which engine
  *         (Spark vs the DuckDB oracle) computes them;
  *      3. `assignBuckets`: argmax-cosine bucket per vector as a
  *         NARROW codegen'd expression over the collected centroid
  *         matrix (no Exchange — every assignment pass is a pure
  *         per-row projection);
  *      4. `probeBuckets`: multi-probe — each query searches its
  *         `nprobe` nearest buckets, recovering recall at bucket edges.
  *    Cost drops to O(|q|·nprobe·|corpus|/n); the bucket join shuffles
  *    on the bucket key only.
  *
  * Recall honesty: on clustered embeddings (the realistic corpus —
  * real text/image embeddings are strongly clustered) nprobe=2 of
  * n=10 buckets reaches ≥0.9 recall (AnnSpec proves it on a separable
  * fixture). On *isotropic random* vectors — the `embeddings` test
  * fixture, within-label mean cosine ≈ 0.007 — no partitioning scheme
  * beats recall ≈ scanned-fraction; `ann_ivf_recall` records the
  * measured value rather than pretending otherwise.
  *
  * Cosines are emitted as floor-scaled 4-decimal fixed-point longs
  * (F.scale4) and ranked on the scaled value (ties → vec_id) so results
  * are stable across engines.
  */
object Ann {

  /** Sum of elementwise products in double precision, sequential fold
    * (portable across engines: each element is widened before
    * multiply, accumulation is left-to-right). Runs on the codegen'd
    * ArrayDot expression — Spark's higher-order functions are
    * CodegenFallback, and the dot product is the hot loop of every
    * operator in this file. */
  private def dotExpr(a: String, b: String) = {
    import graft.functions.F
    F.toColumn(graft.functions.ArrayDot(F.toExpr(expr(a)), F.toExpr(expr(b))))
  }

  /** Cosine similarity as the portable 4-decimal fixed-point long. */
  def cosScaled(a: String, b: String): Column =
    graft.functions.F.scale4(dotExpr(a, b) / sqrt(dotExpr(a, a) * dotExpr(b, b)))

  /** Cosine from PRECOMPUTED per-side self-dots: scale4(dot(a,b) /
    * sqrt(a2*b2)) — the exact IEEE op sequence of [[cosScaled]] (the
    * self-dot is a pure per-row function, so hoisting it into a
    * projection changes nothing bit-wise), but each side's self-dot is
    * computed once per ROW instead of once per candidate PAIR. At
    * Σ bucket² / |q|·|corpus| pair counts this removes 2 of the 3
    * array dots from every hot loop in this file. */
  private def cosScaledPre(a: String, b: String, a2: Column, b2: Column): Column =
    graft.functions.F.scale4(dotExpr(a, b) / sqrt(a2 * b2))

  /** Symmetric per-vector int8 quantization: scale = max|x|/127, q_i =
    * clamp(round(x_i / scale)) — one byte per component, 4× smaller
    * than float32, which is the storage/IO lever for a 100 TB
    * embedding corpus. Built-in HOFs are fine HERE (one interpreted
    * pass per stored vector at write time); the per-PAIR hot path runs
    * the codegen'd integer [[graft.functions.ArrayDotInt8]]. Quantized
    * cosine is iab / sqrt(iaa·ibb) — the scales cancel and every term
    * is an EXACT integer, so scores are oracle-reproducible with no
    * IEEE summation-order caveat. Zero vectors quantize to all-zero. */
  def quantizeInt8(df: DataFrame, vec: String, q: String): DataFrame =
    df.withColumn("_qscale",
        expr(s"array_max(transform($vec, x -> abs(CAST(x AS DOUBLE)))) / 127.0D"))
      .withColumn(q, expr(
        s"""CASE WHEN _qscale = 0.0D THEN transform($vec, x -> CAST(0 AS TINYINT))
           |ELSE transform($vec, x -> CAST(LEAST(127.0D, GREATEST(-127.0D,
           |  round(CAST(x AS DOUBLE) / _qscale))) AS TINYINT)) END""".stripMargin))
      .drop("_qscale")

  /** Brute-force cosine top-k over int8-QUANTIZED vectors — the same
    * contract and plan shape as [[cosineTopK]] (broadcast query side,
    * per-query window rank) at a quarter of the candidate-side bytes.
    * Self-dots precompute per row like [[cosScaledPre]]; the pair loop
    * is one integer dot. Zero vectors (self-dot 0) score null and rank
    * last, on both engines. */
  def cosineTopKInt8(queries: DataFrame, corpus: DataFrame, k: Int = 10): DataFrame = {
    import graft.functions.{ArrayDotInt8, F}
    def dotq(a: Column, b: Column): Column =
      F.toColumn(ArrayDotInt8(F.toExpr(a), F.toExpr(b)))
    val q = quantizeInt8(queries, "qe", "qq")
      .select(col("qid"), col("qq"), dotq(col("qq"), col("qq")).as("qqq"))
    val c = quantizeInt8(corpus, "ce", "cq")
      .select(col("vec_id"), col("cq"), dotq(col("cq"), col("cq")).as("cqq"))
    val scored = broadcast(q).crossJoin(c)
      .select(col("qid"), col("vec_id"),
        when(col("qqq") === 0L || col("cqq") === 0L, lit(null))
          .otherwise(F.scale4(dotq(col("qq"), col("cq")).cast("double")
            / sqrt((col("qqq") * col("cqq")).cast("double"))))
          .as("cos_x1e4"))
    val w = Window.partitionBy("qid").orderBy(desc("cos_x1e4"), asc("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** queries(qid, qe) × corpus(vec_id, ce) → top-k by cosine. */
  def cosineTopK(queries: DataFrame, corpus: DataFrame, k: Int = 10): DataFrame = {
    val q = broadcast(queries.select(col("qid"), col("qe"),
      dotExpr("qe", "qe").as("qe2")))
    val joined = q.crossJoin(corpus.select(col("vec_id"), col("ce"),
      dotExpr("ce", "ce").as("ce2")))
    rankTopK(joined, k)
  }

  // -------------------------------------------------------------------
  // IVF index build
  // -------------------------------------------------------------------

  /** Deterministic seeded init: the n corpus vectors with the smallest
    * md5(vec_id ":" seed), cid = 0..n-1 in hash order. orderBy+limit
    * compiles to TakeOrderedAndProject (per-partition heap + driver
    * merge); the rank over the surviving n rows goes through the
    * scale-safe Rank helper. Output (cid, cemb: array<double>). */
  def seedCentroids(corpus: DataFrame, n: Int, seed: String = "ivf"): DataFrame = {
    val h = md5(concat(col("vec_id").cast("string"), lit(s":$seed")))
    val top = corpus.select(col("vec_id"), col("ce"), h.as("h"))
      .orderBy(col("h"), col("vec_id")).limit(n)
    graft.ops.Rank.globalRowNumber(top, Seq(col("h"), col("vec_id")), "rn")
      .select((col("rn") - 1).cast("int").as("cid"),
        expr("transform(ce, x -> CAST(x AS DOUBLE))").as("cemb"))
  }

  /** [[seedCentroids]] collapsed to ONE job: the ≤n winning rows come
    * back through the same TakeOrderedAndProject (per-partition heap +
    * driver merge), and the 0..n-1 cid rank — a total order over ≤n
    * driver-local rows — is assigned driver-side instead of through a
    * zipWithIndex round-trip (which costs an extra per-partition count
    * job plus a second collect). Values are identical: the hash column
    * sorts as lowercase-hex ASCII, which String ordering and Spark's
    * UTF8 binary ordering agree on, and CAST(float AS DOUBLE) is the
    * same exact widening as `toDouble`. */
  private def seedCentroidArrays(corpus: DataFrame, n: Int,
      seed: String): Array[(Int, Array[Double])] = {
    val h = md5(concat(col("vec_id").cast("string"), lit(s":$seed")))
    val top = corpus.select(
        expr("transform(ce, x -> CAST(x AS DOUBLE))").as("cemb"),
        h.as("h"), col("vec_id").cast("long").as("vid"))
      .orderBy(col("h"), col("vid")).limit(n).collect()
    top.map(r => (r.getString(1), r.getLong(2), r.getSeq[Double](0).toArray))
      .sortBy(t => (t._1, t._2))
      .zipWithIndex
      .map { case ((_, _, c), i) => (i, c) }
  }

  /** Argmax-cosine bucket per corpus vector, as a NARROW projection:
    * the centroid set — small by construction, it IS the index —
    * collects to the driver and compiles into the codegen'd
    * [[graft.functions.ArgmaxBucket]] expression, so assignment adds
    * no Exchange at any corpus size. (An earlier formulation ran
    * crossJoin → packed-long min HashAggregate → join-back: same
    * buckets bit-for-bit — ArgmaxOps freezes the identical IEEE op
    * order and ascending-cid strict-`>` tie-break — but it shuffled
    * the corpus twice per assignment pass.) Highest cosine wins, ties
    * to the smallest cid. Output (vec_id, ce, ce2, bucket). */
  def assignBuckets(corpus: DataFrame, centroids: DataFrame): DataFrame =
    assignBucketsArr(corpus, collectCentArrays(centroids))

  /** Centroid table → driver arrays, sorted by cid (the literal form
    * the codegen'd assignment expressions compile against). */
  private def collectCentArrays(centroids: DataFrame): Array[(Int, Array[Double])] =
    centroids.select(col("cid"), col("cemb")).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray)).sortBy(_._1)

  /** [[assignBuckets]] against driver-local centroid arrays — the form
    * the build loop uses so a step's collected result feeds the next
    * assignment with zero extra jobs. */
  private def assignBucketsArr(corpus: DataFrame,
      cents: Array[(Int, Array[Double])]): DataFrame = {
    import graft.functions.{ArgmaxBucket, F}
    require(cents.nonEmpty, "assignBuckets: empty centroid set")
    corpus.select(col("vec_id"), col("ce"), dotExpr("ce", "ce").as("ce2"),
      F.toColumn(ArgmaxBucket(F.toExpr(col("ce")),
        cents.map(_._1), cents.map(_._2))).as("bucket"))
  }

  /** One Lloyd iteration: reassign, then recompute each centroid as the
    * component-wise mean of its members. Sums run in integer
    * fixed-point (exact, order-independent); the final division is one
    * IEEE double op, identical everywhere. Buckets that lose all
    * members disappear (their vectors reassign next step).
    *
    * The component sums run as ONE wide hash aggregate — `dim` sum
    * columns over `element_at` — instead of posexplode + groupBy
    * (bucket, pos): same values (integer sums commute), but the shuffle
    * carries |buckets| rows of partial sums rather than N×dim exploded
    * rows, and the second collect_list aggregate disappears. */
  def lloydStep(corpus: DataFrame, centroids: DataFrame, dim: Int): DataFrame =
    assignBuckets(corpus, centroids)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        (0 until dim).map(p =>
          sum(floor(element_at(col("ce"), p + 1).cast("double") * 1000000d)
            .cast("long")).as(s"s$p")): _*)
      .select(col("bucket").as("cid"),
        array((0 until dim).map(p =>
          col(s"s$p").cast("double") / (col("n") * 1000000L).cast("double")): _*)
          .as("cemb"))

  /** Full index build: seeded init + `iters` Lloyd refinements. The
    * result materializes to the driver and returns as a local
    * DataFrame — the centroid set is small by construction (n rows),
    * this is the "index build" boundary every IVF system has, and it
    * keeps the search plans flat: assignment and probing each
    * broadcast a literal table instead of re-reading a cached
    * multi-stage lineage. */
  def ivfCentroids(corpus: DataFrame, n: Int, iters: Int = 2,
      seed: String = "ivf"): DataFrame = {
    // The build scans the corpus iters+1 times (seeding + one
    // assignment per Lloyd step). Each step's ≤n-row result collects
    // to the driver and feeds the next assignment as a literal — a
    // lazily-folded chain would re-execute 1+2+…+iters assignment
    // passes. r20: the whole loop is driver arrays (seeding is the
    // one-job [[seedCentroidArrays]], the dimensionality comes from
    // the seed rows instead of a separate probe job, and each Lloyd
    // step is one aggregate + collect) — iters+1 jobs total, down
    // from 2·(iters+1)+2 with the localize/zipWithIndex round-trips.
    val cached = corpus.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var cents = seedCentroidArrays(cached, n, seed)
      require(cents.nonEmpty, "ivfCentroids: empty corpus")
      val dim = cents.head._2.length
      (0 until iters).foreach { _ =>
        // identical values to [[lloydStep]]: same assignment
        // expression, same order-independent fixed-point sums, same
        // single IEEE division per component.
        cents = assignBucketsArr(cached, cents)
          .groupBy("bucket")
          .agg(count(lit(1)).as("n"),
            (0 until dim).map(p =>
              sum(floor(element_at(col("ce"), p + 1).cast("double") * 1000000d)
                .cast("long")).as(s"s$p")): _*)
          .collect()
          .map { r =>
            val n0 = r.getLong(1)
            (r.getInt(0), Array.tabulate(dim)(p =>
              r.getLong(2 + p).toDouble / (n0 * 1000000L).toDouble))
          }
          .sortBy(_._1)
      }
      localCentDf(corpus.sparkSession, cents)
    } finally cached.unpersist(blocking = false)
  }

  /** Driver centroid arrays → the local literal (cid, cemb) DataFrame
    * every search/assignment entry point consumes. */
  private def localCentDf(spark: org.apache.spark.sql.SparkSession,
      cents: Array[(Int, Array[Double])]): DataFrame = {
    import org.apache.spark.sql.types._
    val rows = cents.map { case (cid, c) =>
      org.apache.spark.sql.Row(cid, c.toSeq) }
    spark.createDataFrame(java.util.Arrays.asList(rows: _*),
      StructType(Seq(
        StructField("cid", IntegerType, nullable = false),
        StructField("cemb", ArrayType(DoubleType, containsNull = false),
          nullable = false))))
  }

  /** Multi-probe: each query pairs with its `nprobe` nearest centroids
    * (qid-partitioned window over |centroids| rows per query).
    * Output (qid, qe, bucket). */
  def probeBuckets(queries: DataFrame, centroids: DataFrame, nprobe: Int): DataFrame = {
    val cents = centroids.select(col("cid"), col("cemb"),
      dotExpr("cemb", "cemb").as("cemb2"))
    val scored = queries.select(col("qid"), col("qe"), dotExpr("qe", "qe").as("qe2"))
      .crossJoin(broadcast(cents))
      .select(col("qid"), col("qe"), col("qe2"), col("cid"),
        cosScaledPre("qe", "cemb", col("qe2"), col("cemb2")).as("c"))
    val w = Window.partitionBy("qid").orderBy(desc("c"), asc("cid"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= nprobe)
      .select(col("qid"), col("qe"), col("qe2"), col("cid").as("bucket"))
  }

  /** IVF search: assign corpus buckets, probe nprobe buckets per
    * query, join on the bucket key, per-query top-k. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
      k: Int = 10, nprobe: Int = 2): DataFrame =
    ivfTopKPreassigned(queries, assignBuckets(corpus, centroids), centroids,
      k, nprobe)

  /** [[ivfTopK]] against a PREASSIGNED corpus — the serving shape:
    * bucket assignment (the expensive corpus-side pass) runs once at
    * index-build time and persists; each query batch pays only its own
    * probing plus the bucket-restricted join. The streaming retrieval
    * path ([[graft.streaming.AnnStream]]) reuses one assignment
    * relation across every micro-batch. */
  def ivfTopKPreassigned(queries: DataFrame, assigned: DataFrame,
      centroids: DataFrame, k: Int = 10, nprobe: Int = 2): DataFrame = {
    val probes = broadcast(probeBuckets(queries, centroids, nprobe))
    rankTopK(probes.join(assigned, Seq("bucket")), k)
  }

  /** The full scale composition: IVF bucket restriction AND int8
    * scoring. Assignment and probing run on full precision (centroid
    * geometry should not inherit quantization error); the candidate
    * pair loop — the only O(|q|·nprobe·|corpus|/n) part — runs the
    * codegen'd integer dot over quarter-size vectors. Same output
    * contract as [[ivfTopK]]; scores carry the quantized cosine. */
  def ivfTopKInt8(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
      k: Int = 10, nprobe: Int = 2): DataFrame = {
    import graft.functions.{ArrayDotInt8, F}
    def dotq(a: Column, b: Column): Column =
      F.toColumn(ArrayDotInt8(F.toExpr(a), F.toExpr(b)))
    val cass = quantizeInt8(assignBuckets(corpus, centroids), "ce", "cq")
      .select(col("vec_id"), col("bucket"), col("cq"),
        dotq(col("cq"), col("cq")).as("cqq"))
    val probes = quantizeInt8(probeBuckets(queries, centroids, nprobe), "qe", "qq")
      .select(col("qid"), col("bucket"), col("qq"),
        dotq(col("qq"), col("qq")).as("qqq"))
    val scored = broadcast(probes).join(cass, Seq("bucket"))
      .select(col("qid"), col("vec_id"),
        when(col("qqq") === 0L || col("cqq") === 0L, lit(null))
          .otherwise(F.scale4(dotq(col("qq"), col("cq")).cast("double")
            / sqrt((col("qqq") * col("cqq")).cast("double"))))
          .as("cos_x1e4"))
    val w = Window.partitionBy("qid").orderBy(desc("cos_x1e4"), asc("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Expects qe2/ce2 (the per-side self-dots) already projected onto
    * `joined` — see [[cosScaledPre]] for why this is value-identical
    * to the inline cosine. */
  private def rankTopK(joined: DataFrame, k: Int): DataFrame = {
    val scored = joined.select(col("qid"), col("vec_id"),
      cosScaledPre("qe", "ce", col("qe2"), col("ce2")).as("cos_x1e4"))
    val w = Window.partitionBy("qid").orderBy(desc("cos_x1e4"), asc("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Embedding-cosine near-duplicate pairs (a < b, cosine ≥
    * threshold/1e4), bucket-restricted through the IVF assignment: the
    * self-join runs per bucket, so cost is Σ bucket² instead of
    * |corpus|² — the embedding twin of MinHash-LSH banding. Like any
    * locality partitioning it can miss cross-bucket pairs right at a
    * boundary; identical/near-identical vectors assign identically by
    * construction. */
  def embeddingDupPairs(corpus: DataFrame, centroids: DataFrame,
      threshold4: Long = 9500L): DataFrame = {
    // Norms precompute once per vector (narrow map), so each candidate
    // pair costs ONE dot product, not three — at Σ bucket² pairs the
    // per-pair cost is the whole game. sqrt is taken per side (not
    // sqrt(na²·nb²)) so the oracle can mirror the exact IEEE ops; the
    // self-dot under it reuses the assignment's ce2 column (same value,
    // computed once).
    // The assignment persists across the self-join — without it the
    // whole assignment subtree computes twice (once per join side).
    val assigned = assignBuckets(corpus, centroids)
      .withColumn("nrm", sqrt(col("ce2")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val x = assigned.as("x"); val y = assigned.as("y")
    // Materialize the (thresholded, bucket-bounded) pair result once
    // and release the assignment cache with it — the near-dup pair set
    // is the terminal output here, and the cached assignment would
    // otherwise stay pinned in the CacheManager after the caller's
    // action.
    graft.core.Materialize.drained(
      x.join(y, col("x.bucket") === col("y.bucket") && col("x.vec_id") < col("y.vec_id"))
        .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
          graft.functions.F.scale4(
            dotExpr("x.ce", "y.ce") / (col("x.nrm") * col("y.nrm"))).as("cos_x1e4"))
        .filter(col("cos_x1e4") >= threshold4),
      assigned)
  }

  /** Measured IVF recall against the exact baseline from ONE scored
    * relation and ONE window sort. Every (query, corpus-vector) pair
    * is scored exactly once — the IVF candidate set is by construction
    * a subset of the brute all-pairs set, so scoring it separately (as
    * a naive ivfTopK + cosineTopK composition would) repeats nprobe/n
    * of the dot products and pays a second qid-keyed sort. Instead the
    * single ranked pass carries both ranks:
    *  - `r_all`   — row_number over (desc cos, asc vec_id): the exact
    *    rank, identical to [[cosineTopK]]'s;
    *  - `r_cand`  — a running sum of the candidate flag over the SAME
    *    ordered frame: the rank among IVF candidates (pairs whose
    *    assigned bucket is probed for that query). The flagged subset
    *    ranks in the same (desc cos, asc vec_id) order [[ivfTopK]]
    *    uses, so `cand && r_cand <= k` IS the ivfTopK result set.
    * recall = |{r_all ≤ k} ∩ {cand ∧ r_cand ≤ k}| / k, one hash
    * aggregate on qid (every qid appears — the cross product keys all
    * of them), replacing the old semi-join + right-outer repair. The
    * two window frames share one partition/order spec, so CollapseWindow
    * fuses them into a single sort — no persist, no second pass. */
  def ivfRecall(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
      k: Int = 10, nprobe: Int = 2): DataFrame = {
    val cass = assignBuckets(corpus, centroids)
    val probes = probeBuckets(queries, centroids, nprobe)
      .select(col("qid").as("_pqid"), col("bucket").as("_pbucket"))
    val q = queries.select(col("qid"), col("qe"), dotExpr("qe", "qe").as("qe2"))
    val scored = broadcast(q).crossJoin(cass)
      .join(broadcast(probes),
        col("qid") === col("_pqid") && col("bucket") === col("_pbucket"), "left")
      .select(col("qid"), col("vec_id"),
        cosScaledPre("qe", "ce", col("qe2"), col("ce2")).as("cos_x1e4"),
        col("_pqid").isNotNull.as("cand"))
    val w = Window.partitionBy("qid").orderBy(desc("cos_x1e4"), asc("vec_id"))
    scored
      .withColumn("r_all", row_number().over(w))
      .withColumn("r_cand", sum(when(col("cand"), 1L).otherwise(0L))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("qid")
      .agg(sum(when(col("r_all") <= k && col("cand") && col("r_cand") <= k, 1L)
        .otherwise(0L)).as("n_hits"))
      .select(col("qid"), col("n_hits"),
        graft.functions.F.scale4(col("n_hits").cast("double") / k).as("recall_x1e4"))
  }

  /** Per-query recall of `approx` against `exact` (both shaped
    * (qid, vec_id, ..., rank), rank ≤ k). Output
    * (qid, n_hits, recall_x1e4). */
  def recallVsBrute(approx: DataFrame, exact: DataFrame, k: Int = 10): DataFrame = {
    val a = approx.select(col("qid"), col("vec_id"))
    val e = exact.select(col("qid"), col("vec_id"))
    e.join(a, Seq("qid", "vec_id"), "left_semi")
      .groupBy("qid").agg(count(lit(1)).as("n_hits"))
      .join(e.select("qid").distinct(), Seq("qid"), "right_outer")
      .na.fill(0, Seq("n_hits"))
      .select(col("qid"), col("n_hits"),
        graft.functions.F.scale4(col("n_hits").cast("double") / k).as("recall_x1e4"))
  }

  // ---- index persistence (the serving boundary) ------------------------

  /** Materialize an IVF index as two parquet tables under `dir`: the
    * ≤n-row centroid table and the bucket-assigned corpus, the latter
    * range-clustered on `bucket` with a [[graft.ops.FileIndex]]
    * manifest. Build once, write, reload in ANY later session, query
    * with [[ivfTopKPersisted]] — serving never re-clusters and never
    * re-pays the Lloyd passes (the round-12 gap: centroids +
    * assignments lived only in memory, so a serving path re-paid the
    * build per process). Range clustering on the bucket id is what
    * makes the probe-restricted query cheap at corpus scale: each
    * assignment file owns a narrow bucket span, so an nprobe-bucket
    * query reads ~nprobe/n of the corpus files. */
  def writeIndex(corpus: DataFrame, dir: String, n: Int, iters: Int = 2,
      files: Int = 16, seed: String = "ivf"): Unit = {
    val cent = ivfCentroids(corpus, n, iters, seed)
    cent.coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
    graft.ops.FileIndex.writeIndexed(assignBuckets(corpus, cent),
      s"$dir/assigned", "bucket", files)
    // Corpus fingerprint, recorded with the build: a corpus refresh
    // that skips re-indexing would otherwise serve stale assignments
    // SILENTLY (the manifest stays self-consistent — nothing in the
    // serving path could notice). verifyIndex compares this at load.
    corpusFingerprint(corpus)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/fingerprint")
  }

  /** Order-independent corpus fingerprint: row count + bit_xor of the
    * per-row xxhash64(vec_id, ce). XOR (not sum) so the aggregate is
    * partitioning-independent AND overflow-free under ANSI mode; any
    * added, dropped, or edited vector flips it. */
  private def corpusFingerprint(corpus: DataFrame): DataFrame =
    corpus.agg(count(lit(1)).as("n_vectors"),
      coalesce(expr("bit_xor(xxhash64(vec_id, ce))"), lit(0L)).as("checksum"))

  /** Guard for [[ivfTopKPersisted]]: recompute the fingerprint of the
    * corpus the caller BELIEVES is indexed and compare it to the one
    * recorded at build time. Fails loud on mismatch — serving
    * stale-assignment results after a corpus refresh is a silent
    * correctness bug, not a degradation. One corpus scan; call it at
    * deploy/refresh boundaries, not per query. */
  def verifyIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
      corpus: DataFrame): Unit = {
    val rec = spark.read.parquet(s"$dir/fingerprint").head()
    val cur = corpusFingerprint(corpus).head()
    if (rec.getLong(0) != cur.getLong(0) || rec.getLong(1) != cur.getLong(1))
      throw new IllegalStateException(
        s"stale IVF index at $dir: recorded corpus (n=${rec.getLong(0)}, " +
          f"checksum=${rec.getLong(1)}%016x) != current corpus " +
          f"(n=${cur.getLong(0)}, checksum=${cur.getLong(1)}%016x) — " +
          "the corpus changed since writeIndex; rebuild the index")
  }

  /** The persisted centroid table as a LOCAL literal DataFrame (≤n
    * rows — the same localization the build uses, keeping downstream
    * search plans flat). */
  def loadCentroids(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/centroids")
    spark.createDataFrame(java.util.Arrays.asList(df.collect(): _*), df.schema)
  }

  /** IVF search against a PERSISTED index: load centroids, probe, prune
    * the assignment table's FILES to those whose bucket span intersects
    * a probed bucket (one manifest read — driver-side metadata, the
    * planning step every indexed system has), then the usual
    * bucket-restricted join + per-query top-k. The only cluster work is
    * the pruned scan and the search joins — zero re-clustering, which
    * is the point: ≡ [[ivfTopK]] output over the same build. */
  def ivfTopKPersisted(spark: org.apache.spark.sql.SparkSession, queries: DataFrame,
      dir: String, k: Int = 10, nprobe: Int = 2): DataFrame = {
    val cent = loadCentroids(spark, dir)
    val probes = probeBuckets(queries, cent, nprobe)
    // distinct probed buckets: ≤ |queries|·nprobe values — metadata-sized
    val buckets = probes.select("bucket").distinct().collect().map(_.getInt(0)).toSet
    val manifest = spark.read.parquet(s"$dir/assigned/_index")
      .select("file", "lo", "hi").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
    val keep = manifest.collect {
      case (f, lo, hi) if buckets.exists(b => b >= lo && b <= hi) => f
    }
    val assigned =
      if (keep.isEmpty) spark.read.parquet(s"$dir/assigned").limit(0)
      else spark.read.parquet(keep.toIndexedSeq: _*)
    rankTopK(broadcast(probes).join(assigned, Seq("bucket")), k)
  }

  // ---- Product quantization (Jégou, Douze & Schmid 2011) ------------

  /** Per-subspace argmin-L2 assignment as a NARROW projection (the
    * [[assignBuckets]] rationale, PQ's metric): the codebook collects
    * to the driver — m·ksub rows, it IS the codebook — and compiles
    * into the codegen'd [[graft.functions.ArgminL2Bucket]]. Smallest
    * ×1e6-scaled squared distance wins, ties to the smallest cid. */
  private def pqAssignExpr(sub: Column,
      cents: Array[(Int, Array[Double])]): Column = {
    import graft.functions.{ArgminL2Bucket, F}
    F.toColumn(ArgminL2Bucket(F.toExpr(sub), cents.map(_._1), cents.map(_._2)))
  }

  /** PQ codebooks: slice each vector into `m` contiguous dim/m
    * subvectors and train an independent ksub-centroid k-means per
    * subspace — seeded by the SAME keyed-md5 init as IVF (seed
    * `pq<s>`), refined by `iters` Lloyd steps whose assignment metric
    * is squared L2 (PQ approximates dot products from reconstructed
    * subvectors, so subspace geometry — not direction — is what must
    * be preserved; cosine stays the IVF routing metric). Mean updates
    * run in the same order-independent integer fixed-point as
    * [[lloydStep]].
    *
    * The build scans the cached corpus m·(iters+1) times and each step
    * localizes to a ≤ksub-row driver table (the [[ivfCentroids]]
    * lifecycle); the result is metadata-sized: m·ksub rows of dim/m
    * doubles. Output (sub, cid, cemb). */
  def pqCodebooks(corpus: DataFrame, m: Int, ksub: Int, iters: Int = 2,
      seed: String = "pq"): DataFrame = {
    val cached = corpus.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try pqCodebooksCached(cached, m, ksub, iters, seed)
    finally cached.unpersist(blocking = false)
  }

  /** [[pqCodebooks]] over an input the CALLER has already persisted
    * (or that is cheap to rescan) — [[writeIndexPq]] trains from the
    * persisted residual relation and must not double-cache a second
    * projected copy of a corpus-sized table.
    *
    * r20 build shape (values unchanged, passes divided by m): the m
    * per-subspace Lloyd refinements each re-read the whole `ce`
    * column anyway (parquet stores the vector as ONE array column —
    * slicing prunes nothing at the scan), so the m independent
    * aggregations now run as ONE exploded aggregate per iteration:
    * each row emits its m (sub, bucket, subvector) arms, map-side
    * partial aggregation collapses them to ≤ m·ksub groups per task
    * before the exchange, and the collected (sub, bucket) sums split
    * back into per-subspace codebooks driver-side. Assignment stays
    * the same per-subspace codegen'd argmin-L2; component sums stay
    * order-independent fixed-point integers; the mean is the same
    * single IEEE division — bit-identical codebooks (AnnSpec pins
    * determinism, the oracle pins values). Seeding runs the one-job
    * [[seedCentroidArrays]] per subspace: m + iters jobs total,
    * down from m·(2·(iters+1)) + 1. */
  def pqCodebooksCached(cached: DataFrame, m: Int, ksub: Int,
      iters: Int = 2, seed: String = "pq"): DataFrame = {
    val probe = cached.select(size(col("ce")).as("d")).limit(1).collect()
    require(probe.nonEmpty, "pqCodebooks: empty corpus — cannot probe dimensionality")
    val dim = probe(0).getInt(0)
    require(dim % m == 0, s"pqCodebooks: dim $dim not divisible by m $m")
    val d = dim / m
    val seeds: IndexedSeq[Array[(Int, Array[Double])]] = (0 until m).map { s =>
      seedCentroidArrays(cached.select(col("vec_id"),
        expr(s"slice(ce, ${s * d + 1}, $d)").as("ce")), ksub, s"$seed$s")
    }
    val fin = (0 until iters).foldLeft(seeds) { (cents, _) =>
      val arms = (0 until m).map { s =>
        struct(lit(s).as("sub"),
          pqAssignExpr(expr(s"slice(ce, ${s * d + 1}, $d)"), cents(s)).as("bucket"),
          expr(s"slice(ce, ${s * d + 1}, $d)").as("sv"))
      }
      val agg = cached
        .select(explode(array(arms: _*)).as("e"))
        .select(col("e.sub").as("sub"), col("e.bucket").as("bucket"),
          col("e.sv").as("sv"))
        .groupBy("sub", "bucket")
        .agg(count(lit(1)).as("n"),
          (0 until d).map(p =>
            sum(floor(element_at(col("sv"), p + 1).cast("double") * 1000000d)
              .cast("long")).as(s"s$p")): _*)
        .collect()
      (0 until m).map { s =>
        agg.filter(_.getInt(0) == s).map { r =>
          val n0 = r.getLong(2)
          (r.getInt(1), Array.tabulate(d)(p =>
            r.getLong(3 + p).toDouble / (n0 * 1000000L).toDouble))
        }.sortBy(_._1)
      }
    }
    import org.apache.spark.sql.types._
    val rows = fin.zipWithIndex.flatMap { case (cs, s) =>
      cs.map { case (cid, c) => org.apache.spark.sql.Row(cid, c.toSeq, s) }
    }
    cached.sparkSession.createDataFrame(java.util.Arrays.asList(rows: _*),
      StructType(Seq(
        StructField("cid", IntegerType, nullable = false),
        StructField("cemb", ArrayType(DoubleType, containsNull = false),
          nullable = false),
        StructField("sub", IntegerType, nullable = false))))
  }

  /** PQ encode: per subspace, the argmin-L2 code — ONE narrow
    * projection per vector, zero Exchange (this is the write-time pass
    * that turns a dim·4-byte float vector into m one-byte codes, the
    * 100 TB storage lever: 64 floats → 4 codes here). `x2hat` — the
    * reconstruction's squared norm Σ_s |cb(s, code_s)|², the
    * query-independent half of the approximate cosine — is computed
    * once at encode time from the codebook norms (subspaces are
    * orthogonal coordinate blocks, so the cross terms are zero by
    * construction). Output (vec_id, codes array<int>, x2hat). */
  def pqEncode(corpus: DataFrame, codebooks: DataFrame,
      keep: Seq[String] = Nil): DataFrame = {
    val cb = codebooks.select(col("sub"), col("cid"), col("cemb")).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    val m = cb.map(_._1).max + 1
    val d = cb.head._3.length
    val bySub = (0 until m).map(s =>
      cb.collect { case (`s`, cid, c) => (cid, c) }.sortBy(_._1))
    val norms = bySub.map(_.map { case (cid, c) =>
      var t = 0.0; var i = 0
      while (i < c.length) { t += c(i) * c(i); i += 1 }
      (cid, t)
    }.toMap)
    // `keep` columns (e.g. the IVF bucket already sitting on the
    // residual row) ride through the narrow encode projection — the
    // alternative is re-attaching them afterwards through a
    // corpus-wide shuffle join on vec_id, two Exchanges for a value
    // the row already carries.
    val withCodes = (0 until m).foldLeft(
      corpus.select((col("vec_id") +: keep.map(col)) :+ col("ce"): _*)) {
      (df, s) =>
        df.withColumn(s"_c$s",
          pqAssignExpr(expr(s"slice(ce, ${s * d + 1}, $d)"), bySub(s)))
    }
    val x2 = (0 until m).map { s =>
      val cases = norms(s).toSeq.sortBy(_._1).map { case (cid, n) =>
        when(col(s"_c$s") === cid, lit(n))
      }
      coalesce(cases: _*)
    }.reduce(_ + _)
    withCodes.select((col("vec_id") +: keep.map(col)) ++ Seq(
      array((0 until m).map(s => col(s"_c$s")): _*).as("codes"),
      x2.as("x2hat")): _*)
  }

  /** PQ search by asymmetric distance computation (ADC): each query
    * builds its m·ksub lookup table tdot(s, c) = dot(q_s, cb(s, c))
    * once — |q|·m·ksub rows, broadcast-sized — and every stored
    * vector's approximate dot is the SUM of m table lookups keyed by
    * its codes; the approximate cosine divides by sqrt(qe2 · x2hat).
    * Table entries are ×1e6-scaled integers BEFORE the sum — m partial
    * aggregates land in arbitrary order, and integer addition is the
    * established order-independence device (the lloydStep trick), so
    * scores are bit-identical across partitionings and engines.
    * The corpus-side scan reads only (vec_id, codes, x2hat) — the
    * 4×-to-64×-smaller representation IS the speed at 100 TB; the
    * explode-join-sum is m rows per stored vector through one
    * broadcast hash join and one partial+final aggregate, no window
    * until the per-query top-k rank. Exact re-ranking of the ADC
    * top-k against full vectors is the standard second stage and
    * composes from [[cosineTopK]] when needed; this operator pins the
    * ADC math itself. Output (qid, vec_id, cos_x1e4, rank ≤ k). */
  def pqTopK(queries: DataFrame, encoded: DataFrame, codebooks: DataFrame,
      k: Int = 10): DataFrame = {
    val d = codebooks.select(size(col("cemb")).as("d")).head.getInt(0)
    val qt = queries
      .select(col("qid"), col("qe"), dotExpr("qe", "qe").as("qe2"))
      .crossJoin(broadcast(codebooks))
      .select(col("qid"), col("qe2"), col("sub"), col("cid"),
        floor(graft.functions.F.toColumn(graft.functions.ArrayDot(
          graft.functions.F.toExpr(expr(s"slice(qe, sub * $d + 1, $d)")),
          graft.functions.F.toExpr(col("cemb")))) * lit(1000000d) + lit(0.5d))
          .cast("long").as("tdot6"))
    val codes = encoded.select(col("vec_id"), col("x2hat"),
      posexplode(col("codes")).as(Seq("sub", "cid")))
    val scored = codes
      .join(broadcast(qt), Seq("sub", "cid"))
      .groupBy("qid", "vec_id", "qe2", "x2hat")
      .agg(sum(col("tdot6")).as("adot6"))
      .select(col("qid"), col("vec_id"),
        graft.functions.F.scale4((col("adot6").cast("double") / lit(1000000d))
          / sqrt(col("qe2") * col("x2hat"))).as("cos_x1e4"))
    val w = Window.partitionBy("qid").orderBy(desc("cos_x1e4"), asc("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Per-vector IVF residual: r = ce − centroid(bucket), the vector
    * PQ actually quantizes in the composed IVF+PQ architecture —
    * residuals are small where raw vectors are spread across the
    * space, so the same codebook budget spends its resolution where
    * the data lives (Jégou et al. 2011 §IV). One assignment projection
    * plus one broadcast join; the subtraction is an interpreted
    * zip_with, acceptable at write time (the quantizeInt8 rationale).
    * Output (vec_id, bucket, re: array<double>). */
  def ivfResiduals(corpus: DataFrame, centroids: DataFrame): DataFrame =
    assignBuckets(corpus, centroids)
      .join(broadcast(centroids.select(col("cid"), col("cemb"))),
        col("bucket") === col("cid"))
      .select(col("vec_id"), col("bucket"),
        zip_with(col("ce"), col("cemb"),
          (x, y) => x.cast("double") - y).as("re"))

  /** IVF+PQ search under the inner-product metric (MIPS — the
    * retrieval contract for trained embedding models): probe nprobe
    * buckets per query, then score ONLY probed-bucket candidates by
    * the ADC identity dot(q, x̂) = dot(q, c_bucket) + Σ_s dot(q_s,
    * cb_s(code_s)) — the first term is one ×1e6 integer per (query,
    * probed bucket), the second is the PQ lookup-table sum over
    * RESIDUAL codebooks, every term an integer before any aggregation
    * (order-independent, oracle-exact). The corpus side of the search
    * reads (vec_id, bucket, codes) — one int and m bytes per vector;
    * at 100 TB this is the architecture that makes the scan feasible:
    * IVF prunes which vectors are read, PQ shrinks what a read costs.
    * Output (qid, vec_id, dot_x1e6, rank ≤ k). */
  def ivfpqTopK(queries: DataFrame, centroids: DataFrame,
      codebooks: DataFrame, encoded: DataFrame, k: Int = 10,
      nprobe: Int = 2): DataFrame = {
    import graft.functions.{ArrayDot, F}
    val d = codebooks.select(size(col("cemb")).as("d")).head.getInt(0)
    val probes = probeBuckets(queries, centroids, nprobe)
    val qc = probes
      .join(broadcast(centroids.select(col("cid").as("bucket"), col("cemb"))),
        Seq("bucket"))
      .select(col("qid"), col("bucket"),
        floor(dotExpr("qe", "cemb") * lit(1000000d) + lit(0.5d))
          .cast("long").as("qcdot6"))
    val qt = queries.select(col("qid"), col("qe"))
      .crossJoin(broadcast(codebooks))
      .select(col("qid"), col("sub"), col("cid"),
        floor(F.toColumn(ArrayDot(
          F.toExpr(expr(s"slice(qe, sub * $d + 1, $d)")),
          F.toExpr(col("cemb")))) * lit(1000000d) + lit(0.5d))
          .cast("long").as("tdot6"))
    val scored = encoded
      .join(probes.select("qid", "bucket"), Seq("bucket"))
      .select(col("qid"), col("vec_id"), col("bucket"),
        posexplode(col("codes")).as(Seq("sub", "cid")))
      .join(broadcast(qt), Seq("qid", "sub", "cid"))
      .groupBy("qid", "vec_id", "bucket")
      .agg(sum(col("tdot6")).as("rdot6"))
      .join(qc, Seq("qid", "bucket"))
      .select(col("qid"), col("vec_id"),
        (col("rdot6") + col("qcdot6")).as("dot_x1e6"))
    val w = Window.partitionBy("qid").orderBy(desc("dot_x1e6"), asc("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Materialize the composed IVF+PQ index under `dir` — the
    * [[writeIndex]] lifecycle for the PQ-compressed serving path:
    * the IVF centroid table, the RESIDUAL PQ codebooks, and the
    * encoded corpus (vec_id, bucket, codes — one int + m bytes per
    * vector) range-clustered on bucket with a
    * [[graft.ops.FileIndex]] manifest, plus the corpus-checksum
    * guard [[verifyIndex]] compares at load. At 100 TB the Lloyd
    * passes are amortized across every query the index ever serves —
    * persisted or the build isn't real; serving reads only the
    * probed files' compressed rows. */
  def writeIndexPq(corpus: DataFrame, dir: String, n: Int, m: Int,
      ksub: Int, iters: Int = 2, files: Int = 16, seed: String = "ivf",
      pqSeed: String = "pq"): Unit = {
    val cent = ivfCentroids(corpus, n, iters, seed)
    cent.coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
    // The residual relation feeds THREE consumers (codebook training,
    // encoding, and the encoded rows' bucket column): persist it once
    // — previously its (scan + assignment + broadcast join + zip_with)
    // lineage recomputed per consumer and the bucket was re-attached
    // through a corpus-wide shuffle join on vec_id.
    val res = ivfResiduals(corpus, cent)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val rv = res.select(col("vec_id"), col("re").as("ce"))
      val cb = pqCodebooksCached(rv, m, ksub, iters, pqSeed)
      cb.coalesce(1).write.mode("overwrite").parquet(s"$dir/codebooks")
      val enc = pqEncode(
          res.select(col("vec_id"), col("bucket"), col("re").as("ce")),
          cb, keep = Seq("bucket"))
        .select(col("vec_id"), col("bucket"), col("codes"))
      graft.ops.FileIndex.writeIndexed(enc, s"$dir/encoded", "bucket", files)
      corpusFingerprint(corpus)
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/fingerprint")
    } finally res.unpersist(blocking = false)
  }

  /** INCREMENTAL add to a persisted IVF+PQ index: encode a delta
    * batch against the FROZEN centroids and residual codebooks (the
    * [[writeIndexPq]] geometry — NO Lloyd pass, no codebook retrain),
    * append its bucket-clustered files, extend the manifest with only
    * the new files' stats ([[graft.ops.FileIndex.appendIndexed]] —
    * the base corpus is never re-read), and XOR-roll the corpus
    * fingerprint forward (the checksum is a bit_xor, so base ⊕ delta
    * IS the full-corpus fingerprint — [[verifyIndex]] against
    * base ∪ delta passes without a rescan). Because assignment and
    * encoding are deterministic row-wise expressions of the frozen
    * geometry, base-build + delta-add serves results bit-for-bit
    * equal to encoding the union in one pass — a serving corpus that
    * grows daily pays the arrival, not the full rebuild.
    *
    * PRECONDITION (enforced): delta vec_ids are disjoint from the
    * indexed corpus — re-appending an identical row would serve it
    * twice and XOR-cancel its fingerprint contribution. The guard
    * semi-joins the delta's vec_ids against only the manifest-pruned
    * base files covering the delta's buckets (an identical re-append
    * is assigned to the same bucket by the frozen centroids), so the
    * check costs a column scan of the overlap, not the archive. */
  def appendIndexPq(delta: DataFrame, dir: String, files: Int = 4): Unit = {
    val spark = delta.sparkSession
    val cent = loadCentroids(spark, dir)
    val cbDf = spark.read.parquet(s"$dir/codebooks")
    val cb = spark.createDataFrame(
      java.util.Arrays.asList(cbDf.collect(): _*), cbDf.schema)
    val enc = pqEncode(
        ivfResiduals(delta, cent)
          .select(col("vec_id"), col("bucket"), col("re").as("ce")),
        cb, keep = Seq("bucket"))
      .select(col("vec_id"), col("bucket"), col("codes"))
      .localCheckpoint(true)
    try {
      // Disjointness guard — the fingerprint roll's precondition: a
      // re-appended (vec_id, embedding) pair XOR-cancels its own
      // checksum contribution, so the staleness guard would silently
      // degrade while the encoded table served the row twice. An
      // identical re-append lands in the SAME bucket (assignment is a
      // deterministic function of the frozen centroids), so checking
      // only the manifest-pruned base files covering the delta's
      // buckets catches exactly the dangerous case at delta cost —
      // a vec_id-only column scan of the overlapping files, never the
      // archive. (A re-append under a CHANGED embedding is a plain
      // duplicate-id ingest bug upstream; its checksum does NOT
      // cancel, so verifyIndex still catches that corpus.)
      val encDir = encodedDir(dir)
      val deltaBuckets = enc.select("bucket").distinct().collect()
        .map(_.getInt(0)).toSet
      val manifest = spark.read.parquet(s"$encDir/_index")
        .select("file", "lo", "hi").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
      val overlap = manifest.collect {
        case (f, lo, hi) if deltaBuckets.exists(b => b >= lo && b <= hi) => f
      }
      if (overlap.nonEmpty) {
        val dup = spark.read.parquet(overlap.toIndexedSeq: _*)
          .select("vec_id")
          .join(enc.select("vec_id"), Seq("vec_id"), "left_semi")
          .limit(1).collect()
        require(dup.isEmpty,
          s"appendIndexPq: delta re-appends vec_id '${dup.headOption.map(_.get(0)).orNull}' " +
            s"already present in the index at $dir — the row would serve " +
            "twice and XOR-cancel its fingerprint contribution; dedup the " +
            "delta against the index before appending")
      }
      graft.ops.FileIndex.appendIndexed(enc, encDir, "bucket", files)
      val rec = spark.read.parquet(s"$dir/fingerprint").head()
      val d = corpusFingerprint(delta).head()
      val merged = org.apache.spark.sql.Row(
        rec.getLong(0) + d.getLong(0), rec.getLong(1) ^ d.getLong(1))
      spark.createDataFrame(java.util.Arrays.asList(merged),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("n_vectors",
              org.apache.spark.sql.types.LongType, nullable = false),
            org.apache.spark.sql.types.StructField("checksum",
              org.apache.spark.sql.types.LongType, nullable = false))))
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/fingerprint")
    } finally enc.unpersist(blocking = false)
  }

  /** The LIVE encoded-table directory of a persisted IVF+PQ index:
    * the latest generation published through the Wap commit log at
    * `$dir/encoded_gens/_commits` when staged compaction has run,
    * else the original `$dir/encoded` laid down by [[writeIndexPq]].
    * Pure read — the existence probe never creates commit state, so
    * serving from a read-only filesystem stays read-only. */
  def encodedDir(dir: String): String = {
    val commits = java.nio.file.Paths.get(dir, "encoded_gens", "_commits")
    if (java.nio.file.Files.isDirectory(commits) &&
        graft.ops.Wap.currentVersion(s"$dir/encoded_gens") > 0L)
      graft.ops.Wap.publishedPath(s"$dir/encoded_gens").get
    else s"$dir/encoded"
  }

  /** COMPACT a persisted IVF+PQ index after append generations: each
    * [[appendIndexPq]] adds `files` new files whose bucket spans
    * overlap the existing layout, so a point probe reads one extra
    * file per generation — the LSM tradeoff. Compaction re-clusters
    * the encoded rows into a single `files`-file generation (rows,
    * codes, centroids, codebooks, fingerprint all UNCHANGED — this
    * moves bytes, it never re-trains or re-encodes, so served
    * results are identical before and after).
    *
    * STAGED-GENERATION COMMIT (r20 — replaces the r19
    * overwrite-in-place): the compacted rows are written as a NEW
    * generation directory under `$dir/encoded_gens/` (its own
    * [[graft.ops.FileIndex]] manifest inside), audited against the
    * live generation's row total, and published with the
    * [[graft.ops.Wap]] CAS — the atomic commit-file rename is the
    * only mutation readers can observe. A crash anywhere before the
    * publish leaves an orphan directory the next compaction
    * overwrites (deterministic generation token) while the old
    * generation keeps serving; a crash after publish is simply the
    * new generation. Input rows are read from the live manifest's
    * FILE LIST, never the directory, so orphans are invisible to the
    * rewrite too. Superseded generations remain on disk as
    * time-travel history; `Wap.expireBefore` on
    * `$dir/encoded_gens` plus deleting unreferenced `data-g*` dirs
    * is the retention job. */
  def compactIndexPq(spark: org.apache.spark.sql.SparkSession, dir: String,
      files: Int = 16): Unit = {
    val cur = encodedDir(dir)
    val live = spark.read.parquet(s"$cur/_index")
      .select("file").collect().map(_.getString(0)).toIndexedSeq
    val liveRows = spark.read.parquet(s"$cur/_index")
      .agg(sum(col("rows"))).head().getLong(0)
    val rows = spark.read.parquet(live: _*)
    val gens = s"$dir/encoded_gens"
    val staged = s"$gens/data-g${graft.ops.Wap.currentVersion(gens) + 1}"
    graft.ops.FileIndex.writeIndexed(rows, staged, "bucket", files)
    // audit before publish: compaction moves bytes, never rows — the
    // staged manifest must account for exactly the live row total
    val stagedRows = spark.read.parquet(s"$staged/_index")
      .agg(sum(col("rows"))).head().getLong(0)
    require(stagedRows == liveRows,
      s"compactIndexPq: staged generation at $staged holds $stagedRows " +
        s"rows but the live generation holds $liveRows — refusing to publish")
    graft.ops.Wap.publishWithRetry(gens, staged)
  }

  /** IVF+PQ search against a PERSISTED index: load centroids and
    * codebooks (both metadata-sized, localized like
    * [[loadCentroids]]), probe, prune the encoded table's files to
    * the probed bucket spans via the manifest (driver-side planning,
    * the [[ivfTopKPersisted]] step), then the [[ivfpqTopK]] ADC
    * scoring over only the pruned (vec_id, bucket, codes) rows —
    * output ≡ ivfpqTopK over the same build, with zero training
    * passes at serve time. */
  def ivfpqTopKPersisted(spark: org.apache.spark.sql.SparkSession,
      queries: DataFrame, dir: String, k: Int = 10,
      nprobe: Int = 2): DataFrame = {
    val cent = loadCentroids(spark, dir)
    val cbDf = spark.read.parquet(s"$dir/codebooks")
    val cb = spark.createDataFrame(
      java.util.Arrays.asList(cbDf.collect(): _*), cbDf.schema)
    val probes = probeBuckets(queries, cent, nprobe)
    val buckets = probes.select("bucket").distinct().collect()
      .map(_.getInt(0)).toSet
    val encDir = encodedDir(dir)
    val manifest = spark.read.parquet(s"$encDir/_index")
      .select("file", "lo", "hi").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
    val keep = manifest.collect {
      case (f, lo, hi) if buckets.exists(b => b >= lo && b <= hi) => f
    }
    val encoded =
      if (keep.isEmpty) spark.read.parquet(encDir).limit(0)
      else spark.read.parquet(keep.toIndexedSeq: _*)
    ivfpqTopK(queries, cent, cb, encoded, k, nprobe)
  }

  // ---- Random-hyperplane LSH (Charikar 2002) -------------------------

  /** Deterministic integer hyperplanes: component (j, i) =
    * md5-hash32("<seed>:<j>:<i>") % 2001 − 1000 — the same keyed-md5
    * derivation as every other deterministic draw in the engine, so
    * the DuckDB twin regenerates the matrix exactly. Integer
    * components keep the only floating-point op in the signature the
    * per-element widening multiply (cross-engine exact). */
  def rhpPlanes(dim: Int, planes: Int = 64,
      seed: String = "rhp"): Array[Array[Long]] =
    Array.tabulate(planes, dim) { (j, i) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$seed:$j:$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16) % 2001 - 1000
    }

  /** 64-bit random-hyperplane signature per vector: bit j = sign of
    * the dot with plane j. P[bit differs] = angle/π, so
    * cosine-similar vectors agree on most bits — the embedding member
    * of the banded-Hamming family (text SimHash, image aHash/pHash),
    * and the k-means-free alternative to the IVF-bucketed near-dup
    * join: no training pass, signatures are a pure narrow projection
    * (one codegen'd expression, zero Exchange at any corpus size).
    * Output (id, sig). */
  def rhpSimhash(corpus: DataFrame, seed: String = "rhp"): DataFrame = {
    import graft.functions.{F, SignBits}
    val probe = corpus.select(size(col("ce")).as("d")).limit(1).collect()
    require(probe.nonEmpty, "rhpSimhash: empty corpus — cannot probe dimensionality")
    val dim = probe(0).getInt(0)
    val m = rhpPlanes(dim, 64, seed)
    corpus.select(col("vec_id").as("id"),
      F.toColumn(SignBits(F.toExpr(col("ce")), m)).as("sig"))
  }

  /** Embedding near-dup pairs via the shared banded-Hamming kernel
    * over sign signatures (four 16-bit bands, pigeonhole-exact at
    * maxBits ≤ 3, hot-band cap). Output (a, b, dist), a < b. */
  def rhpNearDupPairs(corpus: DataFrame, maxBits: Int = 3,
      maxBucket: Long = 10000L, seed: String = "rhp"): DataFrame =
    Dedup.bandedHammingPairs(rhpSimhash(corpus, seed), maxBits, maxBucket)

  /** PQ search with the standard exact second stage: ADC shortlists
    * `shortlist` candidates per query from codes alone, then ONLY the
    * shortlisted vectors' full embeddings are read and re-ranked by
    * exact cosine ([[rankTopK]]'s precomputed-self-dot loop). Within a
    * tight cluster ADC collapses members onto shared reconstructions
    * (the documented tie regime) — the re-rank restores true order
    * while the full-precision reads stay at |q|·shortlist rows, not
    * the corpus. Same output contract as [[ivfTopK]]. */
  def pqTopKReranked(queries: DataFrame, encoded: DataFrame,
      codebooks: DataFrame, corpus: DataFrame, k: Int = 10,
      shortlist: Int = 50): DataFrame = {
    val cand = pqTopK(queries, encoded, codebooks, shortlist)
      .select(col("qid"), col("vec_id"))
    val qs = queries.select(col("qid"), col("qe"), dotExpr("qe", "qe").as("qe2"))
    val cs = corpus.select(col("vec_id"), col("ce"), dotExpr("ce", "ce").as("ce2"))
    rankTopK(cand.join(broadcast(qs), Seq("qid")).join(cs, Seq("vec_id")), k)
  }
}
