package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Byte-Pair-Encoding merge learning — the tokenizer-training half of
  * an LLM data pipeline (Sennrich et al. 2016 shape), restructured for
  * Spark's execution model.
  *
  * The naive formulation rescans the corpus once per merge — k ≈ 32k
  * merges × a 100 TB corpus is absurd. The standard distributed trick
  * makes the corpus cost ONE pass: aggregate to the word histogram
  * (vocab-sized — hundreds of thousands of rows no matter how many
  * petabytes feed it, by Heaps' law), then run every merge iteration
  * against the histogram with pair counts weighted by word frequency.
  * Each iteration is a vocab-sized aggregate (the argmax pair — ONE
  * row to the driver) plus a narrow per-row re-tokenization; nothing
  * corpus-sized moves after the first shuffle.
  *
  * Merge application is a fold over the token array via the typed
  * `aggregate` higher-order function — Column lambdas, so corpus
  * tokens never interpolate into SQL text (no quoting surface), and
  * the greedy left-to-right non-overlap semantics of classic BPE
  * ("aaa" + merge(a,a) → [aa, a]) are implemented structurally:
  * carry a pending token; emit the merged token and clear the
  * pending slot when (pending, next) matches the merge pair.
  */
object Bpe {

  /** The one corpus-scale pass: whitespace-split word histogram. */
  def wordHistogram(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** A word's UTF-8 bytes as stable two-hex-digit atoms — the
    * byte-level BPE alphabet (GPT-2 style: the base vocabulary is the
    * 256 byte values, so EVERY string tokenizes with zero OOV and no
    * code-unit vs code-point splitting convention can diverge across
    * engines; `lower(hex(encode(word)))` chunked in pairs is the same
    * sequence in any SQL dialect). Merged tokens are concatenated hex
    * runs — always decodable back to the byte string they cover. */
  private[llm] def byteAtoms(w: String): Vector[String] = {
    val bs = w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < bs.length) {
      val v = bs(i) & 0xff
      out += f"$v%02x"
      i += 1
    }
    out.result()
  }

  /** Character-level token sequences of the histogram words. */
  private def charSeqs(hist: DataFrame): DataFrame =
    hist.select(expr("filter(split(word, ''), x -> x != '')").as("toks"),
      col("cnt"))

  /** Adjacent-pair counts of a (toks, cnt) table, one row per distinct
    * (left, right) pair, weighted by word frequency. */
  private def pairCounts(seqs: DataFrame): DataFrame =
    // sequence(1, 0) counts DOWN in Spark, so a single-token word must
    // short-circuit: when() yields null there and explode(null) emits
    // no rows — the pairless word simply leaves the aggregate.
    seqs.select(explode(when(size(col("toks")) >= 2, expr(
        "transform(sequence(1, size(toks) - 1), j -> struct(toks[j-1] AS l, toks[j] AS r))")))
        .as("p"), col("cnt"))
      .groupBy(col("p.l").as("left"), col("p.r").as("right"))
      .agg(sum(col("cnt")).as("n"))

  /** Initial (character-level) pair statistics, descending — the
    * iteration-0 view a SQL oracle can mirror exactly. `asciiOnly`
    * restricts to printable-ASCII words so engines with different
    * code-unit vs code-point splitting conventions agree. */
  def topPairs(docs: DataFrame, textCol: String, limit: Int,
      asciiOnly: Boolean): DataFrame = {
    val hist0 = wordHistogram(docs, textCol)
    val hist = if (asciiOnly) hist0.filter(col("word").rlike("^[\\x20-\\x7E]+$"))
      else hist0
    pairCounts(charSeqs(hist))
      .orderBy(desc("n"), asc("left"), asc("right"))
      .limit(limit)
  }

  /** Byte-level token sequences of the histogram words, as a
    * DISTRIBUTED expression (the [[byteAtoms]] twin in Spark SQL):
    * lower(hex(encode(word))) chunked in twos — one narrow
    * projection, no driver involvement, for corpus-scale byte-pair
    * statistics. */
  private def byteSeqs(hist: DataFrame): DataFrame =
    hist.select(lower(hex(encode(col("word"), "UTF-8"))).as("h"), col("cnt"))
      .select(expr(
        "transform(sequence(1, length(h) div 2), i -> substring(h, 2*i-1, 2))")
        .as("toks"), col("cnt"))

  /** Iteration-0 view of BYTE-level BPE: adjacent byte-pair counts
    * over the word histogram — [[topPairs]] without the ASCII fence,
    * valid on ANY text (the UTF-8 hex alphabet has no splitting
    * convention to disagree on). Fully distributed: histogram
    * aggregate + narrow hex projection + pair aggregate. */
  def topPairsBytes(docs: DataFrame, textCol: String, limit: Int): DataFrame =
    pairCounts(byteSeqs(wordHistogram(docs, textCol)))
      .orderBy(desc("n"), asc("left"), asc("right"))
      .limit(limit)

  /** Apply ONE merge (l, r) → l+r to every token sequence: greedy
    * left-to-right, structural fold (no SQL-string interpolation). */
  private[llm] def applyMerge(toks: Column, l: String, r: String): Column = {
    val merged = l + r
    val init = struct(
      expr("CAST(array() AS array<string>)").as("arr"),
      lit(null).cast("string").as("pend"))
    val folded = aggregate(toks, init,
      (acc, t) =>
        when(acc("pend").isNull, struct(acc("arr").as("arr"), t.as("pend")))
          .when(acc("pend") === lit(l) && t === lit(r),
            struct(concat(acc("arr"), array(lit(merged))).as("arr"),
              lit(null).cast("string").as("pend")))
          .otherwise(struct(concat(acc("arr"), array(acc("pend"))).as("arr"),
            t.as("pend"))),
      acc => when(acc("pend").isNull, acc("arr"))
        .otherwise(concat(acc("arr"), array(acc("pend")))))
    folded
  }

  /** Learn the top-k BPE merges over the corpus. Returns
    * (rank, left, right, n) — rank 1 is the first (highest-count)
    * merge; ties break lexicographically so the result is
    * deterministic under any partitioning. Stops early when no
    * adjacent pair remains (every word fully merged).
    *
    * Iteration state (the tokenized vocab) is localCheckpointed each
    * round: the table is vocab-sized by construction, and truncating
    * lineage keeps iteration i's plan O(1) instead of O(i). */
  def learnMerges(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 4096, s"learnMerges: k=$k out of [1, 4096]")
    val spark = docs.sparkSession
    var seqs = charSeqs(wordHistogram(docs, textCol)).localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= k && !done) {
      val top = pairCounts(seqs)
        .orderBy(desc("n"), asc("left"), asc("right"))
        .limit(1).collect()
      top.headOption match {
        case None => done = true
        case Some(row) =>
          val l = row.getString(0); val r = row.getString(1); val n = row.getLong(2)
          merges += ((rank, l, r, n))
          val next = seqs.select(applyMerge(col("toks"), l, r).as("toks"),
            col("cnt")).localCheckpoint(true)
          seqs.unpersist()
          seqs = next
          rank += 1
      }
    }
    seqs.unpersist()
    spark.createDataFrame(
      spark.sparkContext.parallelize(merges.toSeq.map {
        case (rk, l, r, n) => Row(rk, l, r, n)
      }, 1),
      StructType(Seq(
        StructField("rank", IntegerType, nullable = false),
        StructField("left", StringType, nullable = false),
        StructField("right", StringType, nullable = false),
        StructField("n", LongType, nullable = false))))
  }

  /** Encode a (word, cnt) histogram with an ordered merge list:
    * chars, then each merge applied greedily in rank order — exactly
    * the tokenizer-inference contract implied by [[learnMerges]]
    * (BPE encodes by replaying merges in learned order). Returns
    * (word, cnt, toks, n_toks). The scale shape is the point: encode
    * each DISTINCT word once on the vocab-sized table, then join
    * token counts back to the corpus — never re-tokenize the corpus
    * row-by-row. Merge count is capped so the k chained fold
    * expressions stay a bounded codegen tree. */
  def encodeHistogram(hist: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    require(merges.length <= 64,
      s"encodeHistogram: ${merges.length} chained merges would blow the expression tree; " +
        "encode in batches (checkpoint between) for longer merge lists")
    val toks0 = expr("filter(split(word, ''), x -> x != '')")
    val encoded = merges.foldLeft(toks0: Column) {
      case (c, (l, r)) => applyMerge(c, l, r)
    }
    hist.select(col("word"), col("cnt"), encoded.as("toks"))
      .withColumn("n_toks", size(col("toks")))
  }

  /** Encode a (word, cnt) histogram at REALISTIC merge counts —
    * [[encodeHistogram]]'s 64-merge cap is a codegen expression-tree
    * limit, not an algorithmic one. The histogram collects to the
    * driver (vocab-sized, the [[learnMergesFast]] argument) and each
    * DISTINCT word encodes once by replaying the merges in rank
    * order, with the scan skipping ranks whose pair is absent: after
    * applying rank r, only ranks > r are ever considered (exact
    * replay semantics — pairs a later merge re-creates at an
    * already-passed rank stay unmerged, byte-for-byte the
    * [[encodeHistogram]] contract on ARBITRARY merge lists, which
    * LlmSpec property-checks; for lists actually learned by BPE this
    * also equals the min-rank iteration tokenizers use, since a
    * learned pair's member tokens always form at earlier ranks).
    * Output (word, cnt, toks, n_toks), one row per collected word. */
  def encodeHistogramFast(hist: DataFrame, merges: Seq[(String, String)],
      maxWords: Int = 1 << 20): DataFrame =
    encodeHistogramFastWith(hist, merges, maxWords,
      w => w.map(_.toString).toVector)

  /** [[encodeHistogramFast]] over the BYTE-LEVEL alphabet: each word
    * starts as its UTF-8 hex-pair atoms ([[byteAtoms]]) — the encode
    * half of [[learnMergesFastBytes]], OOV-free on any text. */
  def encodeHistogramFastBytes(hist: DataFrame, merges: Seq[(String, String)],
      maxWords: Int = 1 << 20): DataFrame =
    encodeHistogramFastWith(hist, merges, maxWords, byteAtoms)

  private def encodeHistogramFastWith(hist: DataFrame,
      merges: Seq[(String, String)], maxWords: Int,
      atoms: String => Vector[String]): DataFrame = {
    val spark = hist.sparkSession
    val words = hist.orderBy(desc("cnt"), asc("word")).limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // Build the pair→rank map ONCE per histogram — rebuilding the
    // O(merges) groupBy inside the per-word loop would make the map
    // construction alone O(words × merges) at 1M-word / 65k-merge scale.
    val rankOf = rankIndex(merges)
    val rows = words.map { case (w, c) =>
      val toks = encodeWordReplay(atoms(w), merges, rankOf)
      Row(w, c, toks, toks.length)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1),
      StructType(Seq(
        StructField("word", StringType, nullable = false),
        StructField("cnt", LongType, nullable = false),
        StructField("toks", ArrayType(StringType, containsNull = false), nullable = false),
        StructField("n_toks", IntegerType, nullable = false))))
  }

  /** Replay-in-rank-order encode of one token vector: at each step,
    * the lowest-rank merge ABOVE the cursor whose pair is adjacent
    * somewhere applies greedily left-to-right (the pending fold), and
    * the cursor advances to it — a rank never applies twice (a greedy
    * pass consumes every occurrence and cannot re-create its own
    * pair) and passed ranks are never revisited. O(applications ·
    * |toks|) with applications ≤ |toks| − 1. */
  private[llm] def rankIndex(merges: Seq[(String, String)])
      : Map[(String, String), Int] =
    merges.zipWithIndex
      .groupBy(_._1).map { case (p, xs) => (p, xs.map(_._2).min) }

  private[llm] def encodeWordReplay(init: Vector[String],
      merges: Seq[(String, String)],
      rankOfPre: Map[(String, String), Int] = null): Vector[String] = {
    val rankOf =
      if (rankOfPre != null) rankOfPre else rankIndex(merges)
    var toks = init
    var cursor = -1
    var done = false
    while (!done && toks.length >= 2) {
      var best = Int.MaxValue
      var i = 0
      while (i + 1 < toks.length) {
        rankOf.get((toks(i), toks(i + 1))).foreach { r =>
          if (r > cursor && r < best) best = r
        }
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val (l, r) = merges(best)
        val merged = l + r
        val buf = Vector.newBuilder[String]
        var pend: String = null
        toks.foreach { t =>
          if (pend == null) pend = t
          else if (pend == l && t == r) { buf += merged; pend = null }
          else { buf += pend; pend = t }
        }
        if (pend != null) buf += pend
        toks = buf.result()
        cursor = best
      }
    }
    toks
  }

  /** DuckDB oracle for [[learnMerges]] with a FIXED k: the greedy
    * iteration unrolls into k chained CTE rounds — `b{i}` is round i's
    * argmax pair (same (-n, l, r) tie order as the engine) and `s{i}`
    * re-tokenizes the vocab by applying that merge greedily
    * left-to-right via list lambdas. The greedy non-overlap rule is
    * positional: within each maximal run of consecutive matching pair
    * positions, keep the 1st, 3rd, 5th… (odd distance from the run's
    * start — exactly what the engine's pending-token fold selects).
    * Unrolling sidesteps every recursive-CTE restriction (the round
    * needs both an aggregate over the working vocab AND a second
    * reference to it); k=8 keeps the statement ~60 lines. */
  /** Shared CTE chain for the two BPE oracles: s0 is the char-level
    * tokenized word histogram (word carried through every round), b_i
    * is round i's argmax pair, s_i the vocab after applying it. When
    * `throughK` the chain ends with the FULLY merged s_k (the encode
    * oracle needs it); the learn oracle stops at b_k. */
  /** Default histogram SQL: printable-ASCII whitespace words of
    * `documents.text` (the [[wordHistogram]] twin). */
  private val docsHistSql: String =
    """SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM (
      |      SELECT unnest(regexp_split_to_array(text, '\s+')) AS word
      |      FROM documents WHERE regexp_matches(text, '^[\x20-\x7E]*$'))
      |    WHERE length(word) > 0 GROUP BY word""".stripMargin

  private def bpeChainCtes(k: Int, throughK: Boolean,
      histSql: String = docsHistSql, byteLevel: Boolean = false): Seq[String] = {
    // Every s_i is referenced twice (by b_{i+1} and s_{i+1}); DuckDB
    // 1.0 inlines multi-referenced CTEs, re-executing the chain
    // multiplicatively — MATERIALIZED keeps k rounds linear.
    //
    // byteLevel: s0 tokenizes each word to its UTF-8 hex-pair atoms
    // (lower(hex(encode(word))) chunked in twos — the [[byteAtoms]]
    // twin), so the chain is engine-portable on ANY text; the default
    // s0 splits per character (per code point in DuckDB), which only
    // agrees with per-code-unit engines on BMP-safe corpora.
    val s0 =
      if (byteLevel)
        s"""s0 AS MATERIALIZED (
          |  SELECT word, list_transform(range(1, length(h)//2 + 1),
          |      i -> substring(h, CAST(2*i-1 AS INT), 2)) AS toks, cnt
          |  FROM (SELECT word, lower(hex(encode(word))) AS h, cnt FROM ($histSql)))""".stripMargin
      else
        s"""s0 AS MATERIALIZED (
          |  SELECT word, list_transform(range(1, length(word)+1), i -> word[i]) AS toks, cnt
          |  FROM ($histSql))""".stripMargin
    def best(prev: String, b: String) =
      s"""$b AS MATERIALIZED (
         |  SELECT pr.l AS l, pr.r AS r, CAST(sum(cnt) AS BIGINT) AS n
         |  FROM (SELECT unnest(list_transform(range(1, len(toks)),
         |      i -> struct_pack(l := toks[i], r := toks[i+1]))) AS pr, cnt FROM $prev)
         |  GROUP BY 1, 2 ORDER BY n DESC, l, r LIMIT 1)""".stripMargin
    def step(prev: String, b: String, next: String) =
      s"""$next AS MATERIALIZED (
         |  SELECT word, flatten(list_transform(range(1, len(toks)+1), i ->
         |      CASE WHEN list_contains(kept, i) THEN [ml || mr]
         |           WHEN list_contains(kept, i - 1) THEN []
         |           ELSE [toks[i]] END)) AS toks, cnt
         |  FROM (
         |    SELECT word, toks, cnt, ml, mr,
         |      list_filter(matches, i -> (i - coalesce(list_max(
         |        list_filter(range(0, i), j -> j = 0 OR NOT list_contains(matches, j))), 0)) % 2 = 1) AS kept
         |    FROM (
         |      SELECT word, toks, cnt, b.l AS ml, b.r AS mr,
         |        list_filter(range(1, len(toks)), i -> toks[i] = b.l AND toks[i+1] = b.r) AS matches
         |      -- LEFT JOIN ON TRUE: past saturation (the argmax CTE
         |      -- is EMPTY) every word passes through unchanged; a
         |      -- plain cross join would annihilate the vocab and the
         |      -- deep-encode oracle would return zero rows
         |      FROM $prev LEFT JOIN $b b ON TRUE)))""".stripMargin
    s0 +: (1 to k).flatMap { i =>
      best(s"s${i - 1}", s"b$i") +:
        (if (i < k || throughK) Seq(step(s"s${i - 1}", s"b$i", s"s$i"))
         else Seq.empty)
    }
  }

  def mergesOracleSql(k: Int): String = {
    require(k >= 1 && k <= 32, s"mergesOracleSql: k=$k out of [1, 32]")
    mergesOracleSqlOver(k, docsHistSql)
  }

  /** The raw CTE chain (s0..s_k / b1..b_k) as one comma-joined block,
    * for COMPOSITION oracles that splice BPE learning into a larger
    * WITH (the histogram SQL may reference the caller's own CTEs). */
  def chainCtesSql(k: Int, throughK: Boolean, histSql: String,
      byteLevel: Boolean = false): String = {
    require(k >= 1 && k <= 512, s"chainCtesSql: k=$k out of [1, 512]")
    bpeChainCtes(k, throughK, histSql, byteLevel).mkString(",\n")
  }

  /** [[mergesOracleSql]] over an arbitrary (word, cnt) histogram SQL —
    * the deep-merge gate needs a vocabulary rich enough for hundreds
    * of rounds, which the 31-word synthetic `documents` corpus is
    * not. Each round is two MATERIALIZED CTEs, so DuckDB cost stays
    * linear in k (measured ~0.13 s/round). */
  def mergesOracleSqlOver(k: Int, histSql: String,
      byteLevel: Boolean = false): String = {
    require(k >= 1 && k <= 512, s"mergesOracleSqlOver: k=$k out of [1, 512]")
    val unions = (1 to k).map(i =>
      s"""SELECT CAST($i AS INT) AS "rank", l AS "left", r AS "right", n FROM b$i""")
    "WITH " + bpeChainCtes(k, throughK = false, histSql, byteLevel).mkString(",\n") +
      "\nSELECT * FROM (\n" + unions.mkString("\nUNION ALL ") +
      ")\nORDER BY \"rank\""
  }

  /** Oracle for the ENCODE gate: the same k merge rounds, then the
    * fully merged vocab's per-word token counts for the `limit` most
    * frequent words (ties broken by the unique word). */
  def encodeOracleSql(k: Int, limit: Int): String = {
    require(k >= 1 && k <= 32 && limit >= 1,
      s"encodeOracleSql: k=$k limit=$limit")
    encodeOracleSqlOver(k, limit, docsHistSql)
  }

  /** [[encodeOracleSql]] over an arbitrary (word, cnt) histogram SQL
    * — the deep-encode twin of [[mergesOracleSqlOver]]. */
  def encodeOracleSqlOver(k: Int, limit: Int, histSql: String,
      byteLevel: Boolean = false): String = {
    require(k >= 1 && k <= 512 && limit >= 1,
      s"encodeOracleSqlOver: k=$k limit=$limit")
    "WITH " + bpeChainCtes(k, throughK = true, histSql, byteLevel).mkString(",\n") +
      s"""
         |SELECT word, cnt, CAST(len(toks) AS BIGINT) AS n_toks,
         |  toks[1] AS first_tok
         |FROM s$k ORDER BY cnt DESC, word LIMIT $limit""".stripMargin
  }

  /** Learn the top-k BPE merges at REALISTIC merge counts — the
    * production path. Identical output contract to [[learnMerges]]
    * (same merges, same early-stop; LlmSpec asserts exact equality
    * against both the naive in-memory reference and the distributed
    * path on random corpora), but the per-merge cost is driver CPU,
    * not a Spark job.
    *
    * Scale shape: the ONLY corpus-scale object is the word-histogram
    * aggregate — one shuffle, however many petabytes feed it. The
    * histogram itself is vocab-sized (Heaps' law), and `maxWords`
    * caps what the driver collects to the most frequent N words
    * (deterministic ties by word), which is the standard tokenizer-
    * training design: HuggingFace tokenizers and SentencePiece both
    * learn merges single-node over a pre-counted, frequency-floored
    * histogram, because rare words contribute ~nothing to pair
    * statistics. Learning then runs the textbook incremental
    * algorithm ([[incrementalMerges]]): pair counts live in a hash
    * table with an ordered candidate set, updated by DELTAS at each
    * merge's match sites — O(sites · log P) per merge instead of a
    * vocab rescan, so 32k merges over a 1M-word histogram is seconds
    * of driver CPU where [[learnMerges]] would schedule 32k
    * sequential Spark jobs. */
  def learnMergesFast(docs: DataFrame, textCol: String, k: Int,
      maxWords: Int = 1 << 20): DataFrame =
    learnMergesFastWith(docs, textCol, k, maxWords,
      w => w.map(_.toString).toVector)

  /** [[learnMergesFast]] over the BYTE-LEVEL alphabet: the histogram
    * words tokenize to their UTF-8 hex-pair atoms ([[byteAtoms]])
    * before learning, so merge statistics cover ANY text — Korean,
    * emoji, mixed scripts — with zero OOV and engine-portable
    * semantics (the hex rendering is identical under every string
    * model). Same output contract: (rank, left, right, n) with
    * left/right as hex-atom strings, ties broken lexicographically
    * (hex strings are ASCII, so every engine agrees). */
  def learnMergesFastBytes(docs: DataFrame, textCol: String, k: Int,
      maxWords: Int = 1 << 20): DataFrame =
    learnMergesFastWith(docs, textCol, k, maxWords, byteAtoms)

  private def learnMergesFastWith(docs: DataFrame, textCol: String, k: Int,
      maxWords: Int, atoms: String => Vector[String]): DataFrame = {
    require(k >= 1 && k <= 65536, s"learnMergesFast: k=$k out of [1, 65536]")
    require(maxWords >= 1, s"learnMergesFast: maxWords=$maxWords")
    val spark = docs.sparkSession
    val hist = wordHistogram(docs, textCol)
      .orderBy(desc("cnt"), asc("word")).limit(maxWords)
      .collect().map(r => (atoms(r.getString(0)), r.getLong(1))).toSeq
    val merges = incrementalMergesTok(hist, k)
    spark.createDataFrame(
      spark.sparkContext.parallelize(merges.map {
        case (rk, l, r, n) => Row(rk, l, r, n)
      }, 1),
      StructType(Seq(
        StructField("rank", IntegerType, nullable = false),
        StructField("left", StringType, nullable = false),
        StructField("right", StringType, nullable = false),
        StructField("n", LongType, nullable = false))))
  }

  /** Incremental-delta BPE over an in-memory histogram: exact
    * sequential greedy semantics (argmax by (-n, left, right), greedy
    * left-to-right non-overlapping application — byte-for-byte the
    * [[referenceMerges]] contract) at O(match-sites · log P) per
    * merge. State: per-word token arrays, a pair→count table, a
    * pair→word-set occurrence index, and an ordered candidate set
    * keyed (-n, l, r); each merge re-tokenizes ONLY the words that
    * contain the pair and applies the count deltas of that word's
    * before/after pair multisets. */
  private[llm] def incrementalMerges(words: Seq[(String, Long)],
      k: Int): Seq[(Int, String, String, Long)] =
    incrementalMergesTok(
      words.map { case (w, c) => (w.map(_.toString).toVector, c) }, k)

  private[llm] def incrementalMergesTok(words: Seq[(Vector[String], Long)],
      k: Int): Seq[(Int, String, String, Long)] = {
    import scala.collection.mutable
    val seqs = words.map { case (w, _) =>
      mutable.ArrayBuffer(w: _*) }.toArray
    val wcnt = words.map(_._2).toArray

    def pairBag(ts: collection.Seq[String]): mutable.Map[(String, String), Long] = {
      val m = mutable.Map.empty[(String, String), Long]
      var i = 0
      while (i + 1 < ts.length) {
        val p = (ts(i), ts(i + 1))
        m(p) = m.getOrElse(p, 0L) + 1L
        i += 1
      }
      m
    }

    val counts = mutable.Map.empty[(String, String), Long]
    val occurs = mutable.Map.empty[(String, String), mutable.Set[Int]]
    // Ordered candidates: TreeSet of (n, l, r) snapshots kept in sync
    // with `counts` (remove-old/insert-new on every delta).
    val ord: Ordering[(Long, String, String)] =
      Ordering.by[(Long, String, String), (Long, String, String)] {
        case (n, l, r) => (-n, l, r)
      }
    val cand = mutable.TreeSet.empty[(Long, String, String)](ord)

    def bump(p: (String, String), delta: Long, widx: Int, nowPresent: Boolean): Unit = {
      val old = counts.getOrElse(p, 0L)
      val nw = old + delta
      if (old > 0L) cand.remove((old, p._1, p._2))
      if (nw > 0L) { counts(p) = nw; cand.add((nw, p._1, p._2)) }
      else counts.remove(p)
      val set = occurs.getOrElseUpdate(p, mutable.Set.empty[Int])
      if (nowPresent) set.add(widx) else set.remove(widx)
    }

    seqs.indices.foreach { i =>
      pairBag(seqs(i)).foreach { case (p, c) => bump(p, c * wcnt(i), i, nowPresent = true) }
    }

    val out = mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    while (rank <= k && cand.nonEmpty) {
      val (n, l, r) = cand.head
      out += ((rank, l, r, n))
      val affected = occurs.getOrElse((l, r), mutable.Set.empty[Int]).toArray
      affected.foreach { wi =>
        val before = pairBag(seqs(wi))
        // Greedy left-to-right application — the pending-token fold.
        val merged = l + r
        val buf = mutable.ArrayBuffer.empty[String]
        var pend: String = null
        seqs(wi).foreach { t =>
          if (pend == null) pend = t
          else if (pend == l && t == r) { buf += merged; pend = null }
          else { buf += pend; pend = t }
        }
        if (pend != null) buf += pend
        seqs(wi) = buf
        val after = pairBag(buf)
        (before.keySet ++ after.keySet).foreach { p =>
          val d = after.getOrElse(p, 0L) - before.getOrElse(p, 0L)
          if (d != 0L) bump(p, d * wcnt(wi), wi, nowPresent = after.contains(p))
        }
      }
      rank += 1
    }
    out.toSeq
  }

  // ---- tokenizer persistence (the serving boundary) ------------------

  /** Materialize a learned tokenizer under `dir`: the ranked merge
    * table plus a meta row recording the ALPHABET MODE (byte-level or
    * char-level) and k — a tokenizer is a frozen artifact by design
    * (training corpora evolve; the tokenizer must not), so unlike the
    * ANN index there is no staleness fingerprint: the merge table IS
    * the contract. Train once over the histogram, write, then every
    * later session/job encodes through [[encodeWithTokenizer]] with
    * zero training passes — the 100 TB shape, where one tokenizer
    * serves every pipeline run for months. The meta mode flag keeps a
    * byte-level merge table from ever silently decoding through the
    * char-level replay (hex atoms would never match raw chars — the
    * output would be all-singleton tokens, a silent quality bug, not
    * an error). */
  def writeTokenizer(docs: DataFrame, textCol: String, k: Int, dir: String,
      byteLevel: Boolean = true, maxWords: Int = 1 << 20): Unit = {
    val spark = docs.sparkSession
    val merges =
      if (byteLevel) learnMergesFastBytes(docs, textCol, k, maxWords)
      else learnMergesFast(docs, textCol, k, maxWords)
    merges.coalesce(1).write.mode("overwrite").parquet(s"$dir/merges")
    spark.createDataFrame(
        java.util.Arrays.asList(Row(byteLevel, k)),
        StructType(Seq(
          StructField("byte_level", BooleanType, nullable = false),
          StructField("k", IntegerType, nullable = false))))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** Load a persisted tokenizer: (ranked merges, byteLevel). */
  def loadTokenizer(spark: org.apache.spark.sql.SparkSession,
      dir: String): (Seq[(String, String)], Boolean) = {
    val merges = spark.read.parquet(s"$dir/merges").orderBy("rank")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val byteLevel = spark.read.parquet(s"$dir/meta").head().getBoolean(0)
    (merges, byteLevel)
  }

  /** Encode a (word, cnt) histogram through a PERSISTED tokenizer —
    * the merge table loads (vocab-sized) and the replay encode runs
    * in the mode the artifact was trained in. Output contract ≡ the
    * in-memory encode over the same merges. */
  def encodeWithTokenizer(hist: DataFrame, dir: String,
      maxWords: Int = 1 << 20): DataFrame = {
    val (merges, byteLevel) = loadTokenizer(hist.sparkSession, dir)
    if (byteLevel) encodeHistogramFastBytes(hist, merges, maxWords)
    else encodeHistogramFast(hist, merges, maxWords)
  }

  /** Single-machine reference implementation (test oracle): the
    * textbook in-memory BPE over a word histogram. */
  private[llm] def referenceMerges(words: Seq[(String, Long)], k: Int): Seq[(Int, String, String, Long)] =
    referenceMergesTok(words.map { case (w, c) => (w.map(_.toString).toVector, c) }, k)

  private[llm] def referenceMergesTok(words: Seq[(Vector[String], Long)], k: Int): Seq[(Int, String, String, Long)] = {
    var seqs: Seq[(Vector[String], Long)] = words
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    var cont = true
    while (rank <= k && cont) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      seqs.foreach { case (ts, c) =>
        ts.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + c
          case _ =>
        }
      }
      if (counts.isEmpty) cont = false
      else {
        val ((l, r), n) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((rank, l, r, n))
        seqs = seqs.map { case (ts, c) =>
          val buf = Vector.newBuilder[String]
          var pend: String = null
          ts.foreach { t =>
            if (pend == null) pend = t
            else if (pend == l && t == r) { buf += (l + r); pend = null }
            else { buf += pend; pend = t }
          }
          if (pend != null) buf += pend
          (buf.result(), c)
        }
        rank += 1
      }
    }
    out.toSeq
  }
}
