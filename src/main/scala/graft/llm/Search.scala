package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyword retrieval over the corpus: an inverted-index build and an
  * integer-exact BM25 scorer — the lexical half of a retrieval stack,
  * next to the ANN embedding half (`llm/Ann.scala`).
  *
  * Scoring is BM25 with k1 = 6/5, b = 3/4, made INTEGER-EXACT so the
  * distributed result is reproducible (and oracle-matchable) bit for
  * bit — a float `ln` idf would differ between libm implementations:
  *  - avgdl := ⌊Σdl / N⌋ — the corpus average document length as an
  *    integer, fixed at index time;
  *  - idf(t) := bitlength(⌊N / df(t)⌋) — the same integer-log2
  *    convention as `TextAnalysis.rarityScores`;
  *  - per-(doc,term): clearing k1, b from
  *    tf·(k1+1) / (tf + k1·(1−b) + k1·b·dl/avgdl) by 10·avgdl gives
  *    22·avgdl·tf / (10·avgdl·tf + 3·avgdl + 9·dl) — all integers —
  *    carried as a ×10000 fixed point via integer division;
  *  - doc score := Σ over matched query terms.
  *
  * Scale shape: the postings build is one explode + one (term, doc)
  * hash aggregate — the same term-frequency relation every corpus
  * statistic shares. Scoring filters postings to the query's term set
  * FIRST (a literal isin pushed into the aggregate's input), joins the
  * surviving slice to the doc-length table on doc_id, and broadcasts
  * the per-term idf (≤|q| rows) and the 1-row corpus totals. Top-k is
  * an orderBy+limit → TakeOrderedAndProject, never a global sort.
  */
object Search {

  /** (term, doc_id, tf) postings from space-tokenized text. */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))

  /** (doc_id, dl) document lengths under the same tokenization. */
  def docLengths(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        size(filter(split(col(textCol), " "), t => t =!= "")).cast("long").as("dl"))
      .filter(col("dl") > 0)

  /** Positional postings for a term set: (term, doc_id, tf, first_pos)
    * where positions are 1-based token indices in the RAW space-split
    * array (empties included in the numbering, matching what a phrase
    * or proximity scorer needs to reconstruct adjacency). The isin
    * filter lands directly on the exploded stream — the scan prunes to
    * (id, text) and the aggregate only ever sees the query terms'
    * rows, so the shuffled slice is query-sized, not corpus-sized. */
  def positionalPostings(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "positionalPostings: empty term set")
    docs.select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), " ")).as(Seq("pos0", "term")))
      .filter(col("term").isin(terms: _*))
      .groupBy("term", "doc_id")
      .agg(count(lit(1)).as("tf"),
        (min(col("pos0")) + 1).cast("long").as("first_pos"))
  }

  /** Exact PHRASE match over the positional index: a document matches
    * when the phrase's tokens occur at CONSECUTIVE positions. The
    * exploded token stream is filtered to the phrase's terms before
    * any shuffle (query-sized postings, not corpus-sized — the same
    * pruning discipline as [[positionalPostings]]), then one equi-join
    * per additional phrase term aligns positions (`pos_k = pos_1 + k`)
    * — all joins are on (doc_id, position), co-partitioned after the
    * first shuffle. Output: (doc_id, n_occ, first_pos) per matching
    * doc, 1-based positions. */
  def phraseMatch(docs: DataFrame, idCol: String, textCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.size >= 2, "phraseMatch: need at least a 2-token phrase")
    val tok = docs.select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), " ")).as(Seq("pos0", "term")))
      .filter(col("term").isin(phrase.distinct: _*))
    val base = tok.filter(col("term") === phrase.head)
      .select(col("doc_id"), col("pos0").as("p"))
    val matched = phrase.zipWithIndex.tail.foldLeft(base) {
      case (acc, (t, i)) =>
        val next = tok.filter(col("term") === t)
          .select(col("doc_id").as("_d"), col("pos0").as("_p"))
        acc.join(next,
            col("doc_id") === col("_d") && col("_p") === col("p") + i)
          .drop("_d", "_p")
    }
    matched.groupBy("doc_id")
      .agg(count(lit(1)).as("n_occ"),
        (min(col("p")) + 1).cast("long").as("first_pos"))
  }

  /** Hybrid retrieval: reciprocal-rank fusion of the lexical (BM25)
    * and semantic (brute cosine) top-k lists —
    * rrf(d) = Σ_src 1e6 div (kRrf + rank_src(d)), absent source → 0.
    * Integer division keeps the fused score oracle-exact; kRrf = 60 is
    * the published default (Cormack & Clarke SIGIR'09).
    *
    * Scale shape: both inputs are ALREADY top-k (k rows each), so the
    * fusion itself — full-outer join + rank windows — runs on ≤2k rows
    * no matter the corpus size; the heavy lifting stays in the two
    * retrievers, each with their own scale story (postings slice /
    * IVF-bucketed search). The partitionless windows here are on k-row
    * frames, where they are the correct tool. */
  def hybridRrf(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], emb: DataFrame, queryVecId: Long,
      k: Int, kRrf: Long = 60L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lex = bm25TopK(docs, idCol, textCol, queryTerms, k)
      .select(col("doc_id"), col("score_x1e4"))
      .withColumn("lex_rank", row_number()
        .over(Window.orderBy(desc("score_x1e4"), asc("doc_id"))).cast("long"))
      .drop("score_x1e4")
    val q = emb.filter(col("vec_id") === queryVecId)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val sem = Ann.cosineTopK(q,
        emb.select(col("vec_id"), col("embedding").as("ce")), k)
      .select(col("vec_id").as("doc_id"), col("rank").cast("long").as("sem_rank"))
    lex.join(sem, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("lex_rank"), lit(0L)).as("lex_rank"),
        coalesce(col("sem_rank"), lit(0L)).as("sem_rank"))
      .withColumn("rrf_x1e6", expr(
        s"CASE WHEN lex_rank > 0 THEN 1000000L div (${kRrf}L + lex_rank) ELSE 0L END + " +
        s"CASE WHEN sem_rank > 0 THEN 1000000L div (${kRrf}L + sem_rank) ELSE 0L END"))
      .orderBy(desc("rrf_x1e6"), asc("doc_id"))
      .limit(k)
  }

  /** Top-k documents for a bag of query terms, by integer-exact BM25.
    * Output: doc_id, n_terms_hit, score_x1e4 (desc, doc_id tiebreak). */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int): DataFrame = {
    require(queryTerms.nonEmpty && k > 0, s"bm25TopK: $queryTerms / $k")
    val post = postings(docs, idCol, textCol)
    val lens = docLengths(docs, idCol, textCol)
    // corpus constants: one row (N docs, avgdl = Σdl div N)
    val totals = lens.agg(count(lit(1)).as("n_docs"),
      expr("sum(dl) div count(1)").as("avgdl"))
    // query-term slice of the postings + per-term document frequency
    val qp = post.filter(col("term").isin(queryTerms: _*))
    val dfreq = qp.groupBy("term").agg(count(lit(1)).as("df"))
    val idf = dfreq.join(broadcast(totals))
      .select(col("term"),
        length(bin(expr("n_docs div df"))).cast("long").as("idf"))
    val scored = qp
      .join(broadcast(idf), Seq("term"))
      .join(lens, Seq("doc_id"))
      .join(broadcast(totals))
      .select(col("doc_id"),
        expr("""(10000L * idf * 22L * avgdl * tf)
                div (10L * avgdl * tf + 3L * avgdl + 9L * dl)""").as("comp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms_hit"), sum(col("comp")).as("score_x1e4"))
    scored.orderBy(desc("score_x1e4"), asc("doc_id")).limit(k)
  }

  /** Maximal Marginal Relevance re-rank (Carbonell & Goldstein, SIGIR
    * 1998) — the diversification pass between retrieval and serving: a
    * top-k list where every result says the same thing wastes the
    * context window it fills, so each pick trades relevance against
    * similarity to what is already picked:
    *   pick_t = argmax over remaining of
    *     (λ·rel − (1−λ)·max_{s∈picked} sim(d, s)),
    * λ = lambdaNum/10, all ×1e4 integer arithmetic (margins go
    * negative; `div` and `//` truncate identically). Ties break on
    * vec_id, so the greedy trace is fully deterministic.
    *
    * The greedy recurrence is sequential in k but k is a SERVING
    * constant (3–20): the loop unrolls into a bounded plan of k−1
    * anti-join + max-aggregate + top-1-window rounds — the same
    * bounded-round shape as Graph.bfsLevels — and every round's work
    * is pool-sized (queries × poolK rows), never corpus-sized. The
    * corpus-scale work already happened in the retrieval that built
    * the pool; candidate-pool MMR is exactly how serving stacks run it.
    *
    * `pool`: (qid, vec_id, rel_x1e4) — the retrieval top-N per query.
    * `sims`: (qid, a, b, sim_x1e4) — pairwise similarities WITHIN each
    * query's pool, both directions. Output (qid, step, vec_id,
    * rel_x1e4, mmr_x1e4), step = 1..k pick order. */
  def mmrRerank(pool: DataFrame, sims: DataFrame, k: Int,
      lambdaNum: Int = 7): DataFrame = {
    require(k >= 1, s"mmrRerank: k=$k must be >= 1")
    require(lambdaNum >= 0 && lambdaNum <= 10,
      s"mmrRerank: lambdaNum=$lambdaNum must be in 0..10")
    import org.apache.spark.sql.expressions.Window
    def pick(cands: DataFrame): DataFrame = {
      val w = Window.partitionBy("qid").orderBy(desc("mmr_x1e4"), asc("vec_id"))
      cands.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
    }
    val cols = Seq("qid", "vec_id", "rel_x1e4", "mmr_x1e4", "step")
    // Each round re-reads the selected-so-far set three times and the
    // next round builds on it — localCheckpoint (the Bpe-iteration
    // pattern) pins each round's tiny result so round r+1 starts from
    // materialized rows instead of replaying rounds 1..r's plans.
    var acc = pick(pool.withColumn("mmr_x1e4",
        expr(s"($lambdaNum * rel_x1e4) div 10")))
      .withColumn("step", lit(1)).select(cols.map(col): _*)
      .localCheckpoint(true)
    for (step <- 2 to k) {
      val selIds = acc.select(col("qid"), col("vec_id"))
      val remaining = pool.join(selIds, Seq("qid", "vec_id"), "left_anti")
      val maxsim = sims.join(selIds.withColumnRenamed("vec_id", "b"),
          Seq("qid", "b"))
        .groupBy(col("qid"), col("a").as("vec_id"))
        .agg(max(col("sim_x1e4")).as("maxsim"))
      val picked = pick(remaining.join(maxsim, Seq("qid", "vec_id"), "left")
          .na.fill(0L, Seq("maxsim"))
          .withColumn("mmr_x1e4", expr(
            s"($lambdaNum * rel_x1e4 - ${10 - lambdaNum} * maxsim) div 10"))
          .select("qid", "vec_id", "rel_x1e4", "mmr_x1e4"))
        .withColumn("step", lit(step)).select(cols.map(col): _*)
      acc = acc.unionByName(picked).localCheckpoint(true)
    }
    acc.select(col("qid"), col("step"), col("vec_id"),
      col("rel_x1e4"), col("mmr_x1e4"))
  }
}
