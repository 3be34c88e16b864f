package graft.llm

import graft.SparkSpec

class SearchSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "a b a"),
    (2L, "a c"),
    (3L, "b b b b"))
    .toDF("doc_id", "text")

  test("bm25TopK: hand-computed integer algebra (avgdl=3, idf=bitlen(N div df))") {
    // N=3, T=9 → avgdl=3; df(a)=df(b)=2 → idf = bitlen(3 div 2) = 1
    // comp(d1,a) = 10000·1·22·3·2 div (10·3·2+3·3+9·3) = 1320000 div 96 = 13750
    // comp(d1,b) = 660000 div 66 = 10000 → d1 = 23750
    // comp(d2,a) = 660000 div (30+9+18) = 11578
    // comp(d3,b) = 2640000 div (120+9+36) = 16000
    val out = Search.bm25TopK(docs, "doc_id", "text", Seq("a", "b"), k = 10)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_terms_hit"), r.getAs[Long]("score_x1e4")))
    assert(out.toSeq == Seq((1L, 2L, 23750L), (3L, 1L, 16000L), (2L, 1L, 11578L)))
  }

  test("bm25TopK: unmatched query terms contribute nothing; k truncates after the doc_id tiebreak") {
    val out = Search.bm25TopK(docs, "doc_id", "text", Seq("a", "zzz"), k = 1)
      .collect().map(_.getAs[Long]("doc_id"))
    // only a matches; d1 (tf=2, dl=3) outscores d2 (tf=1, dl=2)
    assert(out.toSeq == Seq(1L))
  }

  test("postings/docLengths: blank tokens drop, multi-space runs never mint empty terms") {
    val messy = Seq((7L, "  x  y x ")).toDF("doc_id", "text")
    val p = Search.postings(messy, "doc_id", "text")
      .orderBy("term").collect().map(r => (r.getString(0), r.getAs[Long]("tf")))
    assert(p.toSeq == Seq(("x", 2L), ("y", 1L)))
    val l = Search.docLengths(messy, "doc_id", "text").collect()
    assert(l.map(r => r.getAs[Long]("dl")).toSeq == Seq(3L))
  }

  test("bm25TopK: tf saturation — score grows sublinearly in tf, monotone nonetheless") {
    val d = Seq((1L, "t"), (2L, "t t"), (3L, "t t t t t t t t"))
      .toDF("doc_id", "text")
    val scores = Search.bm25TopK(d, "doc_id", "text", Seq("t"), 10)
      .orderBy("doc_id").collect().map(r => r.getAs[Long]("score_x1e4"))
    assert(scores(0) < scores(1) && scores(1) < scores(2))
    // saturation: doubling tf from 1→2 gains more than the next doubling per unit
    assert(scores(1) - scores(0) > (scores(2) - scores(1)) / 4)
  }

  test("positionalPostings: 1-based positions over the RAW split (empties counted)") {
    // doc 4 has a double space: tokens [x, '', y] — y is position 3,
    // because phrase adjacency must see the raw token numbering.
    val d = Seq((1L, "a b a"), (4L, "x  y")).toDF("doc_id", "text")
    val out = Search.positionalPostings(d, "doc_id", "text", Seq("a", "y"))
      .orderBy("term", "doc_id").collect()
      .map(r => (r.getAs[String]("term"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("tf"), r.getAs[Long]("first_pos")))
    assert(out.toSeq == Seq(("a", 1L, 2L, 1L), ("y", 4L, 1L, 3L)))
  }

  test("hybridRrf: hand-computed fusion, absent-source rank contributes 0") {
    // lex (term a): d2 (tf2) rank 1, d1 rank 2, d3 absent.
    // sem (query = v1 = (1,0)): d1 rank 1, d3 rank 2, d2 rank 3.
    // rrf = 1e6 div (60 + rank) summed over present sources.
    val d = Seq((1L, "a"), (2L, "a a"), (3L, "b")).toDF("doc_id", "text")
    val e = Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f)), (3L, Array(1f, 1f)))
      .toDF("vec_id", "embedding")
    val out = Search.hybridRrf(d, "doc_id", "text", Seq("a"), e,
        queryVecId = 1L, k = 3)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("lex_rank"),
        r.getAs[Long]("sem_rank"), r.getAs[Long]("rrf_x1e6")))
    assert(out.toSeq == Seq(
      (1L, 2L, 1L, 16129L + 16393L),
      (2L, 1L, 3L, 16393L + 15873L),
      (3L, 0L, 2L, 16129L)))
  }

  test("phraseMatch: consecutive positions only; overlapping occurrences all count") {
    val d = Seq(
      (1L, "x table scan merge y table scan merge"), // two occurrences
      (2L, "table scan x merge"),                    // terms present, not adjacent
      (3L, "merge scan table"),                      // reversed order
      (4L, "a a a b"),                               // overlap fixture for phrase (a,a)
      (5L, "table scan merge")                       // exact-phrase doc
    ).toDF("doc_id", "text")
    val m = Search.phraseMatch(d, "doc_id", "text", Seq("table", "scan", "merge"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(m == Map(1L -> ((2L, 2L)), 5L -> ((1L, 1L))))
    // overlapping bigram: "a a a" contains (a,a) starting at positions 1 and 2
    val ov = Search.phraseMatch(d, "doc_id", "text", Seq("a", "a"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(ov == Map(4L -> ((2L, 1L))))
  }

  test("mmrRerank: hand-traced greedy — diversity flips the relevance order") {
    // Pool: A(rel 9000), B(8800), C(5000). A and B are near-identical
    // (sim 9900), C is far from both (1000).
    val pool = Seq((1L, 10L, 9000L), (1L, 11L, 8800L), (1L, 12L, 5000L))
      .toDF("qid", "vec_id", "rel_x1e4")
    val simPairs = Seq((10L, 11L, 9900L), (10L, 12L, 1000L), (11L, 12L, 1000L))
    val sims = simPairs.flatMap { case (a, b, s) =>
      Seq((1L, a, b, s), (1L, b, a, s)) }
      .toDF("qid", "a", "b", "sim_x1e4")
    val got = Search.mmrRerank(pool, sims, k = 3, lambdaNum = 7)
      .orderBy("step")
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(4))).toSeq
    // step1: margins (7*rel)div10 = A 6300, B 6160, C 3500 -> A
    // step2: B (7*8800-3*9900)div10 = 3190 < C (7*5000-3*1000)div10 = 3200 -> C
    // step3: B maxsim = max(9900, 1000) = 9900 -> 3190
    assert(got == Seq((1, 10L, 6300L), (2, 12L, 3200L), (3, 11L, 3190L)))
    // Plain relevance would have picked B second — MMR demoted the near-dup.
  }

  test("mmrRerank: k beyond the pool exhausts gracefully; negative margins survive") {
    val pool = Seq((1L, 10L, 100L), (1L, 11L, 90L)).toDF("qid", "vec_id", "rel_x1e4")
    val sims = Seq((1L, 10L, 11L, 9999L), (1L, 11L, 10L, 9999L))
      .toDF("qid", "a", "b", "sim_x1e4")
    val got = Search.mmrRerank(pool, sims, k = 4, lambdaNum = 7)
      .orderBy("step").collect()
    assert(got.length == 2) // steps 3 and 4 have nothing left to pick
    // step2 margin: (7*90 - 3*9999) div 10 = (630 - 29997) div 10 = -2936
    // (truncation toward zero, same as DuckDB's //)
    assert(got(1).getLong(4) == -2936L)
  }
}
