package graft.llm

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("dsirScores: matches an independent md5-bucket recompute; target-typical docs outscore pool-typical") {
    // target = doc 1 only. Token counts — target: a,a,b (Np=3);
    // pool: all nine tokens a×4 b×3 c×2 (Nq=9). The expected scores
    // recompute below through java MessageDigest + plain Scala — an
    // independent path from the Spark md5/conv/bin expression chain.
    val docs = Seq((1L, "a a b"), (2L, "a c c"), (3L, "b b a"))
      .toDF("id", "text")
    val out = Curation.dsirScores(docs, "id", "text", col("id") === 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    def bucket(tok: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest((tok + ":dsir:b").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16) % 8192
    }
    val toks = Map(1L -> Seq("a", "a", "b"), 2L -> Seq("a", "c", "c"),
      3L -> Seq("b", "b", "a"))
    val cp = toks(1L).groupBy(bucket).map { case (b, v) => b -> v.size.toLong }
    val cq = toks.values.flatten.toSeq.groupBy(bucket)
      .map { case (b, v) => b -> v.size.toLong }
    val (np, nq) = (3L, 9L)
    def bitlen(x: Long) = java.lang.Long.toBinaryString(x).length.toLong
    def ml(tok: String): Long = {
      val b = bucket(tok)
      bitlen((nq + 8192) / (cq.getOrElse(b, 0L) + 1)) -
        bitlen((np + 8192) / (cp.getOrElse(b, 0L) + 1))
    }
    toks.foreach { case (id, ts) =>
      // plain Long '/' truncates toward zero — the div///`//` contract
      val exp = ts.map(ml).sum * 100 / ts.size.toLong
      assert(out(id) == (ts.size.toLong, exp), s"doc $id")
    }
    // the all-target-token docs must outscore the c-heavy pool doc
    assert(out(1L)._2 > out(2L)._2 && out(3L)._2 > out(2L)._2)
  }

  test("topKPerKey equals the single-window result, including a hot key bigger than salt*k") {
    // key "hot" has 200 rows (≫ k), "cold" has 3 (< k), "edge" exactly k
    val rows = (1 to 200).map(i => ("hot", i.toLong, (i * 37 % 97).toLong)) ++
      (1 to 3).map(i => ("cold", (1000 + i).toLong, i.toLong)) ++
      (1 to 5).map(i => ("edge", (2000 + i).toLong, 50L))
    val df = rows.toDF("key", "id", "score")
    val k = 5
    val got = Curation.topKPerKey(df, "key", Seq(col("score").desc, col("id")),
        saltOn = col("id"), k = k, salt = 4)
      .select("key", "id", "score", "rk").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val w = Window.partitionBy("key").orderBy(col("score").desc, col("id"))
    val want = df.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(got == want)
    assert(got.count(_._1 == "hot") == k && got.count(_._1 == "cold") == 3 &&
      got.count(_._1 == "edge") == k)
  }

  test("packSequences: doc belongs to the sequence its first token lands in; per-shard reset") {
    val docs = Seq(
      ("a", 1L, "w1 w2 w3"),        // 3 tok, cum 3  → seq 0
      ("a", 2L, "w w w w"),         // 4 tok, cum 7  → starts at 3 → seq 0
      ("a", 3L, "x x x"),           // cum 10 → starts at 7 → seq 1 (budget 5)
      ("b", 4L, "y y y y y y"))     // new shard → seq 0
      .toDF("shard", "id", "text")
    val out = Curation.packSequences(docs, "shard", "id", "text", budget = 5)
      .select("id", "n_tok", "seq").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(out(1L) == (3, 0L) && out(2L) == (4, 0L) && out(3L) == (3, 1L) && out(4L) == (6, 0L))
  }

  test("packSequencesByCount: true-token budget packs differently from the word proxy") {
    // one "word" of 12 BPE tokens (the CJK shape): the word proxy
    // packs all three docs into sequence 0 at budget 5; the true
    // count rolls over per document
    val docs = Seq(
      ("a", 1L, "x", 4L), ("a", 2L, "y", 4L), ("a", 3L, "z", 4L),
      ("b", 4L, "w", 12L))
      .toDF("shard", "id", "text", "n_tok")
    val byCount = Curation.packSequencesByCount(docs, "shard", "id", "n_tok", 5)
      .select("id", "seq").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byCount == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 0L))
    val byWords = Curation.packSequences(docs.drop("n_tok"), "shard", "id", "text", 5)
      .select("id", "seq").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byWords == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L))
    intercept[IllegalArgumentException](
      Curation.packSequencesByCount(docs, "shard", "id", "n_tok", 0))
  }

  test("packSequences and topKPerKey reject non-positive budget/k loudly") {
    val df = Seq(("a", 1L, "x")).toDF("shard", "id", "text")
    intercept[IllegalArgumentException](
      Curation.packSequences(df, "shard", "id", "text", budget = 0))
    intercept[IllegalArgumentException](
      Curation.topKPerKey(df, "shard", Seq(col("id")), col("id"), k = 0))
  }

  test("contaminatedDocs: only docs sharing an eval shingle hit, with overlap counts") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps"),   // shares 3-grams with eval doc
      (2L, "totally unrelated words here"))
      .toDF("id", "text")
    val eval = Seq((100L, "the quick brown fox sleeps")).toDF("id", "text")
    val hits = Curation.contaminatedDocs(corpus, eval).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // shared distinct 3-grams: "the quick brown", "quick brown fox"
    assert(hits == Map(1L -> 2L))
  }

  test("hashSample: deterministic, rate-monotone, and roughly proportional") {
    val d = spark.range(2000).toDF("k")
    def ids(rate: Double) =
      Curation.hashSample(d, "k", "seed1", lit(rate)).collect().map(_.getLong(0)).toSet
    val a1 = ids(0.3); val a2 = ids(0.3)
    assert(a1 == a2, "same seed+rate must select identical rows")
    val half = ids(0.6)
    assert(a1.subsetOf(half), "raising the rate must only ADD rows")
    assert(math.abs(a1.size - 600) < 120, s"${a1.size} not ≈ 600")
    assert(ids(0.0).isEmpty && ids(1.0).size == 2000)
    assert(ids(0.3) != Curation.hashSample(d, "k", "seed2", lit(0.3))
      .collect().map(_.getLong(0)).toSet, "different seed → different sample")
  }

  test("weightedMix: per-stratum rates hit the target mix, capped at 1.0; unknown strata drop") {
    val d = (0L until 900L).map(i => (i, if (i < 600) "big" else if (i < 870) "small" else "junk"))
      .toDF("k", "g")
    // budget 300, weights big=0.8 small=0.2 → rates big: 240/600=0.4,
    // small: 60/270≈0.222; junk has no weight → dropped entirely.
    val out = Curation.weightedMix(d, "g", "k", "s", Map("big" -> 0.8, "small" -> 0.2), 300L)
      .groupBy("g").count().collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(!out.contains("junk"), s"unknown stratum leaked: $out")
    assert(math.abs(out("big") - 240L) < 60, s"$out")
    assert(math.abs(out("small") - 60L) < 30, s"$out")
    // a stratum smaller than its target keeps everything (rate capped at 1)
    val capped = Curation.weightedMix(d, "g", "k", "s", Map("small" -> 1.0), 5000L)
      .groupBy("g").count().collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(capped == Map("small" -> 270L), s"$capped")
  }

  test("gopherRules: flags fire on the documented boundaries") {
    import graft.llm.TextAnalysis
    val rows = Seq(
      (1L, Seq.fill(30)("word").mkString(" ")),        // no stopword → reject
      (2L, ("the " * 10 + "word " * 20).trim),          // short words ok, has 'the'
      (3L, Seq.fill(25)("supercalifragilistic").mkString(" ") + " the"), // mean len > 10
      (4L, "the tiny doc"))                             // < 20 words
      .toDF("doc_id", "text")
    val r = TextAnalysis.gopherRules(col("text")).toMap
    val out = rows.select(col("doc_id"), r("keep").as("keep"), r("n_stop").as("n_stop"))
      .collect().map(x => (x.getLong(0), (x.getBoolean(1), x.getLong(2)))).toMap
    assert(out(1L) == ((false, 0L)), s"$out")
    assert(out(2L) == ((true, 1L)), s"$out")
    assert(out(3L)._1 == false, s"$out")
    assert(out(4L)._1 == false, s"$out")
  }

  test("repetitionMetrics: fractions exact, repetitive flag fires, short docs drop") {
    import graft.llm.TextAnalysis
    val rows = Seq(
      (1L, "a b a b a b a b a b"),   // 10 toks, 2 distinct; top bigram "a b" 5/9
      (2L, "one two three four five"), // all distinct, all bigrams unique
      (3L, "solo"))                   // < 2 tokens: dropped
      .toDF("doc_id", "text")
    val out = TextAnalysis.repetitionMetrics(rows, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(out.keySet == Set(1L, 2L))
    // doc 1: dup = 1 - 2/10 = 0.8; top bigram 5 of 9 = 0.5556
    assert(out(1L) == ((10L, 8000L, 5556L, true)), s"$out")
    // doc 2: dup 0; 4 unique bigrams → top = 1/4
    assert(out(2L) == ((5L, 0L, 2500L, true)), s"$out")
  }

  test("assignSplits: disjoint+exhaustive by construction, stable under corpus changes") {
    import graft.llm.Curation
    val d = graft.core.Tables.load(spark, sf, "documents").select("doc_id")
    val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val full = Curation.assignSplits(d, "doc_id", "s1", fr)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // exhaustive: every row got exactly one split
    assert(full.values.forall(Set("train", "val", "test")))
    // roughly proportional (hash uniformity; fixture has 500 docs)
    val n = full.size.toDouble
    val trainFrac = full.values.count(_ == "train") / n
    assert(trainFrac > 0.7 && trainFrac < 0.9, s"train frac $trainFrac")
    // STABLE: assignments computed on a half-corpus agree row-for-row
    val half = Curation.assignSplits(
        d.filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 0), "doc_id", "s1", fr)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(half.forall { case (id, s) => full(id) == s })
    // different seed ⇒ different assignment for at least some rows
    val reseeded = Curation.assignSplits(d, "doc_id", "s2", fr)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(reseeded.exists { case (id, s) => full(id) != s })
    // fractions must sum to 1
    intercept[IllegalArgumentException] {
      Curation.assignSplits(d, "doc_id", "s1", Seq("a" -> 0.5, "b" -> 0.4))
    }
  }

  test("canonicalUrl: case, default ports, fragments, tracking params, slashes") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      // scheme+host lowercase; path case PRESERVED
      "HTTPS://Example.COM/Path" -> "https://example.com/Path",
      // default ports strip per scheme; non-default ports stay
      "https://example.com:443/a" -> "https://example.com/a",
      "http://example.com:80/a" -> "http://example.com/a",
      "http://example.com:8080/a" -> "http://example.com:8080/a",
      // https keeps an explicit :80 (it is NOT that scheme's default)
      "https://example.com:80/a" -> "https://example.com:80/a",
      // trailing slashes collapse; bare host becomes '/'
      "https://example.com/a///" -> "https://example.com/a",
      "https://example.com" -> "https://example.com/",
      "https://example.com/" -> "https://example.com/",
      // fragment drops; tracking params drop; survivors sort
      "https://example.com/a?b=2&a=1#frag" -> "https://example.com/a?a=1&b=2",
      "https://example.com/a?utm_source=x&gclid=1&a=1" -> "https://example.com/a?a=1",
      "https://example.com/a?utm_campaign=x&fbclid=z&ref=rss" -> "https://example.com/a",
      // a non-tracking param NAMED like a prefix survives (refresh != ref)
      "https://example.com/a?refresh=1" -> "https://example.com/a?refresh=1",
      // empty query stays empty
      "https://example.com/a?#f" -> "https://example.com/a")
    val got = cases.map(_._1).toDF("url")
      .select(col("url"), Curation.canonicalUrl(col("url")).as("c"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (in, want) =>
      assert(got(in) == want, s"$in -> ${got(in)}, want $want")
    }
  }

  test("writeShards: manifest matches the written files and is deterministic") {
    import spark.implicits._
    val d = (0L until 200L).map(i => (i, s"w$i text $i")).toDF("doc_id", "text")
    val base = graft.core.Scratch.dir("shards_spec").toString
    val m = Curation.writeShards(d, "doc_id", "text", "t1",
      Seq("train" -> 0.5, "test" -> 0.5), nShards = 2, s"$base/o")
    val rows = m.collect()
    assert(rows.map(_.getLong(2)).sum == 200L, "every doc lands in exactly one cell")
    assert(rows.length > 2, "multiple (split, shard) cells populated")
    val dirs = new java.io.File(s"$base/o").listFiles
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.nonEmpty && dirs.subsetOf(Set("split=train", "split=test")), dirs)
    // re-delivery to a fresh dir reproduces the manifest cell-for-cell
    val m2 = Curation.writeShards(d, "doc_id", "text", "t1",
      Seq("train" -> 0.5, "test" -> 0.5), nShards = 2, s"$base/o2")
    assert(rows.toSet == m2.collect().toSet)
  }

  test("registrableDomain: ccTLD second levels, platform suffixes, short hosts") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      "www.example.co.uk" -> "example.co.uk",
      "a.b.example.co.uk" -> "example.co.uk",
      "deep.a.b.example.com" -> "example.com",
      "example.com" -> "example.com",
      // <= 2 labels pass through, even a bare suffix
      "localhost" -> "localhost",
      "co.uk" -> "co.uk",
      // hosted platforms: the platform domain is the eTLD
      "x.github.io" -> "x.github.io",
      "a.x.github.io" -> "x.github.io",
      "foo.blogspot.com" -> "foo.blogspot.com",
      "shop.example.com.au" -> "example.com.au")
    val got = cases.map(_._1).toDF("h")
      .select(col("h"), Curation.registrableDomain(col("h")).as("d"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (in, want) =>
      assert(got(in) == want, s"$in -> ${got(in)}, want $want")
    }
  }

  test("stripBoilerplate: cross-doc lines drop, within-doc repeats and unique lines stay") {
    import spark.implicits._
    val d = Seq(
      // "common" recurs across docs 1-3 under lower+trim normalization
      (1L, "alpha one\ncommon\nbeta one"),
      (2L, "COMMON \ngamma two"),
      // a doc that is ALL boilerplate must survive with empty text
      (3L, "common"),
      // "thrice" repeats 3x within ONE doc only -> distinct-doc count
      // is 1, stays below minDocs=2, so every copy is kept
      (4L, "thrice\nthrice\nthrice")).toDF("doc_id", "text")
    val out = Curation.stripBoilerplate(d, "doc_id", "text", minDocs = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == (("alpha one\nbeta one", 2L, 1L)))
    assert(out(2L) == (("gamma two", 1L, 1L)))
    assert(out(3L) == (("", 0L, 1L)))
    assert(out(4L) == (("thrice\nthrice\nthrice", 3L, 0L)))
  }

  test("scrubPii: each kind redacts to its placeholder; boundaries respected") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      "mail bob.smith+x@sub.example.co.uk end" -> "mail <EMAIL> end",
      "ip 192.168.0.1 end" -> "ip <IP> end",
      "ssn 123-45-6789 end" -> "ssn <SSN> end",
      "call 010-1234-5678 end" -> "call <PHONE> end",
      // \b guards: digit runs glued to word chars are NOT redacted
      "ida123-45-6789 end" -> "ida123-45-6789 end",
      // ssn shape (2-digit middle) never matches the phone pattern
      "plain 12-34-5678 end" -> "plain 12-34-5678 end",
      "x u7@example.com 10.0.3.7 123-45-6789 010-0004-1234 y" ->
        "x <EMAIL> <IP> <SSN> <PHONE> y")
    val got = cases.map(_._1).toDF("t")
      .select(col("t"), TextAnalysis.scrubPii(col("t")).as("c"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (in, want) =>
      assert(got(in) == want, s"$in -> ${got(in)}, want $want")
    }
    val counts = Seq("a@b.co 1.2.3.4 5.6.7.8 123-45-6789")
      .toDF("t").select(TextAnalysis.piiCounts(col("t"))
        .map { case (k, c) => c.as(k) }: _*).collect().head
    assert(counts.getInt(0) == 1 && counts.getInt(1) == 2 &&
      counts.getInt(2) == 1 && counts.getInt(3) == 0)
  }

  test("pageRankInt: ring fixpoint, star concentration, partition invariance") {
    // 3-ring: every node keeps exactly `scale` (150000 + 85% of 1e6)
    val ring = Seq((0L, 1L), (1L, 2L), (2L, 0L)).toDF("src", "dst")
    val r = Curation.pageRankInt(ring, iters = 4)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r.values.toSet == Set(1000000L), r)
    // star (all spokes -> hub): the hub outranks every spoke
    val star = (1L to 6L).map(i => (i, 0L)).toDF("src", "dst")
    val s = Curation.pageRankInt(star, iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(s(0L) > s(1L) && (1L to 6L).map(s).toSet.size == 1, s)
    // integer arithmetic makes the result partition-count invariant
    val edges = (0 until 60).map(i => (i.toLong % 12, (i * 5 + 1).toLong % 12))
      .filter(e => e._1 != e._2)
    val one = Curation.pageRankInt(edges.toDF("src", "dst").coalesce(1), 3)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val many = Curation.pageRankInt(edges.toDF("src", "dst").repartition(7), 3)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(one == many)
    spark.catalog.clearCache()
  }

  test("chunkDocuments: coverage, overlap, tail snap, and degenerate docs") {
    def toks(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, toks(10)),          // one full window exactly? 10 < 4? see below
      (2L, toks(4)),           // == chunk size -> exactly one chunk
      (3L, toks(3)),           // shorter than chunk -> one short chunk
      (4L, ""),                // no tokens -> zero chunks
      (5L, "  \t \n "),        // whitespace only -> zero chunks
      (6L, toks(11))           // tail NOT on a stride boundary -> snapped
    ).toDF("doc_id", "text")
    // chunk=4, overlap=1 -> stride=3
    val out = Curation.chunkDocuments(docs, "doc_id", "text", 4, 1)
      .orderBy("doc_id", "chunk_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    // doc 1 (10 toks): starts 0,3,6 (m=6, on stride) -> 3 chunks
    val d1 = out.filter(_._1 == 1L)
    assert(d1.map(_._2).toSeq == Seq(0, 1, 2))
    assert(d1.forall(_._3 == 4))
    assert(d1.last._4 == "w7 w8 w9 w10")
    // every token of doc 1 appears in some chunk (full coverage)
    assert(d1.flatMap(_._4.split(" ")).toSet == (1 to 10).map(i => s"w$i").toSet)
    // doc 2: single full chunk; doc 3: single short chunk
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0, 4, "w1 w2 w3 w4")))
    assert(out.filter(_._1 == 3L).toSeq == Seq((3L, 0, 3, "w1 w2 w3")))
    // docs 4/5: no chunks at all
    assert(!out.exists(r => r._1 == 4L || r._1 == 5L))
    // doc 6 (11 toks): starts 0,3,6 then tail snap 7 -> last two overlap
    val d6 = out.filter(_._1 == 6L)
    assert(d6.map(_._2).toSeq == Seq(0, 1, 2, 3))
    assert(d6(2)._4 == "w7 w8 w9 w10" && d6(3)._4 == "w8 w9 w10 w11")
    // chunking is narrow: no exchange in the plan
    val plan = Curation.chunkDocuments(docs, "doc_id", "text", 4, 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("chunkDocuments rejects bad window parameters") {
    val d = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](
      Curation.chunkDocuments(d, "doc_id", "text", 0, 0))
    intercept[IllegalArgumentException](
      Curation.chunkDocuments(d, "doc_id", "text", 4, 4))
  }
}
