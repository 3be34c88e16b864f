package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: language ID
  * (stopword-profile heuristic), quality scoring, token counting
  * (whitespace + BPE-ish regex), and document fingerprinting
  * (min char-n-gram hash — the degenerate single-window case of
  * winnowing).
  *
  * Everything is a codegen'd Column expression over the text column —
  * document-parallel, no shuffle, no UDFs.
  */
object TextAnalysis {

  /** Stopword profiles per language (tiny, deterministic; a real
    * deployment would plug in trained n-gram profiles — the operator
    * shape is identical). Order = tie-break priority. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "de" -> Seq("der", "die", "und", "ist", "das"),
    "fr" -> Seq("le", "les", "et", "des", "une"),
  )

  /** Per-language stopword hit count. */
  def langScore(text: Column, lang: String): Column = {
    val words = langProfiles.toMap.apply(lang).mkString("|")
    regexp_count(text, lit(s"\\b($words)\\b"))
  }

  /** Arg-max guess from precomputed score columns (one per language, in
    * profile order); ties resolve in profile order. Prefer this over
    * [[langGuess]] whenever the scores are already projected: the fold
    * references up to n² score pairs, so feeding it attribute
    * references instead of raw `regexp_count` trees guarantees each
    * score is evaluated once per row regardless of how far codegen's
    * subexpression elimination reaches. */
  def langGuessFrom(scores: Seq[(String, Column)]): Column =
    scores.foldRight(lit(scores.last._1)) { case ((l, s), acc) =>
      val geAll = scores.map(_._2).map(s >= _).reduce(_ && _)
      when(geAll, lit(l)).otherwise(acc)
    }

  /** Arg-max language guess; ties resolve in profile order. */
  def langGuess(text: Column): Column =
    langGuessFrom(langProfiles.map { case (l, _) => l -> langScore(text, l) })

  /** Per-script codepoint counts for the CJK family — the signal the
    * stopword profiles are blind to (no word spaces, no stopword
    * tokens). One codegen'd regexp_count per script. */
  def scriptCounts(text: Column): Seq[(String, Column)] = Seq(
    "hangul" -> regexp_count(text, lit("\\p{IsHangul}")),
    "kana" -> regexp_count(text, lit("[\\p{IsHiragana}\\p{IsKatakana}]")),
    "han" -> regexp_count(text, lit("\\p{IsHan}")))

  /** Script-first language guess (the CLD-style first stage): ANY
    * kana decides Japanese (Chinese and Korean text contains none —
    * Japanese prose is obligate kana even when Han-heavy); else
    * dominant Hangul decides Korean; else any Han decides Chinese;
    * else fall back to the stopword-profile argmax. Thresholds are
    * integer comparisons on the precomputed script counts, so the
    * decision is cross-engine exact. Pass ATTRIBUTE references for
    * the counts (the [[langGuessFrom]] rationale). */
  def langGuessCjk(hangul: Column, kana: Column, han: Column,
      stopwordGuess: Column): Column =
    when(kana >= 1, lit("ja"))
      .when(hangul >= 1 && hangul >= han, lit("ko"))
      .when(han >= 1, lit("zh"))
      .otherwise(stopwordGuess)

  /** Gopher word-count rule with the CJK fallback wired in (the
    * [[cjkAwareTerms]] integration into quality filtering): a
    * CJK-DOMINANT document (script codepoints over half its length)
    * takes its word count from the per-codepoint tokens, everything
    * else from the whitespace split — without this, a Japanese or
    * spaceless-Korean document counts as ONE word and the [20, max]
    * rule rejects it spuriously. Only the word-count rule transfers:
    * mean-word-len and stopword rules are language-specific by
    * construction (CCNet replaces them with per-language LM
    * perplexity — `text_lm_score`/`llm_pipeline_ccnet` here). All
    * decisions are integer comparisons, cross-engine exact. */
  def cjkWordStats(text: Column, minWords: Int = 20,
      maxWords: Int = 100000): Seq[(String, Column)] = {
    val nWs = size(filter(split(text, "\\s+"), t => t =!= "")).cast("long")
    val nCjkAware = size(filter(cjkAwareTerms(text), t => t =!= "")).cast("long")
    val nCjkChars = scriptCounts(text).map(_._2.cast("long")).reduce(_ + _)
    val dominant = nCjkChars * 2 > length(text).cast("long")
    val eff = when(dominant, nCjkAware).otherwise(nWs)
    Seq(
      "n_words_ws" -> nWs,
      "n_words_cjk" -> nCjkAware,
      "n_cjk_chars" -> nCjkChars,
      "cjk_dominant" -> dominant,
      "keep" -> (eff >= minWords && eff <= maxWords))
  }

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(split(text, "\\s+"))

  /** BPE-ish token count: letter runs, digit runs, single punctuation. */
  def bpeishTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))

  /** Stopword ratio (English profile), raw double. */
  def stopwordRatio(text: Column): Column =
    langScore(text, "en").cast("double") / tokenCount(text)

  /** Punctuation-character ratio, raw double. */
  def punctRatio(text: Column): Column =
    regexp_count(text, lit("[^A-Za-z0-9\\s]")).cast("double") /
      greatest(length(text), lit(1))

  /** Composite quality score ∈ [0,1]: token-count saturation +
    * stopword presence, equal weight (a simple, documented heuristic —
    * the operator contract is "deterministic per-doc score"). Raw
    * double; cross the oracle boundary via F.scale4. */
  def qualityScore(text: Column): Column =
    least(tokenCount(text).cast("double") / 100.0, lit(1.0)) * 0.5 +
      least(stopwordRatio(text) * 5.0, lit(1.0)) * 0.5

  /** [[qualityScore]] with the en-score already projected (same
    * expression tree with the attribute substituted for the regex
    * scan, so values are bit-identical) — pair with [[langGuessFrom]]
    * when a pipeline needs language AND quality in one pass: the en
    * regex then runs once per row instead of once per consumer. */
  def qualityScoreFrom(sEn: Column, text: Column): Column =
    least(tokenCount(text).cast("double") / 100.0, lit(1.0)) * 0.5 +
      least((sEn.cast("double") / tokenCount(text)) * 5.0, lit(1.0)) * 0.5

  /** Gopher-style rule columns (Rae et al. 2021 §A1.1, the published
    * quality heuristics): word count bounds, mean word length band,
    * alphabetic-character fraction, stopword presence. Returns the
    * audit columns plus the composite `keep` — pipelines usually keep
    * the flags, not just the verdict, so threshold ablations don't
    * re-scan the corpus. All codegen'd Column math (regexp_count /
    * translate / length — no HOFs, no UDFs), document-parallel.
    *
    * `stopwords` defaults to the en profile; `keep` requires n_words ∈
    * [minWords, maxWords], mean word length ∈ [3, 10], and ≥ minStop
    * distinct stopwords present. */
  def gopherRules(text: Column, minWords: Int = 20, maxWords: Int = 100000,
      minStop: Int = 1): Seq[(String, Column)] = {
    val toks = split(text, " ")
    val nWords = size(toks).cast("long")
    val nCharsNoSp = length(translate(text, " ", "")).cast("double")
    val nAlpha = length(regexp_replace(text, "[^a-z]", "")).cast("double")
    val meanLen = nCharsNoSp / nWords
    val nStop = langProfiles.toMap.apply("en")
      .map(w => array_contains(toks, w).cast("long")).reduce(_ + _)
    Seq(
      "n_words" -> nWords,
      "mean_word_len" -> meanLen,
      "alpha_frac" -> (nAlpha / nCharsNoSp),
      "n_stop" -> nStop,
      "keep" -> (nWords >= minWords && nWords <= maxWords &&
        meanLen >= 3.0 && meanLen <= 10.0 && nStop >= minStop))
  }

  /** CJK-aware tokenization (the CCNet convention for scripts written
    * WITHOUT word spaces): each Han / Hiragana / Katakana / Hangul
    * codepoint becomes its own token — spaced out by one codegen'd
    * regexp_replace before the whitespace split — while spaced
    * scripts tokenize by whitespace as usual. Without this, a
    * Japanese document collapses into one giant "word" and every
    * frequency statistic built on `\s+` (top terms, vocab growth,
    * Gopher word counts) silently degenerates. Java regex spells the
    * script classes \p{IsHan}…; the DuckDB twin uses RE2's \p{Han}…
    * — same code-point sets. Returns the token ARRAY (empties
    * included where runs touch — filter downstream). */
  def cjkAwareTerms(text: Column): Column =
    split(regexp_replace(text,
      "([\\p{IsHan}\\p{IsHiragana}\\p{IsKatakana}\\p{IsHangul}])", " $1 "),
      "\\s+")

  /** Gopher-style repetition metrics (the COUNTING complement to the
    * ratio rules in [[gopherRules]]): duplicate-token fraction
    * (1 − distinct/total) and top-bigram fraction (share of all bigram
    * occurrences taken by the most frequent one — Gopher flags docs
    * where it exceeds ~0.18). Token-level stats are per-row collection
    * functions; the bigram mode runs the DISTRIBUTED counting shape
    * (explode → (doc, bigram) hash agg → per-doc max) — the same plan
    * family as `text_top_terms`, shuffling token counts, never text.
    * Fractions cross the oracle boundary as scale4 fixed-point; the
    * `repetitive` flag compares the fixed-point value so both engines
    * branch on the same integer. Docs with < 2 tokens drop (no
    * bigrams). */
  def repetitionMetrics(docs: DataFrame, idCol: String, textCol: String,
      topBigramMax4: Long = 1800L): DataFrame = {
    val toks = docs.select(col(idCol),
      expr(s"filter(split($textCol, ' '), t -> t <> '')").as("toks"))
    val base = toks
      .select(col(idCol), size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct"))
      .filter(col("n_tokens") >= 2)
    val bigrams = toks.filter(size(col("toks")) >= 2)
      .select(col(idCol), explode(expr(
        "transform(sequence(0, size(toks) - 2), " +
          "i -> concat(element_at(toks, i + 1), ' ', element_at(toks, i + 2)))")).as("b"))
      .groupBy(idCol, "b").agg(count(lit(1)).as("c"))
      .groupBy(idCol).agg(max(col("c")).as("maxc"), sum(col("c")).as("nbi"))
    val top4 = graft.functions.F.scale4(
      col("maxc").cast("double") / col("nbi").cast("double"))
    base.join(bigrams, Seq(idCol))
      .select(col(idCol), col("n_tokens"),
        graft.functions.F.scale4(lit(1.0) -
          col("n_distinct").cast("double") / col("n_tokens").cast("double"))
          .as("dup_tok_x1e4"),
        top4.as("top_bigram_x1e4"),
        (top4 > topBigramMax4).as("repetitive"))
  }

  /** Document fingerprint: min polynomial hash over codepoint 5-grams —
    * winnowing with a single global window. The polynomial
    * (base 257 mod 2^31−1 over character codes) costs 5 integer ops
    * per position vs a full digest for the earlier md5-per-position
    * design; short docs right-pad with spaces to one full window.
    *
    * Runs on the codegen'd MinFingerprint kernel: the equivalent
    * split('')/ascii/nested-transform Column construction is
    * CodegenFallback — an interpreted lambda per CHARACTER and per
    * window — and an earlier per-position `substr` variant was O(len²)
    * (measured 45 s vs 6.5 s at sf0.1). One compiled loop per row;
    * DuckDB's string_split('') mirror iterates the same codepoints. */
  def fingerprint(text: Column): Column = {
    import graft.functions.F
    F.toColumn(graft.functions.MinFingerprint(F.toExpr(text)))
  }

  /** HTML → text extraction — the step BEFORE every other text
    * operator when the corpus is a web crawl: script/style bodies and
    * comments drop wholesale, remaining tags drop, the six core named
    * entities decode (tags first, entities after — an encoded
    * `&lt;tags&gt;` in prose must surface as literal text, never be
    * re-interpreted as markup; `&amp;` decodes LAST so `&amp;lt;`
    * yields the literal string `&lt;`), and whitespace collapses.
    * A narrow chain of codegen'd regexp_replace/replace calls — no
    * shuffle, no UDF — kept to the Java∩RE2 regex subset ((?is)
    * inline flags, non-greedy repeats) so the DuckDB oracle runs the
    * SAME patterns verbatim (with its explicit 'g' flag). Numeric
    * character references are out of scope (a regexp cannot compute a
    * codepoint); they survive as visible `&#NN;` text. */
  val htmlEntities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  def stripHtml(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script\\b[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    val decoded = htmlEntities.foldLeft(noTags) { case (c, (e, r)) =>
      // literal (non-regex) substitution on both engines
      replace(c, lit(e), lit(r))
    }
    trim(regexp_replace(decoded, "[ \t\r\n]+", " "))
  }

  /** Corpus-rarity quality signal — the integer-exact stand-in for a
    * unigram language-model score: a token's rarity is
    * `bitlength(total_tokens div token_count)` (a floor-log2 of the
    * inverse frequency — pure integer ops, so Spark and the oracle
    * agree to the bit, where a float `ln` would flake at ULP
    * boundaries), and a document scores the floor of 100× the mean
    * rarity of its tokens. High = rare-token content; boilerplate and
    * stop-word soup score low.
    *
    * Shape: one token explode (narrow) → one frequency aggregate
    * (map-side combined) → one broadcast of the 1-row total → one
    * equi-join back on token → one per-doc aggregate. At 100 TB the
    * frequency table is the only large shuffle and is exactly the
    * term-frequency relation every other corpus statistic shares. */
  def rarityScores(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs
      .select(col(idCol).as("id"), explode(split(col(textCol), " ")).as("tok"))
      .filter(col("tok") =!= "")
    val freq = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val total = freq.agg(sum(col("cnt")).as("total"))
    toks.join(freq, Seq("tok"))
      .join(broadcast(total))
      .select(col("id"),
        length(bin(expr("total div cnt"))).as("rb"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("rb")).as("_sr"))
      .select(col("id"), col("n_tokens"),
        expr("(_sr * 100) div n_tokens").as("rarity_x100"))
  }

  /** Stopword-filtered S-stemmer normalization: tokens lowercased,
    * stopwords dropped, and plural surface forms collapsed by the
    * classic three-rule S-stemmer (sses→ss, ies→i, trailing s drops
    * unless the token ends in ss) — the deterministic, regex-free
    * normalizer that merges inflected forms before counting. Several
    * surface forms map to one stem, so downstream term statistics
    * stop splitting their mass. Entirely narrow (one explode + a CASE
    * chain); the stopword set is a broadcast-literal isin. A real
    * Porter stemmer is a model decision, not an engine one — the
    * three S-rules are the documented scope. Output (id, stem). */
  def stemmedTokens(docs: DataFrame, idCol: String, textCol: String,
      stopwords: Seq[String]): DataFrame = {
    val toks = docs
      .select(col(idCol).as("id"),
        explode(split(col(textCol), " ")).as("raw"))
      .select(col("id"), lower(col("raw")).as("tok"))
      .filter(col("tok") =!= "" && !col("tok").isin(stopwords: _*))
    toks.select(col("id"),
      when(col("tok").endsWith("sses"),
        expr("substring(tok, 1, length(tok) - 2)"))
        .when(col("tok").endsWith("ies"),
          concat(expr("substring(tok, 1, length(tok) - 3)"), lit("i")))
        .when(col("tok").endsWith("ss"), col("tok"))
        .when(col("tok").endsWith("s") && length(col("tok")) > 1,
          expr("substring(tok, 1, length(tok) - 1)"))
        .otherwise(col("tok")).as("stem"))
  }

  /** Bigram-surprisal quality scoring — the contextual sibling of
    * [[rarityScores]] and the engine's perplexity proxy: per doc, the
    * mean log2 of 1/P(w2|w1) under the corpus bigram model, in pure
    * integer arithmetic (one bigram's surprisal = bitlength(cnt(w1)
    * div cnt(w1,w2)) where cnt(w1) counts w1 as a bigram HEAD — the
    * LM denominator Σ_y cnt(w1,y) — so the ratio is ≥ 1 by
    * construction; doc score = ×100 floor mean). A doc full of
    * improbable transitions (shuffled tokens, template mashups)
    * scores high even when every token is individually common — the
    * signal unigram rarity cannot see.
    *
    * Scale shape: bigram construction is NARROW (an index-transform
    * over the split array — no window, no per-doc shuffle); corpus
    * counts are two hash aggregates; scoring joins are keyed on the
    * bigram/head. Docs with < 2 tokens drop (no bigram, no score). */
  def bigramSurprisal(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = docs
      .select(col(idCol).as("id"),
        filter(split(col(textCol), " "), x => x =!= "").as("w"))
      .filter(size(col("w")) >= 2)
    val bp = base
      .select(col("id"), explode(expr(
        "transform(sequence(1, size(w) - 1), i -> struct(w[i-1] AS w1, w[i] AS w2))")).as("bg"))
      .select(col("id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val heads = bp.groupBy("w1").agg(count(lit(1)).as("c1"))
    val pairs = bp.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    bp.join(pairs, Seq("w1", "w2")).join(heads, Seq("w1"))
      .select(col("id"), length(bin(expr("c1 div cb"))).as("sb"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("sb")).as("_ss"))
      .select(col("id"), col("n_bigrams"),
        expr("(_ss * 100) div n_bigrams").as("surprisal_x100"))
  }

  /** Stupid Backoff trigram LM scoring (Brants et al. 2007, "Large
    * Language Models in Machine Translation" §4) — the perplexity
    * filter of a CCNet-style curation pipeline (Wenzek et al. 2020):
    * train an n-gram model on a REFERENCE slice, score every document
    * by its mean per-token surprisal under that model, and filter on
    * the score. Stupid Backoff is the at-scale choice on purpose: its
    * score S(w3|w1,w2) = count(w1w2w3)/count(w1w2) when the trigram
    * was seen, else 0.4·S(w3|w2), else 0.4²·count(w3)/N — no
    * discounting state, so the "model" is nothing but three count
    * tables, exactly what a distributed engine aggregates well.
    *
    * Integer-exact surrogate (shared verbatim with the DuckDB twin):
    * one token's surprisal in ×100 bits is
    *   trigram hit:  100·bitlength(cth div ct)
    *   bigram hit:   132 + 100·bitlength(ch div cb)
    *   unigram hit:  264 + 100·bitlength(N div cu)
    *   OOV:          264 + 100·bitlength(N)         (count-1 floor)
    * where each denominator counts the n-gram and each numerator its
    * CONTEXT as an (n−1)-gram head (so every ratio is ≥ 1), and 132 =
    * ⌊100·log2(1/0.4)⌋ is the per-level backoff penalty. Doc score =
    * floor mean over its trigram positions; docs with < 3 tokens drop.
    *
    * Scale shape: the seven branches over the split-token relation
    * each RECOMPUTE it from the columnar scan on purpose — the split
    * is whole-stage-codegen'd and a measured 2× cheaper than caching
    * 10⁶s of array rows through MEMORY_AND_DISK (cache write + per-
    * branch deserialization dominate); trigram construction is NARROW
    * (an index transform over the split array — no window, no per-doc
    * shuffle); the model is five hash
    * aggregates, and each context count folds into its n-gram table
    * MODEL-SIDE (tri⋈th, bi⋈bh are joins between count tables, not
    * over the corpus) so the scoring trigram stream shuffles exactly
    * THREE times — once per backoff level; the total-token count joins
    * as a broadcast single row. Nothing is quadratic. Output (id,
    * n_scored, n_backoff, n_oov, lm_bits_x100) — the backoff/OOV
    * counts are the model-coverage telemetry reported next to the
    * score. */
  def stupidBackoff(docs: DataFrame, idCol: String, textCol: String,
      trainPred: Column): DataFrame =
    sbTokenScores(docs, idCol, textCol, trainPred)
      .groupBy("id")
      .agg(count(lit(1)).as("n_scored"),
        sum(when(col("lvl") >= 1, lit(1)).otherwise(lit(0))).as("n_backoff"),
        sum(when(col("lvl") === 3, lit(1)).otherwise(lit(0))).as("n_oov"),
        expr("sum(sb) div count(1)").as("lm_bits_x100"))

  /** The token-level stream under [[stupidBackoff]]'s model: one row
    * per scored trigram position, (id, sb, lvl) where sb is the ×100
    * integer surprisal and lvl the backoff depth (0 trigram hit … 3
    * OOV). Shared by the doc-mean score and [[minKProb]]. */
  private def sbTokenScores(docs: DataFrame, idCol: String, textCol: String,
      trainPred: Column): DataFrame = {
    val base = docs
      .select(col(idCol).as("id"), trainPred.as("is_train"),
        filter(split(col(textCol), " "), x => x =!= "").as("w"))
    val train = base.filter(col("is_train"))
    val tTok = train.select(explode(col("w")).as("w3"))
    val uni = tTok.groupBy("w3").agg(count(lit(1)).as("cu"))
    // r20: the context/total counts are exact ROLLUPS of the n-gram
    // count tables — n_total = Σ cu, ch(w2) = Σ_{w3} cb, cth(w1,w2) =
    // Σ_{w3} ct — so they aggregate the vocab-sized tables instead of
    // re-exploding the training corpus (3 corpus-token passes become 3
    // vocab-scale aggregates; identical integer values by definition).
    val nTot = uni.agg(coalesce(sum(col("cu")), lit(0L)).as("n_total"))
    val tBi = train.filter(size(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(w) - 1), i -> struct(w[i-1] AS w2, w[i] AS w3))")).as("p"))
      .select(col("p.w2").as("w2"), col("p.w3").as("w3"))
    val bi = tBi.groupBy("w2", "w3").agg(count(lit(1)).as("cb"))
    val bh = bi.groupBy("w2").agg(sum(col("cb")).as("ch"))
    val tTri = train.filter(size(col("w")) >= 3)
      .select(explode(expr(
        "transform(sequence(2, size(w) - 1), i -> struct(w[i-2] AS w1, w[i-1] AS w2, w[i] AS w3))")).as("t"))
      .select(col("t.w1").as("w1"), col("t.w2").as("w2"), col("t.w3").as("w3"))
    val tri = tTri.groupBy("w1", "w2", "w3").agg(count(lit(1)).as("ct"))
    val th = tri.groupBy("w1", "w2").agg(sum(col("ct")).as("cth"))
    // Context counts fold into their n-gram tables model-side: these
    // two joins shuffle count tables, never the corpus stream.
    val triE = tri.join(th, Seq("w1", "w2"))
    val biE = bi.join(bh, Seq("w2"))
    val sTri = base.filter(size(col("w")) >= 3)
      .select(col("id"), explode(expr(
        "transform(sequence(2, size(w) - 1), i -> struct(w[i-2] AS w1, w[i-1] AS w2, w[i] AS w3))")).as("t"))
      .select(col("id"),
        col("t.w1").as("w1"), col("t.w2").as("w2"), col("t.w3").as("w3"))
    sTri
      .join(triE, Seq("w1", "w2", "w3"), "left")
      .join(biE, Seq("w2", "w3"), "left")
      .join(uni, Seq("w3"), "left")
      .crossJoin(broadcast(nTot))
      .select(col("id"),
        when(col("ct").isNotNull, expr("100 * length(bin(cth div ct))"))
          .when(col("cb").isNotNull, expr("132 + 100 * length(bin(ch div cb))"))
          .when(col("cu").isNotNull, expr("264 + 100 * length(bin(n_total div cu))"))
          .otherwise(expr("264 + 100 * length(bin(n_total))")).as("sb"),
        when(col("ct").isNotNull, lit(0))
          .when(col("cb").isNotNull, lit(1))
          .when(col("cu").isNotNull, lit(2))
          .otherwise(lit(3)).as("lvl"))
  }

  /** Min-K% Prob membership signal (Shi et al. 2023, "Detecting
    * Pretraining Data from Large Language Models"): per document, the
    * mean surprisal of its ceil(k%·n) LEAST-probable tokens under the
    * reference LM — a member of the training slice rarely contains
    * extreme-surprisal tokens, so a low tail-mean flags probable
    * members where the plain mean ([[stupidBackoff]]) washes the tail
    * out. The contamination-audit companion to the n-gram and LSH
    * decontamination screens: it catches memorized text those miss
    * when the surface form was lightly edited.
    *
    * Determinism under ties: the cut selects by rank over (sb DESC)
    * and tied boundary tokens are interchangeable BY VALUE, so the
    * selected multiset — and the integer mean — is unique no matter
    * how the window orders equal keys. One extra window pass over the
    * token stream; everything else is the shared LM plan. Output
    * (id, n_scored, n_k, mink_bits_x100). */
  def minKProb(docs: DataFrame, idCol: String, textCol: String,
      trainPred: Column, kPct: Int = 20): DataFrame = {
    require(kPct >= 1 && kPct <= 100, s"minKProb: kPct=$kPct")
    import org.apache.spark.sql.expressions.Window
    val toks = sbTokenScores(docs, idCol, textCol, trainPred)
    val w = Window.partitionBy("id").orderBy(desc("sb"))
    val wn = Window.partitionBy("id")
    toks
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wn))
      .filter(col("rn") <= expr(s"(n * $kPct + 99) div 100"))
      .groupBy("id")
      .agg(max(col("n")).as("n_scored"),
        count(lit(1)).as("n_k"),
        expr("sum(sb) div count(1)").as("mink_bits_x100"))
  }

  /** Sentence segmentation — the granularity between document and
    * token: each sentence is a maximal run of non-terminator
    * characters plus its trailing `.!?` run, trimmed; empty segments
    * drop. Deliberately extraction-based (`regexp_extract_all` on
    * `[^.!?]+[.!?]*`) rather than split-on-lookbehind — RE2 has no
    * lookbehind, and this formulation runs VERBATIM on both engines.
    * Naive by design about abbreviations ("Dr. Smith" splits) — the
    * documented cost of a regex segmenter; a model-based splitter is
    * out of scope for an engine. Narrow: one extract + posexplode,
    * no shuffle. Output (id, sent_id, sentence). */
  def sentences(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("id"),
        posexplode(regexp_extract_all(col(textCol),
          lit("[^.!?]+[.!?]*"), lit(0))).as(Seq("sent_id", "raw")))
      .select(col("id"), col("sent_id"), trim(col("raw")).as("sentence"))
      .filter(col("sentence") =!= "")

  /** PII patterns for free-text scrubbing, applied in this order
    * (email first — its local part may contain digits a later digit
    * pattern would chew on; the digit shapes are mutually disjoint:
    * SSN's middle group is 2 digits, phone's is 3–4, IP uses dots).
    * Kept to the regex subset Java and RE2 share (`\b`, `\d`, bounded
    * repeats, non-capturing groups) so the DuckDB oracle runs the
    * SAME pattern strings verbatim. */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b", "<IP>"),
    ("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"),
    ("phone", "\\b\\d{2,3}-\\d{3,4}-\\d{4}\\b", "<PHONE>"))

  /** Free-text PII scrubbing — the redaction pass a corpus runs before
    * any text ships to training: emails, IPv4s, SSN-shaped and
    * phone-shaped digit runs each collapse to a typed placeholder
    * token. Column-level masking (ops/Mask) anonymizes a KNOWN field;
    * this catches PII embedded anywhere inside document text.
    *
    * A narrow chain of codegen'd regexp_replace calls — no shuffle,
    * no UDF; at 100 TB it runs entirely map-side inside the scan's
    * WholeStageCodegen span. */
  def scrubPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (_, pat, rep)) =>
      regexp_replace(c, pat, rep)
    }

  /** Per-kind PII match counts over the ORIGINAL text (each kind
    * counted independently; the patterns are disjoint, see
    * [[piiPatterns]]) — the audit metric reported next to the scrub. */
  def piiCounts(text: Column): Seq[(String, Column)] =
    piiPatterns.map { case (kind, pat, _) =>
      (kind, size(regexp_extract_all(text, lit(pat), lit(0))))
    }

  /** RAKE keyword extraction (Rose et al. 2010, "Automatic Keyword
    * Extraction from Individual Documents"): candidate phrases are
    * maximal stopword-free token runs; each word scores
    * degree/frequency (degree = Σ length of the phrase occurrences
    * containing it), and a phrase scores the sum of its words'
    * scores. Corpus-level distributed shape: token islands come from
    * the classic gaps-and-islands trick (pos − row_number over
    * non-stop tokens per doc — one per-doc window), word stats are
    * ONE hash aggregate over exploded phrase words, and the top-k is
    * TakeOrderedAndProject — no global sort, no driver loop. Scores
    * are x1e4 integer fixed point (deg·1e4 div freq; the phrase sum
    * stays integer), so the ranking is oracle-exact.
    * Output: (phrase, n_occ, rake_x1e4) — top `k` by score. */
  /** Winnowing document fingerprints (Schleimer-Wilkerson-Aiken 2003,
    * the MOSS algorithm): hash every k-gram, then keep ONE hash per
    * window of `w` consecutive positions — the minimum, leftmost on
    * ties. The guarantee that makes it the standard plagiarism /
    * contamination fingerprint: any verbatim match of ≥ w+k−1 chars
    * shares at least one selected fingerprint, while storage is ~2/(w+1)
    * of the gram count.
    *
    * Scale shape: one narrow generate→project stage hashes the grams
    * (the gram text exists only inside the stage, like cdcChunks'
    * boundary scan — windows never shuffle), then selection is ONE
    * keyed sliding-window pass: the window-of-w minimum at start j is
    * `min(key) OVER (... ROWS BETWEEN CURRENT ROW AND w−1 FOLLOWING)`
    * evaluated at position j — no membership fan-out, no w× row
    * multiplication (the fan-out formulation went 15× at 10× data;
    * this one rides a single exchange on the doc key). The argmin key
    * is exact-integer (h·2²⁰ + p): smallest hash, leftmost position on
    * ties — no float, no arg_min ambiguity, oracle-identical.
    * Documents are bounded at 2²⁰ chars by the position field
    * (assert_true fails loud, not silently wrong).
    *
    * Output: distinct (id, p 1-based gram start, h) fingerprints. */
  def winnowFingerprints(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 20, w: Int = 8): DataFrame = {
    require(k >= 4 && k <= 64, s"winnowFingerprints: k=$k")
    require(w >= 2 && w <= 64, s"winnowFingerprints: w=$w")
    import org.apache.spark.sql.expressions.Window
    val base = docs.select(col(idCol).as("id"), col(textCol).as("text"))
    // np = number of gram positions, carried from the text length (no
    // extra aggregate); guard the position-field width while at it
    val pos = base
      .select(col("id"),
        explode(when(length(col("text")) >= k,
          expr(s"sequence(1L, length(text) - ${k - 1}L)"))).as("p"),
        col("text"),
        (length(col("text")).cast("long") - (k - 1).toLong).as("np"))
      .select(col("id"), col("p"),
        when(assert_true(col("np") < 1048576L).isNull, col("np")).as("np"),
        graft.functions.F.hash32(
          expr(s"substring(text, CAST(p AS INT), $k)"), "win", "h").as("h"))
    val frame = Window.partitionBy("id").orderBy("p")
      .rowsBetween(Window.currentRow, w - 1)
    pos
      .withColumn("wmin", min(col("h") * 1048576L + col("p")).over(frame))
      .filter(col("p") <= col("np") - (w - 1).toLong) // complete windows only
      .select(col("id"), expr("wmin % 1048576").as("p"),
        expr("wmin div 1048576").as("h"))
      .distinct()
  }

  def rakeKeywords(docs: DataFrame, idCol: String, textCol: String,
      stopwords: Seq[String], k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol).as("id"),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "term")))
      .filter(col("term") =!= "")
    val w = Window.partitionBy("id").orderBy("pos")
    val islands = toks.filter(!col("term").isin(stopwords: _*))
      .withColumn("grp", col("pos") - row_number().over(w))
    // one row per phrase OCCURRENCE, words kept for scoring
    val phrases = islands.groupBy("id", "grp")
      .agg(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("term")))),
          x => x.getField("term")), " ").as("phrase"),
        count(lit(1)).as("plen"))
    val pw = phrases.select(col("phrase"), col("plen"),
      explode(split(col("phrase"), " ")).as("term"))
    val scores = pw.groupBy("term")
      .agg(count(lit(1)).as("freq"), sum(col("plen")).as("deg"))
      .withColumn("score_x1e4", expr("deg * 10000L div freq"))
      .select("term", "score_x1e4")
    val occ = phrases.groupBy("phrase").agg(count(lit(1)).as("n_occ"))
    occ.select(col("phrase"), col("n_occ"),
        explode(split(col("phrase"), " ")).as("term"))
      .join(scores, "term")
      .groupBy("phrase", "n_occ")
      .agg(sum(col("score_x1e4")).as("rake_x1e4"))
      .orderBy(desc("rake_x1e4"), desc("n_occ"), asc("phrase"))
      .limit(k)
  }

  /** Multinomial Naive Bayes, trained and served as ONE declarative
    * plan — the supervised sibling of the stopword-profile [[langGuess]]
    * heuristic, and the classic fastText-shaped quality/language gate a
    * curation pipeline runs over every document.
    *
    * Training is nothing but the term-frequency relation: per-(class,
    * token) counts with add-one smoothing. The per-token class cost is
    * the bit-length surprisal  cost(w,c) = bitlen((T_c + V) div
    * (cnt(w,c) + 1))  ≈ log2 of the smoothed inverse class-conditional
    * probability — the same integer-log idiom as [[rarityScores]], so
    * the whole model crosses the oracle boundary exactly. Scoring sums
    * costs over token OCCURRENCES and takes argmin (score, class) —
    * struct-min, deterministic under ties.
    *
    * Scale shape: training = one hash aggregate on (class, token);
    * the weight grid is vocab × classes (vocab-sized by Heaps' law,
    * classes tiny — totals and |V| broadcast); scoring re-joins tokens
    * on `tok`, the same single large shuffle every corpus statistic
    * here shares. Tokens unseen in training drop from scoring (OOV =
    * ignored, the documented smoothing choice — an OOV pseudo-token is
    * a one-line variant). Docs whose every token is OOV drop. */
  def nbTrain(train: DataFrame, textCol: String, classCol: String): DataFrame = {
    val toks = train
      .select(col(classCol).as("cls"), explode(split(col(textCol), " ")).as("tok"))
      .filter(col("tok") =!= "")
    // The term-frequency relation feeds THREE consumers (class totals,
    // vocab, smoothing grid) — persist it so the corpus explode+shuffle
    // runs once (plan-audited: one training scan).
    val counts = toks.groupBy("cls", "tok").agg(count(lit(1)).as("cwc"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = counts.groupBy("cls").agg(sum(col("cwc")).as("tc"))
    val vocabSize = counts.agg(countDistinct(col("tok")).as("v"))
    // The model grid is vocab × classes — bounded by Heaps' law no
    // matter the corpus — so materialize it once and release the
    // term-frequency cache with it: training is terminal, and the
    // persisted counts relation would otherwise stay pinned in the
    // CacheManager for the life of the session.
    graft.core.Materialize.drained(
      counts.select("tok").distinct()
        .crossJoin(broadcast(totals))
        .join(counts, Seq("cls", "tok"), "left").na.fill(0L, Seq("cwc"))
        .crossJoin(broadcast(vocabSize))
        .select(col("tok"), col("cls"),
          length(bin(expr("(tc + v) div (cwc + 1)"))).cast("long").as("cost")),
      counts)
  }

  /** Score + argmin over a [[nbTrain]] weight grid. Output
    * (id, pred, score) — one row per doc with ≥1 in-vocabulary token. */
  def nbScore(docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame): DataFrame =
    docs
      .select(col(idCol).as("id"), explode(split(col(textCol), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .join(model, Seq("tok"))
      .groupBy("id", "cls").agg(sum(col("cost")).as("score"))
      .groupBy("id").agg(min(struct(col("score"), col("cls"))).as("best"))
      .select(col("id"), col("best.cls").as("pred"), col("best.score").as("score"))
}
