package graft.llm

import org.apache.spark.sql.Column
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

  /** Arg-max language guess; ties resolve in profile order. */
  def langGuess(text: Column): Column = {
    val scores = langProfiles.map { case (l, _) => l -> langScore(text, l) }
    scores.foldRight(lit(scores.last._1)) { case ((l, s), acc) =>
      val geAll = scores.map(_._2).map(s >= _).reduce(_ && _)
      when(geAll, lit(l)).otherwise(acc)
    }
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

  /** Document fingerprint: min polynomial hash over char 5-grams —
    * winnowing with a single global window. The polynomial
    * (base 257 mod 2^31−1 over character codes) costs 5 integer ops
    * per position vs a full digest for the earlier md5-per-position
    * design; short docs right-pad with spaces to one full window.
    *
    * Two O(len) traps deliberately avoided: per-position `substr` on a
    * UTF8 string scans from the start (O(len²) total — measured 45 s
    * vs 6.5 s at sf0.1), so the text splits into a char-code array
    * once; and a bare array-valued subexpression inside a `transform`
    * lambda re-evaluates per element, so the code array is bound once
    * via a 1-element array-wrap (the "let" of Column algebra). Scope:
    * code values are UTF-16 units in Spark and codepoints in DuckDB —
    * identical over BMP text (the fixture is ASCII). */
  def fingerprint(text: Column): Column = {
    val t = when(length(text) < 5, rpad(text, 5, " ")).otherwise(text)
    val codes = transform(split(t, ""), c => ascii(c).cast("long"))
    val idxs = sequence(lit(1), length(t) - 4)
    element_at(transform(array(codes), cs =>
      array_min(transform(idxs, i => {
        val ch = (0 until 5).map(j => element_at(cs, i + lit(j)))
        ch.reduce((acc, c) => acc * 257L + c) % 2147483647L
      }))), 1)
  }
}
