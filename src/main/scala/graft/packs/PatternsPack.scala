package graft.packs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryPack
import graft.core.Tables
import graft.ops.Patterns

/** Oracle-checked queries for the pattern-editor surface (F1-F3,
  * A2-A3) over the `documents` table. DuckDB regexp note: its
  * regexp_replace is first-match by default ('g' makes it global) and
  * backrefs are `\1` (Java is `$1`) — the oracles account for both. */
object PatternsPack extends QueryPack {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // F1 via the multi-space-collapse preset (inflate first so the
    // collapse has work to do).
    "pattern_replace_all" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        Patterns.applyPreset(regexp_replace(col("text"), " ", "  "),
          "multi-space-collapse").as("out"))
        .orderBy("doc_id")),
    // F2: first-match-only replace through the custom Catalyst expr.
    "pattern_replace_first" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        Patterns.replaceFirst(col("text"), "the", "THE").as("out"))
        .orderBy("doc_id")),
    // F1 literal mode: '.' escaped, not wildcard.
    "pattern_literal_replace" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        Patterns.replaceAll(concat(col("lang"), lit("."), col("source")),
          ".", "-", regex = false).as("out"))
        .orderBy("doc_id")),
    // F1 backref + case-insensitive flag folding.
    "pattern_backref" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        Patterns.replaceAll(concat(col("lang"), lit(","), col("source")),
          """,(\S)""", ", $1").as("out"))
        .orderBy("doc_id")),
    // F3 end-to-end: ALL presets chained in library order over a
    // fixture that gives every preset work (leading spaces, injected
    // newlines, tabs, commas, periods). Output hashed — any divergence
    // in any preset's semantics breaks the gate.
    "pattern_presets_pipeline" -> ((s, dir) => {
      val src: org.apache.spark.sql.Column = expr(
        "concat('  ', replace(text, 'e', concat('e', chr(10))), chr(9), 'tail,  end. Done')")
      val out = Patterns.presets.foldLeft(src)((c, p) => Patterns.applyPreset(c, p.id))
      docs(s, dir).select(col("doc_id"), md5(out).as("h")).orderBy("doc_id")
    }),
    // A2: per-document match counts + document total.
    "pattern_count_matches" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        Patterns.countMatches(col("text"), "[bs][a-z]+").as("n_matches"))
        .orderBy("doc_id")),
    // A3: corpus character counts per language.
    "pattern_char_count" -> ((s, dir) =>
      docs(s, dir)
        .groupBy("lang")
        .agg(sum(Patterns.charCount(col("text"))).as("n_chars"),
          count(lit(1)).as("n_docs"))
        .orderBy("lang")),
  )

  /** Mirror of the chained preset fold: same inline-flag patterns
    * (RE2 supports `(?m)` too), replacements translated `$1` → `\1`,
    * 'g' for global. */
  private val presetPipelineSql: String = {
    val src = "concat('  ', replace(text, 'e', concat('e', chr(10))), chr(9), 'tail,  end. Done')"
    val folded = Patterns.presets.foldLeft(src) { (e, p) =>
      val find = graft.functions.F
        .withFlags(p.find, ignoreCase = false, multiline = p.multiline)
        .replace("'", "''")
      val repl = p.replace.replace("$1", "\\1").replace("'", "''")
      s"regexp_replace($e, '$find', '$repl', 'g')"
    }
    s"SELECT doc_id, md5($folded) AS h FROM documents ORDER BY doc_id"
  }

  val oracleSql: Map[String, String] = Map(
    "pattern_presets_pipeline" -> presetPipelineSql,
    "pattern_replace_all" ->
      """SELECT doc_id, regexp_replace(replace(text, ' ', '  '), ' {2,}', ' ', 'g') AS out
        |FROM documents ORDER BY doc_id""".stripMargin,
    "pattern_replace_first" ->
      "SELECT doc_id, regexp_replace(text, 'the', 'THE') AS out FROM documents ORDER BY doc_id",
    "pattern_literal_replace" ->
      """SELECT doc_id, regexp_replace(lang || '.' || source, '\.', '-', 'g') AS out
        |FROM documents ORDER BY doc_id""".stripMargin,
    "pattern_backref" ->
      """SELECT doc_id, regexp_replace(lang || ',' || source, ',(\S)', ', \1', 'g') AS out
        |FROM documents ORDER BY doc_id""".stripMargin,
    "pattern_count_matches" ->
      """SELECT doc_id, len(regexp_extract_all(text, '[bs][a-z]+')) AS n_matches
        |FROM documents ORDER BY doc_id""".stripMargin,
    "pattern_char_count" ->
      """SELECT lang, CAST(SUM(length(text)) AS BIGINT) AS n_chars, count(*) AS n_docs
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
  )
}
