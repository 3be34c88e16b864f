package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.F

/** Pattern-editor operators (SURVEY §2.8 F1-F3, §2.5 A2-A3; reference
  * app/(contents)/pattern-editor/page.tsx).
  *
  * All ops are codegen'd Column expressions over a string column —
  * document-parallel at scale (one row per document), no shuffle.
  */
object Patterns {

  /** F3: the 11-preset find/replace library
    * (reference PRESETS, pattern-editor/page.tsx:28-40).
    * `multiline` marks presets meant to run with the m flag. */
  case class Preset(id: String, find: String, replace: String,
      multiline: Boolean = false)

  val presets: Seq[Preset] = Seq(
    Preset("newline-remove", """\r?\n""", ""),
    Preset("newline-collapse", """\n{2,}""", "\n"),
    Preset("period-to-newline", """\.\s+""", ".\n"),
    Preset("comma-to-newline", """,\s+""", ",\n"),
    Preset("trim-each-line", """^[ \t]+|[ \t]+$""", "", multiline = true),
    Preset("multi-space-collapse", """ {2,}""", " "),
    Preset("tabs-to-spaces", """\t""", "    "),
    Preset("spaces-to-tabs", """ {4}""", "\t"),
    Preset("nbsp-remove", " ", ""),
    Preset("zero-width-remove", "[​‌‍﻿]", ""),
    Preset("comma-korean-space", """,(\S)""", ", $1"),
  )

  def preset(id: String): Preset =
    presets.find(_.id == id).getOrElse(
      throw new IllegalArgumentException(s"unknown preset '$id'"))

  /** Build the effective pattern: literal-mode escaping + i/m flags
    * folded into inline groups (reference buildRegExp,
    * pattern-editor/page.tsx:64-74). */
  def buildPattern(pattern: String, regex: Boolean = true,
      caseSensitive: Boolean = true, multiline: Boolean = false): String = {
    val p = if (regex) pattern else F.escapeRegex(pattern)
    F.withFlags(p, ignoreCase = !caseSensitive, multiline = multiline)
  }

  /** F1: global replace (reference onReplaceAll, :262-278). */
  def replaceAll(c: Column, pattern: String, replacement: String,
      regex: Boolean = true, caseSensitive: Boolean = true,
      multiline: Boolean = false): Column =
    regexp_replace(c, buildPattern(pattern, regex, caseSensitive, multiline), replacement)

  /** F2: first-match-only replace (reference onReplaceOne, :242-259). */
  def replaceFirst(c: Column, pattern: String, replacement: String,
      regex: Boolean = true, caseSensitive: Boolean = true,
      multiline: Boolean = false): Column =
    F.regexpReplaceFirst(c,
      lit(buildPattern(pattern, regex, caseSensitive, multiline)), lit(replacement))

  /** A2: per-document match count (reference countMatches, :77-91). */
  def countMatches(c: Column, pattern: String, regex: Boolean = true,
      caseSensitive: Boolean = true, multiline: Boolean = false): Column =
    regexp_count(c, lit(buildPattern(pattern, regex, caseSensitive, multiline)))

  /** Apply a named preset (F3 over F1). */
  def applyPreset(c: Column, id: String): Column = {
    val p = preset(id)
    replaceAll(c, p.find, p.replace, regex = true, multiline = p.multiline)
  }

  /** A3: character count. */
  def charCount(c: Column): Column = length(c)
}
