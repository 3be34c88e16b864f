package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PatternsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): String =
    Seq("x").toDF("t").select(c.as("v")).head().getString(0)

  test("replaceAll global vs replaceFirst first-only (F1/F2)") {
    val df = Seq("the cat the dog the bird").toDF("t")
    assert(df.select(Patterns.replaceAll($"t", "the", "THE")).head().getString(0) ==
      "THE cat THE dog THE bird")
    assert(df.select(Patterns.replaceFirst($"t", "the", "THE")).head().getString(0) ==
      "THE cat the dog the bird")
  }

  test("$1 backrefs work in replaceFirst (JS parity)") {
    val df = Seq("ab12cd").toDF("t")
    assert(df.select(Patterns.replaceFirst($"t", "(\\d+)", "[$1]")).head().getString(0) ==
      "ab[12]cd")
  }

  test("literal mode escapes metacharacters (F1 non-regex)") {
    val df = Seq("a.b.c").toDF("t")
    assert(df.select(Patterns.replaceAll($"t", ".", "-", regex = false)).head().getString(0) ==
      "a-b-c")
    // regex mode: '.' is a wildcard
    assert(df.select(Patterns.replaceAll($"t", ".", "-")).head().getString(0) == "-----")
  }

  test("case-insensitive and multiline flag folding") {
    val df = Seq("The THE the").toDF("t")
    assert(df.select(Patterns.replaceAll($"t", "the", "x", caseSensitive = false))
      .head().getString(0) == "x x x")
    val ml = Seq("  a\n  b").toDF("t")
    assert(ml.select(Patterns.applyPreset($"t", "trim-each-line")).head().getString(0) == "a\nb")
  }

  test("countMatches counts non-overlapping global matches (A2)") {
    val df = Seq("abab abba").toDF("t")
    assert(df.select(Patterns.countMatches($"t", "ab")).head().getInt(0) == 3)
    assert(df.select(Patterns.countMatches($"t", "AB", caseSensitive = false)).head().getInt(0) == 3)
  }

  test("the 11 presets exist and apply (F3)") {
    assert(Patterns.presets.size == 11)
    val df = Seq("a  b\t\tc").toDF("t")
    assert(df.select(Patterns.applyPreset($"t", "multi-space-collapse")).head().getString(0) ==
      "a b\t\tc")
    assert(df.select(Patterns.applyPreset($"t", "tabs-to-spaces")).head().getString(0) ==
      "a  b        c")
    intercept[IllegalArgumentException](Patterns.preset("nope"))
  }
}
