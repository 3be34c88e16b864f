package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MarkupSpec extends SparkSpec {

  private def strip(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(Markup.stripMarkdown(col("t")).as("c"))
      .head().getString(0)
  }

  test("headings, quotes, rules, fences strip; content survives") {
    assert(strip("# Title\nbody") == "Title\nbody")
    assert(strip("###### deep\nx") == "deep\nx")
    assert(strip("#nospace stays") == "#nospace stays") // not a heading
    assert(strip("> quoted\n  > indented") == "quoted\nindented")
    assert(strip("a\n---\nb") == "a\n\nb")
    assert(strip("```scala\nval x = 1\n```") == "\nval x = 1\n")
  }

  test("emphasis, code, links, images") {
    assert(strip("**bold** and *em* and `code`") == "bold and em and code")
    assert(strip("__strong__ but snake_case_name stays") == "strong but snake_case_name stays")
    assert(strip("[anchor](http://x/y?z=1)") == "anchor")
    assert(strip("![alt text](img.png)") == "alt text")
    assert(strip("[](empty) ![](i)") == " ")
  }

  test("inline HTML strips before entities decode — the script trap") {
    assert(strip("<b>x</b> <br/> <!-- gone -->") == "x  ")
    // &lt;script&gt; must decode to literal text, never become a tag
    assert(strip("&lt;script&gt;alert(1)&lt;/script&gt;") == "<script>alert(1)</script>")
    // &amp;lt; decodes ONCE: to the literal five chars '&lt;'
    assert(strip("&amp;lt;") == "&lt;")
    assert(strip("&quot;q&quot; &#39;a&#39; A&nbsp;B &amp; C") == "\"q\" 'a' A B & C")
  }

  test("nested and unterminated fences stay line-anchored") {
    // inner ``` lines strip individually; content between them survives
    assert(strip("````\n```\ncode\n```\n````") == "\n\ncode\n\n")
    assert(strip("```unterminated\ntail") == "\ntail")
    // inline triple-backtick is NOT a fence (not line-anchored)...
    // but the inline-code rule still unwraps one `...` span
    assert(strip("a ``` b") == "a ``` b")
  }

  test("multi-line HTML comments and attribute-heavy tags") {
    assert(strip("x <!-- a\nb\nc --> y") == "x  y")
    assert(strip("""<a href="u" data-x='1'>t</a>""") == "t")
    assert(strip("<img src=\"u\"/>") == "")
  }

  test("list-bullet markers strip before inline emphasis") {
    assert(strip("* item *real*") == "item real") // not " item real*"
    assert(strip("- dash\n+ plus\n  * indented") == "dash\nplus\nindented")
    assert(strip("1. first\n23) second") == "first\nsecond")
    assert(strip("*no-space stays*") == "no-space stays") // italic, not bullet
  }

  test("setext headings: underline lines strip, title survives") {
    assert(strip("Title\n=====\nbody") == "Title\n\nbody")
    assert(strip("Other\n---\nbody") == "Other\n\nbody") // hrule form
  }

  test("single-underscore emphasis unwraps; identifiers never mangle") {
    assert(strip("a _em_ b") == "a em b")
    assert(strip("_lead_ word") == "lead word")
    assert(strip("(_paren_)") == "(paren)")
    assert(strip("snake_case_identifier stays") == "snake_case_identifier stays")
    assert(strip("the_variable_name") == "the_variable_name")
  }

  test("strikethrough unwraps") {
    assert(strip("~~gone~~ kept") == "gone kept")
  }

  test("reference-style links: usage to anchor, definition lines drop") {
    assert(strip("[text][ref] and [collapsed][]") == "text and collapsed")
    assert(strip("[r1]: http://ref \"title\"\nbody") == "\nbody")
    assert(strip("see [x][r]\n[r]: u\ntail") == "see x\n\ntail")
  }

  test("oracleExpr mirrors the rule list shape") {
    val sql = Markup.oracleExpr("text")
    assert(sql.startsWith("regexp_replace("))
    // one nested call per rule, innermost over the input expression
    assert("regexp_replace\\(".r.findAllIn(sql).size == Markup.rules.size)
    assert(sql.contains("'g'") && sql.contains("text"))
    // replacement groups flipped to RE2's convention
    assert(sql.contains("""'\1'""") && !sql.contains("$1"))
  }
}
