package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit gates for Dedup.ngramSpanStats — the duplicated-span half of
  * training-data dedup. Hand-computed fixtures, short-doc fallback,
  * and the "no cross-doc duplication → zero bps" floor. */
class NgramSpanSpec extends SparkSpec {
  import spark.implicits._

  private def stats(rows: (Long, String)*) =
    Dedup.ngramSpanStats(rows.toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  test("shared 3-gram counts once per doc; unique grams don't") {
    // A: grams {x y z, y z w}; B: {x y z, y z q}; only "x y z" crosses docs
    val out = stats(1L -> "x y z w", 2L -> "x y z q", 3L -> "all tokens here differ")
    assert(out(0) === ((1L, 2L, 1L, 5000L)))
    assert(out(1) === ((2L, 2L, 1L, 5000L)))
    assert(out(2)._3 === 0L) // no gram shared with other docs
    assert(out(2)._4 === 0L)
  }

  test("docs shorter than n words fall back to whole-text grams and still cross-match") {
    val out = stats(1L -> "a b", 2L -> "a b", 3L -> "c")
    assert(out(0) === ((1L, 1L, 1L, 10000L)))
    assert(out(1) === ((2L, 1L, 1L, 10000L)))
    assert(out(2) === ((3L, 1L, 0L, 0L)))
  }

  test("within-doc repetition alone never flags: grams are distinct per doc") {
    // the repeated gram appears 3x inside ONE doc but in no other doc
    val out = stats(1L -> "p q r p q r p q r", 2L -> "totally other words here")
    assert(out(0)._3 === 0L, out.mkString(","))
  }

  test("an exact copy saturates at 10000 bps") {
    val text = "the quick brown fox jumps over the lazy dog"
    val out = stats(1L -> text, 2L -> text)
    assert(out.forall(_._4 === 10000L), out.mkString(","))
  }
}
