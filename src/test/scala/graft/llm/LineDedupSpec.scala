package graft.llm

import graft.SparkSpec

class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)]) =
    Dedup.lineDedup(docs.toDF("id", "text"), "id", "text", "\n")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap

  test("globally-first occurrence wins; repeats drop everywhere") {
    val out = run(Seq(
      1L -> "alpha\nboilerplate\nbeta",
      2L -> "boilerplate\ngamma",
      3L -> "gamma\nboilerplate\nalpha"))
    assert(out(1L) == ((3L, 0L, "alpha\nboilerplate\nbeta"))) // all first
    assert(out(2L) == ((2L, 1L, "gamma")))                    // boilerplate dropped
    assert(out(3L) == ((3L, 3L, "")))                         // every line seen before
  }

  test("first occurrence is by (id, pos) order, within one doc too") {
    val out = run(Seq(1L -> "x\ny\nx\nx", 2L -> "y"))
    assert(out(1L) == ((4L, 2L, "x\ny"))) // doc-internal repeats drop
    assert(out(2L) == ((1L, 1L, "")))
  }

  test("unique corpus round-trips unchanged") {
    val docs = Seq(1L -> "a\nb\nc", 2L -> "d\ne")
    val out = run(docs)
    docs.foreach { case (id, t) =>
      assert(out(id)._2 == 0L && out(id)._3 == t)
    }
  }

  test("line order is preserved after drops, not collection order") {
    val out = run(Seq(1L -> "dup", 2L -> "z9\ndup\na1\ndup\nm5"))
    assert(out(2L) == ((5L, 2L, "z9\na1\nm5")))
  }

  test("empty lines dedup like any other content") {
    val out = run(Seq(1L -> "a\n\nb", 2L -> "c\n\nd"))
    assert(out(1L)._2 == 0L)                 // first '' survives in doc 1
    assert(out(2L) == ((3L, 1L, "c\nd")))    // doc 2's '' drops
  }

  test("huge ids and positions beyond the old packed-key range stay correct") {
    // the retired id*1e6+pos order key overflowed for ids near
    // Long.MaxValue and corrupted ordering for pos >= 1e6; the struct
    // min has no such contract — the smaller id must still win
    val big = Long.MaxValue - 1
    val out = run(Seq(big -> "shared\nonly-big", 7L -> "shared\nonly-small"))
    assert(out(7L) == ((2L, 0L, "shared\nonly-small"))) // id 7 first: keeps all
    assert(out(big) == ((2L, 1L, "only-big")))          // 'shared' drops here
  }

  test("position ordering breaks id ties lexicographically") {
    // same doc: later duplicate of its own line 0 drops, regardless of
    // any arithmetic relation between id and pos
    val out = run(Seq(1000000L -> "p\nq\np"))
    assert(out(1000000L) == ((3L, 1L, "p\nq")))
  }
}
