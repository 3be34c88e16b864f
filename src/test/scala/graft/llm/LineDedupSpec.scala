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
}
