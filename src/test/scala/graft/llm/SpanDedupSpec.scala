package graft.llm

import graft.SparkSpec

class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], k: Int = 3) =
    Dedup.spanDedup(docs.toDF("id", "text"), "id", "text", "\n", k)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap

  test("a repeated 3-sentence run drops at every non-first occurrence") {
    val out = run(Seq(
      1L -> "a\nb\nc\ntail1",
      2L -> "head2\na\nb\nc\ntail2"))
    assert(out(1L) == ((4L, 0L, "a\nb\nc\ntail1")))      // first occurrence keeps
    assert(out(2L) == ((5L, 3L, "head2\ntail2")))        // the run drops
  }

  test("isolated repeated sentences never drop (coarser than line grain)") {
    val out = run(Seq(
      1L -> "x\nu1\nu2",
      2L -> "v1\nx\nv2")) // 'x' repeats but no 3-run does
    assert(out(1L)._2 == 0L && out(2L)._2 == 0L)
  }

  test("wholesale duplicate documents empty out") {
    val out = run(Seq(1L -> "p\nq\nr\ns", 2L -> "p\nq\nr\ns"))
    assert(out(1L) == ((4L, 0L, "p\nq\nr\ns")))
    assert(out(2L) == ((4L, 4L, ""))) // spans at 0 and 1 cover all 4
  }

  test("overlapping duplicate spans union their coverage") {
    // doc 2 embeds a 4-sentence run: 2 duplicate spans cover 4 sentences
    val out = run(Seq(
      1L -> "a\nb\nc\nd",
      2L -> "in\na\nb\nc\nd\nout"))
    assert(out(2L) == ((6L, 4L, "in\nout")))
  }

  test("documents shorter than k have no spans and round-trip unchanged") {
    val out = run(Seq(1L -> "s1\ns2", 2L -> "s1\ns2"))
    assert(out(1L) == ((2L, 0L, "s1\ns2")))
    assert(out(2L) == ((2L, 0L, "s1\ns2"))) // identical but too short to span
  }

  test("within-document repeats drop too; first span wins by (id, pos)") {
    val out = run(Seq(1L -> "m\nn\no\nz\nm\nn\no"))
    // span (m,n,o) at pos 0 is first; its repeat at pos 4 drops 4..6
    assert(out(1L) == ((7L, 3L, "m\nn\no\nz")))
  }

  test("k is configurable") {
    val out = run(Seq(1L -> "a\nb\nt1", 2L -> "t2\na\nb"), k = 2)
    assert(out(1L) == ((3L, 0L, "a\nb\nt1")))
    assert(out(2L) == ((3L, 2L, "t2"))) // 2-run (a,b) drops at k=2
  }
}
