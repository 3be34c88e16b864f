package graft.ops

import graft.SparkSpec

class FifoSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(buys: Seq[(String, Long, Long)], sells: Seq[(String, Long, Long)]) =
    Fifo.matchLots(buys.toDF("k", "ord", "qty"), sells.toDF("k", "ord", "qty"),
        "k", "ord", "qty")
      .select("b_ord", "s_ord", "matched_qty")
      .as[(Long, Long, Long)].collect().toSet

  test("interleaved lots split exactly at cumulative boundaries") {
    // buys [0,5) [5,10); sells [0,3) [3,7) [7,10)
    val got = pairs(Seq(("k", 1L, 5L), ("k", 2L, 5L)),
      Seq(("k", 1L, 3L), ("k", 2L, 4L), ("k", 3L, 3L)))
    assert(got == Set((1L, 1L, 3L), (1L, 2L, 2L), (2L, 2L, 2L), (2L, 3L, 3L)))
  }

  test("oversold tail is unmatched, conservation holds") {
    // 5 bought, 8 sold → only 5 units pair up
    val got = pairs(Seq(("k", 1L, 5L)), Seq(("k", 1L, 4L), ("k", 2L, 4L)))
    assert(got == Set((1L, 1L, 4L), (1L, 2L, 1L)))
    assert(got.toSeq.map(_._3).sum == 5L)
  }

  test("leftover stock is unmatched") {
    val got = pairs(Seq(("k", 1L, 10L)), Seq(("k", 1L, 2L)))
    assert(got == Set((1L, 1L, 2L)))
  }

  test("keys do not cross-match") {
    val got = pairs(Seq(("a", 1L, 5L)), Seq(("b", 1L, 5L)))
    assert(got.isEmpty)
  }
}
