package graft.llm

import graft.SparkSpec

/** Gates for Dedup.cdcChunks — content-defined chunking. The property
  * that justifies the operator: boundaries depend only on local
  * window content, so a copy with a SHIFTED prefix re-synchronizes at
  * the first shared boundary and every later chunk hashes identically
  * — fixed-offset blocking finds none of them. */
class CdcChunksSpec extends SparkSpec {
  import spark.implicits._

  private def chunks(docs: Seq[(Long, String)], divisor: Long = 8L) =
    Dedup.cdcChunks(docs.toDF("id", "text"), "id", "text",
        window = 4, divisor = divisor)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4)))

  test("shift-invariance: a prepended copy shares all chunks after re-sync") {
    val rnd = new scala.util.Random(7L)
    val body = Seq.fill(400)(('a' + rnd.nextInt(4)).toChar).mkString
    val out = chunks(Seq(1L -> body, 2L -> ("SHIFT>> " + body)))
    val h1 = out.filter(_._1 == 1L).map(_._4).toSet
    val h2 = out.filter(_._1 == 2L).map(_._4).toSet
    // duplicated-chunk output is non-empty and the two docs share
    // almost everything (only the pre-sync head chunk can differ)
    assert(h1.nonEmpty && (h1 intersect h2).nonEmpty, out.toSeq.take(5))
    // every shared hash appears in BOTH docs with the same length
    val byHash = out.groupBy(_._4)
    byHash.foreach { case (h, rows) =>
      assert(rows.map(_._3).distinct.length == 1, s"hash $h lengths differ")
      assert(rows.map(_._1).distinct.length >= 2, s"hash $h not cross-doc")
    }
    // exact re-sync correspondence: boundaries in the copy can differ
    // only where the window touches the 8-char prefix (positions ≤ 11
    // with window=4), so doc-1 chunks past its head map 1:1 onto
    // doc-2 chunks past that region, shifted by exactly the prefix
    val body1 = out.filter(r => r._1 == 1L && r._2 >= 5L)
      .map(r => (r._2 + 8L, r._3, r._4)).toSet
    val body2 = out.filter(r => r._1 == 2L && r._2 >= 13L)
      .map(r => (r._2, r._3, r._4)).toSet
    assert(body1 == body2,
      s"re-sync mismatch:\n  only doc1+8: ${(body1 -- body2).toSeq.sorted.take(3)}" +
        s"\n  only doc2: ${(body2 -- body1).toSeq.sorted.take(3)}")
  }

  test("identical docs: every chunk duplicated, concatenation covers the text") {
    val t = "the quick brown fox jumps over the lazy dog again and again"
    val out = chunks(Seq(1L -> t, 2L -> t))
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.nonEmpty)
    assert(d1.head._2 == 1L) // first chunk starts at 1
    assert(d1.map(c => c._2 + c._3).max == t.length + 1L) // covers the tail
    // chunks tile without gaps or overlaps
    d1.sliding(2).foreach {
      case Array(a, b) => assert(b._2 == a._2 + a._3, s"gap between $a and $b")
      case _ =>
    }
    assert(out.forall(_._5 == 2L))
  }

  test("unique content emits nothing; short doc is one whole-text chunk") {
    assert(chunks(Seq(1L -> "abcdefghijklmnop", 2L -> "qrstuvwxyz012345")).isEmpty)
    val out = chunks(Seq(1L -> "ab", 2L -> "ab")) // shorter than the window
    assert(out.toSet.map((c: (Long, Long, Long, String, Long)) => (c._1, c._2, c._3)) ==
      Set((1L, 1L, 2L), (2L, 1L, 2L)))
  }

  test("short docs never emit phantom boundaries past the text (r16 guard)") {
    // Pre-guard, sequence(window, length) DESCENDED for length < window
    // and could emit boundary candidates beyond the document end —
    // chunk extents past length, empty-slice digests falsely shared.
    // Sweep every sub-window length with duplicated content: every
    // chunk must sit inside the text and tile it exactly.
    val docs = (1 to 15).flatMap { len =>
      val t = ("abcdefghijklmno" + "!").substring(0, len)
      Seq((len * 2L) -> t, (len * 2L + 1L) -> t)
    }
    val out = chunks(docs)
    val byLen = docs.toMap
    assert(out.nonEmpty) // every duplicated short doc shares chunks
    out.foreach { case (id, start, clen, _, _) =>
      val textLen = byLen(id).length
      assert(start >= 1L && start + clen - 1L <= textLen.toLong,
        s"doc $id (len $textLen): phantom chunk at start=$start len=$clen")
    }
    // docs strictly below the window (4 here) carry no interior
    // boundary candidates at all: exactly one whole-text chunk
    out.filter(t => byLen(t._1).length < 4).foreach { case (id, start, clen, _, _) =>
      assert(start == 1L && clen == byLen(id).length.toLong,
        s"sub-window doc $id: start=$start len=$clen")
    }
  }
}
