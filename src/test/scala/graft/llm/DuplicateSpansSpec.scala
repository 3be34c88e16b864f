package graft.llm

import graft.SparkSpec

/** Gates for Dedup.duplicateSpans — character-granular exact
  * duplicated-substring spans via digested prefix doubling.
  *
  * The load-bearing test is the PROPERTY check against an in-memory
  * SUFFIX ARRAY + LCP reference: a position starts a duplicated
  * length-≥L substring iff its LCP with an adjacent suffix in the
  * sorted suffix order is ≥ L (equal L-prefixes are contiguous in the
  * SA), and maximal spans are the islands of such starts. Agreement
  * on random corpora proves the duplicated-L-window union the engine
  * computes equals the suffix-array semantics. */
class DuplicateSpansSpec extends SparkSpec {
  import spark.implicits._

  /** In-memory reference: full suffix sort + neighbor LCP ≥ L marks,
    * then the same touching-windows island merge. */
  private def saReference(docs: Seq[(Long, String)],
      minLen: Int): Set[(Long, Long, Long, Long, Long)] = {
    val suffixes = docs.flatMap { case (id, t) =>
      (0 until t.length).map(i => (id, i + 1, t.substring(i)))
    }
    val sa = suffixes.sortBy(_._3)
    def lcp(a: String, b: String): Int = {
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n && a.charAt(i) == b.charAt(i)) i += 1
      i
    }
    val marked = sa.indices.filter { i =>
      (i > 0 && lcp(sa(i)._3, sa(i - 1)._3) >= minLen) ||
        (i < sa.length - 1 && lcp(sa(i)._3, sa(i + 1)._3) >= minLen)
    }.map(i => (sa(i)._1, sa(i)._2.toLong))
    marked.groupBy(_._1).iterator.flatMap { case (id, ps) =>
      val sorted = ps.map(_._2).sorted
      val islands = sorted.foldLeft(List.empty[List[Long]]) {
        case (acc @ (cur :: rest), p) if p - cur.head <= minLen =>
          (p :: cur) :: rest
        case (acc, p) => List(p) :: acc
      }
      islands.map { isl =>
        val start = isl.last; val end = isl.head + minLen
        (id, start, end, end - start, isl.length.toLong)
      }
    }.toSet
  }

  private def engine(docs: Seq[(Long, String)], minLen: Int,
      blockChars: Int): Set[(Long, Long, Long, Long, Long)] =
    Dedup.duplicateSpans(docs.toDF("id", "text"), "id", "text",
        minLen, blockChars)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSet

  test("hand fixture: cross-doc repeat found, maximal, exact bounds") {
    val docs = Seq(1L -> "xxabcdefghyy", 2L -> "zzabcdefghqq", 3L -> "unrelated!!!")
    // "abcdefgh" at positions 3..10 of both docs; L=5 → span [3, 11)
    val got = engine(docs, minLen = 5, blockChars = 6)
    assert(got == Set((1L, 3L, 11L, 8L, 4L), (2L, 3L, 11L, 8L, 4L)))
  }

  test("within-doc repeat duplicates; disjoint islands stay split") {
    val got = engine(Seq(7L -> "abcde1234abcde"), minLen = 5, blockChars = 5)
    assert(got == Set((7L, 1L, 6L, 5L, 1L), (7L, 10L, 15L, 5L, 1L)))
  }

  test("no ≥L repeat → empty output") {
    assert(engine(Seq(1L -> "abcdefgh", 2L -> "ijklmnop"), 4, 8).isEmpty)
  }

  test("property: engine == suffix-array reference on random low-alphabet corpora") {
    // 3-letter alphabet forces heavy repetition; seeds fixed so the
    // gate is deterministic. Block size 16 << doc length exercises the
    // overlap-block segmentation on every doc.
    val rnd = new scala.util.Random(20260815L)
    (1 to 5).foreach { round =>
      val docs = (1L to 8L).map { id =>
        val len = 30 + rnd.nextInt(90)
        id -> Seq.fill(len)(('a' + rnd.nextInt(3)).toChar).mkString
      }
      val L = 4 + rnd.nextInt(5) // 4..8 crosses the 2^K power boundary
      val got = engine(docs, L, blockChars = 16)
      val want = saReference(docs, L)
      assert(got == want,
        s"round $round L=$L\n  engine-only: ${(got -- want).toSeq.sorted}" +
          s"\n  reference-only: ${(want -- got).toSeq.sorted}")
    }
  }

  test("minLen at an exact power of two uses the single-digest key path") {
    val docs = Seq(1L -> "qqabcdefghijklmnopzz", 2L -> "rrabcdefghijklmnopww")
    // shared run of 16 chars at 3..18; L=8 (tail==0) → span [3, 19)... L=8:
    // marked starts 3..11 (9 windows), span [3, 19), len 16
    val got = engine(docs, minLen = 8, blockChars = 8)
    assert(got == Set((1L, 3L, 19L, 16L, 9L), (2L, 3L, 19L, 16L, 9L)))
    assert(got == saReference(docs, 8))
  }
}
