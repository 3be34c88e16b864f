package graft.llm

import graft.SparkSpec

/** Gates for TextAnalysis.winnowFingerprints — the MOSS winnowing
  * guarantee and exact agreement with an in-memory reference. */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private def engine(docs: Seq[(Long, String)], k: Int, w: Int) =
    TextAnalysis.winnowFingerprints(docs.toDF("id", "text"), "id", "text", k, w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  /** In-memory reference: same keyed hash, explicit window scan with
    * leftmost-min selection. */
  private def reference(docs: Seq[(Long, String)], k: Int,
      w: Int): Set[(Long, Long, Long)] = {
    def h32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$s:win:h".getBytes("UTF-8"))
        .take(4).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16)
    }
    docs.flatMap { case (id, t) =>
      val n = t.length - k + 1
      if (n < w) Seq.empty
      else {
        val hs = (0 until n).map(i => h32(t.substring(i, i + k)))
        (0 to n - w).map { j =>
          val p = (j until j + w).minBy(i => (hs(i), i))
          (id, (p + 1).toLong, hs(p))
        }.distinct
      }
    }.toSet
  }

  test("engine == reference on random corpora; density ≈ 2/(w+1)") {
    val rnd = new scala.util.Random(99L)
    val docs = (1L to 6L).map { id =>
      id -> Seq.fill(120 + rnd.nextInt(200))(('a' + rnd.nextInt(5)).toChar).mkString
    }
    val got = engine(docs, k = 6, w = 4)
    val want = reference(docs, k = 6, w = 4)
    assert(got == want,
      s"only-engine: ${(got -- want).take(3)}; only-ref: ${(want -- got).take(3)}")
    // winnowing selects roughly 2/(w+1) of gram positions
    val grams = docs.map(_._2.length - 5).sum
    assert(got.size > grams / 8 && got.size < grams, s"${got.size} of $grams")
  }

  test("guarantee: any shared substring of ≥ w+k−1 chars shares a fingerprint") {
    val rnd = new scala.util.Random(5L)
    def rand(n: Int) = Seq.fill(n)(('a' + rnd.nextInt(6)).toChar).mkString
    val common = rand(9) // w+k-1 = 4+6-1 = 9
    val docs = Seq(1L -> (rand(60) + common + rand(60)),
      2L -> (rand(40) + common + rand(80)))
    val fp = engine(docs, k = 6, w = 4)
    val shared = fp.filter(_._1 == 1L).map(_._3) intersect
      fp.filter(_._1 == 2L).map(_._3)
    assert(shared.nonEmpty, "match of w+k-1 chars must share a fingerprint")
  }

  test("short documents (< w windows) emit nothing") {
    assert(engine(Seq(1L -> "abcdefgh"), k = 6, w = 4).isEmpty)
  }
}
