package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FuzzySpec extends SparkSpec {
  import spark.implicits._

  /** Reference Levenshtein (classic DP) — independent of Spark's. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def naive(as: Seq[(Int, String)], bs: Seq[(Int, String)], k: Int) =
    (for { (ai, a) <- as; (bi, b) <- bs; if lev(a, b) <= k } yield (ai, bi)).sorted

  private def fuzzy(as: Seq[(Int, String)], bs: Seq[(Int, String)], k: Int) =
    Fuzzy.editJoin(as.toDF("aid", "a_s"), bs.toDF("bid", "b_s"), "a_s", "b_s", k)
      .select("aid", "bid").as[(Int, Int)].collect().toSeq.sorted

  test("deletionVariants: k=1 is the string plus every single deletion") {
    val got = Seq("abc").toDF("s")
      .select(Fuzzy.deletionVariants(col("s"), 1).as("v"))
      .as[Seq[String]].head.toSet
    assert(got === Set("abc", "bc", "ac", "ab"))
  }

  test("deletionVariants: empty string only yields itself; k=2 reaches depth 2") {
    val e = Seq("").toDF("s").select(Fuzzy.deletionVariants(col("s"), 1).as("v"))
      .as[Seq[String]].head
    assert(e === Seq(""))
    val got = Seq("ab").toDF("s").select(Fuzzy.deletionVariants(col("s"), 2).as("v"))
      .as[Seq[String]].head.toSet
    assert(got === Set("ab", "a", "b", ""))
  }

  test("editJoin ≡ cross+levenshtein on substitution/insert/delete/far pairs, no dup pairs") {
    val as = Seq((1, "kitten"), (2, "abc"), (3, ""), (4, "x"))
    val bs = Seq((10, "sitten"), (11, "abcd"), (12, "ab"), (13, "a"),
      (14, "zzzz"), (15, ""))
    for (k <- Seq(1, 2)) {
      val got = fuzzy(as, bs, k)
      assert(got === naive(as, bs, k), s"k=$k")
      assert(got.distinct === got, s"duplicate pairs at k=$k")
    }
  }

  test("editJoin: null strings match nothing") {
    val as = Seq((1, "ab"), (2, null)).toDF("aid", "a_s")
    val bs = Seq((10, "ab"), (11, null)).toDF("bid", "b_s")
    val got = Fuzzy.editJoin(as, bs, "a_s", "b_s", 1)
      .select("aid", "bid").as[(Int, Int)].collect().toSet
    assert(got === Set((1, 10)))
  }

  test("editJoin rejects colliding column names") {
    val df = Seq((1, "a")).toDF("id", "s")
    intercept[IllegalArgumentException](Fuzzy.editJoin(df, df, "s", "s", 1))
  }

  test("property: editJoin equals cross+levenshtein on random short strings") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val sG = Gen.chooseNum(0, 6).flatMap(n => Gen.stringOfN(n, Gen.oneOf('a', 'b', 'c')))
    val side = Gen.listOfN(10, sG)
    val prop = Prop.forAll(side, side, Gen.oneOf(1, 2)) { (as0, bs0, k) =>
      val as = as0.zipWithIndex.map { case (s, i) => (i, s) }
      val bs = bs0.zipWithIndex.map { case (s, i) => (i, s) }
      fuzzy(as, bs, k) == naive(as, bs, k)
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(r.passed, r.status.toString)
  }

  test("soundex: classic keys, run collapse, vowel separation, padding, edge cases") {
    import org.apache.spark.sql.functions.col
    val in = Seq("Robert", "Rupert", "Pfister", "Tymczak", "Ashcraft",
      "BOB", "bb", "A", "123!", "Kim Minjun").toDF("s")
    val got = in.select(col("s"), Fuzzy.soundex(col("s")).as("sx"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("Robert") == "R163" && got("Rupert") == "R163") // block together
    assert(got("Pfister") == "P236")  // leading same-code run collapses
    assert(got("Tymczak") == "T522")  // adjacent C/Z collapse, vowel keeps K
    // Documented simplified variant: H separates like a vowel (true
    // Soundex would give A261).
    assert(got("Ashcraft") == "A226")
    assert(got("BOB") == "B100")      // vowel separation keeps the second B
    assert(got("bb") == "B000")       // adjacent duplicates collapse
    assert(got("A") == "A000")        // pad to 4
    assert(got("123!") == "")         // nothing survives the strip
    assert(got("Kim Minjun").startsWith("K")) // space stripped, one key
  }
}
