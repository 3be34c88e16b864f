package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq(
    (1L, 100L, "p1"), (1L, 200L, "p2"), (2L, 50L, "p3"))
    .toDF("k", "lt", "name")
  private def right = Seq(
    (1L, 100L, "r_at_100", 7.0), (1L, 150L, "r_at_150", 8.0), (2L, 60L, "r_late", 9.0))
    .toDF("k", "rt", "tag", "v")

  test("as-of: greatest right time <= left time; equal timestamps match; no-prior gives null") {
    val out = AsOf.joinAsOf(left, right, "k", "lt", "rt", Seq("tag", "v"))
      .orderBy("k", "lt").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("name"), r.getAs[String]("tag")))
    assert(out.toSeq == Seq(
      (1L, "p1", "r_at_100"), // rt == lt is eligible (the <= of ASOF)
      (1L, "p2", "r_at_150"), // most recent prior, not the first
      (2L, "p3", null)))      // right row at 60 > 50: no match
  }

  test("as-of: payload travels as one struct — a null field never mixes rows") {
    val r2 = Seq((1L, 10L, null.asInstanceOf[String], 1.0), (1L, 20L, "second", 2.0))
      .toDF("k", "rt", "tag", "v")
    val l2 = Seq((1L, 15L, "a"), (1L, 25L, "b")).toDF("k", "lt", "name")
    val out = AsOf.joinAsOf(l2, r2, "k", "lt", "rt", Seq("tag", "v"))
      .orderBy("lt").collect()
      .map(r => (r.getAs[String]("name"), r.getAs[String]("tag"), r.getAs[Double]("v")))
    // row at lt=15 matches the rt=10 row WHOLE: tag null, v=1.0 — a
    // per-column carry would have left tag null but pulled nothing, or
    // worse, mixed a later tag with an earlier v.
    assert(out.toSeq == Seq(("a", null, 1.0), ("b", "second", 2.0)))
  }

  test("as-of: null right timestamps never match — dropped, not carried forward") {
    // Spark sorts nulls FIRST ascending: unfiltered, a null-rt row
    // would head every key's window and its payload would carry into
    // left rows with no genuine prior match (k=2 here). Predicate-ASOF
    // (`rt <= lt`) says a null timestamp matches nothing.
    val r2 = Seq(
      (1L, Some(100L), "r_at_100", 7.0),
      (1L, None, "r_null", 6.0),
      (2L, None, "r_null2", 9.0))
      .toDF("k", "rt", "tag", "v")
    val out = AsOf.joinAsOf(left, r2, "k", "lt", "rt", Seq("tag", "v"))
      .orderBy("k", "lt").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("name"), r.getAs[String]("tag")))
    assert(out.toSeq == Seq(
      (1L, "p1", "r_at_100"), // genuine match unaffected by the null row
      (1L, "p2", "r_at_100"), // carries the real row, never the null-rt one
      (2L, "p3", null)))      // ONLY right row has null rt: no match
  }

  test("as-of: payload collision with left columns fails loud") {
    intercept[IllegalArgumentException](
      AsOf.joinAsOf(left, right.withColumnRenamed("tag", "name"), "k", "lt", "rt", Seq("name")))
  }

  test("forward as-of: smallest right time >= left time; equal timestamps match") {
    val out = AsOf.joinAsOfForward(left, right, "k", "lt", "rt", Seq("tag", "v"))
      .orderBy("k", "lt").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("name"), r.getAs[String]("tag")))
    assert(out.toSeq == Seq(
      (1L, "p1", "r_at_100"), // rt == lt is eligible (the >= of forward ASOF)
      (1L, "p2", null),       // nothing at-or-after 200
      (2L, "p3", "r_late")))  // 60 is the nearest following 50
  }

  test("tolerance as-of: in-window match kept, stale match nulled, no-match stays null") {
    val out = AsOf.joinAsOfWithin(left, right, "k", "lt", "rt", Seq("tag", "v"),
        (lt, rt) => lt - rt <= 60L) // long fixture times; window of 60
      .orderBy("k", "lt").collect()
      .map(r => (r.getAs[String]("name"), r.getAs[String]("tag")))
    assert(out.toSeq == Seq(
      ("p1", "r_at_100"), // lt=100, rt=100: within
      ("p2", "r_at_150"), // lt=200, rt=150: gap 50 <= 60, within
      ("p3", null)))      // no prior at all
    val tight = AsOf.joinAsOfWithin(left, right, "k", "lt", "rt", Seq("tag", "v"),
        (lt, rt) => lt - rt <= 10L)
      .orderBy("k", "lt").collect().map(r => r.getAs[String]("tag"))
    assert(tight.toSeq == Seq("r_at_100", null, null)) // p2's match went stale
  }

  test("forward as-of: nearest following wins over later ones; null rt dropped") {
    val r2 = Seq(
      (1L, Some(120L), "r_at_120", 1.0),
      (1L, Some(150L), "r_at_150", 2.0),
      (1L, None, "r_null", 3.0))
      .toDF("k", "rt", "tag", "v")
    val out = AsOf.joinAsOfForward(left, r2, "k", "lt", "rt", Seq("tag", "v"))
      .orderBy("k", "lt").collect()
      .map(r => (r.getAs[String]("name"), r.getAs[String]("tag")))
    assert(out.toSeq == Seq(
      ("p1", "r_at_120"), // 120, not 150: NEAREST at-or-after
      ("p2", null),       // null rt can never match
      ("p3", null)))
  }

  test("property: both directions agree with an in-memory brute force on random data") {
    // The carry-forward window construction vs the O(n·m) definition.
    // Right (key, rt) pairs are unique — ASOF tie-breaking among equal
    // right timestamps is engine-defined, so only the unambiguous
    // space is property-tested (the oracle queries pre-dedupe the same
    // way).
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val keyG = Gen.chooseNum(1L, 4L)
    val tG = Gen.chooseNum(0L, 50L)
    val leftG = Gen.listOfN(30, Gen.zip(keyG, tG))
    val rightG = Gen.listOfN(30, Gen.zip(keyG, tG)).map(_.distinct)
    val prop = Prop.forAll(leftG, rightG) { (ls, rs0) =>
      val rs = rs0.zipWithIndex.map { case ((k, t), i) => (k, t, s"tag$i") }
      val lDf = ls.zipWithIndex.map { case ((k, t), i) => (k, t, s"L$i") }
        .toDF("k", "lt", "name")
      val rDf = rs.toDF("k", "rt", "tag")
      def run(forward: Boolean) = {
        val df = if (forward) AsOf.joinAsOfForward(lDf, rDf, "k", "lt", "rt", Seq("tag"))
          else AsOf.joinAsOf(lDf, rDf, "k", "lt", "rt", Seq("tag"))
        df.collect().map(r => (r.getAs[String]("name"), r.getAs[String]("tag"))).toMap
      }
      def brute(forward: Boolean) = ls.zipWithIndex.map { case ((k, t), i) =>
        val cands = rs.filter(r => r._1 == k && (if (forward) r._2 >= t else r._2 <= t))
        val best = if (cands.isEmpty) null
          else (if (forward) cands.minBy(_._2) else cands.maxBy(_._2))._3
        s"L$i" -> best
      }.toMap
      run(forward = false) == brute(forward = false) &&
        run(forward = true) == brute(forward = true)
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(r.passed, r.status.toString)
  }

  test("nearest as-of: closer side wins, ties go backward, one-sided misses fall back") {
    val l = Seq((1L, 100L, "fwd_closer"), (1L, 200L, "back_closer"),
      (1L, 300L, "tie_back"), (2L, 10L, "only_fwd"), (3L, 10L, "no_rights"))
      .toDF("k", "lt", "name")
    val r = Seq(
      (1L, 90L, "r90"), (1L, 105L, "r105"),   // 100: 10 back vs 5 fwd
      (1L, 260L, "r260"),                      // 200: 95 back (r105) vs 60 fwd
      (1L, 295L, "r295"), (1L, 305L, "r305"),  // 300: 5 == 5 -> backward
      (2L, 50L, "r50"))                        // 10: nothing prior
      .toDF("k", "rt", "tag")
    val out = AsOf.joinAsOfNearest(l, r, "k", "lt", "rt", Seq("tag"))
      .collect().map(x => (x.getAs[String]("name"), x.getAs[String]("tag"))).toMap
    assert(out === Map("fwd_closer" -> "r105", "back_closer" -> "r260",
      "tie_back" -> "r295", "only_fwd" -> "r50", "no_rights" -> null))
  }

  test("nearest as-of: equal instant matches itself; null right times dropped") {
    val l = Seq((1L, 100L, "exact")).toDF("k", "lt", "name")
    val r = Seq((1L, Some(100L), "self"), (1L, Some(101L), "later"),
      (1L, None, "null_rt")).toDF("k", "rt", "tag")
    val out = AsOf.joinAsOfNearest(l, r, "k", "lt", "rt", Seq("tag"))
      .collect().map(x => (x.getAs[String]("name"), x.getAs[String]("tag"))).toMap
    assert(out === Map("exact" -> "self"))
  }

  test("property: nearest agrees with brute force (closer of back/fwd, ties backward)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val keyG = Gen.chooseNum(1L, 4L)
    val tG = Gen.chooseNum(0L, 50L)
    val leftG = Gen.listOfN(25, Gen.zip(keyG, tG))
    val rightG = Gen.listOfN(25, Gen.zip(keyG, tG)).map(_.distinct)
    val prop = Prop.forAll(leftG, rightG) { (ls, rs0) =>
      val rs = rs0.zipWithIndex.map { case ((k, t), i) => (k, t, s"tag$i") }
      val lDf = ls.zipWithIndex.map { case ((k, t), i) => (k, t, s"L$i") }
        .toDF("k", "lt", "name")
      val got = AsOf.joinAsOfNearest(lDf, rs.toDF("k", "rt", "tag"),
          "k", "lt", "rt", Seq("tag"))
        .collect().map(x => (x.getAs[String]("name"), x.getAs[String]("tag"))).toMap
      val want = ls.zipWithIndex.map { case ((k, t), i) =>
        val mine = rs.filter(_._1 == k)
        val b = mine.filter(_._2 <= t).sortBy(_._2).lastOption
        val f = mine.filter(_._2 >= t).sortBy(_._2).headOption
        val best = (b, f) match {
          case (Some(bb), Some(ff)) =>
            if (t - bb._2 <= ff._2 - t) bb._3 else ff._3
          case (Some(bb), None) => bb._3
          case (None, Some(ff)) => ff._3
          case _ => null
        }
        s"L$i" -> best
      }.toMap
      got == want
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(r.passed, r.status.toString)
  }
}
