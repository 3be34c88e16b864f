package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CompareSpec extends SparkSpec {
  import spark.implicits._

  private def a = Seq((1, "x", 10), (2, "y", 20), (3, "z", 30)).toDF("k", "s", "n")
  private def b = Seq((2, "y", 20), (3, "zz", 30), (4, "w", 40)).toDF("k", "s", "n")

  test("diff classifies added/deleted/changed/same (J1)") {
    val d = Compare.diff(a, b, "k").collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(d == Map(1 -> "deleted", 2 -> "same", 3 -> "changed", 4 -> "added"))
  }

  test("diff(x, x) is all-same and summary partitions the key union (A1)") {
    val d = Compare.diff(a, a, "k")
    assert(d.filter($"status" =!= "same").count() == 0)
    val db = Compare.diff(a, b, "k")
    val total = Compare.summary(db).agg(sum("cnt")).as[Long].head()
    val keys = Compare.distinctKeyCount(a, b, "k").as[Long].head()
    assert(total == keys && keys == 4)
  }

  test("mismatch melt: changed emits differing fields only; added emits all; same none (R1)") {
    val m = Compare.mismatches(Compare.diff(a, b, "k"), "k")
    val rows = m.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getString(4)))
    assert(rows.count(_._1 == 3) == 1) // only 's' differs for key 3
    assert(rows.find(_._1 == 3).get == ((3, "s", "changed", "z", "zz")))
    assert(rows.count(_._1 == 4) == 2) // all fields of the present side
    assert(rows.filter(_._1 == 4).forall(_._4 == "")) // a_value '' for added
    assert(!rows.exists(_._1 == 2)) // same emits nothing
  }

  test("null keys dropped before diffing (P8)") {
    val withNull = Seq((Some(1), "x"), (None, "boom")).toDF("k", "s")
    val d = Compare.diff(withNull, withNull, "k")
    assert(d.count() == 1)
  }

  test("autoKey picks first common column (J4)") {
    val l = Seq((1, "a")).toDF("p", "q")
    val r = Seq((1, "a")).toDF("q", "r")
    assert(Compare.autoKey(l, r).contains("q"))
    assert(Compare.autoKey(l, Seq(1).toDF("zzz")).isEmpty)
  }

  test("union-of-fields covers both sides; absent side coerced to '' (P1/P10)") {
    val l = Seq((1, "x")).toDF("k", "only_a")
    val r = Seq((1, "y")).toDF("k", "only_b")
    val d = Compare.diff(l, r, "k")
    assert(d.columns.toSet ==
      Set("k", "status", "a_only_a", "b_only_a", "a_only_b", "b_only_b"))
    val row = d.head()
    assert(row.getAs[String]("b_only_a") == "" && row.getAs[String]("a_only_b") == "")
  }

  test("dedupKeysDeterministic keeps one deterministic row per key") {
    val dup = Seq((1, "b"), (1, "a"), (2, "c")).toDF("k", "v")
    val out = Compare.dedupKeysDeterministic(dup, "k").orderBy("k").as[(Int, String)].collect()
    assert(out.toSeq == Seq((1, "a"), (2, "c"))) // min by row image
  }
}
