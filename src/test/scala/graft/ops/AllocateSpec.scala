package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class AllocateSpec extends SparkSpec {
  import spark.implicits._

  private def alloc(rows: Seq[(String, Long, Long, Long)]) =
    Allocate.largestRemainder(rows.toDF("k", "w", "total", "tie"),
        "k", "w", "total", "tie")
      .select("k", "tie", "alloc").as[(String, Long, Long)].collect().toSet

  test("100 over weights 1,1,1: largest-remainder gives 34/33/33, first tie wins the cent") {
    val got = alloc(Seq(("k", 1L, 100L, 1L), ("k", 1L, 100L, 2L), ("k", 1L, 100L, 3L)))
    assert(got == Set(("k", 1L, 34L), ("k", 2L, 33L), ("k", 3L, 33L)))
  }

  test("proportional split is exact when divisible") {
    val got = alloc(Seq(("k", 2L, 90L, 1L), ("k", 1L, 90L, 2L)))
    assert(got == Set(("k", 1L, 60L), ("k", 2L, 30L)))
  }

  test("conservation: sum of allocations equals the total for every key") {
    val rows = Seq(("a", 3L, 1003L, 1L), ("a", 7L, 1003L, 2L), ("a", 11L, 1003L, 3L),
      ("b", 1L, 7L, 1L), ("b", 1L, 7L, 2L), ("b", 1L, 7L, 3L))
    val sums = Allocate.largestRemainder(rows.toDF("k", "w", "total", "tie"),
        "k", "w", "total", "tie")
      .groupBy("k").agg(sum("alloc").as("s"), max("total").as("t"))
      .select("s", "t").as[(Long, Long)].collect()
    assert(sums.forall { case (s, t) => s == t })
  }

  test("zero-weight row gets at most a remainder unit") {
    val got = alloc(Seq(("k", 0L, 10L, 1L), ("k", 5L, 10L, 2L)))
    assert(got == Set(("k", 1L, 0L), ("k", 2L, 10L)))
  }
}
