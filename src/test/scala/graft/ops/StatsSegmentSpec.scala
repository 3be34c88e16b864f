package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class StatsSegmentSpec extends SparkSpec {
  import spark.implicits._

  test("abcClassify: cumulative-share classes on a hand-computed ladder") {
    // values 50, 30, 15, 5 (total 100): cum shares 50%, 80%, 95%, 100%
    // → A (≤80%) takes the first two, B (≤95%) the third, C the rest.
    val per = Seq((1L, 50L), (2L, 30L), (3L, 15L), (4L, 5L)).toDF("id", "v")
    val out = Stats.abcClassify(per, "id", "v")
      .orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("abc_class")))
    assert(out.toSeq == Seq((1L, "A"), (2L, "A"), (3L, "B"), (4L, "C")))
  }

  test("abcClassify: ties on value break by id, classes stay deterministic") {
    val per = Seq((10L, 25L), (11L, 25L), (12L, 25L), (13L, 25L)).toDF("id", "v")
    val out = Stats.abcClassify(per, "id", "v")
      .orderBy("id").collect().map(r => r.getAs[String]("abc_class"))
    // cum shares 25/50/75/100 → A,A,A,C (nothing lands in (80,95])
    assert(out.toSeq == Seq("A", "A", "A", "C"))
  }

  test("rfmSegments: best-on-all-three lands in 111, worst in kkk, counts conserve") {
    // 4 customers with strictly ordered metrics: recency asc = best
    // first; freq/monetary desc = best first. Customer 1 best on all
    // (recency 0, freq 40, mon 400), customer 4 worst on all.
    val per = Seq(
      (1L, 0L, 40L, 400L), (2L, 5L, 30L, 300L),
      (3L, 9L, 20L, 200L), (4L, 30L, 10L, 100L))
      .toDF("id", "rec", "freq", "mon")
    val out = Stats.rfmSegments(per, "id", "rec", "freq", "mon", k = 4)
      .orderBy("rfm_code").collect()
      .map(r => (r.getAs[Int]("rfm_code"), r.getAs[Long]("n_entities")))
    assert(out.toSeq == Seq((111, 1L), (222, 1L), (333, 1L), (444, 1L)))
  }
}
