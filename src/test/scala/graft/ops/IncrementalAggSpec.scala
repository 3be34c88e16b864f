package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private def fixture: DataFrame = {
    val rng = new scala.util.Random(7)
    (1 to 500).map { i =>
      (i.toLong, s"k${rng.nextInt(5)}", rng.nextInt(2000).toLong - 400L)
    }.toDF("id", "k", "v")
  }

  private def snap(df: DataFrame): Seq[(String, Long, Long, Long, Long)] =
    df.orderBy("k").collect().map(r => (r.getAs[String]("k"),
      r.getAs[Long]("n"), r.getAs[Long]("s"),
      r.getAs[Long]("mn"), r.getAs[Long]("mx"))).toSeq

  test("merge of disjoint batch states equals the full recompute") {
    val df = fixture
    val full = IncrementalAgg.state(df, Seq("k"), "v")
    val parts = Seq(
      IncrementalAgg.state(df.filter(col("id") % 3 === 0), Seq("k"), "v"),
      IncrementalAgg.state(df.filter(col("id") % 3 === 1), Seq("k"), "v"),
      IncrementalAgg.state(df.filter(col("id") % 3 === 2), Seq("k"), "v"))
    assert(snap(IncrementalAgg.merge(parts, Seq("k"))) == snap(full))
  }

  test("merge is fold-order independent and idempotent over regrouping") {
    val df = fixture
    val a = IncrementalAgg.state(df.filter(col("id") <= 250), Seq("k"), "v")
    val b = IncrementalAgg.state(df.filter(col("id") > 250), Seq("k"), "v")
    val ab = IncrementalAgg.merge(Seq(a, b), Seq("k"))
    val ba = IncrementalAgg.merge(Seq(b, a), Seq("k"))
    assert(snap(ab) == snap(ba))
    // merging a merged state with an empty-keyed extra state is a no-op
    val again = IncrementalAgg.merge(Seq(ab), Seq("k"))
    assert(snap(again) == snap(ab))
  }

  test("finalizeView derives the fixed-point avg from (s, n)") {
    val st = Seq(("a", 4L, 10L, 1L, 4L)).toDF("k", "n", "s", "mn", "mx")
    val out = IncrementalAgg.finalizeView(st, avgScale = 100L)
      .select("avg_scaled").head.getLong(0)
    assert(out == 250L) // 10·100 div 4
  }

  test("property: join-delta refresh equals the full recompute on random splits") {
    val rnd = new scala.util.Random(7)
    (0 until 3).foreach { trial =>
      val a = (0 until 200).map(i => (rnd.nextInt(20).toLong, i.toLong))
        .toDF("k", "av")
      val b = (0 until 60).map(i => (rnd.nextInt(20).toLong, (i * 10).toLong))
        .toDF("k", "bv")
      val cutA = rnd.nextInt(3).toLong; val cutB = rnd.nextInt(4).toLong
      val (aOld, dA) = (a.filter(col("av") % 3 =!= cutA), a.filter(col("av") % 3 === cutA))
      val (bOld, dB) = (b.filter(col("bv") % 4 =!= cutB), b.filter(col("bv") % 4 === cutB))
      val refreshed = IncrementalJoin.refresh(
        aOld.join(bOld, Seq("k")), aOld, dA, bOld, dB, Seq("k"))
        .groupBy("k").agg(count(lit(1)).as("n"), sum(col("av") + col("bv")).as("s"))
      val full = a.join(b, Seq("k"))
        .groupBy("k").agg(count(lit(1)).as("n"), sum(col("av") + col("bv")).as("s"))
      val d1 = refreshed.exceptAll(full).count()
      val d2 = full.exceptAll(refreshed).count()
      assert(d1 == 0 && d2 == 0, s"trial $trial: delta algebra diverged ($d1, $d2)")
    }
  }

  test("distinct state: inserts + retractions equal recompute; tombstones drop") {
    val df = fixture // (id, k, v) with repeated (k, v) pairs
    val keys = Seq("k")
    def recompute(d: DataFrame): Map[String, Long] =
      d.groupBy("k").agg(countDistinct(col("v")).as("nd")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    def viaState(parts: Seq[DataFrame]): Map[String, Long] =
      IncrementalAgg.finalizeDistinct(
          IncrementalAgg.mergeDistinct(parts, keys, "v"), keys)
        .collect().map(r => r.getString(0) -> r.getAs[Long]("n_distinct")).toMap
    // split inserts equal the full recompute
    val ins = Seq(
      IncrementalAgg.distinctState(df.filter(col("id") % 2 === 0), keys, "v"),
      IncrementalAgg.distinctState(df.filter(col("id") % 2 =!= 0), keys, "v"))
    assert(viaState(ins) == recompute(df))
    // retracting a slice equals recomputing without it — including
    // values that only PARTIALLY retract (multiplicity stays positive)
    val retr = IncrementalAgg.distinctState(
      df.filter(col("id") % 7 === 0), keys, "v", sign = -1)
    assert(viaState(ins :+ retr) == recompute(df.filter(col("id") % 7 =!= 0)))
    // full retraction leaves zero state rows (no tombstone accumulation)
    val undoAll = IncrementalAgg.distinctState(df, keys, "v", sign = -1)
    assert(IncrementalAgg.mergeDistinct(ins :+ undoAll, keys, "v").count() == 0L)
  }
}
