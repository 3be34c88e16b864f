package graft.ops

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Conservation gate for linear multi-touch attribution: the
  * largest-remainder split must re-add EXACTLY to the purchase cents
  * of the sessions it allocated — the property float splits never
  * satisfy and the reason the allocator exists. */
class AttributionSpec extends SparkSpec {

  test("linear attribution credit sums exactly to the attributed purchase cents") {
    val out = SparkEntry.queries("events_attribution_linear")(spark, sf)
    val credit = out.agg(sum(col("credit_x100"))).head.getLong(0)

    // independent recompute of the attributed purchase total: same
    // 30-min-gap sessionization, sessions with positive purchase cents
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val sess = spark.read.parquet(s"$sf/events.parquet")
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
        floor(col("value") * 100 + 0.5).cast("long").as("v_x100"),
        when(lag(col("ts"), 1).over(w).isNull ||
            unix_millis(col("ts").cast("timestamp")) -
              unix_millis(lag(col("ts"), 1).over(w).cast("timestamp")) > 1800000L,
          1L).otherwise(0L).as("new_sess"))
      .withColumn("sess_no", sum(col("new_sess")).over(w))
    val total = sess.filter(col("event_type") === "purchase")
      .groupBy("user_id", "sess_no").agg(sum(col("v_x100")).as("p"))
      .filter(col("p") > 0)
      .agg(sum(col("p"))).head.getLong(0)

    assert(credit === total, s"credit=$credit purchase_total=$total")
    assert(total > 0)

    // decay attribution allocates the SAME session purchase totals
    // (same positive-purchase sessions, different weights) — its
    // credit must re-add to the identical grand total
    val decay = SparkEntry.queries("events_attribution_decay")(spark, sf)
      .agg(sum(col("credit_x100"))).head.getLong(0)
    assert(decay === total, s"decay=$decay purchase_total=$total")
  }

  test("markov removal effects: hand-solved absorbing chain, journey truncation") {
    import spark.implicits._
    // u1: a,b,P (+ a post-purchase event that MUST be ignored)
    // u2: a (never converts); u3: b,P; u4: P first.
    val ev = Seq(
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"), (1L, 30L, 3L, "P"),
      (1L, 40L, 8L, "b"),
      (2L, 10L, 4L, "a"),
      (3L, 10L, 5L, "b"), (3L, 20L, 6L, "P"),
      (4L, 10L, 7L, "P")
    ).toDF("u", "ts", "eid", "et")
    val tr = Attribution.journeyTransitions(ev, "u", "ts", "eid", "et", "P")
    val cnt = tr.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(cnt == Map(
      ("START", "a") -> 2L, ("START", "b") -> 1L, ("START", "CONV") -> 1L,
      ("a", "b") -> 1L, ("a", "NULL") -> 1L, ("b", "CONV") -> 2L))
    // Exact chain: P(b)=1, P(a)=1/2, P(START)=3/4; removing a -> 1/2,
    // removing b -> 1/4.
    val out = Attribution.markovRemovalEffects(tr).orderBy("channel").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      ("a", 750000000L, 500000000L, 333333L, 333333L),
      ("b", 750000000L, 250000000L, 666666L, 666666L)))

    // The metadata-size guard must fire from a bounded count probe,
    // BEFORE any driver collect of the oversized relation.
    val big = (1 to 20).map(i => (s"c$i", "CONV", 1L)).toDF("s", "t", "c")
    val e = intercept[IllegalArgumentException] {
      Attribution.markovRemovalEffects(big, maxStates = 10)
    }
    assert(e.getMessage.contains("maxStates=10"))
  }
}
