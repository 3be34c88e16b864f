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
}
