package graft

import graft.SparkSpec

/** Regression locks on the PHYSICAL PLAN SHAPES the 100-TB design
  * depends on. Correctness gates prove the right rows come back; these
  * prove they come back the scale-safe way — a refactor that silently
  * turns a broadcast join into a shuffled sort-merge join, or a top-k
  * into a global sort, fails here even though results stay identical.
  */
class PlanShapeSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("topk_orders compiles to TakeOrderedAndProject — no global sort") {
    val p = plan("topk_orders")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("skew_salted_join broadcasts the replicated dim side — the fact side never shuffles for the join") {
    val p = plan("skew_salted_join")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("join_customer_nation_count broadcasts the small build side") {
    val p = plan("join_customer_nation_count")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("compare_diff keyed full-outer runs as a sort-merge join (both sides big by contract)") {
    val p = plan("compare_diff")
    assert(p.contains("SortMergeJoin") && p.contains("FullOuter"), p)
  }

  test("agg_lineitem_pricing pushes filter + pruning into the parquet scan and hash-aggregates") {
    val df = SparkEntry.queries("agg_lineitem_pricing")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("SortAggregate"), p)
    val scan = df.queryExecution.sparkPlan.toString
      .linesIterator.find(_.contains("FileScan")).getOrElse("")
    assert(scan.contains("PushedFilters: [IsNotNull(l_shipdate)") ||
      scan.contains("LessThanOrEqual(l_shipdate"), scan)
  }

  test("ANN assignment argmax is a HashAggregate (packed-long min), never SortAggregate") {
    val df = graft.llm.Ann.assignBuckets(
      graft.core.Tables.load(spark, sf, "embeddings")
        .selectExpr("vec_id", "embedding AS ce"),
      graft.llm.Ann.seedCentroids(
        graft.core.Tables.load(spark, sf, "embeddings")
          .selectExpr("vec_id", "embedding AS ce"), 4))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("SortAggregate"), p)
  }

  test("dedup_exact is one hash aggregate over the digest — no join, no window") {
    val p = plan("dedup_exact")
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("Window"), p)
  }
}
