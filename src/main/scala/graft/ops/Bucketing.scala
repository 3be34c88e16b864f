package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (pre-shuffled) table layout — the co-located-join primitive.
  *
  * The reference joins everything in browser memory (reference:
  * app/(contents)/compare/page.tsx:545-584 builds one key→row map per
  * side), which caps at a few MB. At 100 TB the equivalent design
  * decision is: pay the shuffle ONCE at write time. `bucketBy(n, key)`
  * hash-partitions rows into `n` buckets per the key; two tables
  * bucketed by the same key with the same bucket count join with NO
  * Exchange on either side — each task reads bucket i of both tables
  * and merges. For a fact table joined repeatedly on the same key
  * (orders ⋈ lineitem on orderkey, every TPC-H-shaped workload), the
  * one-time write shuffle amortizes across every subsequent join,
  * which is the dominant cost structure at cluster scale.
  *
  * `sortBy` inside each bucket additionally lets the sort-merge join
  * skip its per-task sort when files-per-bucket is 1 (guaranteed here
  * by the pre-write repartition), and gives parquet row-group min/max
  * locality for key-range scans. Since Spark 3.1 the planner only
  * trusts per-bucket sort order under
  * `spark.sql.legacy.bucketedTableScan.outputOrdering=true` — safe to
  * enable for tables written through this module; without it the join
  * still runs exchange-free, paying only a per-task sort of
  * already-sorted runs.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted parquet table at an explicit path,
    * registered in the session catalog under `table`. Overwrites both
    * catalog entry and files (idempotent re-runs). */
  def writeBucketed(
      df: DataFrame,
      table: String,
      path: String,
      numBuckets: Int,
      bucketCol: String,
      sortCols: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val sorted = (bucketCol +: sortCols.filterNot(_ == bucketCol))
    // repartition(numBuckets, key) uses the same murmur3-pmod hash as
    // the bucket-id assignment, so every bucket's rows land in exactly
    // one write task → ONE file per bucket. That is the layout under
    // which the scan advertises its sortBy order and the downstream
    // sort-merge join elides both the Exchange AND the per-task Sort.
    df.repartition(numBuckets, df.col(bucketCol))
      .write
      .mode("overwrite")
      .option("path", path)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(sorted.head, sorted.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Inner equi-join of two same-bucketed tables on the bucket key.
    * With both sides bucketed by `key` at equal bucket counts, Catalyst
    * plans a sort-merge join whose children are bare scans — zero
    * Exchange operators (locked by PlanShapeSpec). */
  def colocatedJoin(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    // hint("merge") pins the sort-merge strategy: at test scale one side
    // fits the broadcast threshold, but the operator exists for the
    // both-sides-huge case, and only SMJ exercises the bucket layout.
    spark.table(left).hint("merge").join(spark.table(right), key)
}
