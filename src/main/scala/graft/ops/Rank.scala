package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** Scale-safe global ranking (SURVEY §2.6 O4 — the reference's
  * Fisher-Yates shuffle, app/(contents)/random/page.tsx:135-140,
  * re-expressed as a deterministic keyed-hash rank).
  *
  * A `row_number() OVER (ORDER BY ...)` window with no PARTITION BY
  * moves the whole table through one task — fine at 60k rows, fatal at
  * 100 TB. The scale-safe equivalent implemented here:
  *
  *  1. `orderBy(sortCols)` — a range-partitioned exchange + local sort
  *     (Spark samples range bounds; every partition sorts in parallel);
  *  2. `RDD.zipWithIndex` — computes per-partition element counts in
  *     one extra lightweight job, then assigns each row its partition's
  *     cumulative offset + local index. No partition ever holds more
  *     than its range share.
  *
  * The result is identical to the global window (the sort order must be
  * total — pass a tie-break column), but the plan scales linearly with
  * partition count.
  */
object Rank {

  /** Append a 1-based global `row_number` over the total order given by
    * `sortCols`. `sortCols` must define a total order (include a unique
    * tie-break column) or ranks across equal rows are partition-order
    * dependent. Ranks are Int to mirror `row_number()`'s type — like
    * the built-in, this caps at 2^31−1 rows (emit the Long zip index
    * directly if a table ever exceeds that). */
  def globalRowNumber(df: DataFrame, sortCols: Seq[Column],
      rankCol: String = "rn"): DataFrame = {
    val sorted = df.orderBy(sortCols: _*)
    val schema = StructType(
      sorted.schema.fields :+ StructField(rankCol, IntegerType, nullable = false))
    val withRank = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1).toInt)
    }
    df.sparkSession.createDataFrame(withRank, schema)
  }
}
