package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-file compaction — lake maintenance the reference never needs
  * (one browser, one file — reference: components/FileUploader.tsx
  * uploads are single objects) but a 100 TB table cannot live without:
  * streaming sinks, per-trigger micro-batches, and over-parallel
  * writes leave directories with thousands of KB-sized parquet files,
  * and every downstream scan then pays one task + one footer read +
  * one open per file. Compaction bin-packs the data back to
  * ~`targetBytes` outputs in one distributed pass.
  *
  * The rewrite lands in a NEW directory: swapping it over the source
  * is the caller's transactional boundary (at scale that swap is a
  * metastore/table-format pointer flip, not a filesystem rename).
  */
object Compact {

  /** Parquet file count + total bytes under `dir` (recursive, data
    * files only — `_SUCCESS`/metadata excluded). */
  def layout(spark: SparkSession, dir: String): (Int, Long) = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(path, true)
    var n = 0; var bytes = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) { n += 1; bytes += f.getLen }
    }
    (n, bytes)
  }

  /** Rewrite the parquet table at `srcDir` into `dstDir` with
    * ~`targetBytes` per output file. Returns the output file count.
    *
    * Sizing uses the SOURCE's on-disk bytes as the estimator for the
    * rewrite (same data, same codec ⇒ same ballpark), so the plan is
    * one repartition — a single round-robin shuffle, no sampling job.
    * `repartition(n)` (not `coalesce`) on purpose: coalesce would
    * chain whole source files onto few tasks and skew them; round-
    * robin rebalances rows evenly, which is what makes every output
    * file land near the target. */
  def compact(spark: SparkSession, srcDir: String, dstDir: String,
      targetBytes: Long = 128L << 20): Int = {
    require(targetBytes > 0, s"compact: targetBytes=$targetBytes must be positive")
    val (_, totalBytes) = layout(spark, srcDir)
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    spark.read.parquet(srcDir)
      .repartition(nOut)
      .write.mode("overwrite").parquet(dstDir)
    nOut
  }

  /** Compact and hand back the rewritten table. */
  def compacted(spark: SparkSession, srcDir: String, dstDir: String,
      targetBytes: Long = 128L << 20): DataFrame = {
    compact(spark, srcDir, dstDir, targetBytes)
    spark.read.parquet(dstDir)
  }
}
