package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch incremental-ingest ledger — the "process only files that are
  * new since the last run" pattern every scheduled pipeline needs
  * (the batch twin of a file-source stream's checkpoint log).
  *
  * The ledger is itself a parquet table of processed file paths, so
  * it versions, audits and joins like any other table. The discovery
  * step is a driver-side directory listing minus the ledger — a
  * METADATA operation whose cost scales with file count, never data
  * volume (the same listing a streaming file source performs per
  * micro-batch). Delivery contract is at-least-once: a crash between
  * processing and [[commit]] re-surfaces the same files on the next
  * run, so downstream writes should be idempotent (keyed overwrite or
  * dedup) — the identical contract Spark's own file stream gives
  * foreachBatch.
  */
object Ledger {

  /** Absolute paths of data files under `inputDir` not yet committed
    * to the ledger, plus a DataFrame over exactly those files (empty
    * schema-stable frame when nothing is new). */
  def newBatch(spark: SparkSession, inputDir: String,
      ledgerDir: String): (Seq[String], Option[DataFrame]) = {
    val in = new org.apache.hadoop.fs.Path(inputDir)
    val fs = in.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val listed =
      if (!fs.exists(in)) Seq.empty[String]
      else fs.listStatus(in).toSeq
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .map(_.getPath.toString)
    val done = processedFiles(spark, ledgerDir)
    val fresh = listed.filterNot(done.contains).sorted
    val df = if (fresh.isEmpty) None else Some(spark.read.parquet(fresh: _*))
    (fresh, df)
  }

  /** The committed file set (empty on first run). */
  def processedFiles(spark: SparkSession, ledgerDir: String): Set[String] = {
    val p = new org.apache.hadoop.fs.Path(ledgerDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Set.empty
    else spark.read.parquet(ledgerDir).select("path")
      .collect().map(_.getString(0)).toSet
  }

  /** Record `files` as processed. Append-only: each run adds its own
    * rows, so the ledger doubles as an ingest audit trail (what was
    * picked up, by which run). */
  def commit(spark: SparkSession, ledgerDir: String, files: Seq[String],
      runId: Long): Unit = {
    if (files.nonEmpty) {
      import spark.implicits._
      files.map(f => (f, runId)).toDF("path", "run_id")
        .coalesce(1).write.mode("append").parquet(ledgerDir)
    }
  }
}
