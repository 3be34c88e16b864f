package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog helpers over the driver-generated parquet tables (TESTDATA.md).
  *
  * Mirrors the reference's "workbook = ordered map of sheet-name → rows"
  * abstraction (reference: components/FileUploader.tsx:206-225) at catalog
  * level: each parquet table is a named DataFrame. All reads are lazy scans;
  * Catalyst pushes filters/column pruning into the parquet reader, which is
  * what makes the same code viable at 100 TB (scan only the columns/row
  * groups a query touches).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Lazy scan of one table under an sf dir. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view so `spark.sql` pipelines work. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
