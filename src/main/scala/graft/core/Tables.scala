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

  /** Lazy scan of one table under an sf dir. The `events` table in the
    * driver's testdata carries TIMESTAMP(NANOS) which Spark 4 refuses by
    * default — read it as long nanos and truncate to microsecond
    * TimestampType (`x DIV 1000` stays in integer math; a double division
    * would lose precision above 2^53 ns). DuckDB's `CAST(ts AS TIMESTAMP)`
    * truncates identically. The conversion is type-gated: parquet written
    * with standard µs timestamps (any real deployment, regenerated scale
    * data) already loads as a timestamp column and passes through, so the
    * same code serves both layouts. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts DIV 1000")))
        case _ => df // already a timestamp type (µs/ms parquet)
      }
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view so `spark.sql` pipelines work. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
