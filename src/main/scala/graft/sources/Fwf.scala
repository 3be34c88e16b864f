package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixed-width text interchange (the mainframe/legacy-feed sibling of
  * the CSV sinks — SURVEY §2.1/§2.2 format-surface completion). Every
  * column occupies a declared byte width, left-aligned space-padded;
  * no delimiter, no quoting, so the layout IS the schema.
  *
  * Both directions are fully distributed and splittable:
  *  - write: one `rpad`-concat projection per row through Spark's
  *    text sink — executors emit lines, the driver never assembles a
  *    file. Overflow fails LOUD (a silently truncated field shifts
  *    every later column of that row — classic fixed-width data
  *    corruption — so the write refuses instead).
  *  - read: `spark.read.text` + one `substring`/`trim` projection per
  *    declared column — a narrow, codegen'd scan; column pruning
  *    drops unused substrings at the optimizer level.
  *
  * Contract notes: widths are CHARACTER widths (the layout is only
  * byte-stable for single-byte charsets — the classic FWF caveat,
  * documented not hidden); values are trimmed on read, so trailing
  * spaces in data are not representable (inherent to the format).
  * Null and empty string both round-trip to the empty string. */
object Fwf {

  /** Lines DataFrame (single `value` column) of `df` in fixed-width
    * layout. Values longer than their declared width abort the job. */
  def toLines(df: DataFrame, widths: Seq[Int]): DataFrame = {
    require(widths.length == df.columns.length,
      s"fwf: ${widths.length} widths for ${df.columns.length} columns")
    widths.foreach(w => require(w >= 1, s"fwf: width $w must be >= 1"))
    val cells = df.columns.zip(widths).map { case (c, w) =>
      val s = coalesce(col(s"`$c`").cast("string"), lit(""))
      // raise_error on overflow: a truncated field would silently
      // shift every later column of the row
      when(length(s) > w, raise_error(concat(
          lit(s"fwf: value exceeds width $w in column '$c': "), s)))
        .otherwise(rpad(s, w, " "))
    }
    df.select(concat(cells: _*).as("value"))
  }

  /** Distributed fixed-width write via the text sink. */
  def write(df: DataFrame, path: String, widths: Seq[Int]): Unit =
    toLines(df, widths).write.mode("overwrite").text(path)

  /** Read a fixed-width layout back as all-string columns. */
  def read(spark: SparkSession, path: String, cols: Seq[(String, Int)]): DataFrame = {
    require(cols.nonEmpty, "fwf: empty column spec")
    val raw = spark.read.text(path)
    val starts = cols.scanLeft(1) { case (off, (_, w)) => off + w }
    raw.select(cols.zip(starts).map { case ((name, w), start) =>
      trim(substring(col("value"), start, w)).as(name)
    }: _*)
  }
}
