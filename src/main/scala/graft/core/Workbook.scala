package graft.core

import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The workbook abstraction: an ordered map of sheet-name → DataFrame
  * (reference: `Record<string, any[]>`, FileUploader.tsx:206-225) plus
  * the Convert-tool plumbing around it (SURVEY §2.2 K5/K6/K9, §2.3
  * P3-P6).
  */
class Workbook private (val sheets: mutable.LinkedHashMap[String, DataFrame]) {

  def names: Seq[String] = sheets.keys.toSeq
  def apply(name: String): DataFrame = sheets(name)

  /** P6: drop empty sheets (reference skips them on export,
    * FileUploader.tsx:270,293). */
  def nonEmpty: Workbook =
    new Workbook(sheets.filter { case (_, df) => !df.isEmpty })

  /** Add a sheet with name sanitization + `_N` dedup (K5 semantics). */
  def add(name: String, df: DataFrame): Workbook = {
    val used = mutable.Set(sheets.keys.toSeq: _*)
    sheets(graft.xlsx.Xlsx.sanitizeSheetName(name, used)) = df
    this
  }

  /** P3: preview projection — first `maxCols` columns, `maxRows` rows
    * (reference FileUploader.tsx:520,536). */
  def preview(name: String, maxRows: Int = 30, maxCols: Int = 20): DataFrame = {
    val df = sheets(name)
    df.select(df.columns.take(maxCols).map(c => col(s"`$c`")).toSeq: _*).limit(maxRows)
  }

  /** K5: export all sheets as one workbook file. */
  def writeXlsx(file: String): Unit =
    graft.xlsx.Xlsx.writeWorkbook(sheets.toSeq, file)

  /** K6 + K9: export each sheet as `{base}_{sheet}.{ext}` inside one
    * zip container (reference saveAsZip, FileUploader.tsx:189-203,
    * naming :287,296-301). `render` turns one sheet into file bytes. */
  def writeZip(file: String, base: String, ext: String)
      (render: DataFrame => Array[Byte]): Unit =
    writeZipStreamed(file, base, ext)((df, os) => os.write(render(df)))

  /** Streaming variant of [[writeZip]]: each sheet renders directly
    * into the open zip entry (the renderer typically walks
    * toLocalIterator — see Csv.writeTo), so container exports stay
    * O(row) in driver memory no matter the sheet size. */
  def writeZipStreamed(file: String, base: String, ext: String)
      (render: (DataFrame, java.io.OutputStream) => Unit): Unit = {
    val zos = new ZipOutputStream(Files.newOutputStream(Paths.get(file)))
    try sheets.foreach { case (name, df) =>
      zos.putNextEntry(new ZipEntry(s"$base/${Workbook.outputName(base, name, ext)}"))
      render(df, zos)
      zos.closeEntry()
    } finally zos.close()
  }
}

object Workbook {

  def apply(sheets: (String, DataFrame)*): Workbook = {
    val wb = new Workbook(mutable.LinkedHashMap.empty)
    sheets.foreach { case (n, df) => wb.add(n, df) }
    wb
  }

  /** K9: `{base}_{sheetName}.{ext}` (reference FileUploader.tsx:287). */
  def outputName(base: String, sheet: String, ext: String): String =
    s"${base}_$sheet.$ext"

  /** K9: merged workbook stamp `merged_<timestamp>.xlsx`
    * (FileUploader.tsx:352). Timestamp explicit for determinism. */
  def mergedName(stampMillis: Long): String = {
    val fmt = new java.text.SimpleDateFormat("yyyyMMdd_HHmmss")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    s"merged_${fmt.format(new java.util.Date(stampMillis))}.xlsx"
  }

  /** P4: extension accept-lists per tool mode (reference
    * FileUploader.tsx:24,239-250; compare/page.tsx:638,674). */
  val acceptLists: Map[String, Set[String]] = Map(
    "excel-to-other" -> Set(".xlsx"),
    "other-to-excel" -> Set(".csv", ".txt", ".xml"),
    "compare" -> Set(".csv", ".tsv", ".txt", ".json", ".xlsx", ".xls", ".xlsb"),
    "pdf" -> Set(".pdf"))

  def accepted(mode: String, fileName: String): Boolean = {
    val lower = fileName.toLowerCase
    acceptLists.getOrElse(mode, Set.empty).exists(lower.endsWith)
  }

  /** P4/P5: list input files under a directory with the mode's
    * extension filter and (name, size) dedup (reference
    * FileUploader.tsx:251-253) — over Spark's binaryFile listing, so
    * the listing itself is distributed on object stores. */
  def listInputs(spark: SparkSession, dir: String, mode: String): DataFrame = {
    val exts = acceptLists.getOrElse(mode, Set.empty)
    val glob = exts.map(e => s"*$e").mkString("{", ",", "}")
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .load(dir)
      .select(element_at(split(col("path"), "/"), -1).as("name"), col("length"), col("path"))
      .dropDuplicates("name", "length")
  }
}
