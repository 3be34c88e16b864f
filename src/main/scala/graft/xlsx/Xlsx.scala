package graft.xlsx

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, StringReader}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Minimal OOXML (.xlsx) reader/writer — no external library, just
  * java.util.zip + StAX (SURVEY §2.1 S7, §2.2 K5; reference
  * components/FileUploader.tsx:206-335 via the `xlsx` npm package).
  *
  * Scope (bounded to the reference's sheet_to_json/json_to_sheet use):
  * row 1 = header, all values read as strings, missing cells '',
  * sharedStrings + inlineStr + numeric cells on read; writer emits
  * inline strings only. Date cells surface as their raw serial
  * numbers — the reference parity choice: SheetJS `sheet_to_json`
  * defaults to `raw: true`, so the reference app itself sees serials,
  * not formatted dates. XLSX is a workbook-export format — the writer
  * assembles on the driver via toLocalIterator (bounded memory); bulk
  * data paths stay parquet/CSV.
  */
object Xlsx {

  /** K5: sheet-name sanitizer (strip `\/?*:[]`, ≤31 chars, `_N` dedup —
    * reference sanitizeSheetName, FileUploader.tsx:27-39). */
  def sanitizeSheetName(name: String, existing: mutable.Set[String]): String = {
    var s = name.replaceAll("""[\\/?*:\[\]]""", " ").take(31).trim
    if (s.isEmpty) s = "Sheet"
    val base = s
    var i = 1
    while (existing.contains(s)) {
      val suff = s"_$i"; i += 1
      s = (base.take(math.max(0, 31 - suff.length)) + suff).trim
      if (s.isEmpty) s = s"Sheet$i"
    }
    existing.add(s)
    s
  }

  // -------------------------------------------------------------------
  // Writer
  // -------------------------------------------------------------------

  private def colRef(c: Int): String = { // 0-based → A, B, ..., AA
    var n = c + 1; val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.result()
  }

  /** Stream one worksheet part row-by-row into `w` — memory stays
    * O(row), never O(sheet), so a sheet bigger than the heap still
    * writes (rows arrive via toLocalIterator, one partition at a
    * time). */
  private def writeSheetXml(w: java.io.Writer, header: Seq[String],
      rows: Iterator[Seq[String]]): Unit = {
    w.write("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
    w.write("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
    def row(r: Int, vs: Seq[String]): Unit = {
      w.write(s"""<row r="$r">""")
      vs.zipWithIndex.foreach { case (v, c) =>
        val t = graft.xml.Xml.esc(Option(v).getOrElse(""))
        w.write(s"""<c r="${colRef(c)}$r" t="inlineStr"><is><t xml:space="preserve">$t</t></is></c>""")
      }
      w.write("</row>")
    }
    row(1, header)
    var r = 2
    rows.foreach { vs => row(r, vs); r += 1 }
    w.write("</sheetData></worksheet>")
  }

  /** Write a multi-sheet workbook. Sheet order preserved; names
    * sanitized + deduped. */
  def writeWorkbook(sheets: Seq[(String, DataFrame)], file: String): Unit = {
    val used = mutable.LinkedHashSet.empty[String]
    val named = sheets.map { case (n, df) => (sanitizeSheetName(n, used), df) }
    val zos = new ZipOutputStream(new java.io.FileOutputStream(file))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8")); zos.closeEntry()
    }
    try {
      val n = named.size
      put("[Content_Types].xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
          """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
          """<Default Extension="xml" ContentType="application/xml"/>""" +
          """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
          (1 to n).map(i =>
            s"""<Override PartName="/xl/worksheets/sheet$i.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""").mkString +
          "</Types>")
      put("_rels/.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
          """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
          "</Relationships>")
      put("xl/workbook.xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>""" +
          named.zipWithIndex.map { case ((name, _), i) =>
            s"""<sheet name="${graft.xml.Xml.esc(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
          }.mkString + "</sheets></workbook>")
      put("xl/_rels/workbook.xml.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
          named.indices.map(i =>
            s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>""").mkString +
          "</Relationships>")
      named.zipWithIndex.foreach { case ((_, df), i) =>
        val (header, it) = rowStrings(df)
        zos.putNextEntry(new ZipEntry(s"xl/worksheets/sheet${i + 1}.xml"))
        val w = new java.io.BufferedWriter(
          new java.io.OutputStreamWriter(zos, "UTF-8"), 1 << 16)
        writeSheetXml(w, header, it)
        w.flush() // flush through to the zip stream, but do NOT close it
        zos.closeEntry()
      }
    } finally zos.close()
  }

  // -------------------------------------------------------------------
  // Reader
  // -------------------------------------------------------------------

  /** P4 dispatch for the Compare accept-list, which admits `.xlsx`,
    * `.xls` AND `.xlsb` (reference compare/page.tsx:638,674): OOXML,
    * BIFF8, and BIFF12 all read natively — every extension passing the
    * filter yields data. */
  def readAnyWorkbook(spark: SparkSession, file: String): Seq[(String, DataFrame)] = {
    val lower = file.toLowerCase
    if (lower.endsWith(".xlsx")) readWorkbook(spark, file)
    else if (lower.endsWith(".xls")) Biff.readWorkbook(spark, file)
    else if (lower.endsWith(".xlsb")) Xlsb.readWorkbook(spark, file)
    else throw new IllegalArgumentException(s"not a workbook extension: $file")
  }

  /** Read every sheet of a workbook: sheetName → all-string DataFrame
    * with row 1 as header, missing cells '' (sheet_to_json with
    * defval:'' — reference FileUploader.tsx:206-225). The zip central
    * directory is parsed on the driver (workbook-sized input by
    * definition); per-sheet row materialization is deferred to Spark. */
  def readWorkbook(spark: SparkSession, file: String): Seq[(String, DataFrame)] = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(file))
    val entries = readZip(bytes)
    val shared = entries.get("xl/sharedStrings.xml").map(parseSharedStrings).getOrElse(Vector.empty)
    val sheetNames = entries.get("xl/workbook.xml").map(parseSheetNames).getOrElse(Nil)
    val rels = entries.get("xl/_rels/workbook.xml.rels").map(parseRels).getOrElse(Map.empty)
    sheetNames.zipWithIndex.map { case ((name, rid), i) =>
      val target = rels.getOrElse(rid, s"worksheets/sheet${i + 1}.xml")
      val path = if (target.startsWith("/")) target.drop(1) else s"xl/$target"
      val cells = entries.get(path).map(parseSheetCells(_, shared)).getOrElse(Nil)
      name -> cellsToDf(spark, cells)
    }
  }

  /** All zip entries as raw bytes — the one entry walker shared by the
    * OOXML (.xlsx) and BIFF12 (.xlsb) containers. */
  private[xlsx] def readZipBytes(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val zis = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = mutable.LinkedHashMap.empty[String, Array[Byte]]
    try {
      var e = zis.getNextEntry
      while (e != null) {
        if (!e.isDirectory) {
          val bos = new ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          var n = zis.read(buf)
          while (n > 0) { bos.write(buf, 0, n); n = zis.read(buf) }
          out(e.getName) = bos.toByteArray
        }
        e = zis.getNextEntry
      }
    } finally zis.close()
    out.toMap
  }

  private[xlsx] def readZip(bytes: Array[Byte]): Map[String, String] =
    readZipBytes(bytes).view.mapValues(new String(_, "UTF-8")).toMap

  /** (header, rows-as-strings via toLocalIterator) — the one
    * Row-stringify adapter shared by the three workbook writers, so
    * their null/toString semantics stay provably identical. */
  private[xlsx] def rowStrings(df: DataFrame): (Seq[String], Iterator[Seq[String]]) = {
    val header = df.columns.toSeq
    val it = new Iterator[Seq[String]] {
      private val rows = df.toLocalIterator()
      def hasNext: Boolean = rows.hasNext
      def next(): Seq[String] = {
        val r = rows.next()
        header.indices.map(j => Option(r.get(j)).map(_.toString).getOrElse(""))
      }
    }
    (header, it)
  }

  private def stax(xml: String) = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.createXMLStreamReader(new StringReader(xml))
  }

  private[xlsx] def parseSharedStrings(xml: String): Vector[String] = {
    val r = stax(xml)
    val out = Vector.newBuilder[String]
    var cur: StringBuilder = null
    try while (r.hasNext) r.next() match {
      case XMLStreamConstants.START_ELEMENT if r.getLocalName == "si" => cur = new StringBuilder
      case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA if cur != null => cur.append(r.getText)
      case XMLStreamConstants.END_ELEMENT if r.getLocalName == "si" => out += cur.result(); cur = null
      case _ =>
    } finally r.close()
    out.result()
  }

  private[xlsx] def parseSheetNames(xml: String): Seq[(String, String)] = {
    val r = stax(xml)
    val out = Seq.newBuilder[(String, String)]
    try while (r.hasNext) r.next() match {
      case XMLStreamConstants.START_ELEMENT if r.getLocalName == "sheet" =>
        val attrs = (0 until r.getAttributeCount)
          .map(i => (r.getAttributeLocalName(i), r.getAttributeValue(i))).toMap
        out += ((attrs.getOrElse("name", "Sheet"), attrs.getOrElse("id", "")))
      case _ =>
    } finally r.close()
    out.result()
  }

  private[xlsx] def parseRels(xml: String): Map[String, String] = {
    val r = stax(xml)
    val out = mutable.Map.empty[String, String]
    try while (r.hasNext) r.next() match {
      case XMLStreamConstants.START_ELEMENT if r.getLocalName == "Relationship" =>
        val attrs = (0 until r.getAttributeCount)
          .map(i => (r.getAttributeLocalName(i), r.getAttributeValue(i))).toMap
        out(attrs.getOrElse("Id", "")) = attrs.getOrElse("Target", "")
      case _ =>
    } finally r.close()
    out.toMap
  }

  /** (rowIndex, colIndex, value) triples of one worksheet. */
  private[xlsx] def parseSheetCells(xml: String, shared: Vector[String]): Seq[(Int, Int, String)] = {
    val r = stax(xml)
    val out = Seq.newBuilder[(Int, Int, String)]
    var row = 0; var colInRow = 0
    var cellRef: Option[(Int, Int)] = None
    var cellType = ""
    var inV = false; var inIsT = false
    val text = new StringBuilder
    def cellPos: (Int, Int) = cellRef.getOrElse((row, colInRow))
    try while (r.hasNext) r.next() match {
      case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
        case "row" =>
          row = (0 until r.getAttributeCount).find(i => r.getAttributeLocalName(i) == "r")
            .map(i => r.getAttributeValue(i).toInt).getOrElse(row + 1)
          colInRow = 0
        case "c" =>
          cellType = (0 until r.getAttributeCount).find(i => r.getAttributeLocalName(i) == "t")
            .map(r.getAttributeValue).getOrElse("")
          cellRef = (0 until r.getAttributeCount).find(i => r.getAttributeLocalName(i) == "r")
            .map(i => parseRef(r.getAttributeValue(i)))
          text.clear()
        case "v" => inV = true
        case "t" => inIsT = true
        case _ =>
      }
      case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
        if (inV || inIsT) text.append(r.getText)
      case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
        case "v" => inV = false
        case "t" => inIsT = false
        case "c" =>
          val (rr, cc) = cellPos
          val v = cellType match {
            case "s" => shared.lift(text.result().trim.toInt).getOrElse("")
            case _ => text.result()
          }
          out += ((rr, cc, v))
          colInRow += 1
          cellRef = None
        case _ =>
      }
      case _ =>
    } finally r.close()
    out.result()
  }

  /** "B3" → (3, 1). */
  private def parseRef(ref: String): (Int, Int) = {
    val letters = ref.takeWhile(_.isLetter)
    val digits = ref.drop(letters.length)
    val c = letters.foldLeft(0)((acc, ch) => acc * 26 + (ch - 'A' + 1)) - 1
    (digits.toInt, c)
  }

  /** (header, data rows) from 1-based-row cell triples: row 1 = header
    * (empty header cell c → `col{c+1}`), rows padded to grid width
    * with ''. */
  private[xlsx] def cellGrid(cells: Seq[(Int, Int, String)]): (Seq[String], Seq[Seq[String]]) = {
    val byRow = cells.groupBy(_._1)
    val headerCells = byRow.getOrElse(1, Nil).sortBy(_._2)
    val width = (cells.map(_._2).maxOption.getOrElse(-1)) + 1
    val header = (0 until width).map { c =>
      headerCells.find(_._2 == c).map(_._3).filter(_.nonEmpty).getOrElse(s"col${c + 1}")
    }
    val dataRows = byRow.view.filterKeys(_ > 1).toSeq.sortBy(_._1).map { case (_, cs) =>
      val m = cs.map(t => t._2 -> t._3).toMap
      (0 until width).map(c => m.getOrElse(c, ""))
    }
    (header, dataRows)
  }

  private[xlsx] def cellsToDf(spark: SparkSession, cells: Seq[(Int, Int, String)]): DataFrame = {
    val (header, dataRows) = cellGrid(cells)
    val schema = StructType(header.map(h => StructField(h, StringType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(dataRows.map(Row.fromSeq(_))), schema)
  }

  /** One sheet of a workbook byte image as (header, data rows) —
    * shared by the driver reader and the DSv2 executor-side reader.
    * `sheet` = None → first sheet. */
  private[xlsx] def parseSheetGrid(bytes: Array[Byte],
      sheet: Option[String]): (Seq[String], Seq[Seq[String]]) = {
    val entries = readZip(bytes)
    val shared = entries.get("xl/sharedStrings.xml").map(parseSharedStrings).getOrElse(Vector.empty)
    val sheetNames = entries.get("xl/workbook.xml").map(parseSheetNames).getOrElse(Nil)
    val rels = entries.get("xl/_rels/workbook.xml.rels").map(parseRels).getOrElse(Map.empty)
    val idx = sheet.fold(0) { s =>
      val i = sheetNames.indexWhere(_._1 == s)
      require(i >= 0, s"no sheet '$s' (sheets: ${sheetNames.map(_._1).mkString(", ")})")
      i
    }
    val (_, rid) = sheetNames.lift(idx).getOrElse(("", ""))
    val target = rels.getOrElse(rid, s"worksheets/sheet${idx + 1}.xml")
    val path = if (target.startsWith("/")) target.drop(1) else s"xl/$target"
    cellGrid(entries.get(path).map(parseSheetCells(_, shared)).getOrElse(Nil))
  }
}
