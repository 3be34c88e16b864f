package graft.xlsx

import scala.collection.mutable
import graft.SparkSpec

class XlsxSpec extends SparkSpec {
  import spark.implicits._

  test("workbook write → read round-trips multiple sheets (S7/K5)") {
    val s1 = Seq(("1", "a&<b>", ""), ("2", "plain", "x")).toDF("id", "v", "w")
    val s2 = Seq(("only", "row")).toDF("p", "q")
    val f = java.nio.file.Files.createTempDirectory("xlsxspec").resolve("wb.xlsx").toString
    Xlsx.writeWorkbook(Seq("first" -> s1, "second" -> s2), f)
    val back = Xlsx.readWorkbook(spark, f)
    assert(back.map(_._1) == Seq("first", "second"))
    val r1 = back.head._2.orderBy("id").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(r1.toSeq == Seq(("1", "a&<b>", ""), ("2", "plain", "x")))
    val r2 = back(1)._2.collect().map(r => (r.getString(0), r.getString(1)))
    assert(r2.toSeq == Seq(("only", "row")))
  }

  test("writer streams large sheets row-by-row (O(row) memory, K5)") {
    // 200k rows would OOM a whole-sheet StringBuilder long before the
    // heap if the writer materialized the part; streaming writes it in
    // constant memory. Verified by writing, then counting rows with a
    // streaming scan of the zip entry (never loading it whole).
    val n = 200000
    val big = spark.range(1, n + 1L)
      .selectExpr("CAST(id AS STRING) AS id", "concat('v&', id) AS v", "repeat('x', 20) AS pad")
    val f = java.nio.file.Files.createTempDirectory("xlsxbig").resolve("big.xlsx").toString
    Xlsx.writeWorkbook(Seq("big" -> big), f)
    val zis = new java.util.zip.ZipInputStream(new java.io.FileInputStream(f))
    var rows = -1L
    try {
      var e = zis.getNextEntry
      while (e != null && rows < 0) {
        if (e.getName == "xl/worksheets/sheet1.xml") {
          val buf = new Array[Byte](1 << 16)
          var carry = ""
          var count = 0L
          var read = zis.read(buf)
          while (read > 0) {
            val chunk = carry + new String(buf, 0, read, "UTF-8")
            count += "<row ".r.findAllMatchIn(chunk).size
            carry = chunk.takeRight(4) // longest proper prefix of "<row " that can straddle
            read = zis.read(buf)
          }
          rows = count
        }
        e = zis.getNextEntry
      }
    } finally zis.close()
    assert(rows == n + 1L) // header + n data rows
  }

  test("DSv2 table read: directory of workbooks, executor parse, pruning (SURVEY §4)") {
    val d = java.nio.file.Files.createTempDirectory("xlsxdsv2")
    (1 to 3).foreach { i =>
      val df = Seq((s"$i-1", s"v$i", "x"), (s"$i-2", s"w$i", "y")).toDF("id", "v", "extra")
      Xlsx.writeWorkbook(Seq("data" -> df), d.resolve(s"f$i.xlsx").toString)
    }
    val t = XlsxDataSource.readTable(spark, d.toString)
    assert(t.columns.toSeq == Seq("id", "v", "extra"))
    assert(t.count() == 6)
    assert(t.rdd.getNumPartitions == 3) // one partition per workbook
    val narrow = t.select("v")
    val scanLine = narrow.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("BatchScan")).getOrElse("")
    assert(scanLine.contains("[v#") && !scanLine.matches(".*\\[(id|extra)#.*"), scanLine)
    assert(narrow.orderBy("v").collect().map(_.getString(0)).toSeq ==
      Seq("v1", "v2", "v3", "w1", "w2", "w3"))
    // named-sheet option routes to the right sheet
    val named = XlsxDataSource.readTable(spark, d.resolve("f1.xlsx").toString, Some("data"))
    assert(named.count() == 2)
  }

  test("sheet-name sanitizer: strip, 31-char cap, _N dedup (K5)") {
    val used = mutable.Set.empty[String]
    assert(Xlsx.sanitizeSheetName("a/b:c*?[x]", used) == "a b c   x")
    assert(Xlsx.sanitizeSheetName("", used) == "Sheet")
    assert(Xlsx.sanitizeSheetName("Sheet", used) == "Sheet_1")
    val long = "y" * 40
    assert(Xlsx.sanitizeSheetName(long, used).length == 31)
    assert(Xlsx.sanitizeSheetName(long, used) == "y" * 29 + "_1")
  }
}
