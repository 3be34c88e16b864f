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
