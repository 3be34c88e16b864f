package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class PdfSpec extends AnyFunSuite {

  test("parsePages: ranges, swaps, junk, prefix parseInt (J6/R2 reference parity)") {
    assert(Pdf.parsePages("1,3,5-7") == Seq(Seq(1), Seq(3), Seq(5, 6, 7)))
    assert(Pdf.parsePages("7-5") == Seq(Seq(5, 6, 7)))      // swapped bounds normalize
    assert(Pdf.parsePages("2,x,4") == Seq(Seq(2), Seq(4)))  // junk skipped
    assert(Pdf.parsePages("3abc") == Seq(Seq(3)))           // parseInt prefix
    assert(Pdf.parsePages("-3") == Nil)                     // '-' split yields empty lhs
    assert(Pdf.parsePages("5-") == Nil)
    assert(Pdf.parsePages(" 1 , 2 ") == Seq(Seq(1), Seq(2)))
    assert(Pdf.parsePages("") == Nil && Pdf.parsePages(null) == Nil)
  }

  test("splitJobs clamps and drops empty groups with stable ordinals") {
    assert(Pdf.splitJobs("all", "", 3) == Seq((1, Seq(1)), (2, Seq(2)), (3, Seq(3))))
    assert(Pdf.splitJobs("custom", "0,2-4,99", 3) == Seq((2, Seq(2, 3))))
  }

  test("header validation (S11)") {
    assert(Pdf.hasPdfHeader(Pdf.makePdf(1)))
    assert(!Pdf.hasPdfHeader("plain text".getBytes))
    assert(!Pdf.hasPdfHeader(Array.emptyByteArray))
  }

  test("merge concatenates pages in caller order; split extracts (J5/J6)") {
    val a = Pdf.makePdf(3)
    val b = Pdf.makePdf(2)
    val m = Pdf.merge(Seq(a, b))
    assert(Pdf.pageCount(m) == 5)
    val part = Pdf.extractPages(m, Seq(2, 4))
    assert(Pdf.pageCount(part) == 2)
    assert(Pdf.pageCount(Pdf.merge(Seq(m, part))) == 7)
    assert(Pdf.hasPdfHeader(m) && Pdf.hasPdfHeader(part))
  }

  test("part naming (K9)") {
    assert(Pdf.partName("doc", 1) == "doc_part001.pdf")
    assert(Pdf.partName("doc", 12) == "doc_part012.pdf")
  }

  test("non-PDF input fails fast") {
    intercept[IllegalArgumentException](Pdf.pageCount("nope".getBytes))
  }
}
