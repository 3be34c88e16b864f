package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class PdfTextSpec extends AnyFunSuite {

  private def onePage(cs: String, flate: Boolean = false): String =
    Pdf.extractText(Pdf.makeTextPdf(Seq(cs), flate)).head._2

  test("makePdf fixture pages extract their own emitted text") {
    assert(Pdf.extractText(Pdf.makePdf(3, withContent = true)) ==
      Seq((1, "Page 1"), (2, "Page 2"), (3, "Page 3")))
  }

  test("pages without /Contents extract as empty") {
    assert(Pdf.extractText(Pdf.makePdf(2)) == Seq((1, ""), (2, "")))
  }

  test("literal-string escapes: named, parens, octal, line continuation") {
    assert(onePage("""BT (a\(b\)c\\d) Tj ET""") == "a(b)c\\d")
    assert(onePage("BT (tab\\there) Tj ET") == "tab\there")
    assert(onePage("BT (caf\\351 \\101\\66) Tj ET") == "café A6") // 3- and 2-digit octal
    assert(onePage("BT (con\\\ntinued) Tj ET") == "continued")    // backslash-EOL
    assert(onePage("BT ((nested) parens) Tj ET") == "(nested) parens")
  }

  test("hex strings decode, odd digit pads with zero") {
    assert(onePage("BT <48656C6C6F> Tj ET") == "Hello")
    assert(onePage("BT <5> Tj ET") == "P") // <5> -> 0x50
  }

  test("TJ arrays: strings concatenate, kern <= -180 is a word gap") {
    assert(onePage("BT [(a)-200(b)] TJ ET") == "a b")
    assert(onePage("BT [(a)-100(b)] TJ ET") == "ab")   // small kern: no gap
    assert(onePage("BT [(a)500(b)] TJ ET") == "ab")    // positive never gaps
    assert(onePage("BT [-300(lead)] TJ ET") == "lead") // leading kern: no blank space
  }

  test("newline semantics: Td/TD/T*/Tm/' break lines only after glyphs") {
    assert(onePage("BT 72 720 Td (one) Tj T* (two) Tj ET") == "one\ntwo")
    assert(onePage("BT 1 0 0 1 72 720 Tm (x) Tj 0 -14 TD (y) Tj ET") == "x\ny")
    assert(onePage("BT (a) Tj (b) ' ET") == "a\nb")
    assert(onePage("BT 72 720 Td 72 700 Td (only) Tj ET") == "only") // no leading blanks
    assert(onePage("BT (p) Tj ET BT (q) Tj ET") == "p\nq")           // new text object
  }

  test("WinAnsi mapping: specials in 0x80-0x9F, undefined slots drop") {
    assert(onePage("BT <93776F7794> Tj ET") == "“wow”") // curly quotes
    assert(onePage("BT <9141> Tj ET") == "‘A")
    assert(onePage("BT <8141> Tj ET") == "A") // 0x81 undefined -> dropped
  }

  test("FlateDecode content streams inflate before lexing") {
    assert(onePage("BT (zipped) Tj ET", flate = true) == "zipped")
  }

  test("graphics operators, names, dicts, comments, inline images are inert") {
    assert(onePage("q 1 0 0 1 0 0 cm /GS1 gs BT (x) Tj ET Q") == "x")
    assert(onePage("/P <</MCID 0>> BDC BT (m) Tj ET EMC") == "m")
    assert(onePage("% comment (not text)\nBT (real) Tj ET") == "real")
    assert(onePage("BI /W 1 /H 1 ID ÿþ EI BT (after) Tj ET") == "after")
  }

  test("stray delimiters never stall the lexer") {
    assert(onePage("} { BT (ok) Tj ET )") == "ok")
  }

  test("malformed numerics drop instead of throwing") {
    assert(onePage("BT 1.2.3 - . +. Td (x) Tj ET") == "x")
  }

  test("lexer is total on random operator soup (never throws, never stalls)") {
    val rnd = new scala.util.Random(42L)
    (1 to 300).foreach { _ =>
      val s = Seq.fill(rnd.nextInt(120))(rnd.nextPrintableChar()).mkString
      Pdf.renderContent(s) // must terminate without throwing
    }
    val structured = "BT [( ( < > ) ] TJ <zz1> Tj % (comment\n(tail"
    Pdf.renderContent(structured)
  }

  test("encrypted documents decrypt then extract (RC4 and AES-128)") {
    val src = Pdf.makePdf(2, withContent = true)
    assert(Pdf.extractText(PdfCrypt.encrypt(src)) == Seq((1, "Page 1"), (2, "Page 2")))
    assert(Pdf.extractText(PdfCrypt.encrypt(src, aes128 = true)) ==
      Seq((1, "Page 1"), (2, "Page 2")))
    assert(Pdf.extractText(
      PdfCrypt.encrypt(src, userPw = "pw"), "pw") == Seq((1, "Page 1"), (2, "Page 2")))
  }

  test("multiple /Contents streams concatenate with a newline") {
    // hand-build a page with an array of two content streams
    val cs1 = "BT (first) Tj ET"; val cs2 = "BT (second) Tj ET"
    val objs = Seq(
      1 -> " << /Type /Catalog /Pages 2 0 R >> ",
      2 -> " << /Type /Pages /Kids [3 0 R] /Count 1 >> ",
      3 -> " << /Type /Page /Parent 2 0 R /Contents [4 0 R 5 0 R] >> ",
      4 -> s" << /Length ${cs1.length} >> stream\n$cs1\nendstream ",
      5 -> s" << /Length ${cs2.length} >> stream\n$cs2\nendstream ")
    // reuse the public fixture path: serialize via merge of a manual doc
    val doc = ("%PDF-1.4\n" + objs.map { case (n, b) => s"$n 0 obj$b endobj\n" }.mkString +
      "trailer\n<< /Size 6 /Root 1 0 R >>\n%%EOF\n").getBytes("ISO-8859-1")
    assert(Pdf.extractText(doc) == Seq((1, "first\nsecond")))
  }

  test("xref-stream (PDF 1.5) fixtures extract too") {
    assert(Pdf.extractText(Pdf.makeTextPdf(Seq("BT (modern) Tj ET"),
      flate = true, xrefStream = true)) == Seq((1, "modern")))
  }

  // ---- composite (Type0/CID + /ToUnicode) fonts ----------------------

  test("Type0/Identity-H show strings decode through the ToUnicode CMap") {
    // the fixture's CID assignment is non-Unicode for non-lowercase
    // chars, so only the CMap path can produce this text
    assert(Pdf.extractTextPages(Pdf.makeCidPdf(Seq("Hello CID world!"))) ==
      Seq((1, "Hello CID world!", "")))
  }

  test("bfrange spans cover lowercase; bfchar covers the rest; flate composes") {
    assert(Pdf.extractTextPages(
      Pdf.makeCidPdf(Seq("abc xyz", "Mixed Case 42"), flate = true)) ==
      Seq((1, "abc xyz", ""), (2, "Mixed Case 42", "")))
  }

  test("supplementary code points round-trip via surrogate-pair dst entries") {
    val s = "clef 𝄞 and 😀 ok"
    assert(Pdf.extractTextPages(Pdf.makeCidPdf(Seq(s))) == Seq((1, s, "")))
  }

  test("Type0 without ToUnicode flags unmapped instead of WinAnsi garbage") {
    assert(Pdf.extractTextPages(
      Pdf.makeCidPdf(Seq("secret"), withToUnicode = false)) ==
      Seq((1, "", "unmapped glyphs")))
  }

  test("predefined UniKS-UCS2-H encoding extracts Korean without any ToUnicode") {
    // the UCS2 CMaps' code space IS UTF-16BE — bytes are the text
    val ko = "안녕하세요 세계 Korean 문서"
    assert(Pdf.extractTextPages(Pdf.makeCidPdf(Seq(ko),
      withToUnicode = false, encoding = "UniKS-UCS2-H")) == Seq((1, ko, "")))
  }

  test("predefined UniJIS-UTF16-H carries surrogate pairs; vertical -V variant reads identically") {
    val ja = "日本語 𝄞 テスト"
    assert(Pdf.extractTextPages(Pdf.makeCidPdf(Seq(ja), withToUnicode = false,
      flate = true, encoding = "UniJIS-UTF16-H")) == Seq((1, ja, "")))
    // -V is a layout difference only: logical order extraction is equal
    assert(Pdf.extractTextPages(Pdf.makeCidPdf(Seq(ja), withToUnicode = false,
      encoding = "UniKS-UCS2-V")) == Seq((1, ja, "")))
  }

  test("Identity-V with a ToUnicode CMap decodes; without one it still flags") {
    val s = "vertical text"
    assert(Pdf.extractTextPages(Pdf.makeCidPdf(Seq(s),
      encoding = "Identity-V")) == Seq((1, s, "")))
    assert(Pdf.extractTextPages(Pdf.makeCidPdf(Seq(s),
      withToUnicode = false, encoding = "Identity-V")) ==
      Seq((1, "", "unmapped glyphs")))
  }

  test("Type3 fonts decode through Differences glyph names; unlisted codes flag, never WinAnsi") {
    // A(65)->e-acute, B(66)->bullet, space named explicitly
    val t3 = Pdf.makeType3Pdf(Seq("BT /F1 12 Tf 72 720 Td (AB A) Tj ET"),
      "32 /space 65 /eacute 66 /bullet")
    assert(Pdf.extractTextPages(t3) == Seq((1, "é• é", "")))
    // a code the Differences table does not name must FLAG — Type3
    // has no base encoding, so a WinAnsi guess would be silent garbage
    val unlisted = Pdf.makeType3Pdf(Seq("BT /F1 12 Tf (Ax) Tj ET"),
      "65 /eacute")
    assert(Pdf.extractTextPages(unlisted) == Seq((1, "é", "unmapped glyphs")))
    // an unknown glyph NAME flags too (the Differences contract)
    val unknown = Pdf.makeType3Pdf(Seq("BT /F1 12 Tf (A) Tj ET"),
      "65 /glyph999")
    assert(Pdf.extractTextPages(unknown) == Seq((1, "", "unmapped glyphs")))
    // /ToUnicode wins over the Differences names when present
    val tou = Pdf.makeType3Pdf(Seq("BT /F1 12 Tf (A) Tj ET"),
      "65 /eacute", withToUnicode = true)
    assert(Pdf.extractTextPages(tou) == Seq((1, "Z", "")))
  }

  test("parseCidCMap: codespace ranges, cidrange, cidchar, usecmap base") {
    val cm = Pdf.parseCidCMap(
      """/UniKS-UCS2-H usecmap
        |2 begincodespacerange <00> <7F> <8140> <FEFE> endcodespacerange
        |1 begincidrange <8140> <8150> 500 endcidrange
        |2 begincidchar <41> 9 <8200> 700 endcidchar""".stripMargin)
    assert(cm.base.contains("UniKS-UCS2-H"))
    assert(cm.ranges == Seq((1, 0x00L, 0x7FL), (2, 0x8140L, 0xFEFEL)))
    assert(cm.cids == Seq((2, 0x8140L, 0x8150L, 500L),
      (1, 0x41L, 0x41L, 9L), (2, 0x8200L, 0x8200L, 700L)))
    assert(cm.covers(2, 0x8145L) && cm.covers(1, 0x41L) && !cm.covers(1, 0x42L))
    // mixed-length framing: 1-byte codes in <00>-<7F>, 2-byte above —
    // the shortest-match prefix rule
    assert(cm.tokenize(Array[Byte](0x41, 0x81.toByte, 0x42, 0x42)) ==
      Seq((1, 0x41L), (2, 0x8142L), (1, 0x42L)))
  }

  test("embedded CID CMap: UCS2-base fall-through decodes, cid overrides flag, Identity base flags all") {
    def cmap(base: String, cidSections: String) =
      s"/$base usecmap\n" +
        "1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n" + cidSections
    // fall-through only: overrides touch nothing the text uses
    val ko = "안녕 세계"
    val clean = Pdf.makeCidPdf(Seq(ko), withToUnicode = false,
      embeddedCmap = Some(cmap("UniKS-UCS2-H",
        "1 begincidrange\n<E000> <E0FF> 1000\nendcidrange\n")))
    assert(Pdf.extractTextPages(clean) == Seq((1, ko, "")))
    // a cidchar override drops the char and flags; neighbors survive,
    // including a surrogate pair SPLIT across the override (the
    // fall-through runs on both sides decode independently)
    val ovr = Pdf.makeCidPdf(Seq("안녕하세요"), withToUnicode = false,
      flate = true,
      embeddedCmap = Some(cmap("UniKS-UCS2-H",
        "1 begincidchar\n<D558> 777\nendcidchar\n")))
    assert(Pdf.extractTextPages(ovr) == Seq((1, "안녕세요", "unmapped glyphs")))
    // a cidrange override drops the covered block
    val rng = Pdf.makeCidPdf(Seq("가나다라마"), withToUnicode = false,
      embeddedCmap = Some(cmap("UniKS-UCS2-H",
        "1 begincidrange\n<B098> <B2E4> 100\nendcidrange\n")))
    assert(Pdf.extractTextPages(rng) == Seq((1, "가라마", "unmapped glyphs")))
    // surrogate pairs in the fall-through run still pair (two 2-byte
    // codes, one byte run into decodeUtf16be)
    val sp = "clef 𝄞 ok"
    val spDoc = Pdf.makeCidPdf(Seq(sp), withToUnicode = false,
      embeddedCmap = Some(cmap("UniKS-UCS2-H", "")))
    assert(Pdf.extractTextPages(spDoc) == Seq((1, sp, "")))
    // non-UCS2 usecmap base: fall-through codes are glyph indices
    val id = Pdf.makeCidPdf(Seq("hidden"), withToUnicode = false,
      embeddedCmap = Some(cmap("Identity-H", "")))
    assert(Pdf.extractTextPages(id) == Seq((1, "", "unmapped glyphs")))
    // no usecmap at all: same flag-everything contract
    val none = Pdf.makeCidPdf(Seq("quiet"), withToUnicode = false,
      embeddedCmap = Some(
        "1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"))
    assert(Pdf.extractTextPages(none) == Seq((1, "", "unmapped glyphs")))
  }

  test("decodeUtf16be: lone surrogate and odd tail flag instead of emitting U+FFFD") {
    assert(Pdf.decodeUtf16be("ab".getBytes("UTF-16BE")) == (("ab", false)))
    // high surrogate with no low: flagged, skipped
    assert(Pdf.decodeUtf16be(Array(0xD8.toByte, 0x34.toByte, 0x00, 'x'.toByte)) ==
      (("x", true)))
    // odd trailing byte: flagged
    assert(Pdf.decodeUtf16be(Array(0x00, 'a'.toByte, 0x00)) == (("a", true)))
  }

  test("parseToUnicode: bfrange with explicit array destinations") {
    val cm = Pdf.parseToUnicode(
      """1 begincodespacerange <0000> <FFFF> endcodespacerange
        |1 beginbfrange <0001> <0003> [<0041> <00E9> <D834DD1E>] endbfrange""".stripMargin)
    assert(cm.decode(Array[Byte](0, 1, 0, 2, 0, 3)) == ("Aé𝄞", false))
  }

  test("parseToUnicode: incrementing bfrange and CMap holes flag unmapped") {
    val cm = Pdf.parseToUnicode(
      """1 begincodespacerange <0000> <FFFF> endcodespacerange
        |1 beginbfrange <0010> <0012> <0061> endbfrange""".stripMargin)
    assert(cm.decode(Array[Byte](0, 0x10, 0, 0x12)) == ("ac", false))
    assert(cm.decode(Array[Byte](0, 0x42)) == ("", true)) // hole -> flagged
  }

  test("one-byte ToUnicode CMaps decode simple-font show strings") {
    val cm = Pdf.parseToUnicode(
      """1 begincodespacerange <00> <FF> endcodespacerange
        |2 beginbfchar <41> <0058> <42> <0059> endbfchar""".stripMargin)
    assert(cm.decode("AB".getBytes("ISO-8859-1")) == ("XY", false))
  }

  test("inline-image payload containing the EI byte pair does not derail the lexer") {
    // "xEIx" inside the binary payload must NOT terminate the image;
    // only the whitespace-delimited EI token does
    assert(onePage("BI /W 1 /H 1 ID xEIxÿ EI BT (after) Tj ET") == "after")
  }

  test("unsupported stream filters raise a defined error (no raw-byte lexing)") {
    val doc = new String(Pdf.makeTextPdf(Seq("BT (x) Tj ET"), flate = true),
      "ISO-8859-1").replace("/Filter /FlateDecode", "/Filter /DCTDecode")
      .getBytes("ISO-8859-1")
    val e = intercept[IllegalArgumentException](Pdf.extractText(doc))
    assert(e.getMessage.contains("unsupported stream filter /DCTDecode"))
  }

  // ---- decode filters -------------------------------------------------

  test("ASCIIHexDecode: whitespace, EOD marker, odd-digit padding") {
    assert(Pdf.asciiHexDecode("48 65\n6C6c 6F>".getBytes("ISO-8859-1"))
      .sameElements("Hello".getBytes))
    assert(Pdf.asciiHexDecode("5>".getBytes).sameElements(Array('P'.toByte)))
    intercept[IllegalArgumentException](Pdf.asciiHexDecode("4g>".getBytes))
  }

  test("ASCII85Decode: z shortcut, partial groups, EOD") {
    // "Man " encodes to 9jqo^ in the classic example
    assert(Pdf.ascii85Decode("9jqo^~>".getBytes).sameElements("Man ".getBytes))
    assert(Pdf.ascii85Decode("z~>".getBytes).sameElements(Array[Byte](0, 0, 0, 0)))
    // 1-char final group is illegal
    intercept[IllegalArgumentException](Pdf.ascii85Decode("9jqo^9~>".getBytes))
  }

  test("RunLengthDecode: literal runs, repeats, EOD") {
    val enc = Array[Byte](2, 'a', 'b', 'c', (257 - 4).toByte, 'x', 0, 'y', 128.toByte)
    assert(Pdf.runLengthDecode(enc).sameElements("abcxxxxy".getBytes))
    intercept[IllegalArgumentException](
      Pdf.runLengthDecode(Array[Byte](5, 'a'))) // truncated literal
  }

  test("LZW round-trips, including width growth past 9 bits and KwKwK runs") {
    val rnd = new scala.util.Random(7L)
    val cases = Seq(
      "".getBytes,
      "a".getBytes,
      "abababababababab".getBytes, // KwKwK pattern
      ("the quick brown fox " * 40).getBytes,
      Array.fill(5000)(rnd.nextInt(256).toByte)) // forces 10-12 bit codes
    cases.foreach { plain =>
      assert(Pdf.lzwDecode(Pdf.lzwEncode(plain)).sameElements(plain))
    }
  }

  test("filter chains decode in declared order; /Filter before /Length parses") {
    Seq(
      Seq("ASCIIHexDecode"), Seq("ASCII85Decode"), Seq("RunLengthDecode"),
      Seq("LZWDecode"), Seq("ASCII85Decode", "FlateDecode"),
      Seq("ASCIIHexDecode", "LZWDecode"), Seq("RunLengthDecode", "FlateDecode"))
      .foreach { fs =>
        val doc = Pdf.makeFilteredTextPdf(Seq("BT 72 720 Td (chained text) Tj ET"), fs)
        assert(Pdf.extractText(doc) == Seq((1, "chained text")), s"chain $fs")
      }
  }

  test("parseFilters: single name is ONE name, array form takes all") {
    assert(Pdf.parseFilters("<< /Filter /FlateDecode /Length 9 >>") ==
      Seq("FlateDecode"))
    assert(Pdf.parseFilters("<< /Filter [ /ASCII85Decode /FlateDecode ] >>") ==
      Seq("ASCII85Decode", "FlateDecode"))
    assert(Pdf.parseFilters("<< /Length 9 >>") == Nil)
  }

  // ---- simple-font /Encoding /Differences -----------------------------

  test("Differences remap codes atop WinAnsi; unlisted codes fall back") {
    val doc = Pdf.makeDiffPdf(
      Seq("BT /F1 12 Tf 72 720 Td (AB a) Tj ET"),
      "65 /eacute /bullet 97 /A")
    // 65 -> é, 66 -> •, space unlisted -> WinAnsi, 97 -> A
    assert(Pdf.extractTextPages(doc) == Seq((1, "é• A", "")))
  }

  test("generic uniXXXX / uXXXXX glyph names decode any scalar") {
    val doc = Pdf.makeDiffPdf(
      Seq("BT /F1 12 Tf 72 720 Td (AB) Tj ET"),
      "65 /uniFB01 /u1D11E", flate = true)
    assert(Pdf.extractTextPages(doc) == Seq((1, "ﬁ𝄞", "")))
  }

  test("unknown glyph names flag the page instead of guessing") {
    val doc = Pdf.makeDiffPdf(
      Seq("BT /F1 12 Tf 72 720 Td (Ax) Tj ET"), "65 /gl0042")
    assert(Pdf.extractTextPages(doc) == Seq((1, "x", "unmapped glyphs")))
  }

  test("glyphText covers the AGL subset by name") {
    assert(Pdf.glyphText("seven").contains("7"))
    assert(Pdf.glyphText("ampersand").contains("&"))
    assert(Pdf.glyphText("emdash").contains("—"))
    assert(Pdf.glyphText("germandbls").contains("ß"))
    assert(Pdf.glyphText("Q").contains("Q"))
    assert(Pdf.glyphText("uni00E90041").contains("éA")) // multi-unit uni form
    assert(Pdf.glyphText("nosuchglyph").isEmpty)
  }

  test("parseDifferences: integers reset the code, names run consecutively") {
    val d = Pdf.parseDifferences("<< /Differences [ 10 /a /b 64 /zero ] >>")
    assert(d == Map(10 -> Some("a"), 11 -> Some("b"), 64 -> Some("0")))
  }

  test("pages inherit /Resources from the Pages tree node") {
    // move the font resources from the page dicts up to /Pages — the
    // form many writers emit; extraction must still resolve /F1
    val base = new String(Pdf.makeDiffPdf(
      Seq("BT /F1 12 Tf 72 720 Td (AB) Tj ET"), "65 /eacute /bullet"),
      "ISO-8859-1")
    val resRe = """/Resources << /Font << /F1 (\d+) 0 R >> >>""".r
    val fontRef = resRe.findFirstMatchIn(base).get.group(1)
    val hoisted = resRe.replaceAllIn(base, "")
      .replace("/Type /Pages",
        s"/Type /Pages /Resources << /Font << /F1 $fontRef 0 R >> >>")
      .getBytes("ISO-8859-1")
    assert(Pdf.extractTextPages(hoisted) == Seq((1, "é•", "")))
  }

  test("/Contents refs with non-zero generation numbers still resolve") {
    val doc = new String(Pdf.makeTextPdf(Seq("BT (gen) Tj ET")), "ISO-8859-1")
    // rewrite the page's /Contents ref to generation 7 (object ids are
    // keyed by number only, so the body still resolves)
    val patched = doc.replaceAll("/Contents (\\d+) 0 R", "/Contents $1 7 R")
      .getBytes("ISO-8859-1")
    assert(Pdf.extractText(patched) == Seq((1, "gen")))
  }

  test("extractImages: Flate RGB/Gray re-encode pixel-exact PNG; DCT passes JPEG through") {
    val doc = Pdf.makeImagePdf(Seq(
      Seq(("rgb", 8, 6), ("gray", 5, 4)), Seq(("dct", 8, 8))))
    val rows = Pdf.extractImages(doc)
    assert(rows.map(r => (r._1, r._2, r._3, r._4, r._5, r._6, r._8)) == Seq(
      (1, 0, "Im0", "png", 8, 6, ""), (1, 1, "Im1", "png", 5, 4, ""),
      (2, 0, "Im0", "jpeg", 8, 8, "")))
    // PNG arms decode back pixel-exact against the pattern generator
    val rgb = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(rows(0)._7))
    val want = Pdf.imageSamples("rgb", 8, 6)
    assert((0 until 6).forall { y => (0 until 8).forall { x =>
      val p = rgb.getRGB(x, y); val o = (y * 8 + x) * 3
      ((p >> 16) & 0xFF) == (want(o) & 0xFF) &&
        ((p >> 8) & 0xFF) == (want(o + 1) & 0xFF) &&
        (p & 0xFF) == (want(o + 2) & 0xFF)
    } })
    val gray = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(rows(1)._7))
    val wantG = Pdf.imageSamples("gray", 5, 4)
    assert((0 until 4).forall(y => (0 until 5).forall(x =>
      gray.getRaster.getSample(x, y, 0) == (wantG(y * 5 + x) & 0xFF))))
    // the JPEG payload is the raw stream, byte-for-byte
    assert(rows(2)._7.take(2).toSeq == Seq(0xFF.toByte, 0xD8.toByte))
  }

  test("extractImages: unsupported codec/colorspace degrade to warn rows, never throw") {
    val doc = Pdf.makeImagePdf(Seq(Seq(("ccitt", 4, 4), ("cmyk", 4, 4))))
    val rows = Pdf.extractImages(doc)
    assert(rows.map(r => (r._3, r._4, r._7.isEmpty, r._8)) == Seq(
      ("Im0", "", true, "unsupported image filter /CCITTFaxDecode"),
      ("Im1", "", true, "unsupported image colorspace /DeviceCMYK")))
    // a text-only document simply has no image rows
    assert(Pdf.extractImages(Pdf.makeTextPdf(Seq("BT (x) Tj ET"))).isEmpty)
  }
}
