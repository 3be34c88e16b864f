package graft.ops

import scala.collection.mutable

/** PDF operators (SURVEY §2.1 S11, §2.4 J5/J6, §2.9 R2; reference
  * app/(contents)/pdf-tool/page.tsx).
  *
  * The page-spec algebra (`parsePages`) is an exact port of the
  * reference's JS semantics — including parseInt's numeric-prefix
  * parsing and min/max range normalization. Merge/split operate on a
  * minimal COS object model (SURVEY §7.4 risk #2 documents the
  * subset): object scan by syntax (no xref dependence), FlateDecode
  * `/ObjStm` compressed object streams expanded (so PDF 1.5+ files
  * with xref streams — essentially all modern writers — parse), with
  * /DecodeParms TIFF and PNG Sub/Up/Average/Paeth predictors undone
  * after inflate; xref streams themselves ignored on READ (the object
  * scan never needs them, predictor-compressed or not). Encrypted
  * files decrypt via PdfCrypt. Objects are re-numbered with an offset
  * per source document and page trees rebuilt; output serializes to
  * classic 1.4 xref for classic sources and to the PDF 1.5 compressed
  * form (ObjStm + xref stream) when a source carried an xref stream.
  * Binary payload paths (zip packaging, naming) follow the reference.
  *
  * Scale note: document surgery is inherently per-file; the distributed
  * shape is binaryFile scan → per-file map (validation, page counts) →
  * driver-side assembly only for the final merged artifact, mirroring
  * the reference's single-output flow.
  */
object Pdf {

  /** S11: `%PDF-` 5-byte magic (reference hasPdfHeader,
    * pdf-tool/page.tsx:35-51). */
  def hasPdfHeader(bytes: Array[Byte]): Boolean =
    bytes.length >= 5 && bytes.take(5).sameElements("%PDF-".getBytes("US-ASCII"))

  /** JS parseInt: optional sign + digit prefix of the trimmed string. */
  private def jsParseInt(s: String): Option[Int] =
    "^[+-]?\\d+".r.findFirstIn(s.trim).map(_.toInt)

  /** J6/R2: `"1,3,5-7"` → page groups (reference parsePages,
    * pdf-tool/page.tsx:54-73): chunks split on ',', trimmed, empties
    * dropped; `a-b` ranges normalized to [min,max]; non-numeric chunks
    * skipped; single numbers = singleton groups. Pages are 1-based and
    * NOT yet clamped to the document (clamping happens at split time,
    * :404-408). */
  def parsePages(input: String): Seq[Seq[Int]] = {
    if (input == null || input.trim.isEmpty) return Nil
    input.split(",").map(_.trim).filter(_.nonEmpty).toSeq.flatMap { c =>
      if (c.contains("-")) {
        val parts = c.split("-", -1)
        (jsParseInt(parts(0)), jsParseInt(if (parts.length > 1) parts(1) else "")) match {
          case (Some(s), Some(e)) => Some((math.min(s, e) to math.max(s, e)).toSeq)
          case _ => None
        }
      } else jsParseInt(c).map(n => Seq(n))
    }
  }

  /** Clamp a group to a document (reference handleSplit,
    * pdf-tool/page.tsx:404-408): 1-based pages kept iff within
    * [1, totalPages]. */
  def clampGroup(group: Seq[Int], totalPages: Int): Seq[Int] =
    group.filter(p => p >= 1 && p <= totalPages)

  /** Split jobs: mode "all" → one group per page; "custom" → parsePages
    * (reference :391-394). Returns (1-based group ordinal, clamped
    * pages), empty groups dropped. */
  def splitJobs(mode: String, customSpec: String, totalPages: Int): Seq[(Int, Seq[Int])] = {
    val jobs =
      if (mode == "all") (1 to totalPages).map(Seq(_))
      else parsePages(customSpec)
    jobs.zipWithIndex
      .map { case (g, i) => (i + 1, clampGroup(g, totalPages)) }
      .filter(_._2.nonEmpty)
  }

  /** K9-style split output naming (reference :412). */
  def partName(baseName: String, idx: Int): String =
    f"${baseName}_part${idx}%03d.pdf"

  // -------------------------------------------------------------------
  // Minimal COS model (documented subset)
  // -------------------------------------------------------------------

  /** `usedXrefStream`: the source carried a PDF 1.5+ cross-reference
    * STREAM — outputs derived from it serialize the same way (the
    * compressed-xref size benefit follows the source's vintage). */
  private case class CosDoc(objects: mutable.LinkedHashMap[Int, String],
      catalogNum: Int, pagesNum: Int, pageNums: Seq[Int],
      usedXrefStream: Boolean)

  private val kidsRe = """(?s)/Kids\s*\[(.*?)\]""".r
  private val refRe = """(\d+)\s+0\s+R""".r

  /** Undo a /DecodeParms predictor after inflate ([PDF 32000] 7.4.4.4).
    * Predictor 2 = TIFF horizontal differencing over `stride` rows;
    * >= 10 = PNG: each row is one filter-tag byte + stride data bytes,
    * the tag selecting None/Sub/Up/Average/Paeth per row regardless of
    * the declared predictor value. Returns `data` untouched for
    * predictor 1/absent. */
  private[ops] def unpredict(data: Array[Byte], predictor: Int,
      columns: Int, colors: Int = 1, bpc: Int = 8): Array[Byte] = {
    if (predictor <= 1) return data
    // Ceil, not floor ([PNG] 9. Filtering; [PDF 32000] 7.4.4.4): with
    // bpc < 8 (e.g. Columns=10, BitsPerComponent=1) a floor stride
    // mis-frames every row and decodes garbage with no error.
    val bpp = math.max(1, (colors * bpc + 7) / 8)
    val stride = math.max(1, (columns * colors * bpc + 7) / 8)
    if (predictor == 2) {
      // TIFF differencing below 8 bpc operates on sub-byte samples —
      // a byte-wise undo would silently decode garbage. Out of subset,
      // reject loudly like the other defined-error paths.
      if (bpc < 8) throw new IllegalArgumentException(
        s"TIFF predictor with BitsPerComponent=$bpc unsupported (sub-byte samples)")
      val out = data.clone()
      for (r <- 0 until out.length / stride; i <- bpp until stride) {
        val o = r * stride + i
        out(o) = (out(o) + out(o - bpp)).toByte
      }
      return out
    }
    val rowLen = stride + 1
    val nRows = data.length / rowLen
    val out = new Array[Byte](nRows * stride)
    var prev = new Array[Byte](stride) // implicit zero row above row 0
    for (r <- 0 until nRows) {
      val tag = data(r * rowLen) & 0xFF
      val row = java.util.Arrays.copyOfRange(data, r * rowLen + 1, r * rowLen + 1 + stride)
      tag match {
        case 0 => // None
        case 1 => for (i <- bpp until stride) row(i) = (row(i) + row(i - bpp)).toByte
        case 2 => for (i <- 0 until stride) row(i) = (row(i) + prev(i)).toByte
        case 3 => for (i <- 0 until stride) {
          val left = if (i >= bpp) row(i - bpp) & 0xFF else 0
          row(i) = (row(i) + ((left + (prev(i) & 0xFF)) / 2)).toByte
        }
        case 4 => for (i <- 0 until stride) {
          val a = if (i >= bpp) row(i - bpp) & 0xFF else 0
          val b = prev(i) & 0xFF
          val c = if (i >= bpp) prev(i - bpp) & 0xFF else 0
          val p = a + b - c
          val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
          val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
          row(i) = (row(i) + pred).toByte
        }
        case t => throw new IllegalArgumentException(s"unknown PNG filter tag $t")
      }
      System.arraycopy(row, 0, out, r * stride, stride)
      prev = row
    }
    out
  }

  /** DEFLATE compress (the writer half of /FlateDecode). */
  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Raw DEFLATE inflate (PDF /FlateDecode; predictors undone by the
    * caller via [[unpredict]]). */
  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!inf.finished() && !(inf.needsInput() && inf.getRemaining == 0)) {
      val n = inf.inflate(buf)
      if (n > 0) out.write(buf, 0, n)
      else if (inf.needsDictionary()) throw new IllegalArgumentException("FlateDecode: preset dictionary unsupported")
      else if (inf.needsInput()) throw new IllegalArgumentException("FlateDecode: truncated stream")
    }
    out.toByteArray
  }

  /** ASCIIHexDecode ([PDF 32000] 7.4.2): hex pairs, whitespace
    * ignored, `>` ends the data, an odd final digit pads with 0. */
  private[ops] def asciiHexDecode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var hi = -1
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val c = data(i).toChar
      if (c == '>') done = true
      else {
        val d = Character.digit(c, 16)
        if (d >= 0) {
          if (hi < 0) hi = d
          else { out.write((hi << 4) | d); hi = -1 }
        } else if (!c.isWhitespace) throw new IllegalArgumentException(
          s"ASCIIHexDecode: illegal character '$c'")
      }
      i += 1
    }
    if (hi >= 0) out.write(hi << 4) // odd digit: low nibble 0
    out.toByteArray
  }

  /** ASCII85Decode ([PDF 32000] 7.4.3): base-85 groups of 5 chars →
    * 4 bytes, `z` = four zero bytes (only between groups), whitespace
    * ignored, `~>` EOD; a final partial group of n chars yields n−1
    * bytes (pad with 'u', drop the pad bytes). */
  private[ops] def ascii85Decode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val grp = new Array[Int](5)
    var n = 0
    def flush(k: Int): Unit = { // k chars present, pad to 5 with 'u'
      var v = 0L
      (0 until 5).foreach(j => v = v * 85 + (if (j < k) grp(j) else 84))
      val b = Array(((v >>> 24) & 0xFF).toInt, ((v >>> 16) & 0xFF).toInt,
        ((v >>> 8) & 0xFF).toInt, (v & 0xFF).toInt)
      (0 until k - 1).foreach(j => out.write(b(j)))
    }
    var i = 0
    var done = false
    // a leading <~ (the Adobe convention) is tolerated
    if (data.length >= 2 && data(0) == '<' && data(1) == '~') i = 2
    while (i < data.length && !done) {
      val c = data(i).toChar
      if (c == '~') done = true
      else if (c == 'z' && n == 0) { out.write(0); out.write(0); out.write(0); out.write(0) }
      else if (c >= '!' && c <= 'u') {
        grp(n) = c - '!'
        n += 1
        if (n == 5) { flush(5); n = 0 }
      } else if (!c.isWhitespace) throw new IllegalArgumentException(
        s"ASCII85Decode: illegal character '$c'")
      i += 1
    }
    if (n == 1) throw new IllegalArgumentException(
      "ASCII85Decode: a final group of 1 character is illegal")
    if (n > 1) flush(n)
    out.toByteArray
  }

  /** RunLengthDecode ([PDF 32000] 7.4.5): length byte L — 0–127 copies
    * the next L+1 bytes literally, 129–255 repeats the next byte
    * 257−L times, 128 is EOD. */
  private[ops] def runLengthDecode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val l = data(i) & 0xFF
      i += 1
      if (l == 128) done = true
      else if (l < 128) {
        val n = l + 1
        if (i + n > data.length) throw new IllegalArgumentException(
          "RunLengthDecode: truncated literal run")
        out.write(data, i, n)
        i += n
      } else {
        if (i >= data.length) throw new IllegalArgumentException(
          "RunLengthDecode: truncated repeat run")
        val n = 257 - l
        (0 until n).foreach(_ => out.write(data(i)))
        i += 1
      }
    }
    out.toByteArray
  }

  /** LZWDecode ([PDF 32000] 7.4.4; TIFF variant): MSB-first variable
    * 9–12-bit codes, 256 = clear table, 257 = EOD; the code width
    * grows one code EARLY by default (`earlyChange = 1`, the PDF and
    * TIFF convention — writers that set /EarlyChange 0 in DecodeParms
    * grow exactly at table-full). */
  private[ops] def lzwDecode(data: Array[Byte], earlyChange: Int = 1): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val dict = new Array[Array[Byte]](4096)
    var dictSize = 258
    var width = 9
    var acc = 0L
    var nbits = 0
    var prev: Array[Byte] = null
    var i = 0
    var done = false
    def resetDict(): Unit = { dictSize = 258; width = 9; prev = null }
    while (!done && (i < data.length || nbits >= width)) {
      if (nbits < width) {
        acc = (acc << 8) | (data(i) & 0xFF)
        nbits += 8
        i += 1
      } else {
        val code = ((acc >> (nbits - width)) & ((1 << width) - 1)).toInt
        nbits -= width
        if (code == 256) resetDict()
        else if (code == 257) done = true
        else {
          val entry: Array[Byte] =
            if (code < 256) Array(code.toByte)
            else if (code < dictSize && dict(code) != null) dict(code)
            else if (prev != null && code == dictSize) prev :+ prev(0) // KwKwK
            else throw new IllegalArgumentException(s"LZWDecode: bad code $code")
          out.write(entry, 0, entry.length)
          if (prev != null && dictSize < 4096) {
            dict(dictSize) = prev :+ entry(0)
            dictSize += 1
          }
          // width grows when the NEXT code would not fit; earlyChange
          // shifts the boundary one code early (the default)
          if (dictSize + earlyChange >= (1 << width) && width < 12) width += 1
          prev = entry
        }
      }
    }
    out.toByteArray
  }

  /** LZW compress (TIFF/PDF variant, earlyChange = 1) — the writer
    * half, used by fixtures so the decoder is exercised against real
    * streams rather than hand-transcribed bit patterns. */
  private[ops] def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0L
    var nbits = 0
    var width = 9
    val dict = mutable.HashMap.empty[scala.collection.immutable.ArraySeq[Byte], Int]
    var dictSize = 258
    def emit(code: Int): Unit = {
      acc = (acc << width) | code
      nbits += width
      while (nbits >= 8) { out.write(((acc >> (nbits - 8)) & 0xFF).toInt); nbits -= 8 }
    }
    emit(256) // leading clear, the convention
    var w = scala.collection.immutable.ArraySeq.empty[Byte]
    def codeOf(s: scala.collection.immutable.ArraySeq[Byte]): Int =
      if (s.length == 1) s.head & 0xFF else dict(s)
    data.foreach { b =>
      val wb = w :+ b
      if (wb.length == 1 || dict.contains(wb)) w = wb
      else {
        emit(codeOf(w))
        dict(wb) = dictSize
        dictSize += 1
        // mirror the decoder's early width growth
        if (dictSize + 1 > (1 << width) && width < 12) width += 1
        if (dictSize == 4096) { emit(256); dict.clear(); dictSize = 258; width = 9 }
        w = scala.collection.immutable.ArraySeq(b)
      }
    }
    if (w.nonEmpty) emit(codeOf(w))
    emit(257) // EOD
    if (nbits > 0) out.write(((acc << (8 - nbits)) & 0xFF).toInt)
    out.toByteArray
  }

  private val objStmHeadRe =
    """(?s)(\d+)\s+0\s+obj\s*(<<(?:[^<>]|<<[^<>]*>>)*>>)\s*stream\r?\n""".r
  private def dictInt(dict: String, key: String): Option[Int] =
    (key + """\s+(\d+)""").r.findFirstMatchIn(dict).map(_.group(1).toInt)

  /** Expand every `/Type /ObjStm` compressed object stream: inflate,
    * read the N (objnum, offset) header pairs, and surface the embedded
    * objects as top-level bodies. Modern writers put the catalog, page
    * dicts, and most non-content objects inside these; this pass is
    * what makes Acrobat/Chrome-produced PDFs (1.5+, xref streams)
    * readable by the subset parser — which never needed the xref table
    * to begin with (it scans objects), so xref *streams* need no
    * parsing either. */
  private def expandObjectStreams(text: String,
      objects: mutable.LinkedHashMap[Int, String]): Unit = {
    objStmHeadRe.findAllMatchIn(text).foreach { m =>
      val dict = m.group(2)
      if ("""/Type\s*/ObjStm""".r.findFirstIn(dict).isDefined) {
        val dataStart = m.end
        val dataEnd = dictInt(dict, "/Length") match {
          case Some(len) if dataStart + len <= text.length => dataStart + len
          case _ => text.indexOf("endstream", dataStart) match {
            case -1 => text.length
            case e => e
          }
        }
        val raw = text.substring(dataStart, dataEnd).getBytes("ISO-8859-1")
        val decoded =
          if ("""/Filter\s*/FlateDecode""".r.findFirstIn(dict).isDefined) {
            // Writers may predictor-compress any Flate stream via
            // /DecodeParms (xref streams almost always; ObjStm legally).
            // Both the inline-dict form and the single-element array
            // form `[<<...>>]` (legal, and required when /Filter is an
            // array) are accepted; indirect-reference parms stay out of
            // the documented subset.
            val parms = """/DecodeParms\s*\[?\s*(<<[^<>]*>>)""".r
              .findFirstMatchIn(dict).map(_.group(1))
            val predictor = parms.flatMap(dictInt(_, "/Predictor")).getOrElse(1)
            val columns = parms.flatMap(dictInt(_, "/Columns")).getOrElse(1)
            val colors = parms.flatMap(dictInt(_, "/Colors")).getOrElse(1)
            val bpc = parms.flatMap(dictInt(_, "/BitsPerComponent")).getOrElse(8)
            new String(unpredict(inflate(raw), predictor, columns, colors, bpc), "ISO-8859-1")
          } else new String(raw, "ISO-8859-1")
        (dictInt(dict, "/N"), dictInt(dict, "/First")) match {
          case (Some(n), Some(first)) =>
            val header = decoded.take(first).trim.split("\\s+").filter(_.nonEmpty).map(_.toInt)
            val pairs = header.grouped(2).collect { case Array(num, off) => (num, off) }.toSeq.take(n)
            pairs.zipWithIndex.foreach { case ((num, off), i) =>
              val end = if (i + 1 < pairs.length) first + pairs(i + 1)._2 else decoded.length
              objects(num) = " " + decoded.substring(first + off, end).trim + " "
            }
          case _ =>
        }
      }
    }
  }

  private val encryptRe = """/Encrypt\s+(\d+)\s+\d+\s+R""".r

  /** Encrypted-document probe: an encrypted PDF carries an `/Encrypt N
    * G R` entry in its trailer dictionary (classic xref) or xref-stream
    * dict ([PDF 32000] 7.6.1). Matched over the raw text — the entry
    * only legally appears in those dicts, and page content rarely
    * carries the literal uncompressed. */
  def isEncrypted(bytes: Array[Byte]): Boolean =
    hasPdfHeader(bytes) && encryptRe.findFirstIn(new String(bytes, "ISO-8859-1")).isDefined

  private val streamTokenRe = """stream\r?\n""".r
  private def setLength(dictPart: String, len: Int): String =
    """/Length\s+\d+""".r.replaceAllIn(dictPart, s"/Length $len")

  /** Frame every top-level `N 0 obj … endobj` extent with a
    * length-aware sequential lexer instead of a reluctant
    * regex-to-`endobj`: a stream payload is jumped by its direct
    * /Length ([PDF 32000] 7.3.8) and string tokens are skipped as
    * tokens, so ciphertext or binary payload containing the literal
    * bytes `endobj` can never truncate an object — the failure mode
    * the old regex had on encrypted documents. A stream with a
    * missing or indirect /Length falls back to the `endstream` token
    * (indirect lengths stay outside the documented subset; the crypt
    * transform still raises its defined error for them). Returns
    * (num, bodyStart, bodyEnd); body = text between the `obj`
    * keyword and its `endobj`. */
  private[ops] def scanObjects(text: String): Seq[(Int, Int, Int)] = {
    val head = java.util.regex.Pattern.compile("""(\d+)\s+0\s+obj""").matcher(text)
    val out = Seq.newBuilder[(Int, Int, Int)]
    var cursor = 0
    while (cursor < text.length && head.find(cursor)) {
      val num = head.group(1).toInt
      val bodyStart = head.end
      var i = bodyStart
      var end = -1
      while (end < 0 && i < text.length) {
        text.charAt(i) match {
          case 'e' if text.startsWith("endobj", i) => end = i
          case 's' if (text.startsWith("stream\n", i) ||
              text.startsWith("stream\r\n", i)) &&
              (i == bodyStart || !text.charAt(i - 1).isLetter) =>
            val dataStart = i + (if (text.charAt(i + 6) == '\r') 8 else 7)
            val skipTo = dictInt(text.substring(bodyStart, i), "/Length") match {
              case Some(len) if dataStart + len <= text.length => dataStart + len
              case _ => dataStart // fall back to the endstream token
            }
            val es = text.indexOf("endstream", skipTo)
            i = if (es < 0) text.length else es + "endstream".length
          case '(' =>
            // tokenized skip; a malformed string degrades to one char
            i = try PdfCrypt.readLiteralString(text, i)._2
            catch { case _: RuntimeException => i + 1 }
          case '<' if text.startsWith("<<", i) => i += 2
          case '<' =>
            val e = text.indexOf('>', i)
            i = if (e < 0) text.length else e + 1
          case '%' =>
            val e = text.indexWhere(c => c == '\r' || c == '\n', i)
            i = if (e < 0) text.length else e
          case _ => i += 1
        }
      }
      if (end >= 0) { out += ((num, bodyStart, end)); cursor = end + "endobj".length }
      else cursor = text.length
    }
    out.result()
  }

  /** Rewrite every `N 0 obj ... endobj` body through `f` (encryption
    * integration point; everything outside object bodies — header,
    * xref, trailer — passes through untouched). Framing is
    * [[scanObjects]], so `f` always receives a whole body even when
    * stream bytes contain `endobj`. */
  private[ops] def transformObjects(text: String, f: (Int, String) => String): String = {
    val sb = new java.lang.StringBuilder(text.length)
    var last = 0
    scanObjects(text).foreach { case (num, bs, be) =>
      sb.append(text, last, bs)
      sb.append(f(num, text.substring(bs, be)))
      last = be
    }
    sb.append(text, last, text.length)
    sb.toString
  }

  /** Apply `fStream` to an object's stream payload (direct /Length
    * framing; [PDF 32000] 7.3.8) and `fString` to every literal or hex
    * string outside it, re-emitting strings in hex form. The per-object
    * crypt transforms of the standard security handler act exactly on
    * these two lexical classes. */
  private[ops] def transformStreamsAndStrings(body: String,
      fStream: Array[Byte] => Array[Byte],
      fString: Array[Byte] => Array[Byte]): String =
    streamTokenRe.findFirstMatchIn(body) match {
      case None => transformStrings(body, fString)
      case Some(m) =>
        val dataStart = m.end
        val dataEnd = dictInt(body.substring(0, m.start), "/Length") match {
          case Some(len) if dataStart + len <= body.length => dataStart + len
          case Some(len) => throw new IllegalArgumentException(
            s"stream /Length $len overruns object body (${body.length - dataStart} bytes left)")
          case None => throw new IllegalArgumentException(
            "stream without direct /Length unsupported in crypt transform")
        }
        val out = fStream(body.substring(dataStart, dataEnd).getBytes("ISO-8859-1"))
        val pre = setLength(transformStrings(body.substring(0, m.start), fString), out.length)
        val post = body.substring(dataEnd).dropWhile(c => c == '\r' || c == '\n')
        pre + "stream\n" + new String(out, "ISO-8859-1") + "\n" + post
    }

  private def transformStrings(s: String, f: Array[Byte] => Array[Byte]): String = {
    def hexOf(b: Array[Byte]) = "<" + b.map(x => f"${x & 0xFF}%02x").mkString + ">"
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '(' =>
          val (bytes, next) = PdfCrypt.readLiteralString(s, i)
          sb.append(hexOf(f(bytes))); i = next
        case '<' if i + 1 < s.length && s.charAt(i + 1) == '<' =>
          sb.append("<<"); i += 2
        case '<' =>
          val end = s.indexOf('>', i)
          require(end >= 0, "unterminated hex string")
          val hx = s.substring(i + 1, end).filterNot(_.isWhitespace)
          val padded = if (hx.length % 2 == 1) hx + "0" else hx
          sb.append(hexOf(f(padded.grouped(2)
            .map(h => Integer.parseInt(h, 16).toByte).toArray)))
          i = end + 1
        case c => sb.append(c); i += 1
      }
    }
    sb.result()
  }

  private def parse(bytes: Array[Byte], password: String = ""): CosDoc = {
    require(hasPdfHeader(bytes), "not a PDF (missing %PDF- header)")
    var text = new String(bytes, "ISO-8859-1")
    // Encrypted documents decrypt up front (standard security handler —
    // PdfCrypt scaladoc; the reference instead forces pdf-lib's
    // ignoreEncryption and operates on ciphertext,
    // pdf-tool/page.tsx:338,383). The supplied password is tried as
    // user then owner password (empty = the owner-locked convention).
    // After this block the text is plaintext and every downstream pass
    // is oblivious to encryption; outputs serialize without /Encrypt.
    // Unsupported schemes and wrong passwords raise defined errors.
    val encNum = encryptRe.findFirstMatchIn(text).map(_.group(1).toInt)
    encNum.foreach { num =>
      // scanObjects framing, not regex-to-endobj: the /O and /U
      // entries are 32 raw bytes that may themselves contain `endobj`
      val body = scanObjects(text).collectFirst {
        case (n, bs, be) if n == num => text.substring(bs, be)
      }.getOrElse(
        throw new IllegalArgumentException("encrypted PDF: /Encrypt dictionary not found"))
      val id0 = """/ID\s*\[\s*""".r.findFirstMatchIn(text)
        .map(m => PdfCrypt.readStringAt(text, m.end)._1).getOrElse(Array.empty[Byte])
      val h = PdfCrypt.forDocument(body, id0, password.getBytes("UTF-8"))
      text = transformObjects(text, (n, b) =>
        if (n == num) b
        else transformStreamsAndStrings(b, d => h.decrypt(n, 0, d), s => h.decrypt(n, 0, s)))
    }
    val objects = mutable.LinkedHashMap.empty[Int, String]
    scanObjects(text).foreach { case (n, bs, be) =>
      val body = text.substring(bs, be)
      // container/bookkeeping streams are expanded (ObjStm) or ignored
      // (XRef) rather than carried as opaque objects; a decrypted
      // /Encrypt dict is bookkeeping too
      if ("""/Type\s*/(ObjStm|XRef)""".r.findFirstIn(body).isEmpty &&
          !encNum.contains(n))
        objects(n) = body
    }
    expandObjectStreams(text, objects)
    // Token-anchored type tests: the catalog also CONTAINS "/Pages 2 0 R",
    // so a bare substring test would misidentify it as the page tree.
    val typeCatalog = """/Type\s*/Catalog""".r
    val typePages = """/Type\s*/Pages""".r
    val catalog = objects.collectFirst {
      case (n, b) if typeCatalog.findFirstIn(b).isDefined => n
    }.getOrElse(throw new IllegalArgumentException("no /Catalog object"))
    val pagesNum = objects.collectFirst {
      case (n, b) if typePages.findFirstIn(b).isDefined => n
    }.getOrElse(throw new IllegalArgumentException("no /Pages object"))
    val kids = kidsRe.findFirstMatchIn(objects(pagesNum))
      .map(m => refRe.findAllMatchIn(m.group(1)).map(_.group(1).toInt).toSeq)
      .getOrElse(Nil)
    CosDoc(objects, catalog, pagesNum, kids,
      usedXrefStream = """/Type\s*/XRef""".r.findFirstIn(text).isDefined)
  }

  def pageCount(bytes: Array[Byte], password: String = ""): Int =
    parse(bytes, password).pageNums.size

  /** Reference catch-and-log semantics (pdf-tool/page.tsx:98-118 log
    * utility, :140-176 add-flow rejects, :355/:441 operation catches):
    * a batch over many files degrades to per-file defined error rows
    * instead of failing wholesale. Size-0 and headerless inputs are
    * rejected up front exactly like the add flow; operation-time
    * failures (encrypted, malformed) become that file's error row.
    * Output (name, ok, pages, error), driver-side like all document
    * surgery — the distributed shape maps this over a binaryFile scan. */
  def describeFiles(files: Seq[(String, Array[Byte])], password: String = "")
      : Seq[(String, Boolean, Option[Int], String)] =
    files.map { case (name, bytes) =>
      if (bytes.isEmpty) (name, false, None, "size 0B")
      else if (!hasPdfHeader(bytes)) (name, false, None, "no %PDF- header")
      else try (name, true, Some(pageCount(bytes, password)), "")
      catch { case e: IllegalArgumentException => (name, false, None, e.getMessage) }
    }

  /** Garbage-collect before writing: keep only objects reachable from
    * the root by following `n 0 R` references transitively. A split
    * copies the source body wholesale and rewrites just the Kids list,
    * so without this sweep every extract carried ALL the source's page
    * and content objects as dead weight — a 1-page extract of a
    * 1000-page document was as large as the document. References only
    * occur at dict level (resource/annotation refs live in the page
    * dict, not inside content streams), so a dict-text walk is the
    * complete reference graph. */
  private def reachableFrom(objects: Seq[(Int, String)],
      rootNum: Int): Seq[(Int, String)] = {
    val byNum = objects.toMap
    val seen = mutable.Set(rootNum)
    var frontier = List(rootNum)
    while (frontier.nonEmpty) {
      frontier = frontier
        .flatMap(n => byNum.get(n).iterator.flatMap(
          b => refRe.findAllMatchIn(b).map(_.group(1).toInt)))
        .distinct.filterNot(seen)
      frontier.foreach(n => seen.add(n): Unit)
    }
    objects.filter { case (n, _) => seen(n) }
  }

  /** Serialize a doc: classic 1.4 xref table by default, or the PDF
    * 1.5+ compressed form ([[serializeXrefStream]]) when the source
    * document carried one. Unreachable objects are dropped first
    * ([[reachableFrom]]). */
  private def serialize(objs0: Seq[(Int, String)], rootNum: Int,
      xrefStream: Boolean = false): Array[Byte] = {
    val objects = reachableFrom(objs0, rootNum)
    if (xrefStream) serializeXrefStream(objects, rootNum)
    else {
      val sb = new StringBuilder("%PDF-1.4\n")
      val offsets = mutable.LinkedHashMap.empty[Int, Int]
      objects.foreach { case (n, body) =>
        offsets(n) = sb.length
        sb.append(s"$n 0 obj$body endobj\n")
      }
      val xrefPos = sb.length
      val maxNum = objects.map(_._1).max
      sb.append(s"xref\n0 ${maxNum + 1}\n")
      sb.append("0000000000 65535 f \n")
      (1 to maxNum).foreach { n =>
        sb.append(offsets.get(n)
          .map(o => f"$o%010d 00000 n \n").getOrElse("0000000000 65535 f \n"))
      }
      sb.append(s"trailer\n<< /Size ${maxNum + 1} /Root $rootNum 0 R >>\n")
      sb.append(s"startxref\n$xrefPos\n%%EOF\n")
      sb.result().getBytes("ISO-8859-1")
    }
  }

  /** Serialize with a PDF 1.5 cross-reference STREAM ([PDF 32000]
    * 7.5.8): every streamless object packs into one FlateDecode
    * `/ObjStm` (type-2 xref entries), stream-carrying objects stay
    * top-level (the spec forbids streams inside object streams,
    * 7.5.7), and the xref itself is a `/Type /XRef` stream whose
    * trailer fields live in its own dict — no `trailer` keyword. This
    * is the form essentially all modern writers emit; large merged
    * documents keep the compressed-xref size benefit instead of
    * falling back to 1.4. Output re-parses under this module's own
    * parser (the ObjStm expander + object scan). */
  private def serializeXrefStream(objects: Seq[(Int, String)], rootNum: Int): Array[Byte] = {
    val maxIn = objects.map(_._1).max
    val (withStream, packable) = objects.partition { case (_, b) =>
      streamTokenRe.findFirstIn(b).isDefined
    }
    val objStmNum = maxIn + 1
    val xrefNum = if (packable.nonEmpty) maxIn + 2 else maxIn + 1
    val sb = new StringBuilder("%PDF-1.5\n")
    val offsets = mutable.LinkedHashMap.empty[Int, Int]
    withStream.foreach { case (n, body) =>
      offsets(n) = sb.length
      sb.append(s"$n 0 obj$body endobj\n")
    }
    if (packable.nonEmpty) {
      // ObjStm payload: "num offset ..." header, then the bodies —
      // offsets are relative to /First ([PDF 32000] 7.5.7)
      val header = new StringBuilder
      val data = new StringBuilder
      packable.foreach { case (n, body) =>
        header.append(s"$n ${data.length} ")
        data.append(body.trim).append('\n')
      }
      val flate = deflate((header.toString + data).getBytes("ISO-8859-1"))
      offsets(objStmNum) = sb.length
      sb.append(s"$objStmNum 0 obj << /Type /ObjStm /N ${packable.size} " +
        s"/First ${header.length} /Filter /FlateDecode /Length ${flate.length} >> stream\n")
      sb.append(new String(flate, "ISO-8859-1"))
      sb.append("\nendstream endobj\n")
    }
    // xref stream: W = [1 4 2] — type byte, 4-byte offset/objstm-num,
    // 2-byte gen/index — covering every object 0..xrefNum
    val xrefPos = sb.length
    val packedIdx = packable.map(_._1).zipWithIndex.toMap
    val entries = new java.io.ByteArrayOutputStream()
    def entry(t: Int, f2: Int, f3: Int): Unit = {
      entries.write(t)
      entries.write((f2 >>> 24) & 0xFF); entries.write((f2 >>> 16) & 0xFF)
      entries.write((f2 >>> 8) & 0xFF); entries.write(f2 & 0xFF)
      entries.write((f3 >>> 8) & 0xFF); entries.write(f3 & 0xFF)
    }
    entry(0, 0, 0xFFFF) // object 0: head of the free list
    (1 to xrefNum).foreach { n =>
      if (n == xrefNum) entry(1, xrefPos, 0)
      else offsets.get(n) match {
        case Some(o) => entry(1, o, 0)
        case None => packedIdx.get(n) match {
          case Some(i) => entry(2, objStmNum, i)
          case None => entry(0, 0, 0xFFFF)
        }
      }
    }
    val xdata = deflate(entries.toByteArray)
    sb.append(s"$xrefNum 0 obj << /Type /XRef /Size ${xrefNum + 1} /W [1 4 2] " +
      s"/Root $rootNum 0 R /Filter /FlateDecode /Length ${xdata.length} >> stream\n")
    sb.append(new String(xdata, "ISO-8859-1"))
    sb.append("\nendstream endobj\n")
    sb.append(s"startxref\n$xrefPos\n%%EOF\n")
    sb.result().getBytes("ISO-8859-1")
  }

  /** Generate a minimal n-page PDF (test fixture + writer baseline).
    * `withContent` adds a /Contents stream and a catalog string so the
    * crypt transforms have both lexical classes to act on. */
  def makePdf(nPages: Int, withContent: Boolean = false,
      xrefStream: Boolean = false): Array[Byte] = {
    val pageNums = (0 until nPages).map(3 + _)
    val contentNums = pageNums.map(_ + nPages)
    val catalogTag = if (withContent) " /GraftTag (fixture) " else ""
    val objs = Seq(
      1 -> s" << /Type /Catalog /Pages 2 0 R$catalogTag>> ",
      2 -> s" << /Type /Pages /Kids [${pageNums.map(n => s"$n 0 R").mkString(" ")}] /Count $nPages >> ") ++
      pageNums.zipWithIndex.map { case (n, i) =>
        val contents = if (withContent) s" /Contents ${contentNums(i)} 0 R" else ""
        n -> s" << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]$contents >> "
      } ++
      (if (withContent) contentNums.zipWithIndex.map { case (n, i) =>
        val cs = s"BT /F1 12 Tf 72 720 Td (Page ${i + 1}) Tj ET"
        n -> s" << /Length ${cs.length} >> stream\n$cs\nendstream "
      } else Nil)
    serialize(objs, 1, xrefStream)
  }

  /** J5: N-way merge in caller order — objects of each source renumbered
    * by an offset, page kids concatenated under one new /Pages. */
  def merge(docs: Seq[Array[Byte]], password: String = ""): Array[Byte] = {
    var offset = 2 // 1 = new catalog, 2 = new pages root
    var anyXrefStream = false // any 1.5+ source keeps the output 1.5+
    val outObjs = Seq.newBuilder[(Int, String)]
    val allPageRefs = Seq.newBuilder[Int]
    docs.foreach { bytes =>
      val d = parse(bytes, password)
      anyXrefStream ||= d.usedXrefStream
      val shift = offset
      d.objects.foreach { case (n, body) =>
        if (n != d.catalogNum && n != d.pagesNum) {
          val shifted = refRe.replaceAllIn(body,
            m => s"${m.group(1).toInt + shift} 0 R")
          // old Pages parent now dangles → point pages at the new root
          val fixed = shifted.replaceAll(s"/Parent\\s+${d.pagesNum + shift}\\s+0\\s+R", "/Parent 2 0 R")
          outObjs += ((n + shift, fixed))
        }
      }
      allPageRefs ++= d.pageNums.map(_ + shift)
      offset += d.objects.keys.max
    }
    val pages = allPageRefs.result()
    val head = Seq(
      1 -> " << /Type /Catalog /Pages 2 0 R >> ",
      2 -> s" << /Type /Pages /Kids [${pages.map(n => s"$n 0 R").mkString(" ")}] /Count ${pages.size} >> ")
    serialize(head ++ outObjs.result(), 1, xrefStream = anyXrefStream)
  }

  // ---- page TEXT extraction (S11 → text-family bridge) ---------------

  /** A /ToUnicode CMap ([PDF 32000] 9.10.3; Adobe CMap spec): maps
    * show-string character codes (1–4 bytes, framed by the codespace
    * ranges) to Unicode text (the dst hex is UTF-16BE, so surrogate
    * pairs — one bfchar entry of 4 dst bytes — decode to supplementary
    * code points exactly). `ranges` = (byteLen, lo, hi) codespace
    * extents; `map` keys are (byteLen, code). */
  private[ops] case class ToUnicodeCMap(ranges: Seq[(Int, Long, Long)],
      map: Map[(Int, Long), String]) {
    private val lens: Seq[Int] =
      (ranges.map(_._1) ++ map.keys.map(_._1)).distinct.sorted match {
        case Nil => Seq(2) // Identity-H convention when sections are empty
        case ls => ls
      }
    /** Decode one show string's bytes. Code framing follows the
      * codespace ranges (shortest matching length wins, per the CMap
      * spec's prefix rule); a byte run outside every range falls back
      * to the shortest declared length so the lexer always advances.
      * Returns (text, sawUnmappedCode). */
    def decode(b: Array[Byte]): (String, Boolean) = {
      val sb = new StringBuilder
      var unmapped = false
      var i = 0
      while (i < b.length) {
        def codeAt(l: Int): Long = {
          var v = 0L
          (0 until l).foreach(k => v = (v << 8) | (b(i + k) & 0xFF))
          v
        }
        val len = lens.find { l =>
          i + l <= b.length && {
            val c = codeAt(l)
            ranges.exists { case (rl, lo, hi) => rl == l && c >= lo && c <= hi } ||
              map.contains((l, c))
          }
        }.getOrElse(math.min(lens.head, b.length - i))
        map.get((len, codeAt(len))) match {
          case Some(s) => sb.append(s)
          case None => unmapped = true
        }
        i += len
      }
      (sb.result(), unmapped)
    }
  }

  private val hexTokRe = """<([0-9A-Fa-f \t\r\n]*)>""".r

  /** Parse a /ToUnicode CMap stream's text: every codespacerange,
    * bfchar, and bfrange section (multiple sections are legal and
    * concatenate). bfrange destinations are either a start hex whose
    * LAST UTF-16 code unit increments across the range (the spec's
    * rule — ranges never cross a 256-boundary, so only the low unit
    * moves) or an explicit `[ <dst> ... ]` array, one per code. */
  private[ops] def parseToUnicode(text: String): ToUnicodeCMap = {
    def hv(h: String): Long = java.lang.Long.parseLong(h, 16)
    def hstr(h0: String): String = {
      val h = if (h0.length % 2 == 1) h0 + "0" else h0
      new String(h.grouped(2).map(x => Integer.parseInt(x, 16).toByte).toArray,
        "UTF-16BE")
    }
    def toks(s: String): Seq[String] =
      hexTokRe.findAllMatchIn(s).map(_.group(1).filterNot(_.isWhitespace)).toSeq
    val ranges = Seq.newBuilder[(Int, Long, Long)]
    """(?s)begincodespacerange(.*?)endcodespacerange""".r.findAllMatchIn(text)
      .foreach { m =>
        toks(m.group(1)).grouped(2).foreach {
          case Seq(lo, hi) => ranges += ((lo.length / 2, hv(lo), hv(hi)))
          case _ =>
        }
      }
    val map = Map.newBuilder[(Int, Long), String]
    """(?s)beginbfchar(.*?)endbfchar""".r.findAllMatchIn(text).foreach { m =>
      toks(m.group(1)).grouped(2).foreach {
        case Seq(src, dst) => map += (((src.length / 2, hv(src)), hstr(dst)))
        case _ =>
      }
    }
    """(?s)beginbfrange(.*?)endbfrange""".r.findAllMatchIn(text).foreach { m =>
      // entries are <lo> <hi> then either <dstStart> or [ <d1> <d2> ... ]
      val body = m.group(1)
      val entryRe =
        """<([0-9A-Fa-f \t\r\n]*)>\s*<([0-9A-Fa-f \t\r\n]*)>\s*(<[0-9A-Fa-f \t\r\n]*>|\[[^\]]*\])""".r
      entryRe.findAllMatchIn(body).foreach { e =>
        val loH = e.group(1).filterNot(_.isWhitespace)
        val len = loH.length / 2
        val lo = hv(loH)
        val hi = hv(e.group(2).filterNot(_.isWhitespace))
        val dst = e.group(3)
        if (dst.startsWith("[")) {
          val dsts = toks(dst)
          (lo to math.min(hi, lo + dsts.length - 1)).zip(dsts).foreach {
            case (c, d) => map += (((len, c), hstr(d)))
          }
        } else {
          val base = hstr(dst.stripPrefix("<").stripSuffix(">")
            .filterNot(_.isWhitespace))
          (lo to hi).foreach { c =>
            val delta = (c - lo).toInt
            val out =
              if (base.isEmpty) ""
              else base.dropRight(1) + (base.last + delta).toChar
            map += (((len, c), out))
          }
        }
      }
    }
    ToUnicodeCMap(ranges.result(), map.result())
  }

  /** A CID CMap — the /Encoding-as-STREAM form of a Type0 font
    * ([PDF 32000] 9.7.5.3; Adobe CMap spec §7.3): codespace ranges
    * frame the variable-length character codes, begincidrange /
    * begincidchar sections map codes to CIDs, and `usecmap` names a
    * base CMap unlisted codes fall through to — the form real-world
    * subsetted CJK fonts emit. Extraction semantics (flag-don't-
    * guess): a CID override picks a GLYPH, and the registry tables
    * that would map that CID back to Unicode do not travel with the
    * file, so OVERRIDDEN codes flag; codes that fall through to a
    * predefined UCS-2/UTF-16 base ARE big-endian UTF-16 code units
    * and decode directly (the r18 predefined-name rule, applied
    * per-code). cids entries: (byteLen, lo, hi, cidStart). */
  private[ops] case class CidCMap(ranges: Seq[(Int, Long, Long)],
      cids: Seq[(Int, Long, Long, Long)], base: Option[String]) {
    private val lens: Seq[Int] =
      (ranges.map(_._1) ++ cids.map(_._1)).distinct.sorted match {
        case Nil => Seq(2) // 2-byte convention when sections are empty
        case ls => ls
      }
    /** Does the embedded table override this (len, code)? */
    def covers(len: Int, code: Long): Boolean =
      cids.exists { case (l, lo, hi, _) => l == len && code >= lo && code <= hi }
    /** Frame a show string into (len, code) tokens by the codespace
      * ranges — the same shortest-match prefix rule as
      * [[ToUnicodeCMap.decode]], with the cid sections also accepted
      * as framing evidence and the shortest declared length as the
      * always-advance fallback. */
    def tokenize(b: Array[Byte]): Seq[(Int, Long)] = {
      val out = Seq.newBuilder[(Int, Long)]
      var i = 0
      while (i < b.length) {
        def codeAt(l: Int): Long = {
          var v = 0L
          (0 until l).foreach(k => v = (v << 8) | (b(i + k) & 0xFF))
          v
        }
        val len = lens.find { l =>
          i + l <= b.length && {
            val c = codeAt(l)
            ranges.exists { case (rl, lo, hi) => rl == l && c >= lo && c <= hi } ||
              cids.exists { case (cl, lo, hi, _) => cl == l && c >= lo && c <= hi }
          }
        }.getOrElse(math.min(lens.head, b.length - i))
        out += ((len, codeAt(len)))
        i += len
      }
      out.result()
    }
  }

  /** Parse a CID CMap stream's text: codespacerange sections (same
    * grammar as /ToUnicode), cidrange entries `<lo> <hi> N`, cidchar
    * entries `<code> N` (N a PLAIN integer, not hex — the one
    * grammatical difference from the bf* sections), and the
    * `/Name usecmap` base reference. */
  private[ops] def parseCidCMap(text: String): CidCMap = {
    def hv(h: String): Long = java.lang.Long.parseLong(h, 16)
    val ranges = Seq.newBuilder[(Int, Long, Long)]
    """(?s)begincodespacerange(.*?)endcodespacerange""".r.findAllMatchIn(text)
      .foreach { m =>
        hexTokRe.findAllMatchIn(m.group(1))
          .map(_.group(1).filterNot(_.isWhitespace)).grouped(2).foreach {
            case Seq(lo, hi) => ranges += ((lo.length / 2, hv(lo), hv(hi)))
            case _ =>
          }
      }
    val cids = Seq.newBuilder[(Int, Long, Long, Long)]
    """(?s)begincidrange(.*?)endcidrange""".r.findAllMatchIn(text).foreach { m =>
      """<([0-9A-Fa-f \t\r\n]*)>\s*<([0-9A-Fa-f \t\r\n]*)>\s*(\d+)""".r
        .findAllMatchIn(m.group(1)).foreach { e =>
          val loH = e.group(1).filterNot(_.isWhitespace)
          cids += ((loH.length / 2, hv(loH),
            hv(e.group(2).filterNot(_.isWhitespace)), e.group(3).toLong))
        }
    }
    """(?s)begincidchar(.*?)endcidchar""".r.findAllMatchIn(text).foreach { m =>
      """<([0-9A-Fa-f \t\r\n]*)>\s*(\d+)""".r
        .findAllMatchIn(m.group(1)).foreach { e =>
          val h = e.group(1).filterNot(_.isWhitespace)
          cids += ((h.length / 2, hv(h), hv(h), e.group(2).toLong))
        }
    }
    val base = """/([A-Za-z0-9\-]+)\s+usecmap""".r
      .findFirstMatchIn(text).map(_.group(1))
    CidCMap(ranges.result(), cids.result(), base)
  }

  /** Adobe Glyph List subset: the names real Type1/TrueType
    * /Differences arrays use. Single-letter names are themselves,
    * digits and punctuation by name, the common Latin-1 accents and
    * typographic marks, plus the fully generic `uniXXXX` / `uXXXX(XX)`
    * forms (any Unicode scalar by hex). An unknown name decodes to
    * None — the caller FLAGS the page rather than guessing. */
  private val glyphNames: Map[String, String] = {
    val digits = Seq("zero", "one", "two", "three", "four", "five", "six",
      "seven", "eight", "nine").zipWithIndex.map { case (n, i) => n -> i.toString }
    val punct = Map(
      "space" -> " ", "exclam" -> "!", "quotedbl" -> "\"", "numbersign" -> "#",
      "dollar" -> "$", "percent" -> "%", "ampersand" -> "&", "quotesingle" -> "'",
      "parenleft" -> "(", "parenright" -> ")", "asterisk" -> "*", "plus" -> "+",
      "comma" -> ",", "hyphen" -> "-", "period" -> ".", "slash" -> "/",
      "colon" -> ":", "semicolon" -> ";", "less" -> "<", "equal" -> "=",
      "greater" -> ">", "question" -> "?", "at" -> "@", "bracketleft" -> "[",
      "backslash" -> "\\", "bracketright" -> "]", "asciicircum" -> "^",
      "underscore" -> "_", "grave" -> "`", "braceleft" -> "{", "bar" -> "|",
      "braceright" -> "}", "asciitilde" -> "~",
      "quoteleft" -> "‘", "quoteright" -> "’", "quotedblleft" -> "“",
      "quotedblright" -> "”", "endash" -> "–", "emdash" -> "—",
      "bullet" -> "•", "ellipsis" -> "…", "dagger" -> "†", "daggerdbl" -> "‡",
      "Euro" -> "€", "sterling" -> "£", "yen" -> "¥", "cent" -> "¢",
      "degree" -> "°", "copyright" -> "©", "registered" -> "®",
      "trademark" -> "™", "section" -> "§", "paragraph" -> "¶",
      "eacute" -> "é", "egrave" -> "è", "ecircumflex" -> "ê", "edieresis" -> "ë",
      "agrave" -> "à", "aacute" -> "á", "acircumflex" -> "â", "adieresis" -> "ä",
      "aring" -> "å", "atilde" -> "ã", "ccedilla" -> "ç", "ntilde" -> "ñ",
      "oacute" -> "ó", "ograve" -> "ò", "ocircumflex" -> "ô", "odieresis" -> "ö",
      "otilde" -> "õ", "oslash" -> "ø", "uacute" -> "ú", "ugrave" -> "ù",
      "ucircumflex" -> "û", "udieresis" -> "ü", "iacute" -> "í", "igrave" -> "ì",
      "icircumflex" -> "î", "idieresis" -> "ï", "yacute" -> "ý", "ydieresis" -> "ÿ",
      "germandbls" -> "ß", "ae" -> "æ", "oe" -> "œ", "AE" -> "Æ", "OE" -> "Œ",
      "Eacute" -> "É", "Egrave" -> "È", "Agrave" -> "À", "Aacute" -> "Á",
      "Ccedilla" -> "Ç", "Ntilde" -> "Ñ", "Odieresis" -> "Ö", "Udieresis" -> "Ü",
      "Adieresis" -> "Ä", "exclamdown" -> "¡", "questiondown" -> "¿",
      "guillemotleft" -> "«", "guillemotright" -> "»", "florin" -> "ƒ",
      "dotlessi" -> "ı", "fi" -> "ﬁ", "fl" -> "ﬂ", "minus" -> "−",
      "multiply" -> "×", "divide" -> "÷", "plusminus" -> "±", "mu" -> "µ",
      "middot" -> "·", "periodcentered" -> "·", "nbspace" -> " ")
    val letters = (('a' to 'z') ++ ('A' to 'Z')).map(c => c.toString -> c.toString)
    (digits ++ letters).toMap ++ punct
  }

  private val uniNameRe = """^uni((?:[0-9A-Fa-f]{4})+)$""".r
  private val uNameRe = """^u([0-9A-Fa-f]{4,6})$""".r

  /** Glyph name → text ([AGL]): the table above, then the generic
    * hex forms; None = unknown (the page flags). */
  private[ops] def glyphText(name: String): Option[String] =
    glyphNames.get(name).orElse(name match {
      case uniNameRe(hex) => // one or more UTF-16 code units
        Some(new String(hex.grouped(4)
          .map(h => Integer.parseInt(h, 16).toChar).toArray))
      case uNameRe(hex) =>
        try Some(new String(Character.toChars(Integer.parseInt(hex, 16))))
        catch { case _: IllegalArgumentException => None }
      case _ => None
    })

  /** One page-resource font as extraction sees it: composite (Type0)
    * or simple, plus its parsed /ToUnicode CMap when present and any
    * /Encoding /Differences overrides. Decode preference: CMap if
    * present (either font class — the spec's extraction order), then
    * Differences overrides atop WinAnsi for simple fonts, and
    * flagged-unmapped for Type0 without a CMap (Identity-H show
    * strings are font-program glyph indices no byte table can map —
    * emitting WinAnsi there would be silent garbage, the r16
    * verdict's exact complaint). `diffs` values: Some(text) = a
    * known glyph name, None = an unknown name (flag, don't guess).
    * Type3 fonts (glyphs are arbitrary content-stream drawings,
    * [PDF 32000] 9.6.5) have NO implicit base encoding: codes their
    * /Differences does not name flag instead of falling back to
    * WinAnsi — a Type3 byte means whatever its CharProc draws, so a
    * byte-table guess would be silent garbage of the Identity-H
    * kind. */
  private[ops] case class PdfFont(isType0: Boolean, cmap: Option[ToUnicodeCMap],
      diffs: Map[Int, Option[String]] = Map.empty, ucs2: Boolean = false,
      isType3: Boolean = false, encCmap: Option[CidCMap] = None)

  /** Type0 /Encoding names whose CODE SPACE IS UCS-2/UTF-16 itself:
    * the predefined Uni{KS,JIS,GB,CNS}-{UCS2,UTF16}-{H,V} CMaps
    * (Adobe CMap resources for the four CJK registries — the form
    * Korean/Japanese/Chinese writers emit when they don't subset;
    * reference context: a Korean SaaS document lake). Their code→CID
    * tables ship with viewers, but extraction never needs them: the
    * show-string bytes are big-endian UTF-16 code units by
    * construction, so text decodes directly. -V variants share the
    * -H code mapping (vertical is a LAYOUT difference; logical
    * character order — what extraction emits — is identical).
    * Identity-H/V stays OUTSIDE this set: its codes are font-program
    * glyph indices, mappable only through /ToUnicode. */
  private val ucs2EncodingRe =
    ("Uni(?:KS|JIS|GB|CNS)-(?:UCS2|UTF16)-[HV]").r

  /** Big-endian UTF-16 decode with explicit surrogate validation: a
    * lone/mispaired surrogate or an odd trailing byte flags the page
    * (second member of the pair) instead of silently emitting
    * replacement characters. */
  private[ops] def decodeUtf16be(b: Array[Byte]): (String, Boolean) = {
    val sb = new StringBuilder
    var un = false
    var i = 0
    while (i + 1 < b.length) {
      val c = (((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)).toChar
      if (Character.isHighSurrogate(c) && i + 3 < b.length) {
        val d = (((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)).toChar
        if (Character.isLowSurrogate(d)) { sb.append(c).append(d); i += 4 }
        else { un = true; i += 2 }
      } else if (Character.isSurrogate(c)) { un = true; i += 2 }
      else { sb.append(c); i += 2 }
    }
    if (b.length % 2 != 0) un = true
    (sb.result(), un)
  }

  /** Parse an /Encoding dictionary's /Differences array ([PDF 32000]
    * 9.6.5.1): integers set the next code, names assign consecutive
    * codes. */
  private[ops] def parseDifferences(enc: String): Map[Int, Option[String]] = {
    val start = enc.indexOf("/Differences")
    if (start < 0) return Map.empty
    val open = enc.indexOf('[', start)
    if (open < 0) return Map.empty
    val close = enc.indexOf(']', open)
    val body = enc.substring(open + 1, if (close < 0) enc.length else close)
    val tok = """(\d+)|/([^\s/<>\[\]()]+)""".r
    var code = 0
    val out = Map.newBuilder[Int, Option[String]]
    tok.findAllMatchIn(body).foreach { m =>
      if (m.group(1) != null) code = m.group(1).toInt
      else {
        out += ((code, glyphText(m.group(2))))
        code += 1
      }
    }
    out.result()
  }

  /** Extract a balanced `<< ... >>` dictionary starting at `start`
    * (which must point at the opening `<<`); returns the dict text
    * including delimiters. */
  private def balancedDict(s: String, start: Int): String = {
    var depth = 0
    var i = start
    while (i < s.length) {
      if (s.startsWith("<<", i)) { depth += 1; i += 2 }
      else if (s.startsWith(">>", i)) {
        depth -= 1; i += 2
        if (depth == 0) return s.substring(start, i)
      }
      else i += 1
    }
    s.substring(start)
  }

  private val anyRefRe = """(\d+)\s+\d+\s+R""".r

  /** Resolve dict key `key` in `body` to its dictionary text: either
    * an inline `<< ... >>` or an indirect `N G R` dereferenced through
    * the object table. */
  private def resolveDictValue(objects: collection.Map[Int, String],
      body: String, key: String): Option[String] = {
    val m = ("/" + key + """(?![A-Za-z0-9])""").r.findFirstMatchIn(body)
    m.flatMap { mm =>
      var i = mm.end
      while (i < body.length && body.charAt(i).isWhitespace) i += 1
      if (body.startsWith("<<", i)) Some(balancedDict(body, i))
      else anyRefRe.findPrefixMatchOf(body.substring(i, math.min(body.length, i + 32)))
        .flatMap(r => objects.get(r.group(1).toInt))
    }
  }

  /** Resource-name → font map for one page: /Resources (inline or
    * indirect) → /Font → one [[PdfFont]] per `/Fn N G R` entry. A page
    * WITHOUT its own /Resources inherits the /Pages tree node's
    * ([PDF 32000] 7.7.3.4 — many writers hoist shared resources to the
    * parent; without the fallback their fonts would silently not
    * resolve and Type0 text would decode as WinAnsi garbage). Pages
    * with neither extract with the WinAnsi default. */
  private def pageFonts(objects: collection.Map[Int, String],
      pageBody: String, parentBody: Option[String] = None): Map[String, PdfFont] = {
    val fontDict = resolveDictValue(objects, pageBody, "Resources")
      .orElse(parentBody.flatMap(resolveDictValue(objects, _, "Resources")))
      .flatMap(res => resolveDictValue(objects, res, "Font"))
    fontDict.toSeq.flatMap { fd =>
      // entries: /Name N G R (inline font dicts stay out of subset)
      """/([^\s/<>\[\]()]+)\s+(\d+)\s+\d+\s+R""".r.findAllMatchIn(fd).flatMap { m =>
        objects.get(m.group(2).toInt).map { fb =>
          val isType0 = """/Subtype\s*/Type0""".r.findFirstIn(fb).isDefined
          val cmap = """/ToUnicode\s+(\d+)\s+\d+\s+R""".r.findFirstMatchIn(fb)
            .flatMap(r => objects.get(r.group(1).toInt))
            .flatMap(streamData)
            .map(b => parseToUnicode(new String(b, "ISO-8859-1")))
          // simple-font /Encoding dict (inline or indirect) may carry
          // a /Differences override table atop the base encoding
          val diffs =
            if (isType0) Map.empty[Int, Option[String]]
            else resolveDictValue(objects, fb, "Encoding")
              .map(parseDifferences).getOrElse(Map.empty)
          // Type0 /Encoding as a NAME selects a predefined CMap; the
          // UCS2/UTF16 family decodes without any table (see
          // ucs2EncodingRe). /ToUnicode still wins when present.
          val ucs2 = isType0 &&
            ("/Encoding\\s*/([A-Za-z0-9\\-]+)").r.findFirstMatchIn(fb)
              .exists(e => ucs2EncodingRe.pattern.matcher(e.group(1)).matches())
          val isType3 = ("/Subtype\\s*/Type3").r.findFirstIn(fb).isDefined
          // Type0 /Encoding as an indirect STREAM is an embedded CID
          // CMap (subsetted CJK fonts) — parsed for codespace framing,
          // override flagging, and the usecmap fall-through base.
          val encCmap =
            if (isType0)
              """/Encoding\s+(\d+)\s+\d+\s+R""".r.findFirstMatchIn(fb)
                .flatMap(r => objects.get(r.group(1).toInt))
                .flatMap(streamData)
                .map(b => parseCidCMap(new String(b, "ISO-8859-1")))
            else None
          m.group(1) -> PdfFont(isType0, cmap, diffs, ucs2, isType3, encCmap)
        }
      }
    }.toMap
  }

  /** WinAnsiEncoding byte→text table (cp1252; [PDF 32000] Annex D):
    * printable ASCII identity, 0x80–0x9F Windows specials, 0xA0–0xFF
    * Latin-1 identity — a superset match for StandardEncoding's
    * printable ASCII range, which is why one table serves both simple
    * western fonts. Undefined slots (0x81 0x8D 0x8F 0x90 0x9D, DEL)
    * and non-whitespace control bytes map to "" (dropped). */
  private val winAnsi: Array[String] = {
    val t = Array.fill(256)("")
    t('\t') = "\t"; t('\n') = "\n"; t('\r') = "\r"
    (0x20 to 0x7E).foreach(b => t(b) = b.toChar.toString)
    val hi = "€ ‚ƒ„…†‡ˆ‰" +
      "Š‹Œ Ž  ‘’“”" +
      "•–—˜™š›œ žŸ"
    hi.zipWithIndex.foreach { case (c, i) =>
      if (c != ' ') t(0x80 + i) = c.toString
    }
    (0xA0 to 0xFF).foreach(b => t(b) = b.toChar.toString)
    t
  }

  /** Decode one content-stream string token's bytes through WinAnsi. */
  private def decodeStr(bytes: Array[Byte]): String = {
    val sb = new StringBuilder
    bytes.foreach(b => sb.append(winAnsi(b & 0xFF)))
    sb.result()
  }

  /** Render a page's (concatenated, already-inflated) content streams
    * to plain text: a sequential lexer over the operator stream that
    * interprets the TEXT subset — BT/ET objects; Tj / ' / " / TJ show
    * operators; Td / TD / `T*` / Tm positioning (each starts a new line when
    * the current line already carries glyphs — leading positioning
    * never emits blank lines); literal strings with the full escape
    * set (\n \r \t \b \f \( \) \\ , 1–3-digit octal, backslash-EOL
    * continuation) and hex strings. TJ numeric kern adjustments of
    * ≤ -180 thousandths of an em render as one space (the word-gap
    * convention pdftotext-family extractors use). Inline images
    * (BI…ID…EI) are skipped; graphics operators are ignored.
    *
    * Composite (Type0/CID) fonts decode through their /ToUnicode CMap
    * ([[parseToUnicode]]) when `fonts` carries one for the resource
    * name the `Tf` operator selects — 2-byte Identity-H show strings
    * (hex or literal) map code by code, surrogate pairs included.
    * Simple fonts with a CMap also use it; without one they fall back
    * to WinAnsi. REMAINING CUT-LINE: a Type0 font with NO usable
    * /ToUnicode (show strings are font-program glyph indices no byte
    * table can map) emits nothing and FLAGS the page
    * (`unmapped glyphs` warning) instead of silently extracting
    * WinAnsi garbage — the r16 verdict's exact complaint. */
  private[ops] def renderContent(cs: String): String =
    renderContentEx(cs, Map.empty)._1

  /** Font-aware render: (text, sawUnmappedGlyphs). */
  private[ops] def renderContentEx(cs: String,
      fonts: Map[String, PdfFont]): (String, Boolean) = {
    val out = new StringBuilder
    var lineHasText = false
    var curFont: Option[PdfFont] = None
    var unmappedAny = false
    def decodeTok(b: Array[Byte]): String = curFont match {
      case Some(f) => f.cmap match {
        case Some(cm) =>
          val (s, un) = cm.decode(b)
          if (un) unmappedAny = true
          s
        case None if f.isType0 && f.ucs2 =>
          // predefined UCS-2/UTF-16 CMap: the bytes ARE the text
          val (s, un) = decodeUtf16be(b)
          if (un) unmappedAny = true
          s
        case None if f.isType0 && f.encCmap.isDefined =>
          // embedded CID CMap: frame codes by its codespace; codes the
          // cid sections OVERRIDE flag (the CID→Unicode registry
          // tables aren't in the file — don't guess); fall-through
          // codes decode as UTF-16BE when the usecmap base is a
          // predefined UCS-2/UTF-16 CMap, else flag too (an Identity
          // or absent base means glyph indices). Consecutive
          // fall-through codes decode as ONE byte run so surrogate
          // pairs spanning two 2-byte codes still pair.
          val cm = f.encCmap.get
          val baseUcs2 = cm.base
            .exists(n => ucs2EncodingRe.pattern.matcher(n).matches())
          val sb = new StringBuilder
          val pend = new java.io.ByteArrayOutputStream
          def flush(): Unit = if (pend.size > 0) {
            val (s, un) = decodeUtf16be(pend.toByteArray)
            if (un) unmappedAny = true
            sb.append(s)
            pend.reset()
          }
          cm.tokenize(b).foreach { case (len, code) =>
            if (!baseUcs2 || cm.covers(len, code)) {
              flush(); unmappedAny = true
            } else
              (len - 1 to 0 by -1).foreach(k =>
                pend.write(((code >> (8 * k)) & 0xFF).toInt))
          }
          flush()
          sb.result()
        case None if f.isType0 => // glyph indices, unmappable: flag, emit nothing
          if (b.nonEmpty) unmappedAny = true
          ""
        case None if f.diffs.nonEmpty || f.isType3 =>
          // /Differences overrides per byte; unlisted codes fall back
          // to the WinAnsi base — EXCEPT for Type3 fonts, which have
          // no base encoding (flag instead: the glyph is whatever its
          // CharProc draws); an unknown glyph NAME flags the page
          val sb = new StringBuilder
          b.foreach { byte =>
            f.diffs.get(byte & 0xFF) match {
              case Some(Some(s)) => sb.append(s)
              case Some(None) => unmappedAny = true
              case None if f.isType3 => unmappedAny = true
              case None => sb.append(winAnsi(byte & 0xFF))
            }
          }
          sb.result()
        case None => decodeStr(b)
      }
      case None => decodeStr(b)
    }
    def newline(): Unit = if (lineHasText) { out.append('\n'); lineHasText = false }
    def show(s: String): Unit = if (s.nonEmpty) { out.append(s); lineHasText = true }
    // operand stack: Array[Byte] (string token), java.lang.Double,
    // Vector[Any] (array), NameTok (so Tf can read its font operand),
    // or the sentinel '[' marker
    val ops = mutable.ArrayBuffer.empty[Any]
    object Mark
    case class NameTok(name: String)
    var i = 0
    val n = cs.length
    def parseLiteral(): Array[Byte] = {
      val buf = new java.io.ByteArrayOutputStream()
      var depth = 1
      while (i < n && depth > 0) {
        cs.charAt(i) match {
          case '\\' if i + 1 < n =>
            i += 1
            cs.charAt(i) match {
              case 'n' => buf.write('\n'); i += 1
              case 'r' => buf.write('\r'); i += 1
              case 't' => buf.write('\t'); i += 1
              case 'b' => buf.write('\b'); i += 1
              case 'f' => buf.write('\f'); i += 1
              case '\r' => i += 1; if (i < n && cs.charAt(i) == '\n') i += 1 // line continuation
              case '\n' => i += 1
              case d if d >= '0' && d <= '7' =>
                var v = 0; var k = 0
                while (k < 3 && i < n && cs.charAt(i) >= '0' && cs.charAt(i) <= '7') {
                  v = v * 8 + (cs.charAt(i) - '0'); i += 1; k += 1
                }
                buf.write(v & 0xFF)
              case c => buf.write(c); i += 1 // \( \) \\ and unknown: literal
            }
          case '(' => depth += 1; buf.write('('); i += 1
          case ')' =>
            depth -= 1; if (depth > 0) buf.write(')'); i += 1
          case c => buf.write(c); i += 1
        }
      }
      buf.toByteArray
    }
    def parseHex(): Array[Byte] = {
      val hex = new StringBuilder
      while (i < n && cs.charAt(i) != '>') {
        val c = cs.charAt(i)
        if (Character.digit(c, 16) >= 0) hex.append(c)
        i += 1
      }
      if (i < n) i += 1 // '>'
      if (hex.length % 2 == 1) hex.append('0') // [PDF 32000] 7.3.4.3
      hex.result().grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray
    }
    while (i < n) {
      val c = cs.charAt(i)
      if (c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == '\f' || c == 0) i += 1
      else if (c == '%') { while (i < n && cs.charAt(i) != '\n' && cs.charAt(i) != '\r') i += 1 }
      else if (c == '(') { i += 1; ops += parseLiteral() }
      else if (c == '<' && i + 1 < n && cs.charAt(i + 1) == '<') {
        // dictionary (BDC properties etc.): skip balanced << >>
        var depth = 0
        var done = false
        while (i < n && !done) {
          if (cs.startsWith("<<", i)) { depth += 1; i += 2 }
          else if (cs.startsWith(">>", i)) { depth -= 1; i += 2; done = depth == 0 }
          else i += 1
        }
      }
      else if (c == '<') { i += 1; ops += parseHex() }
      else if (c == '[') { ops += Mark; i += 1 }
      else if (c == ']') {
        val arr = Vector.newBuilder[Any]
        val tail = mutable.Stack.empty[Any]
        while (ops.nonEmpty && (ops.last match { case Mark => false; case _ => true }))
          tail.push(ops.remove(ops.length - 1))
        if (ops.nonEmpty) ops.remove(ops.length - 1) // the Mark
        tail.foreach(arr += _)
        ops += arr.result()
        i += 1
      }
      else if (c == '/') {
        i += 1
        val start = i
        while (i < n && !" \t\r\n\f()<>[]{}/%".contains(cs.charAt(i))) i += 1
        // names carry no text, but Tf needs its font-resource operand
        ops += NameTok(cs.substring(start, i))
      }
      else if (c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9')) {
        val start = i
        i += 1
        while (i < n && (cs.charAt(i) == '.' || (cs.charAt(i) >= '0' && cs.charAt(i) <= '9'))) i += 1
        // malformed numerics ("1.2.3", a bare "-"/"."): drop, never throw
        cs.substring(start, i).toDoubleOption
          .foreach(d => ops += java.lang.Double.valueOf(d))
      }
      else {
        val start = i
        while (i < n && !" \t\r\n\f()<>[]{}/%".contains(cs.charAt(i))) i += 1
        if (i == start) i += 1 // stray delimiter ({ } unpaired ')'): skip, never stall
        val op = cs.substring(start, i)
        op match {
          case "Tj" => ops.lastOption.collect { case b: Array[Byte] => show(decodeTok(b)) }
          case "'" | "\"" =>
            newline()
            ops.lastOption.collect { case b: Array[Byte] => show(decodeTok(b)) }
          case "TJ" => ops.lastOption.collect { case arr: Vector[_] =>
            arr.foreach {
              case b: Array[Byte] => show(decodeTok(b))
              case d: java.lang.Double => if (d <= -180.0 && lineHasText) out.append(' ')
              case _ =>
            }
          }
          case "Tf" => // /Fn size Tf — select the page-resource font
            ops.collect { case nt: NameTok => nt }.lastOption
              .foreach(nt => curFont = fonts.get(nt.name))
          case "Td" | "TD" | "T*" | "Tm" | "BT" => newline()
          case "BI" =>
            // Inline image: binary payload after ID routinely contains
            // the byte pair "EI", so a raw substring search resumes
            // mid-image and emits garbage operators. Per the spec's
            // token rules, scan for an EI *token*: preceded by
            // whitespace and followed by whitespace/delimiter/EOF.
            val id = cs.indexOf("ID", i)
            var j = if (id >= 0) id + 3 else i // ID + one whitespace byte
            var ei = -1
            while (ei < 0 && j >= 0) {
              j = cs.indexOf("EI", j)
              if (j < 0) ()
              else if (j > 0 && cs.charAt(j - 1).isWhitespace &&
                  (j + 2 >= n || cs.charAt(j + 2).isWhitespace ||
                    "()<>[]{}/%".contains(cs.charAt(j + 2)))) ei = j
              else j += 2
            }
            i = if (ei >= 0) ei + 2 else n
          case _ =>
        }
        if (op != "[" && op != "]") ops.clear()
      }
    }
    (out.result(), unmappedAny)
  }

  // Any generation number: the parser keys objects by number only, and
  // a `/Contents 12 1 R` page (regenerated incremental-save objects)
  // must still resolve — the gen-0-only form silently extracted "".
  private val contentsRe = """(?s)/Contents\s*(\[[^\]]*\]|\d+\s+\d+\s+R)""".r

  /** /Filter value as an ordered name list: `[ /A /B ]` array form
    * takes every name inside the brackets; the single-name form takes
    * exactly ONE name (a greedy multi-name match would swallow the
    * following dict key — `/Filter /FlateDecode /Length 9` is one
    * filter, not two). */
  private[ops] def parseFilters(dict: String): Seq[String] = {
    val m = """/Filter(?![A-Za-z0-9])""".r.findFirstMatchIn(dict)
    m.toSeq.flatMap { mm =>
      var i = mm.end
      while (i < dict.length && dict.charAt(i).isWhitespace) i += 1
      if (i < dict.length && dict.charAt(i) == '[') {
        val end = dict.indexOf(']', i)
        val inner = dict.substring(i + 1, if (end < 0) dict.length else end)
        """/([A-Za-z0-9]+)""".r.findAllMatchIn(inner).map(_.group(1)).toSeq
      } else
        """^/([A-Za-z0-9]+)""".r.findFirstMatchIn(dict.substring(i))
          .map(_.group(1)).toSeq
    }
  }

  /** /DecodeParms value as a per-filter list: a bare dict applies to
    * the single filter; the array form pairs entry i with filter i
    * (`null` = no parms). Indirect-reference parms stay out of the
    * documented subset (None). */
  private def parseParmsList(dict: String): Seq[Option[String]] = {
    val m = """/(?:DecodeParms|DP)(?![A-Za-z])""".r.findFirstMatchIn(dict)
    m.toSeq.flatMap { mm =>
      var i = mm.end
      while (i < dict.length && dict.charAt(i).isWhitespace) i += 1
      if (dict.startsWith("<<", i)) Seq(Some(balancedDict(dict, i)))
      else if (i < dict.length && dict.charAt(i) == '[') {
        val out = Seq.newBuilder[Option[String]]
        var j = i + 1
        var done = false
        while (j < dict.length && !done) {
          if (dict.charAt(j) == ']') done = true
          else if (dict.startsWith("<<", j)) {
            val d = balancedDict(dict, j)
            out += Some(d)
            j += d.length - 1
          } else if (dict.startsWith("null", j)) { out += None; j += 3 }
          j += 1
        }
        out.result()
      } else Nil
    }
  }

  /** Decode one object's stream payload: /Length-framed (falling back
    * to the endstream token), then the declared /Filter CHAIN applied
    * in order — FlateDecode and LZWDecode (with their /DecodeParms
    * predictors and /EarlyChange), ASCIIHexDecode, ASCII85Decode,
    * RunLengthDecode. A filter outside that set (DCT/JPX/JBIG2 image
    * codecs, CCITTFax, Crypt) raises a defined error instead of
    * best-effort lexing undecoded bytes as operators — the caller's
    * catch turns it into that file's error row. */
  private def streamData(body: String): Option[Array[Byte]] =
    rawStream(body).map { case (dict, raw) =>
      applyFilterChain(raw, parseFilters(dict), parseParmsList(dict))
    }

  /** /Length-framed raw stream payload (endstream-token fallback)
    * with its dictionary — no filters applied. */
  private def rawStream(body: String): Option[(String, Array[Byte])] =
    streamTokenRe.findFirstMatchIn(body).map { m =>
      val dict = body.substring(0, m.start)
      val dataStart = m.end
      val end = dictInt(dict, "/Length") match {
        case Some(len) if dataStart + len <= body.length => dataStart + len
        case _ => body.lastIndexOf("endstream") match {
          case -1 => body.length
          case e => e
        }
      }
      (dict, body.substring(dataStart, end).getBytes("ISO-8859-1"))
    }

  /** Apply a declared /Filter chain in order (the [[streamData]]
    * transport set); an unknown filter raises the defined error. */
  private def applyFilterChain(raw: Array[Byte], filters: Seq[String],
      parms: Seq[Option[String]]): Array[Byte] =
    filters.zipWithIndex.foldLeft(raw) { case (d, (f, idx)) =>
      val p = parms.lift(idx).flatten
      def pi(key: String, dflt: Int) = p.flatMap(dictInt(_, key)).getOrElse(dflt)
      def unp(x: Array[Byte]) = unpredict(x, pi("/Predictor", 1),
        pi("/Columns", 1), pi("/Colors", 1), pi("/BitsPerComponent", 8))
      f match {
        case "FlateDecode" => unp(inflate(d))
        case "LZWDecode" => unp(lzwDecode(d, pi("/EarlyChange", 1)))
        case "ASCIIHexDecode" => asciiHexDecode(d)
        case "ASCII85Decode" => ascii85Decode(d)
        case "RunLengthDecode" => runLengthDecode(d)
        case other => throw new IllegalArgumentException(
          s"unsupported stream filter /$other")
      }
    }

  /** Extract page text: one (1-based page, text) row per page, in page
    * order. Multiple /Contents streams concatenate with a newline (the
    * spec's "treat as one stream with whitespace between" rule, 7.8.2);
    * a page with no /Contents yields "". Encrypted documents decrypt
    * first (parse()), so extraction always sees plaintext operators.
    * Subset + cut-line: [[renderContentEx]]. */
  def extractText(bytes: Array[Byte], password: String = ""): Seq[(Int, String)] =
    extractTextPages(bytes, password).map { case (p, t, _) => (p, t) }

  /** Like [[extractText]] plus a per-page `warn` column: "" for clean
    * pages, `"unmapped glyphs"` when any show string hit a code with
    * no Unicode mapping (a Type0 font without /ToUnicode, or CMap
    * holes) — the documented-garbage flag a 100 TB document lake needs
    * to quarantine instead of silently ingesting wrong text. */
  def extractTextPages(bytes: Array[Byte], password: String = "")
      : Seq[(Int, String, String)] = {
    val d = parse(bytes, password)
    d.pageNums.zipWithIndex.map { case (pn, idx) =>
      val body = d.objects.get(pn)
      val refs = body.toSeq.flatMap { b =>
        contentsRe.findFirstMatchIn(b).toSeq
          .flatMap(m => anyRefRe.findAllMatchIn(m.group(1)).map(_.group(1).toInt))
      }
      val fonts = body.map(pageFonts(d.objects, _, d.objects.get(d.pagesNum)))
        .getOrElse(Map.empty)
      val cs = refs.flatMap(r => d.objects.get(r).flatMap(streamData))
        .map(b => new String(b, "ISO-8859-1")).mkString("\n")
      val (text, unmapped) = renderContentEx(cs, fonts)
      (idx + 1, text, if (unmapped) "unmapped glyphs" else "")
    }
  }

  /** Image codecs a /Filter chain may END with: the payload after the
    * transport filters IS the image container (or an unsupported
    * codec we degrade on), never operator text. */
  private val imageCodecFilters =
    Set("DCTDecode", "JPXDecode", "JBIG2Decode", "CCITTFaxDecode")

  /** Image XObjects per page — the document lake's figures, bridged
    * to the multimodal pipeline (beyond the reference's text-only PDF
    * surface; the brief's multimodal-columns mandate). One row per
    * /Subtype /Image resource, in resource-dictionary order:
    * (page, img_idx, xobject name, fmt, width, height, content, warn).
    *
    * - /DCTDecode payloads ARE JPEG bytes → pass-through (fmt
    *   "jpeg"); transport armor ahead of the codec (hex/a85/flate)
    *   decodes first.
    * - /FlateDecode (or unfiltered) 8-bit /DeviceRGB / /DeviceGray
    *   samples re-encode losslessly as PNG via
    *   [[graft.llm.Multimodal.pngFromSamples]] (fmt "png"), so the
    *   existing decode / aHash / pHash / near-dup machinery consumes
    *   them directly.
    * - Anything else (JPX/JBIG2/CCITT codecs; Indexed/ICC/CMYK
    *   colorspaces; 1/4/16-bit depths) degrades to a defined warn
    *   row with empty content — flag, don't guess, never throw.
    *
    * Driver-side per document like all COS surgery; the distributed
    * shape maps this over a binaryFile scan
    * ([[PdfText.extractImagesDf]]). */
  def extractImages(bytes: Array[Byte], password: String = "")
      : Seq[(Int, Int, String, String, Int, Int, Array[Byte], String)] = {
    val d = parse(bytes, password)
    val parentBody = d.objects.get(d.pagesNum)
    d.pageNums.zipWithIndex.flatMap { case (pn, pidx) =>
      val xdict = d.objects.get(pn).flatMap { b =>
        resolveDictValue(d.objects, b, "Resources")
          .orElse(parentBody.flatMap(resolveDictValue(d.objects, _, "Resources")))
          .flatMap(res => resolveDictValue(d.objects, res, "XObject"))
      }
      val imgs = xdict.toSeq.flatMap { xd =>
        """/([^\s/<>\[\]()]+)\s+(\d+)\s+\d+\s+R""".r.findAllMatchIn(xd)
          .map(m => (m.group(1), m.group(2).toInt)).toSeq
      }.filter { case (_, ref) =>
        d.objects.get(ref).exists(
          """/Subtype\s*/Image""".r.findFirstIn(_).isDefined)
      }
      imgs.zipWithIndex.map { case ((nm, ref), i) =>
        val ob = d.objects(ref)
        val w = dictInt(ob, "/Width").getOrElse(0)
        val h = dictInt(ob, "/Height").getOrElse(0)
        decodeImageXObject(ob, w, h) match {
          case Right((fmt, content)) => (pidx + 1, i, nm, fmt, w, h, content, "")
          case Left(warn) =>
            (pidx + 1, i, nm, "", w, h, Array.empty[Byte], warn)
        }
      }
    }
  }

  /** Decode one image XObject body → Right(fmt, bytes) or the defined
    * Left(warn). Split from [[extractImages]] so a malformed single
    * image degrades to ITS row, never the document. */
  private def decodeImageXObject(body: String, w: Int,
      h: Int): Either[String, (String, Array[Byte])] = try {
    rawStream(body) match {
      case None => Left("image XObject without stream data")
      case Some((dict, raw)) =>
        val filters = parseFilters(dict)
        val parms = parseParmsList(dict)
        val (transport, codec) =
          if (filters.nonEmpty && imageCodecFilters(filters.last))
            (filters.init, Some(filters.last))
          else (filters, None)
        val data = applyFilterChain(raw, transport, parms)
        codec match {
          case Some("DCTDecode") => Right(("jpeg", data))
          case Some(other) => Left(s"unsupported image filter /$other")
          case None =>
            val bpc = dictInt(dict, "/BitsPerComponent").getOrElse(8)
            val cs = """/ColorSpace\s*/([A-Za-z0-9]+)""".r
              .findFirstMatchIn(dict).map(_.group(1))
            if (w <= 0 || h <= 0) Left(s"bad image dimensions $w x $h")
            else if (bpc != 8) Left(s"unsupported image bit depth $bpc")
            else cs match {
              case Some("DeviceRGB") if data.length >= w * h * 3 =>
                Right(("png", graft.llm.Multimodal.pngFromSamples(data, w, h, 3)))
              case Some("DeviceGray") if data.length >= w * h =>
                Right(("png", graft.llm.Multimodal.pngFromSamples(data, w, h, 1)))
              case Some("DeviceRGB") | Some("DeviceGray") =>
                Left(s"truncated image samples (${data.length} bytes for $w x $h)")
              case Some(other) => Left(s"unsupported image colorspace /$other")
              case None => Left("image XObject without /ColorSpace")
            }
        }
    }
  } catch {
    case e: Exception => Left(s"image decode failed: ${e.getMessage}")
  }

  /** Deterministic sample generator shared by the fixture builder and
    * the gate's pixel-exactness check: gray = one channel, rgb =
    * three, each a fixed affine pattern of (x, y). */
  def imageSamples(kind: String, w: Int, h: Int): Array[Byte] = kind match {
    case "gray" =>
      Array.tabulate(w * h) { i =>
        val x = i % w; val y = i / w
        (((x * 7 + y * 11) * 2) % 256).toByte
      }
    case _ =>
      Array.tabulate(w * h * 3) { i =>
        val px = i / 3; val x = px % w; val y = px / w
        (i % 3 match {
          case 0 => (x * 17 + y * 3) % 256
          case 1 => (y * 31 + x * 5) % 256
          case _ => ((x + y) * 13) % 256
        }).toByte
      }
  }

  /** Fixture builder for the image-extraction gate — the ENCODER half
    * of [[extractImages]]. One page per spec list; each
    * (kind, w, h) spec embeds an /Im<i> XObject:
    * "rgb"/"gray" = deflated 8-bit samples from [[imageSamples]];
    * "dct" = an ImageIO JPEG of the rgb pattern under /DCTDecode;
    * "ccitt" = a /CCITTFaxDecode stub; "cmyk" = deflated bytes under
    * /DeviceCMYK — the last two exercise the defined-warn arms. */
  def makeImagePdf(pages: Seq[Seq[(String, Int, Int)]]): Array[Byte] = {
    val np = pages.size
    var next = 3 + 2 * np
    val pageNums = (0 until np).map(3 + _)
    val contentNums = pageNums.map(_ + np)
    val imgObjs = Seq.newBuilder[(Int, String)]
    val pageImgRefs = pages.map { specs =>
      specs.zipWithIndex.map { case ((kind, w, h), i) =>
        val (payload, filter, cs) = kind match {
          case "rgb" =>
            (deflate(imageSamples("rgb", w, h)), "/FlateDecode", "/DeviceRGB")
          case "gray" =>
            (deflate(imageSamples("gray", w, h)), "/FlateDecode", "/DeviceGray")
          case "dct" =>
            val png = graft.llm.Multimodal.pngFromSamples(
              imageSamples("rgb", w, h), w, h, 3)
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(png))
            val out = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "jpg", out)
            (out.toByteArray, "/DCTDecode", "/DeviceRGB")
          case "ccitt" =>
            (Array.fill[Byte](w * h / 8 + 1)(0x55), "/CCITTFaxDecode", "/DeviceGray")
          case "cmyk" =>
            (deflate(Array.fill[Byte](w * h * 4)(0x40)), "/FlateDecode", "/DeviceCMYK")
          case other =>
            throw new IllegalArgumentException(s"makeImagePdf: kind $other")
        }
        val n = next; next += 1
        imgObjs += (n -> (s" << /Type /XObject /Subtype /Image /Width $w /Height $h" +
          s" /ColorSpace $cs /BitsPerComponent 8 /Filter $filter" +
          s" /Length ${payload.length} >> stream\n" +
          new String(payload, "ISO-8859-1") + "\nendstream "))
        (s"Im$i", n, w, h)
      }
    }
    val objs = Seq(
      1 -> " << /Type /Catalog /Pages 2 0 R >> ",
      2 -> (s" << /Type /Pages /Kids [${pageNums.map(n => s"$n 0 R").mkString(" ")}]" +
        s" /Count $np >> ")) ++
      pageNums.zipWithIndex.map { case (n, i) =>
        val res = pageImgRefs(i).map { case (nm, on, _, _) => s"/$nm $on 0 R" }
          .mkString(" ")
        n -> (s" << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]" +
          s" /Resources << /XObject << $res >> >>" +
          s" /Contents ${contentNums(i)} 0 R >> ")
      } ++
      contentNums.zipWithIndex.map { case (n, i) =>
        val cs = pageImgRefs(i).map { case (nm, _, w, h) =>
          s"q $w 0 0 $h 72 500 cm /$nm Do Q"
        }.mkString(" ")
        n -> s" << /Length ${cs.length} >> stream\n$cs\nendstream "
      } ++ imgObjs.result()
    serialize(objs, 1)
  }

  /** Fixture builder for the extraction gates: one page per raw
    * content-stream string; `flate` compresses every stream so the
    * extractor's inflate path is exercised; `xrefStream` emits the
    * PDF 1.5 compressed form. */
  def makeTextPdf(contents: Seq[String], flate: Boolean = false,
      xrefStream: Boolean = false): Array[Byte] = {
    val np = contents.size
    val pageNums = (0 until np).map(3 + _)
    val contentNums = pageNums.map(_ + np)
    val objs = Seq(
      1 -> " << /Type /Catalog /Pages 2 0 R >> ",
      2 -> s" << /Type /Pages /Kids [${pageNums.map(n => s"$n 0 R").mkString(" ")}] /Count $np >> ") ++
      pageNums.zipWithIndex.map { case (n, i) =>
        n -> s" << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents ${contentNums(i)} 0 R >> "
      } ++
      contentNums.zip(contents).map { case (n, cs) =>
        if (flate) {
          val data = deflate(cs.getBytes("ISO-8859-1"))
          n -> (s" << /Length ${data.length} /Filter /FlateDecode >> stream\n" +
            new String(data, "ISO-8859-1") + "\nendstream ")
        } else
          n -> s" << /Length ${cs.length} >> stream\n$cs\nendstream "
      }
    serialize(objs, 1, xrefStream)
  }

  // fixture-side encoders (the writer halves of the decode filters)
  private def asciiHexEncode(d: Array[Byte]): Array[Byte] =
    (d.map(b => f"${b & 0xFF}%02x").mkString + ">").getBytes("ISO-8859-1")
  private def ascii85Encode(d: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    d.grouped(4).foreach { g =>
      var v = 0L
      (0 until 4).foreach(i => v = (v << 8) | (if (i < g.length) g(i) & 0xFF else 0))
      if (v == 0 && g.length == 4) sb.append('z')
      else {
        val cs = new Array[Char](5)
        (4 to 0 by -1).foreach { i => cs(i) = ('!' + (v % 85)).toChar; v /= 85 }
        (0 to g.length).foreach(i => sb.append(cs(i)))
      }
    }
    (sb.result() + "~>").getBytes("ISO-8859-1")
  }
  private def runLengthEncode(d: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    d.grouped(128).foreach { g => out.write(g.length - 1); out.write(g, 0, g.length) }
    out.write(128)
    out.toByteArray
  }

  /** Fixture builder exercising the full decode-filter surface: one
    * page per content stream, each encoded through `filters` (the
    * list in DECODE order, so encoding applies the chain from the
    * inside out — `[/ASCII85Decode /FlateDecode]` stores ASCII armor
    * around deflate, the classic transport form). */
  def makeFilteredTextPdf(contents: Seq[String], filters: Seq[String]): Array[Byte] = {
    def encodeChain(plain: Array[Byte]): Array[Byte] =
      filters.reverse.foldLeft(plain) { (d, f) =>
        f match {
          case "FlateDecode" => deflate(d)
          case "LZWDecode" => lzwEncode(d)
          case "ASCIIHexDecode" => asciiHexEncode(d)
          case "ASCII85Decode" => ascii85Encode(d)
          case "RunLengthDecode" => runLengthEncode(d)
          case other => throw new IllegalArgumentException(s"no fixture encoder for /$other")
        }
      }
    val np = contents.size
    val pageNums = (0 until np).map(3 + _)
    val contentNums = pageNums.map(_ + np)
    val filterVal =
      if (filters.size == 1) s"/${filters.head}"
      else filters.map("/" + _).mkString("[ ", " ", " ]")
    val objs = Seq(
      1 -> " << /Type /Catalog /Pages 2 0 R >> ",
      2 -> s" << /Type /Pages /Kids [${pageNums.map(n => s"$n 0 R").mkString(" ")}] /Count $np >> ") ++
      pageNums.zipWithIndex.map { case (n, i) =>
        n -> s" << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents ${contentNums(i)} 0 R >> "
      } ++
      contentNums.zip(contents).map { case (n, cs) =>
        val data = encodeChain(cs.getBytes("ISO-8859-1"))
        // /Filter deliberately BEFORE /Length: locks the one-name (not
        // greedy multi-name) parse against the following key
        n -> (s" << /Filter $filterVal /Length ${data.length} >> stream\n" +
          new String(data, "ISO-8859-1") + "\nendstream ")
      }
    serialize(objs, 1)
  }

  /** Fixture builder for the simple-font /Differences gates: a Type1
    * font whose /Encoding dict remaps byte codes to glyph names atop
    * the WinAnsi base. `differences` is the raw array body (e.g.
    * "65 /eacute /bullet 97 /uniFB01"); content streams are provided
    * verbatim and their show-string bytes decode through the map. */
  def makeDiffPdf(contents: Seq[String], differences: String,
      flate: Boolean = false): Array[Byte] = {
    val np = contents.size
    val pageNums = (0 until np).map(3 + _)
    val contentNums = pageNums.map(_ + np)
    val fontNum = 3 + 2 * np
    val objs = Seq(
      1 -> " << /Type /Catalog /Pages 2 0 R >> ",
      2 -> s" << /Type /Pages /Kids [${pageNums.map(n => s"$n 0 R").mkString(" ")}] /Count $np >> ") ++
      pageNums.zipWithIndex.map { case (n, i) =>
        n -> (s" << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]" +
          s" /Resources << /Font << /F1 $fontNum 0 R >> >>" +
          s" /Contents ${contentNums(i)} 0 R >> ")
      } ++
      contentNums.zip(contents).map { case (n, cs) =>
        if (flate) {
          val z = deflate(cs.getBytes("ISO-8859-1"))
          n -> (s" << /Length ${z.length} /Filter /FlateDecode >> stream\n" +
            new String(z, "ISO-8859-1") + "\nendstream ")
        } else n -> s" << /Length ${cs.length} >> stream\n$cs\nendstream "
      } ++ Seq(
        fontNum -> (" << /Type /Font /Subtype /Type1 /BaseFont /Helvetica" +
          s" /Encoding << /BaseEncoding /WinAnsiEncoding /Differences [ $differences ] >> >> "))
    serialize(objs, 1)
  }

  /** Fixture builder for the Type3 extraction gate: glyphs are
    * content-stream procedures under /CharProcs (trivial d0 strokes —
    * extraction never draws them), /Encoding /Differences is the ONLY
    * code→name table (Type3 has no base encoding), FontMatrix/BBox/
    * Widths complete the required dictionary. `withToUnicode` adds a
    * CMap mapping the first code to 'Z' — the CMap must win over the
    * Differences names (the spec's extraction preference). */
  def makeType3Pdf(contents: Seq[String], differences: String,
      withToUnicode: Boolean = false): Array[Byte] = {
    val np = contents.size
    val pageNums = (0 until np).map(3 + _)
    val contentNums = pageNums.map(_ + np)
    val fontNum = 3 + 2 * np
    val procNum = fontNum + 1
    val touNum = fontNum + 2
    val names = ("/([^\\s/<>\\[\\]()]+)").r
      .findAllMatchIn(differences).map(_.group(1)).toSeq.distinct
    val charProcs = names.map(n => s"/$n $procNum 0 R").mkString(" ")
    val tou = "/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n" +
      "1 begincodespacerange\n<00> <FF>\nendcodespacerange\n" +
      "1 beginbfchar\n<41> <005A>\nendbfchar\n" +
      "endcmap\nCMapName currentdict /CMap defineresource pop\nend\nend"
    val touEntry = if (withToUnicode) s" /ToUnicode $touNum 0 R" else ""
    val proc = "0 0 d0"
    val objs = Seq(
      1 -> " << /Type /Catalog /Pages 2 0 R >> ",
      2 -> s" << /Type /Pages /Kids [${pageNums.map(n => s"$n 0 R").mkString(" ")}] /Count $np >> ") ++
      pageNums.zipWithIndex.map { case (n, i) =>
        n -> (s" << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]" +
          s" /Resources << /Font << /F1 $fontNum 0 R >> >>" +
          s" /Contents ${contentNums(i)} 0 R >> ")
      } ++
      contentNums.zip(contents).map { case (n, cs) =>
        n -> s" << /Length ${cs.length} >> stream\n$cs\nendstream "
      } ++ Seq(
        fontNum -> (" << /Type /Font /Subtype /Type3" +
          " /FontBBox [0 0 1000 1000] /FontMatrix [0.001 0 0 0.001 0 0]" +
          s" /CharProcs << $charProcs >>" +
          s" /Encoding << /Differences [ $differences ] >>" +
          s" /FirstChar 0 /LastChar 255$touEntry >> "),
        procNum -> s" << /Length ${proc.length} >> stream\n$proc\nendstream ") ++
      (if (withToUnicode)
        Seq(touNum -> s" << /Length ${tou.length} >> stream\n$tou\nendstream ")
      else Nil)
    serialize(objs, 1)
  }

  /** Fixture builder for the composite-font extraction gates: a PDF
    * 1.5-era Type0/CIDFontType2 document with /Encoding /Identity-H —
    * the form essentially every modern writer (Word, Chrome, LaTeX
    * with subset fonts) emits. Show strings are 2-byte CIDs; the CID
    * assignment is deliberately NOT Unicode (lowercase a–z map to
    * identity CIDs through one bfrange, everything else to 0x2000+k
    * bfchar entries in first-appearance order) so extraction only
    * succeeds through the /ToUnicode CMap, never by byte luck.
    * Supplementary code points (surrogate pairs) get 4-byte dst
    * entries. `withToUnicode = false` builds the no-CMap variant that
    * must FLAG, not garbage. `embeddedCmap` replaces the /Encoding
    * NAME with an indirect CMap STREAM of the given text (the
    * subsetted-CJK form); show strings are then written as UTF-16BE
    * code units — the convention of a usecmap-on-Uni* CMap, whose
    * code space is the base's. */
  def makeCidPdf(pages: Seq[String], withToUnicode: Boolean = true,
      flate: Boolean = false, encoding: String = "Identity-H",
      embeddedCmap: Option[String] = None): Array[Byte] = {
    val np = pages.size
    val pageNums = (0 until np).map(3 + _)
    val contentNums = pageNums.map(_ + np)
    val fontNum = 3 + 2 * np
    val descNum = fontNum + 1
    val touNum = fontNum + 2
    val encNum = fontNum + 3
    // code-point → CID
    val extra = mutable.LinkedHashMap.empty[Int, Int]
    def cidOf(cp: Int): Int =
      if (cp >= 'a' && cp <= 'z') cp
      else extra.getOrElseUpdate(cp, 0x2000 + extra.size)
    // A predefined Uni*-UCS2/UTF16 /Encoding's code space IS UTF-16:
    // its show strings carry the text's big-endian code units, no CID
    // table involved. Identity-H keeps the deliberately-non-Unicode
    // CID assignment above so only the /ToUnicode path can decode it.
    val ucs2Encoding = encoding.startsWith("Uni") || embeddedCmap.isDefined
    val pageCids: Seq[Seq[Int]] =
      if (ucs2Encoding)
        pages.map(_.getBytes("UTF-16BE").grouped(2).toSeq
          .map(p => ((p(0) & 0xFF) << 8) | (p(1) & 0xFF)))
      else pages.map(_.codePoints().toArray.toSeq.map(cidOf))
    val tou = {
      val bfchars = extra.map { case (cp, cid) =>
        val dst = new String(Character.toChars(cp))
          .getBytes("UTF-16BE").map(b => f"${b & 0xFF}%02X").mkString
        f"<$cid%04X> <$dst>"
      }
      "/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n" +
        "1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n" +
        "1 beginbfrange\n<0061> <007A> <0061>\nendbfrange\n" +
        (if (bfchars.nonEmpty)
          s"${bfchars.size} beginbfchar\n${bfchars.mkString("\n")}\nendbfchar\n"
        else "") +
        "endcmap\nCMapName currentdict /CMap defineresource pop\nend\nend"
    }
    def streamObj(data: String): String =
      if (flate) {
        val z = deflate(data.getBytes("ISO-8859-1"))
        s" << /Length ${z.length} /Filter /FlateDecode >> stream\n" +
          new String(z, "ISO-8859-1") + "\nendstream "
      } else s" << /Length ${data.length} >> stream\n$data\nendstream "
    val touEntry = if (withToUnicode) s" /ToUnicode $touNum 0 R" else ""
    val objs = Seq(
      1 -> " << /Type /Catalog /Pages 2 0 R >> ",
      2 -> s" << /Type /Pages /Kids [${pageNums.map(n => s"$n 0 R").mkString(" ")}] /Count $np >> ") ++
      pageNums.zipWithIndex.map { case (n, i) =>
        n -> (s" << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]" +
          s" /Resources << /Font << /F1 $fontNum 0 R >> >>" +
          s" /Contents ${contentNums(i)} 0 R >> ")
      } ++
      contentNums.zip(pageCids).map { case (n, cids) =>
        val hex = cids.map(c => f"$c%04X").mkString
        n -> streamObj(s"BT /F1 12 Tf 72 720 Td <$hex> Tj ET")
      } ++ Seq(
        fontNum -> (" << /Type /Font /Subtype /Type0 /BaseFont /Graft-CID" +
          embeddedCmap.fold(s" /Encoding /$encoding")(_ => s" /Encoding $encNum 0 R") +
          s" /DescendantFonts [$descNum 0 R]$touEntry >> "),
        descNum -> (" << /Type /Font /Subtype /CIDFontType2 /BaseFont /Graft-CID" +
          " /CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) /Supplement 0 >> >> ")) ++
      (if (withToUnicode) Seq(touNum -> streamObj(tou)) else Nil) ++
      embeddedCmap.map(c => encNum -> streamObj(c)).toSeq
    serialize(objs, 1)
  }

  /** J6: extract one group of (1-based, pre-clamped) pages as a new doc. */
  def extractPages(bytes: Array[Byte], group: Seq[Int], password: String = ""): Array[Byte] = {
    val d = parse(bytes, password)
    val picked = group.flatMap(p => d.pageNums.lift(p - 1))
    val kept = d.objects.toSeq.collect {
      case (n, body) if n != d.catalogNum && n != d.pagesNum =>
        val shifted = refRe.replaceAllIn(body, m => s"${m.group(1).toInt + 2} 0 R")
        (n + 2, shifted.replaceAll(s"/Parent\\s+${d.pagesNum + 2}\\s+0\\s+R", "/Parent 2 0 R"))
    }
    val head = Seq(
      1 -> " << /Type /Catalog /Pages 2 0 R >> ",
      2 -> s" << /Type /Pages /Kids [${picked.map(n => s"${n + 2} 0 R").mkString(" ")}] /Count ${picked.size} >> ")
    serialize(head ++ kept, 1, xrefStream = d.usedXrefStream)
  }
}
