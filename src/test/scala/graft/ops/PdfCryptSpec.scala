package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class PdfCryptSpec extends AnyFunSuite {

  test("RC4 matches the published test vector (key 'Key', plaintext 'Plaintext')") {
    val out = PdfCrypt.rc4("Key".getBytes("US-ASCII"), "Plaintext".getBytes("US-ASCII"))
    assert(out.map(b => f"${b & 0xFF}%02X").mkString == "BBF316E8D940AF0AD3")
  }

  test("RC4 is symmetric (decrypt == encrypt)") {
    val key = Array[Byte](1, 2, 3, 4, 5)
    val data = (0 until 256).map(_.toByte).toArray
    assert(PdfCrypt.rc4(key, PdfCrypt.rc4(key, data)).toSeq == data.toSeq)
  }

  test("hash2B terminates and is deterministic (R6 KDF, Algorithm 2.B)") {
    val salt = Array.fill(8)(7.toByte)
    val h1 = PdfCrypt.hash2B(Array.empty, salt, Array.empty)
    val h2 = PdfCrypt.hash2B(Array.empty, salt, Array.empty)
    assert(h1.length == 32 && h1.toSeq == h2.toSeq)
    val h3 = PdfCrypt.hash2B("pw".getBytes, salt, Array.empty)
    assert(h1.toSeq != h3.toSeq)
  }

  test("PDF string lexer: literal escapes, nesting, octal; hex with odd digit") {
    val (b1, n1) = PdfCrypt.readStringAt("""(a\(b\)c\\d\101\n)""", 0)
    assert(new String(b1, "ISO-8859-1") == "a(b)c\\dA\n")
    assert(n1 == 18)
    val (b2, _) = PdfCrypt.readStringAt("<48690>", 0)
    assert(b2.toSeq == Seq[Byte](0x48, 0x69, 0x00))
    val (b3, _) = PdfCrypt.readStringAt("(x(y(z)))", 0)
    assert(new String(b3, "ISO-8859-1") == "x(y(z))")
  }

  test("RC4-128 encrypted PDF round-trips: page count, split, merge to plaintext") {
    val plain = Pdf.makePdf(4, withContent = true)
    val enc = PdfCrypt.encrypt(plain)
    assert(Pdf.isEncrypted(enc))
    assert(Pdf.pageCount(enc) == 4)
    // extract pages 2-3 of the encrypted doc → 2-page plaintext output
    val part = Pdf.extractPages(enc, Seq(2, 3))
    assert(!Pdf.isEncrypted(part) && Pdf.pageCount(part) == 2)
    // decrypted content streams surface the original text
    val partText = new String(part, "ISO-8859-1")
    assert(partText.contains("(Page 2) Tj") || partText.contains("Page 2"),
      "decrypted content stream must carry the plaintext page text")
  }

  test("AES-128 (V4 /AESV2) encrypted PDF round-trips and merges with an RC4 doc") {
    val aesDoc = PdfCrypt.encrypt(Pdf.makePdf(2, withContent = true), aes128 = true)
    assert(Pdf.pageCount(aesDoc) == 2)
    val rc4Doc = PdfCrypt.encrypt(Pdf.makePdf(3, withContent = true))
    val merged = Pdf.merge(Seq(aesDoc, rc4Doc))
    assert(!Pdf.isEncrypted(merged) && Pdf.pageCount(merged) == 5)
  }

  test("non-empty user password and malformed /Encrypt raise defined errors") {
    val locked = PdfCrypt.encrypt(Pdf.makePdf(2), userPw = "secret")
    val e1 = intercept[IllegalArgumentException](Pdf.pageCount(locked))
    assert(e1.getMessage.contains("password-protected"))
    val bogus = new String(Pdf.makePdf(2), "ISO-8859-1")
      .replace("trailer\n<< ", "trailer\n<< /Encrypt 9 0 R ")
      .getBytes("ISO-8859-1")
    val e2 = intercept[IllegalArgumentException](Pdf.pageCount(bogus))
    assert(e2.getMessage.contains("/Encrypt dictionary not found"))
  }

  test("V5/R6 (AES-256) document with empty user password decrypts") {
    // Build a V5/R6 /Encrypt dict the way a writer would ([PDF 32000-2]
    // Algorithm 8/9 shape): U = hash2B(pw,valSalt)||salts, UE =
    // AES-CBC(intermediate, 0-IV, fileKey); then check forDocument
    // recovers the same file key and decrypts an AESV3 payload.
    val valSalt = Array.fill(8)(1.toByte)
    val keySalt = Array.fill(8)(2.toByte)
    val fileKey = (1 to 32).map(_.toByte).toArray
    val uHash = PdfCrypt.hash2B(Array.empty, valSalt, Array.empty)
    val inter = PdfCrypt.hash2B(Array.empty, keySalt, Array.empty)
    val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    c.init(javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(inter, "AES"),
      new javax.crypto.spec.IvParameterSpec(new Array[Byte](16)))
    val ue = c.doFinal(fileKey)
    def hx(b: Array[Byte]) = "<" + b.map(x => f"${x & 0xFF}%02x").mkString + ">"
    val dict = s" << /Filter /Standard /V 5 /R 6 /Length 256 /P -3904 " +
      s"/O ${hx(Array.fill(48)(9.toByte))} /U ${hx(uHash ++ valSalt ++ keySalt)} " +
      s"/OE ${hx(Array.fill(32)(9.toByte))} /UE ${hx(ue)} /CF << /StdCF << /CFM /AESV3 >> >> >> "
    val h = PdfCrypt.forDocument(dict, Array.empty)
    val payload = "hello aes256 world".getBytes("US-ASCII")
    assert(new String(h.decrypt(7, 0, h.encrypt(7, 0, payload)), "US-ASCII")
      == "hello aes256 world")
    assert(h.fileKey.toSeq == fileKey.toSeq)
  }

  test("ciphertext containing literal 'endobj' cannot truncate object framing") {
    // RC4 is a stream cipher, so for any target ciphertext there is a
    // plaintext that encrypts to it — craft a stream whose CIPHERTEXT
    // spells `endobj` (and a fake object header) and splice it into a
    // real encrypted document. The old regex-to-endobj framing
    // truncated the object mid-stream and failed the crypt transform;
    // /Length-framed scanning must parse the document unharmed.
    val enc = new String(PdfCrypt.encrypt(Pdf.makePdf(2, withContent = true)), "ISO-8859-1")
    val encNum = """/Encrypt\s+(\d+)\s+0\s+R""".r.findFirstMatchIn(enc).get.group(1).toInt
    val encBody = Pdf.scanObjects(enc).collectFirst {
      case (n, s, e) if n == encNum => enc.substring(s, e)
    }.get
    val id0 = """/ID\s*\[\s*""".r.findFirstMatchIn(enc)
      .map(m => PdfCrypt.readStringAt(enc, m.end)._1).get
    val h = PdfCrypt.forDocument(encBody, id0)
    val evilCipher = "q endobj 3 0 obj BT (gotcha) Tj ET".getBytes("ISO-8859-1")
    val plaintext = h.decrypt(50, 0, evilCipher)
    assert(h.encrypt(50, 0, plaintext).toSeq == evilCipher.toSeq) // cipher really emits endobj
    val evilObj = s"50 0 obj << /Length ${evilCipher.length} >> stream\n" +
      new String(evilCipher, "ISO-8859-1") + "\nendstream endobj\n"
    val doc = enc.replaceFirst("trailer",
      java.util.regex.Matcher.quoteReplacement(evilObj) + "trailer")
    assert(Pdf.pageCount(doc.getBytes("ISO-8859-1")) == 2)
  }

  test("property: /Length-framed scan survives arbitrary stream payloads") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // The r10 scanObjects contract: whatever bytes a stream payload
    // carries — including 'endobj', 'stream', parens, '%' — framing
    // follows the declared /Length and transformObjects is an exact
    // identity. Payload chars stay in ISO-8859-1 range (the parser's
    // charset); the generator salts in the exact token strings the old
    // regex framing tripped over.
    val payloadGen: Gen[String] = Gen.listOf(Gen.oneOf(
      Gen.choose(32, 255).map(_.toChar.toString),
      Gen.oneOf("endobj", "stream\n", "endstream", "(", ")", "%", "<<", "1 0 obj")))
      .map(_.mkString.take(200))
    val prop = Prop.forAll(payloadGen, payloadGen) { (p1, p2) =>
      val text = "%PDF-1.4\n" +
        s"1 0 obj << /Length ${p1.length} >> stream\n$p1\nendstream endobj\n" +
        "2 0 obj << /S (plain) >> endobj\n" +
        s"3 0 obj << /Length ${p2.length} >> stream\n$p2\nendstream endobj\n" +
        "trailer << /Size 4 >>\n%%EOF"
      val framed = Pdf.scanObjects(text)
      framed.map(_._1) == Seq(1, 2, 3) &&
        Pdf.transformObjects(text, (_, b) => b) == text
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, res.status.toString)
  }

  test("user password opens RC4-128 and AES-128 documents (Algorithms 4/5)") {
    val rc4 = PdfCrypt.encrypt(Pdf.makePdf(3), userPw = "secret")
    val aes = PdfCrypt.encrypt(Pdf.makePdf(4, withContent = true),
      aes128 = true, userPw = "secret")
    assert(Pdf.pageCount(rc4, "secret") == 3)
    assert(Pdf.pageCount(aes, "secret") == 4)
    // unlock + merge yields plaintext
    val merged = Pdf.merge(Seq(rc4, aes), password = "secret")
    assert(!Pdf.isEncrypted(merged) && Pdf.pageCount(merged) == 7)
  }

  test("owner password opens R2-4 documents via Algorithm 7 /O recovery") {
    val doc = PdfCrypt.encrypt(Pdf.makePdf(2), ownerPw = "boss", userPw = "secret")
    assert(Pdf.pageCount(doc, "boss") == 2)   // owner path
    assert(Pdf.pageCount(doc, "secret") == 2) // user path
    val e = intercept[IllegalArgumentException](Pdf.pageCount(doc, "nope"))
    assert(e.getMessage == "encrypted PDF: wrong password")
  }

  test("V5/R6 password-protected document opens with user or owner password (Alg 11/12)") {
    val doc = PdfCrypt.encryptV5(Pdf.makePdf(5, withContent = true),
      ownerPw = "boss", userPw = "secret")
    assert(Pdf.isEncrypted(doc))
    assert(Pdf.pageCount(doc, "secret") == 5) // Algorithm 11 (user)
    assert(Pdf.pageCount(doc, "boss") == 5)   // Algorithm 12 (owner, folds U[0:48])
    val e1 = intercept[IllegalArgumentException](Pdf.pageCount(doc, "nope"))
    assert(e1.getMessage == "encrypted PDF: wrong password")
    val e2 = intercept[IllegalArgumentException](Pdf.pageCount(doc))
    assert(e2.getMessage.contains("password required"))
    // empty-user-password V5 doc still opens with no password at all
    val open = PdfCrypt.encryptV5(Pdf.makePdf(2), ownerPw = "boss")
    assert(Pdf.pageCount(open) == 2)
    // extract from an unlocked doc serializes plaintext
    val part = Pdf.extractPages(doc, Seq(1, 3), password = "secret")
    assert(!Pdf.isEncrypted(part) && Pdf.pageCount(part) == 2)
  }

  test("scanObjects frames /Length streams, strings and comments over 'endobj' bytes") {
    val payload = "raw endobj 7 0 obj stream\n bytes"
    val text = "%PDF-1.4\n" +
      s"1 0 obj << /Length ${payload.length} >> stream\n$payload\nendstream endobj\n" +
      "2 0 obj << /S (a literal with endobj inside) % comment endobj\n /T <0a1b> >> endobj\n" +
      "trailer << /Size 3 >>"
    val framed = Pdf.scanObjects(text)
    assert(framed.map(_._1) == Seq(1, 2))
    val body2 = text.substring(framed(1)._2, framed(1)._3)
    assert(body2.contains("<0a1b>")) // survived past the string + comment
    // transformObjects round-trips identity framing
    assert(Pdf.transformObjects(text, (_, b) => b) == text)
  }
}
