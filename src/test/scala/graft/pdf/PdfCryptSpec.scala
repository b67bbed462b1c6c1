package graft.pdf

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.ISO_8859_1
import graft.pipeline.Kernel

/** Standard-security-handler decryption (PdfCrypt + parseAll integration).
  *
  * The reference's stack opens owner-password-only ("permissions
  * restricted") documents transparently — poppler/pdfplumber/PyPDF2 all try
  * the empty user password before failing — so the rebuild must extract the
  * same class rather than refuse every `/Encrypt` file. Fixtures are
  * written by [[MiniPdf.buildEncrypted]] per ISO 32000-1 §7.6.3 / 32000-2
  * §7.6.4 algorithms; a non-empty user password must surface as the typed
  * `pdf_encrypted_locked` refusal (never garbage text).
  */
class PdfCryptSpec extends AnyFunSuite {

  private val pages = Seq(
    MiniPdf.streamFor(Seq(("page one secret", 72, 700))),
    MiniPdf.streamFor(Seq(("page two secret", 72, 700))))
  private val want = "page one secret\n\npage two secret"

  for (variant <- Seq("rc4-40", "rc4-128", "aesv2", "identity-stm", "aesv3")) {
    test(s"$variant: empty-user-password document decrypts to exact text") {
      val doc = PdfExtractor.extract(MiniPdf.buildEncrypted(pages, variant))
        .fold(e => fail(s"extract failed: $e"), identity)
      assert(doc.text == want)
      assert(doc.pageCount == 2)
      // the /Info /Title string went through the string-decryption path
      assert(doc.metadata.get("title").contains("Encrypted Fixture"))
    }
  }

  test("rc4-128 + FlateDecode: decryption wraps OUTSIDE the filter chain") {
    val doc = PdfExtractor.extract(
        MiniPdf.buildEncrypted(pages, "rc4-128", flate = true))
      .fold(e => fail(s"extract failed: $e"), identity)
    assert(doc.text == want)
  }

  test("aesv2 + FlateDecode: AES padding strip composes with inflate") {
    val doc = PdfExtractor.extract(
        MiniPdf.buildEncrypted(pages, "aesv2", flate = true))
      .fold(e => fail(s"extract failed: $e"), identity)
    assert(doc.text == want)
  }

  for (variant <- Seq("rc4-128", "aesv2", "aesv3")) {
    test(s"$variant: non-empty user password refuses as pdf_encrypted_locked") {
      val b = MiniPdf.buildEncrypted(pages, variant, userPw = "secret")
      assert(PdfExtractor.extract(b) == Left("pdf_encrypted_locked"))
      val r = Kernel.extractOne(b)
      assert(r.status == "error" && r.error == "pdf_encrypted_locked" && r.text.isEmpty)
    }
  }

  test("unsupported crypt-filter method refuses as pdf_encrypted, not garbage") {
    // take a valid aesv2 doc and rename its CFM to an unknown method
    val b = MiniPdf.buildEncrypted(pages, "aesv2")
    val s = new String(b, ISO_8859_1).replace("/CFM /AESV2", "/CFM /AESV9")
    assert(PdfExtractor.extract(s.getBytes(ISO_8859_1)) == Left("pdf_encrypted"))
  }

  test("non-Standard security handler refuses as pdf_encrypted") {
    // same-length handler name keeps every xref offset valid
    val b = MiniPdf.buildEncrypted(pages, "rc4-128")
    val s = new String(b, ISO_8859_1).replace("/Filter /Standard", "/Filter /ACMEsec8")
    assert(PdfExtractor.extract(s.getBytes(ISO_8859_1)) == Left("pdf_encrypted"))
  }

  test("corrupt startxref: trailer-keyword fallback still finds /Encrypt and decrypts") {
    val b = MiniPdf.buildEncrypted(pages, "rc4-128")
    val s = new String(b, ISO_8859_1)
    // point startxref at garbage: the chain parse dies, the body scan other
    // fixtures rely on takes over — the /Encrypt sighting must survive it
    val at = s.lastIndexOf("startxref")
    val broken = s.substring(0, at) + s.substring(at).replaceFirst("\\d+", "1")
    val doc = PdfExtractor.extract(broken.getBytes(ISO_8859_1))
      .fold(e => fail(s"extract failed: $e"), identity)
    assert(doc.text == want)
  }

  test("wrong /ID breaks key derivation: refused as locked, never misread") {
    // flip one /ID byte: the MD5-bound file key no longer validates /U
    val b = MiniPdf.buildEncrypted(pages, "rc4-128")
    val s = new String(b, ISO_8859_1)
    val idAt = s.indexOf("/ID [ <")
    assert(idAt > 0)
    val flipped = s.substring(0, idAt + 7) +
      (if (s.charAt(idAt + 7) == '0') '1' else '0') + s.substring(idAt + 8)
    assert(PdfExtractor.extract(flipped.getBytes(ISO_8859_1)) == Left("pdf_encrypted_locked"))
  }

  // --- primitive round-trips (spec algorithms, writer vs reader) ---

  test("rc4 is symmetric") {
    val key = Array[Byte](1, 2, 3, 4, 5)
    val data = ("payload " * 20).getBytes(ISO_8859_1)
    assert(PdfCrypt.rc4(key, PdfCrypt.rc4(key, data)).sameElements(data))
  }

  test("aes-cbc encrypt/decrypt round-trips at every padding remainder") {
    val key = (1 to 16).map(_.toByte).toArray
    val iv = (17 to 32).map(_.toByte).toArray
    for (n <- 0 to 33) {
      val data = (0 until n).map(i => (i * 7).toByte).toArray
      val rt = PdfCrypt.aesCbcDecrypt(key, PdfCrypt.aesCbcEncrypt(key, iv, data))
      assert(rt.sameElements(data), s"mismatch at n=$n")
    }
  }

  test("objectKey truncates to min(len+5, 16) with the AES salt") {
    val fk5 = new Array[Byte](5)
    val fk16 = new Array[Byte](16)
    assert(PdfCrypt.objectKey(fk5, 7, 0, aes = false).length == 10)
    assert(PdfCrypt.objectKey(fk16, 7, 0, aes = false).length == 16)
    // the sAlT suffix changes the derived key
    assert(!PdfCrypt.objectKey(fk16, 7, 0, aes = true)
      .sameElements(PdfCrypt.objectKey(fk16, 7, 0, aes = false)))
  }

  test("hash2B: R5 is single SHA-256; R6 iterates and is deterministic") {
    val pw = "pw".getBytes(ISO_8859_1)
    val salt = (1 to 8).map(_.toByte).toArray
    val r5 = PdfCrypt.hash2B(pw, salt, Array.emptyByteArray, 5)
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.update(pw); md.update(salt)
    assert(r5.sameElements(md.digest()))
    val a = PdfCrypt.hash2B(pw, salt, Array.emptyByteArray, 6)
    val b = PdfCrypt.hash2B(pw, salt, Array.emptyByteArray, 6)
    assert(a.length == 32 && a.sameElements(b) && !a.sameElements(r5))
  }

  test("property: extraction is total on corrupted ENCRYPTED variants") {
    // bit flips and truncations over every security-handler build: the
    // reader must stay total (processed or a typed error, never a throw),
    // and a corrupted LOCKED document must never flip to readable text —
    // the password check either still refuses or the damage degrades the
    // document, but plaintext is cryptographically unreachable
    val content = Seq("BT /F1 12 Tf 72 700 Td (Texto cifrado estable) Tj ET")
    val builds = Seq(
      "rc4" -> MiniPdf.buildEncrypted(content, "rc4-128", flate = true),
      "aesv2" -> MiniPdf.buildEncrypted(content, "aesv2", flate = true),
      "aesv3" -> MiniPdf.buildEncrypted(content, "aesv3", flate = true),
      "locked" -> MiniPdf.buildEncrypted(content, "aesv3", userPw = "pw-9", flate = true))
    val rnd = new scala.util.Random(23)
    builds.foreach { case (name, base) =>
      (1 to 150).foreach { i =>
        val bytes = base.clone()
        rnd.nextInt(3) match {
          case 0 => bytes(rnd.nextInt(bytes.length)) = rnd.nextInt(256).toByte
          case 1 =>
            val r = graft.pipeline.Kernel.extractOne(bytes.take(rnd.nextInt(bytes.length)))
            assert(r != null, s"$name truncation $i")
          case _ => bytes(rnd.nextInt(bytes.length)) = '('
        }
        val r = graft.pipeline.Kernel.extractOne(bytes)
        assert(r.status == "processed" || r.status == "error", s"$name flip $i: ${r.status}")
        if (name == "locked")
          assert(!r.text.contains("Texto cifrado"), s"$name flip $i leaked plaintext")
      }
    }
  }

  test("computeU/computeO are deterministic pure functions") {
    val o1 = PdfCrypt.computeO("own".getBytes(ISO_8859_1), Array.emptyByteArray, 16, 3)
    val o2 = PdfCrypt.computeO("own".getBytes(ISO_8859_1), Array.emptyByteArray, 16, 3)
    assert(o1.length == 32 && o1.sameElements(o2))
    val fk = PdfCrypt.fileKeyR4(Array.emptyByteArray, o1, -44,
      (1 to 16).map(_.toByte).toArray, 16, 3, encryptMetadata = true)
    assert(fk.length == 16)
    val u = PdfCrypt.computeU(fk, (1 to 16).map(_.toByte).toArray, 3)
    assert(u.length == 32)
  }
}
