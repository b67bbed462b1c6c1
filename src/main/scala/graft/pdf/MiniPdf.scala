package graft.pdf

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.ISO_8859_1

/** Deterministic minimal-PDF writer.
  *
  * Used by the fixture suites (FIXTURES.md §3.3) and the synthetic pages
  * generator — the rebuild's analogue of the reference's inline fixture
  * bytes (`tests/integration/test_document_processing.py:20-21`: `%PDF-1.7`,
  * one page, MediaBox 612×792, `BT /F1 12 Tf 100 700 Td (Test PDF) Tj ET`),
  * generalized to multiple pages and optional FlateDecode streams. Output is
  * a byte-for-byte pure function of its inputs (fixed object layout, no
  * timestamps, deflate level pinned).
  */
object MiniPdf {

  /** One content stream per page. `flate` compresses every stream;
    * `withFont = false` omits the /Font resource (image-only/scanned shapes).
    */
  def build(pageStreams: Seq[String], flate: Boolean = false, padTo: Int = 1024,
            withFont: Boolean = true, info: Seq[(String, String)] = Nil,
            rawInfo: Seq[(String, String)] = Nil): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]

    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    def obj(body: => Unit): Unit = { offsets += out.size(); body }

    w("%PDF-1.7\n")
    val nPages = pageStreams.length
    // object numbering: 1 catalog, 2 pages, 3 font, then per page i:
    //   page obj = 4 + 2*i, content obj = 5 + 2*i
    val kidRefs = (0 until nPages).map(i => s"${4 + 2 * i} 0 R").mkString(" ")

    obj { w(s"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n") }
    obj { w(s"2 0 obj\n<< /Type /Pages /Kids [ $kidRefs ] /Count $nPages >>\nendobj\n") }
    obj { w("3 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n") }

    pageStreams.zipWithIndex.foreach { case (content, i) =>
      val pageNum = 4 + 2 * i
      val contNum = 5 + 2 * i
      obj {
        val res = if (withFont) "/Resources << /Font << /F1 3 0 R >> >> " else "/Resources << >> "
        w(s"$pageNum 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 612 792 ] " +
          s"$res/Contents $contNum 0 R >>\nendobj\n")
      }
      val payload: Array[Byte] =
        if (flate) deflate(content.getBytes(ISO_8859_1)) else content.getBytes(ISO_8859_1)
      obj {
        val filter = if (flate) " /Filter /FlateDecode" else ""
        w(s"$contNum 0 obj\n<< /Length ${payload.length}$filter >>\nstream\n")
        out.write(payload)
        w("\nendstream\nendobj\n")
      }
    }

    // Info LAST, matching its object number (4 + 2*nPages): the xref below
    // assigns offsets to object numbers in WRITE order, so writing Info
    // before the pages shifted every entry from object 4 on — a corrupt
    // table whose header-number mismatch silently demoted parsing to the
    // body scan, leaving the authoritative-xref path untested by Info
    // fixtures
    if (info.nonEmpty || rawInfo.nonEmpty) {
      val infoNum = 4 + 2 * nPages
      obj {
        // rawInfo values are emitted VERBATIM (hex strings, refs) — the
        // BOM'd-text-string fixtures need exact bytes, not escapes
        val entries = (info.map { case (k, v) => s"/$k (${escape(v)})" } ++
          rawInfo.map { case (k, v) => s"/$k $v" }).mkString(" ")
        w(s"$infoNum 0 obj\n<< $entries >>\nendobj\n")
      }
    }

    // xref
    val xrefPos = out.size()
    w(s"xref\n0 ${offsets.length + 1}\n")
    w("0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size ${offsets.length + 1} /Root 1 0 R >>\nstartxref\n$xrefPos\n%%EOF\n")

    // pad with comment bytes to clear the ≥1024-byte validity floor
    if (out.size() < padTo) {
      w("%")
      while (out.size() < padTo - 1) out.write('x')
      w("\n")
    }
    out.toByteArray
  }

  /** Single page, reference-fixture shape. */
  def singlePage(lines: Seq[(String, Int, Int)], flate: Boolean = false): Array[Byte] = {
    build(Seq(streamFor(lines)), flate)
  }

  /** Encrypted document (standard security handler, [[PdfCrypt]] reader
    * counterpart). `variant` ∈ rc4-40 (V1 R2), rc4-128 (V2 R3), aesv2
    * (V4 R4 /AESV2), identity-stm (V4 R4 — plaintext streams, RC4 strings),
    * aesv3 (V5 R6 /AESV3). A non-empty `userPw` produces a document the
    * empty-password reader must report as locked. Layout mirrors [[build]]
    * (classic xref + trailer so the /Encrypt + /ID sighting runs the
    * authoritative chain), plus an /Info /Title string exercising the
    * string-decryption path. Deterministic: fixed /ID, per-object IVs
    * derived from the object number.
    */
  /** Memoized per-(variant, userPw) encryption credentials — see the
    * derivation comment inside [[buildEncrypted]].
    */
  private final case class EncMaterial(encBody: String, fk: Array[Byte])
  private val encMaterials =
    new java.util.concurrent.ConcurrentHashMap[(String, String), EncMaterial]()

  def buildEncrypted(pageStreams: Seq[String], variant: String, userPw: String = "",
                     flate: Boolean = false, padTo: Int = 1024): Array[Byte] = {
    import java.security.MessageDigest
    def md5(s: String): Array[Byte] = MessageDigest.getInstance("MD5").digest(s.getBytes(ISO_8859_1))
    val id0: Array[Byte] = (0 until 16).map(i => ((i * 31 + 7) & 0xFF).toByte).toArray
    val pw = userPw.getBytes(ISO_8859_1)
    val ownerPw = "owner-fixture".getBytes(ISO_8859_1)
    val perm = -44
    def hex(b: Array[Byte]): String = b.map(x => f"${x & 0xFF}%02X").mkString
    def iv(num: Int): Array[Byte] = md5(s"fixture-iv-$num")
    def rc4Of(fk: Array[Byte])(num: Int, d: Array[Byte]): Array[Byte] =
      PdfCrypt.rc4(PdfCrypt.objectKey(fk, num, 0, aes = false), d)
    def aesV2Of(fk: Array[Byte])(num: Int, d: Array[Byte]): Array[Byte] =
      PdfCrypt.aesCbcEncrypt(PdfCrypt.objectKey(fk, num, 0, aes = true), iv(num), d)

    // credentials (encrypt-dict body + file key) are a pure function of
    // (variant, userPw) — fixed /ID, fixture owner password, fixture
    // salts — yet their derivation is EXPENSIVE BY DESIGN (R6's hash2B
    // iterated-SHA rounds; the O/U MD5-RC4 loops), and the generator was
    // re-deriving identical values for every encrypted document (~27% of
    // corpus-generation samples in the round-6 profile). Memoized per
    // (variant, userPw): bounded (a handful of fixture combinations),
    // byte-identical output. The per-object work (object keys, per-object
    // IVs, the payload encryption itself) is data-dependent and still runs
    // per document.
    val mat = encMaterials.computeIfAbsent((variant, userPw), _ =>
      variant match {
        case "rc4-40" | "rc4-128" =>
          val (v, r, kb, lenDecl) =
            if (variant == "rc4-40") (1, 2, 5, "") else (2, 3, 16, " /Length 128")
          val o = PdfCrypt.computeO(ownerPw, pw, kb, r)
          val fk = PdfCrypt.fileKeyR4(pw, o, perm, id0, kb, r, encryptMetadata = true)
          val u = PdfCrypt.computeU(fk, id0, r)
          EncMaterial(
            s"/Filter /Standard /V $v /R $r$lenDecl /O <${hex(o)}> /U <${hex(u)}> /P $perm",
            fk)
        case "aesv2" | "identity-stm" =>
          val o = PdfCrypt.computeO(ownerPw, pw, 16, 4)
          val fk = PdfCrypt.fileKeyR4(pw, o, perm, id0, 16, 4, encryptMetadata = true)
          val u = PdfCrypt.computeU(fk, id0, 4)
          if (variant == "aesv2")
            EncMaterial(
              s"/Filter /Standard /V 4 /R 4 /Length 128 /O <${hex(o)}> /U <${hex(u)}> " +
                s"/P $perm /CF << /StdCF << /CFM /AESV2 /Length 16 >> >> /StmF /StdCF /StrF /StdCF",
              fk)
          else
            EncMaterial(
              s"/Filter /Standard /V 4 /R 4 /Length 128 /O <${hex(o)}> /U <${hex(u)}> " +
                s"/P $perm /CF << /StdCF << /CFM /V2 >> >> /StmF /Identity /StrF /StdCF",
              fk)
        case "aesv3" =>
          val fk = MessageDigest.getInstance("SHA-256").digest("fixture-filekey".getBytes(ISO_8859_1))
          val vs = md5("fixture-vs").take(8)
          val ks = md5("fixture-ks").take(8)
          val u = PdfCrypt.hash2B(pw, vs, Array.emptyByteArray, 6) ++ vs ++ ks
          val ue = PdfCrypt.aesCbcNoIv(javax.crypto.Cipher.ENCRYPT_MODE,
            PdfCrypt.hash2B(pw, ks, Array.emptyByteArray, 6), fk)
          val ovs = md5("fixture-ovs").take(8)
          val oks = md5("fixture-oks").take(8)
          val o = PdfCrypt.hash2B(ownerPw, ovs, u, 6) ++ ovs ++ oks
          val oe = PdfCrypt.aesCbcNoIv(javax.crypto.Cipher.ENCRYPT_MODE,
            PdfCrypt.hash2B(ownerPw, oks, u, 6), fk)
          EncMaterial(
            s"/Filter /Standard /V 5 /R 6 /Length 256 /O <${hex(o)}> /U <${hex(u)}> " +
              s"/OE <${hex(oe)}> /UE <${hex(ue)}> /Perms <${"00" * 16}> /P $perm " +
              "/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> /StmF /StdCF /StrF /StdCF",
            fk)
        case other => throw new IllegalArgumentException(s"unknown variant: $other")
      })
    val encBody = mat.encBody
    val (encStream, encString): ((Int, Array[Byte]) => Array[Byte], (Int, Array[Byte]) => Array[Byte]) =
      variant match {
        case "rc4-40" | "rc4-128" => (rc4Of(mat.fk), rc4Of(mat.fk))
        case "aesv2" => (aesV2Of(mat.fk), aesV2Of(mat.fk))
        case "identity-stm" => ((_: Int, d: Array[Byte]) => d, rc4Of(mat.fk))
        case _ => // aesv3
          val enc = (num: Int, d: Array[Byte]) => PdfCrypt.aesCbcEncrypt(mat.fk, iv(num), d)
          (enc, enc)
      }

    val out = new ByteArrayOutputStream()
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    def obj(body: => Unit): Unit = { offsets += out.size(); body }
    w("%PDF-1.7\n")
    val nPages = pageStreams.length
    val kidRefs = (0 until nPages).map(i => s"${4 + 2 * i} 0 R").mkString(" ")
    obj { w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n") }
    obj { w(s"2 0 obj\n<< /Type /Pages /Kids [ $kidRefs ] /Count $nPages >>\nendobj\n") }
    obj { w("3 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n") }
    pageStreams.zipWithIndex.foreach { case (content, i) =>
      val pageNum = 4 + 2 * i
      val contNum = 5 + 2 * i
      obj {
        w(s"$pageNum 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 612 792 ] " +
          s"/Resources << /Font << /F1 3 0 R >> >> /Contents $contNum 0 R >>\nendobj\n")
      }
      // encryption wraps OUTSIDE the filter chain (ISO 32000-1 §7.6.2):
      // plaintext → deflate → encrypt, so the reader must decrypt FIRST
      val plain = content.getBytes(ISO_8859_1)
      val payload = encStream(contNum, if (flate) deflate(plain) else plain)
      obj {
        val filter = if (flate) " /Filter /FlateDecode" else ""
        w(s"$contNum 0 obj\n<< /Length ${payload.length}$filter >>\nstream\n")
        out.write(payload)
        w("\nendstream\nendobj\n")
      }
    }
    val infoNum = 4 + 2 * nPages
    obj {
      val title = encString(infoNum, "Encrypted Fixture".getBytes(ISO_8859_1))
      w(s"$infoNum 0 obj\n<< /Title <${hex(title)}> >>\nendobj\n")
    }
    val encNum = infoNum + 1
    obj { w(s"$encNum 0 obj\n<< $encBody >>\nendobj\n") }
    val xrefPos = out.size()
    w(s"xref\n0 ${offsets.length + 1}\n")
    w("0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size ${offsets.length + 1} /Root 1 0 R /Info $infoNum 0 R " +
      s"/Encrypt $encNum 0 R /ID [ <${hex(id0)}> <${hex(id0)}> ] >>\nstartxref\n$xrefPos\n%%EOF\n")
    if (out.size() < padTo) {
      w("%")
      while (out.size() < padTo - 1) out.write('x')
      w("\n")
    }
    out.toByteArray
  }

  /** MIXED document: native-text pages interleaved with image-only scanned
    * pages — the reference's "mixed" class (pdf_analyzer.py:96-122), where
    * per-page routing matters: span pages extract directly, raster pages go
    * through pixel OCR, and the page texts join "\n\n" in page order.
    * `pages` entries are Left(contentStream) or Right((graySamples, w, h)).
    * Object layout: 1 catalog, 2 pages, 3 font, then per page i: page
    * 4+3i, content 5+3i, image 6+3i (text pages leave the image slot
    * unused).
    */
  def buildMixed(pages: Seq[Either[String, (Array[Byte], Int, Int)]],
                 padTo: Int = 1024): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    // offsets per object NUMBER (text pages leave their image slot unused,
    // so the table has holes — written as free entries below). The xref is
    // written the same way build() writes it: mixed fixtures must exercise
    // the authoritative-xref parse path, not just the body-scan fallback.
    val offsets = scala.collection.mutable.Map.empty[Int, Int]
    def obj(num: Int)(body: => Unit): Unit = { offsets(num) = out.size(); body }
    w("%PDF-1.7\n")
    val kidRefs = pages.indices.map(i => s"${4 + 3 * i} 0 R").mkString(" ")
    obj(1) { w(s"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n") }
    obj(2) { w(s"2 0 obj\n<< /Type /Pages /Kids [ $kidRefs ] /Count ${pages.length} >>\nendobj\n") }
    obj(3) { w("3 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n") }
    pages.zipWithIndex.foreach { case (p, i) =>
      val pageNum = 4 + 3 * i
      val contNum = 5 + 3 * i
      val imgNum = 6 + 3 * i
      p match {
        case Left(content) =>
          obj(pageNum) {
            w(s"$pageNum 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 612 792 ] " +
              s"/Resources << /Font << /F1 3 0 R >> >> /Contents $contNum 0 R >>\nendobj\n")
          }
          obj(contNum) {
            w(s"$contNum 0 obj\n<< /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n")
          }
        case Right((gray, iw, ih)) =>
          obj(pageNum) {
            w(s"$pageNum 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 612 792 ] " +
              s"/Resources << /XObject << /Im0 $imgNum 0 R >> >> /Contents $contNum 0 R >>\nendobj\n")
          }
          val content = s"q $iw 0 0 $ih 72 ${720 - ih} cm /Im0 Do Q"
          obj(contNum) {
            w(s"$contNum 0 obj\n<< /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n")
          }
          val packed = deflate(gray)
          obj(imgNum) {
            w(s"$imgNum 0 obj\n<< /Type /XObject /Subtype /Image /Width $iw /Height $ih " +
              s"/ColorSpace /DeviceGray /BitsPerComponent 8 /Filter /FlateDecode " +
              s"/Length ${packed.length} >>\nstream\n")
            out.write(packed)
            w("\nendstream\nendobj\n")
          }
      }
    }
    val maxObj = 3 + 3 * pages.length
    val xrefPos = out.size()
    w(s"xref\n0 ${maxObj + 1}\n")
    w("0000000000 65535 f \n")
    (1 to maxObj).foreach { n =>
      offsets.get(n) match {
        case Some(o) => w(f"$o%010d 00000 n \n")
        case None => w("0000000000 65535 f \n") // unused image slot of a text page
      }
    }
    w(s"trailer\n<< /Size ${maxObj + 1} /Root 1 0 R >>\nstartxref\n$xrefPos\n%%EOF\n")
    if (out.size() < padTo) {
      w("%")
      while (out.size() < padTo - 1) out.write('x')
      w("\n")
    }
    out.toByteArray
  }

  /** Build a content stream placing each (text, x, y) with its own Td from origin. */
  def streamFor(lines: Seq[(String, Int, Int)]): String = {
    val ops = lines.map { case (t, x, y) =>
      s"BT /F1 12 Tf $x $y Td (${escape(t)}) Tj ET"
    }
    ops.mkString("\n")
  }

  /** Single page under a /Type0 composite font with a /ToUnicode CMap.
    * `shows` are (hexCodes, x, y) triples — e.g. ("00010002", 72, 700) shows
    * the two 2-byte codes 1 and 2. `cmapBody` is the section payload between
    * `begincmap`/`endcmap` (codespacerange/bfchar/bfrange lines).
    * Object layout: 1 catalog, 2 pages, 3 font, 4 page, 5 content, 6 cmap.
    */
  def buildType0(shows: Seq[(String, Int, Int)], cmapBody: String,
                 padTo: Int = 1024): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))

    w("%PDF-1.7\n")
    w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    w("2 0 obj\n<< /Type /Pages /Kids [ 4 0 R ] /Count 1 >>\nendobj\n")
    w("3 0 obj\n<< /Type /Font /Subtype /Type0 /BaseFont /Synthetic-Identity-H " +
      "/Encoding /Identity-H /ToUnicode 6 0 R >>\nendobj\n")
    w("4 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 612 792 ] " +
      "/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>\nendobj\n")
    val content = shows.map { case (hex, x, y) =>
      s"BT /F1 12 Tf $x $y Td <$hex> Tj ET"
    }.mkString("\n")
    w(s"5 0 obj\n<< /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n")
    val cmap =
      "/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n" +
      "/CMapName /Synthetic-UCS def\n/CMapType 2 def\n" +
      cmapBody +
      "\nendcmap\nCMapName currentdict /CMap defineresource pop\nend\nend\n"
    w(s"6 0 obj\n<< /Length ${cmap.length} >>\nstream\n$cmap\nendstream\nendobj\n")
    w("trailer\n<< /Size 7 /Root 1 0 R >>\n%%EOF\n")
    if (out.size() < padTo) {
      w("%")
      while (out.size() < padTo - 1) out.write('x')
      w("\n")
    }
    out.toByteArray
  }

  /** Type0 font with a named predefined CMap encoding (e.g. UniJIS-UCS2-H,
    * UniGB-UTF16-H) and NO /ToUnicode — the CJK shape produced by writers
    * that rely on the viewer's bundled Adobe CMap resources. For the
    * UniXX-UCS2/UTF16 family the show-string codes are UTF-16BE units.
    */
  def buildType0Predef(shows: Seq[(String, Int, Int)], encoding: String,
                       padTo: Int = 1024): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    w("%PDF-1.7\n")
    w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    w("2 0 obj\n<< /Type /Pages /Kids [ 4 0 R ] /Count 1 >>\nendobj\n")
    w("3 0 obj\n<< /Type /Font /Subtype /Type0 /BaseFont /Synthetic-CJK " +
      s"/Encoding /$encoding /DescendantFonts [ 6 0 R ] >>\nendobj\n")
    w("4 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 612 792 ] " +
      "/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>\nendobj\n")
    val content = shows.map { case (hex, x, y) =>
      s"BT /F1 12 Tf $x $y Td <$hex> Tj ET"
    }.mkString("\n")
    w(s"5 0 obj\n<< /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n")
    w("6 0 obj\n<< /Type /Font /Subtype /CIDFontType0 /BaseFont /Synthetic-CJK " +
      "/CIDSystemInfo << /Registry (Adobe) /Ordering (Japan1) /Supplement 7 >> >>\nendobj\n")
    w("trailer\n<< /Size 7 /Root 1 0 R >>\n%%EOF\n")
    if (out.size() < padTo) {
      w("%")
      while (out.size() < padTo - 1) out.write('x')
      w("\n")
    }
    out.toByteArray
  }

  /** Identity-H Type0 WITHOUT /ToUnicode but WITH an embedded TrueType
    * program (/FontFile2) whose `cmap` carries the unicode→gid mapping —
    * the composite-font shape real-world subset-embedded PDFs use.
    */
  def buildType0Embedded(shows: Seq[(String, Int, Int)], fontFile: Array[Byte],
                         padTo: Int = 1024): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    w("%PDF-1.7\n")
    w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    w("2 0 obj\n<< /Type /Pages /Kids [ 4 0 R ] /Count 1 >>\nendobj\n")
    w("3 0 obj\n<< /Type /Font /Subtype /Type0 /BaseFont /Synthetic-TT " +
      "/Encoding /Identity-H /DescendantFonts [ 6 0 R ] >>\nendobj\n")
    w("4 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 612 792 ] " +
      "/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>\nendobj\n")
    val content = shows.map { case (hex, x, y) =>
      s"BT /F1 12 Tf $x $y Td <$hex> Tj ET"
    }.mkString("\n")
    w(s"5 0 obj\n<< /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n")
    w("6 0 obj\n<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Synthetic-TT " +
      "/CIDToGIDMap /Identity /FontDescriptor 7 0 R >>\nendobj\n")
    w("7 0 obj\n<< /Type /FontDescriptor /FontName /Synthetic-TT /Flags 4 " +
      "/FontFile2 8 0 R >>\nendobj\n")
    w(s"8 0 obj\n<< /Length ${fontFile.length} >>\nstream\n")
    out.write(fontFile)
    w("\nendstream\nendobj\n")
    w("trailer\n<< /Size 9 /Root 1 0 R >>\n%%EOF\n")
    if (out.size() < padTo) {
      w("%")
      while (out.size() < padTo - 1) out.write('x')
      w("\n")
    }
    out.toByteArray
  }

  /** Minimal sfnt carrying only a cmap table with one subtable (fixture
    * font programs for [[TrueTypeCmap]]).
    */
  def sfntWithCmap(sub: Array[Byte], plat: Int, enc: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    def w32(v: Int): Unit = { w16((v >> 16) & 0xFFFF); w16(v & 0xFFFF) }
    w32(0x00010000); w16(1); w16(16); w16(0); w16(0) // offset table, 1 table
    out.write("cmap".getBytes(ISO_8859_1)); w32(0); w32(28); w32(12 + sub.length)
    w16(0); w16(1) // cmap version, 1 encoding record
    w16(plat); w16(enc); w32(12) // subtable at cmap+12
    out.write(sub)
    out.toByteArray
  }

  /** Format-4 cmap subtable from (startChar, endChar, startGid) segments. */
  def cmapFormat4(segs: Seq[(Int, Int, Int)]): Array[Byte] = {
    val all = segs :+ ((0xFFFF, 0xFFFF, 0))
    val n = all.length
    val out = new ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    w16(4); w16(16 + 8 * n); w16(0)
    w16(n * 2); w16(2); w16(0); w16(0)
    all.foreach { case (_, e, _) => w16(e) }
    w16(0)
    all.foreach { case (s, _, _) => w16(s) }
    all.foreach { case (s, _, g) => w16((g - s) & 0xFFFF) }
    all.foreach(_ => w16(0))
    out.toByteArray
  }

  /** Format-0 cmap subtable (byte encoding table): 256-entry gid array. */
  def cmapFormat0(gidFor: Int => Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    w16(0); w16(262); w16(0)
    (0 until 256).foreach(c => out.write(gidFor(c) & 0xFF))
    out.toByteArray
  }

  /** Format-6 cmap subtable (trimmed table): firstCode + contiguous gids. */
  def cmapFormat6(firstCode: Int, gids: Seq[Int]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    w16(6); w16(10 + 2 * gids.length); w16(0)
    w16(firstCode); w16(gids.length)
    gids.foreach(w16)
    out.toByteArray
  }

  /** Format-12 cmap subtable from (startChar, endChar, startGid) groups. */
  def cmapFormat12(groups: Seq[(Int, Int, Int)]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    def w32(v: Int): Unit = { w16((v >> 16) & 0xFFFF); w16(v & 0xFFFF) }
    w16(12); w16(0); w32(16 + 12 * groups.length); w32(0); w32(groups.length)
    groups.foreach { case (s, e, g) => w32(s); w32(e); w32(g) }
    out.toByteArray
  }

  /** Single page whose catalog/pages/page dicts live inside a compressed
    * PDF 1.5 object stream (`/Type /ObjStm`, obj 6); only the content
    * stream (obj 5) and the container are direct objects — the shape a
    * body scan cannot read without ObjStm expansion.
    */
  def buildObjStm(content: String, padTo: Int = 1024): Array[Byte] = {
    val members = Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [ 4 0 R ] /Count 1 >>",
      3 -> "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
      4 -> ("<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 612 792 ] " +
            "/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>"))
    val bodies = members.map(_._2)
    val offsets = bodies.scanLeft(0)((acc, b) => acc + b.length + 1).init
    val header = members.map(_._1).zip(offsets)
      .map { case (num, off) => s"$num $off" }.mkString(" ") + "\n"
    val payload = (header + bodies.mkString("\n") + "\n").getBytes(ISO_8859_1)
    val first = header.length
    val packed = deflate(payload)

    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    w("%PDF-1.5\n")
    w(s"5 0 obj\n<< /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n")
    w(s"6 0 obj\n<< /Type /ObjStm /N ${members.length} /First $first " +
      s"/Filter /FlateDecode /Length ${packed.length} >>\nstream\n")
    out.write(packed)
    w("\nendstream\nendobj\n")
    w("%%EOF\n")
    if (out.size() < padTo) {
      w("%")
      while (out.size() < padTo - 1) out.write('x')
      w("\n")
    }
    out.toByteArray
  }

  /** Image-only ("scanned") page: no fonts, no text operators — a single
    * full-page image XObject carrying 8-bit DeviceGray (or interleaved
    * DeviceRGB) samples, FlateDecoded. The shape the reference rasterizes
    * and OCRs (`ocr_adapters.py:49-76`); here the OCR path reads the
    * samples directly. Object layout: 1 catalog, 2 pages, 3 page,
    * 4 content, 5 image.
    */
  def buildScanned(samples: Array[Byte], w: Int, h: Int, rgb: Boolean = false,
                   padTo: Int = 1024, dct: Boolean = false,
                   ccitt: Boolean = false, mask: Boolean = false,
                   rotate: Int = 0, ccittK: Int = -1): Array[Byte] = {
    require(!(dct && ccitt) && !(ccitt && rgb), "ccitt is bilevel gray only")
    require(!mask || ccitt, "mask fixtures are CCITT stencils")
    require(rotate % 90 == 0, "/Rotate must be a multiple of 90")
    val out = new ByteArrayOutputStream()
    def wr(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    wr("%PDF-1.7\n")
    wr("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    wr("2 0 obj\n<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>\nendobj\n")
    val rotDecl = if (rotate != 0) s"/Rotate $rotate " else ""
    wr(s"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 612 792 ] $rotDecl" +
      "/Resources << /XObject << /Im0 5 0 R >> >> /Contents 4 0 R >>\nendobj\n")
    val content = s"q $w 0 0 $h 72 ${720 - h} cm /Im0 Do Q"
    wr(s"4 0 obj\n<< /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n")
    // ccittK selects the fax flavor (PDF /K semantics): < 0 pure-2-D G4,
    // 0 → 1-D G3 MH with byte-aligned rows ("CCITT RLE" — the
    // EncodedByteAlign true form), > 0 → mixed-2-D G3 with EOLs
    val packed =
      if (dct) encodeJpeg(samples, w, h, rgb)
      else if (ccitt && ccittK < 0) CcittTiff.encodeG4(samples, w, h)
      else if (ccitt && ccittK == 0) CcittTiff.encodeCcitt(samples, w, h, "CCITT RLE")
      else if (ccitt) CcittTiff.encodeCcitt(samples, w, h, "CCITT T.4", t4Options = 1)
      else deflate(samples)
    // a mask is a color-space-less stencil (/ImageMask true); otherwise the
    // usual explicit ColorSpace + BitsPerComponent pair
    val colorDecl =
      if (mask) "/ImageMask true /BitsPerComponent 1 "
      else s"/ColorSpace ${if (rgb) "/DeviceRGB" else "/DeviceGray"} " +
        s"/BitsPerComponent ${if (ccitt) 1 else 8} "
    val filter = if (dct) "/DCTDecode"
      else if (ccitt) "/CCITTFaxDecode" else "/FlateDecode"
    val parms =
      if (ccitt && ccittK < 0) s"/DecodeParms << /K -1 /Columns $w /Rows $h >> "
      else if (ccitt && ccittK == 0)
        s"/DecodeParms << /K 0 /EncodedByteAlign true /Columns $w /Rows $h >> "
      else if (ccitt)
        s"/DecodeParms << /K $ccittK /EndOfLine true /Columns $w /Rows $h >> "
      else ""
    wr(s"5 0 obj\n<< /Type /XObject /Subtype /Image /Width $w /Height $h " +
      colorDecl + s"/Filter $filter $parms" +
      s"/Length ${packed.length} >>\nstream\n")
    out.write(packed)
    wr("\nendstream\nendobj\n")
    wr("trailer\n<< /Size 6 /Root 1 0 R >>\n%%EOF\n")
    if (out.size() < padTo) {
      wr("%")
      while (out.size() < padTo - 1) out.write('x')
      wr("\n")
    }
    out.toByteArray
  }

  /** JPEG-encode samples (gray 1 B/px or RGB 3 B/px interleaved) at maximum
    * quality via the in-JDK writer — the DCTDecode fixture payload (real
    * scanned PDFs overwhelmingly embed JPEG rasters, the class the
    * reference feeds to pdf2image+Tesseract, ocr_adapters.py:62). Quality
    * 1.0 keeps the round-trip error far inside the OCR binarization margin
    * (|err| ≲ 16 around 0/255 edges vs threshold 128), so text recovery is
    * exact even though JPEG is lossy. Deterministic for a fixed JDK encoder.
    */
  def encodeJpeg(samples: Array[Byte], w: Int, h: Int, rgb: Boolean): Array[Byte] = {
    import java.awt.image.BufferedImage
    val img = new BufferedImage(w, h,
      if (rgb) BufferedImage.TYPE_3BYTE_BGR else BufferedImage.TYPE_BYTE_GRAY)
    if (rgb) {
      var i = 0
      while (i < w * h) {
        val r = samples(3 * i) & 0xFF
        val g = samples(3 * i + 1) & 0xFF
        val b = samples(3 * i + 2) & 0xFF
        img.setRGB(i % w, i / w, (r << 16) | (g << 8) | b)
        i += 1
      }
    } else img.getRaster.setDataElements(0, 0, w, h, samples)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(1.0f)
    val bos = new ByteArrayOutputStream
    // in-memory output stream (identical bytes): the default
    // createImageOutputStream spools through a disk cache file per encode
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    writer.dispose()
    ios.flush() // MemoryCacheImageOutputStream does NOT flush on close
    ios.close()
    bos.toByteArray
  }

  /** Content stream laying out a rows×cols grid of cell texts at fixed
    * column x positions (table-detection fixtures).
    */
  def gridStream(rows: Seq[Seq[String]], colXs: Seq[Int],
                 topY: Int = 700, lineStep: Int = 20): String = {
    rows.zipWithIndex.flatMap { case (cells, r) =>
      cells.zip(colXs).collect { case (cell, x) if cell.nonEmpty =>
        s"BT /F1 12 Tf $x ${topY - r * lineStep} Td (${escape(cell)}) Tj ET"
      }
    }.mkString("\n")
  }

  /** Ruled-grid page: drawn boundary lines (`m/l S`) carry the structure,
    * text x positions may be RAGGED per row (`jitter(row, col)` points of
    * per-cell shift) so span-alignment detection alone cannot recover the
    * columns — only [[RuleGrid]] can. Column boundaries sit at `colXs` and
    * `colXs.last + colWidth`; row boundaries every `rowStep` from `topY`.
    */
  def ruledGridStream(rows: Seq[Seq[String]], colXs: Seq[Int],
                      colWidth: Int = 140, topY: Int = 700, rowStep: Int = 20,
                      jitter: (Int, Int) => Int = (_, _) => 0): String = {
    val xBounds = colXs ++ Seq(colXs.last + colWidth)
    val yBounds = (0 to rows.length).map(topY + 4 - _ * rowStep)
    val sb = new StringBuilder
    yBounds.foreach(y => sb.append(s"${xBounds.head} $y m ${xBounds.last} $y l S\n"))
    xBounds.foreach(x => sb.append(s"$x ${yBounds.last} m $x ${yBounds.head} l S\n"))
    rows.zipWithIndex.foreach { case (cells, r) =>
      cells.zip(colXs).zipWithIndex.foreach { case ((cell, x), c) =>
        if (cell.nonEmpty) {
          val cx = x + 4 + jitter(r, c)
          sb.append(s"BT /F1 12 Tf $cx ${topY - 10 - r * rowStep} Td (${escape(cell)}) Tj ET\n")
        }
      }
    }
    sb.toString
  }

  def escape(s: String): String =
    s.flatMap {
      case '(' => "\\("
      case ')' => "\\)"
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case c => c.toString
    }

  // per-thread Deflater (fixed level 6): reset() keeps the configured level
  // and native state; output bytes are identical to a fresh instance
  private val deflaterLocal: ThreadLocal[java.util.zip.Deflater] =
    ThreadLocal.withInitial(() => new java.util.zip.Deflater(6))

  /** Deterministic deflate (fixed level, no header variance). */
  def deflate(data: Array[Byte]): Array[Byte] = {
    val d = deflaterLocal.get
    try {
      d.setInput(data); d.finish()
      val out = new ByteArrayOutputStream(data.length + 64)
      val buf = new Array[Byte](8192)
      while (!d.finished()) {
        val k = d.deflate(buf)
        out.write(buf, 0, k)
      }
      out.toByteArray
    } finally d.reset()
  }
}
