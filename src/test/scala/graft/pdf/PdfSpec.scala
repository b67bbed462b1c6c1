package graft.pdf

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.ISO_8859_1
import graft.pipeline.Kernel

/** PDF span-ordering fixtures (FIXTURES.md §3.3). */
class PdfSpec extends AnyFunSuite {

  private def text(bytes: Array[Byte]): String =
    PdfExtractor.extract(bytes).fold(e => fail(s"extract failed: $e"), _.text)

  test("pdf-single-tj: the reference fixture shape verbatim") {
    val pdf = MiniPdf.singlePage(Seq(("Test PDF", 100, 700)))
    assert(text(pdf) == "Test PDF")
  }

  test("pdf-multi-td: descending y → top-to-bottom lines, \\n-joined") {
    val pdf = MiniPdf.singlePage(Seq(("line one", 100, 700), ("line two", 100, 660), ("line three", 100, 620)))
    assert(text(pdf) == "line one\nline two\nline three")
  }

  test("pdf-tj-array: kerning numbers ignored") {
    val stream = "BT /F1 12 Tf 100 700 Td [(He) -20 (llo)] TJ ET"
    val pdf = MiniPdf.build(Seq(stream))
    assert(text(pdf) == "Hello")
  }

  test("pdf-out-of-order: bottom-first stream restored to reading order") {
    val pdf = MiniPdf.singlePage(Seq(("third", 100, 620), ("first", 100, 700), ("second", 100, 660)))
    assert(text(pdf) == "first\nsecond\nthird")
  }

  test("pdf-two-pages: pages joined with \\n\\n") {
    val pdf = MiniPdf.build(Seq(
      MiniPdf.streamFor(Seq(("page one text", 100, 700))),
      MiniPdf.streamFor(Seq(("page two text", 100, 700)))))
    assert(text(pdf) == "page one text\n\npage two text")
  }

  test("pdf-flate: FlateDecode stream gives identical output") {
    val plain = MiniPdf.singlePage(Seq(("Test PDF", 100, 700)), flate = false)
    val flate = MiniPdf.singlePage(Seq(("Test PDF", 100, 700)), flate = true)
    assert(text(flate) == text(plain))
  }

  test("pdf-escapes: \\( \\) \\\\ \\n decoded in string literal") {
    val stream = "BT /F1 12 Tf 100 700 Td (a\\(b\\)c\\\\d\\ne) Tj ET"
    val pdf = MiniPdf.build(Seq(stream))
    assert(text(pdf) == "a(b)c\\d\ne")
  }

  test("pdf-quote-ops: ' and \" move-then-show semantics") {
    val stream = "BT /F1 12 Tf 14 TL 100 700 Td (first) Tj (second) ' 1 1 (third) \" ET"
    val pdf = MiniPdf.build(Seq(stream))
    assert(text(pdf) == "first\nsecond\nthird")
  }

  test("pdf-octal and hex strings") {
    // Td is relative to the current line start: 0 -20 moves one line down
    val stream = "BT /F1 12 Tf 100 700 Td (\\101\\102) Tj 0 -20 Td <43 44> Tj ET"
    val pdf = MiniPdf.build(Seq(stream))
    assert(text(pdf) == "AB\nCD")
  }

  test("pdf-invalid: truncated body → error, no throw") {
    val bytes = "%PDF-1.7\nthis is not a pdf body".getBytes(ISO_8859_1) ++
      Array.fill[Byte](1024)('x')
    val r = Kernel.extractOne(bytes)
    assert(r.status == "error")
    assert(r.error != null)
  }

  test("pdf-too-small: validity floor before extraction (file_utils.py:64-66)") {
    val small = MiniPdf.build(Seq(MiniPdf.streamFor(Seq(("tiny", 100, 700)))), padTo = 0)
    val r = Kernel.extractOne(small.take(900))
    assert(r.status == "error")
    assert(r.error == "pdf_too_small")
  }

  test("classify-native: long extractable text with fonts → native_text") {
    val longLines = (0 until 12).map(i => (s"This line number $i carries plenty of body text for the page.", 72, 720 - 14 * i))
    val pdf = MiniPdf.singlePage(longLines)
    val d = PdfExtractor.extract(pdf).toOption.get
    assert(d.docType == "native_text")
    assert(d.confidence == 100.0)
  }

  test("classify-scanned: image-only page, no text ops") {
    val stream = "q 612 0 0 792 0 0 cm /Im0 Do Q"
    val pdf = MiniPdf.build(Seq(stream), withFont = false)
    val d = PdfExtractor.extract(pdf).toOption.get
    assert(d.docType == "scanned")
    assert(d.text == "")
  }

  test("spans index into the extracted text") {
    val pdf = MiniPdf.build(Seq(
      MiniPdf.streamFor(Seq(("alpha", 100, 700), ("beta", 100, 660))),
      MiniPdf.streamFor(Seq(("gamma", 100, 700)))))
    val d = PdfExtractor.extract(pdf).toOption.get
    assert(d.text == "alpha\nbeta\n\ngamma")
    d.spans.foreach { s =>
      val slice = d.text.substring(s.off, s.off + s.len)
      assert(Seq("alpha", "beta", "gamma").contains(slice))
    }
    assert(d.spans.map(_.page) == Vector(0, 0, 1))
  }

  test("pdf /Info metadata extracted (S5: pdf_info_adapter.py:55-90)") {
    val pdf = MiniPdf.build(Seq(MiniPdf.streamFor(Seq(("body", 72, 700)))),
      info = Seq("Title" -> "Informe anual", "Author" -> "Unidad OCR", "Producer" -> "graft"))
    val d = PdfExtractor.extract(pdf).toOption.get
    assert(d.metadata == Map("title" -> "Informe anual", "author" -> "Unidad OCR",
      "producer" -> "graft"))
  }

  test("/Info text strings: UTF-16BE BOM, PDFDocEncoding high block, UTF-8 BOM") {
    import PdfObjects.textString
    // UTF-16BE with BOM — how Acrobat writes every non-ASCII title
    val utf16 = Array[Byte](0xFE.toByte, 0xFF.toByte) ++
      "Año 2026 — informe".getBytes(java.nio.charset.StandardCharsets.UTF_16BE)
    assert(textString(utf16) == "Año 2026 — informe")
    // PDF 2.0 UTF-8 BOM
    val utf8 = Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
      "świat".getBytes(java.nio.charset.StandardCharsets.UTF_8)
    assert(textString(utf8) == "świat")
    // PDFDocEncoding: 0x8D/0x8E smart quotes, 0x84 em-dash, 0xA0 euro
    assert(textString(Array[Byte](0x8D.toByte, 'o', 'k', 0x8E.toByte, ' ',
      0x84.toByte, ' ', 0xA0.toByte, '5')) == "“ok” — €5")
    // plain ASCII stays identical
    assert(textString("D:20260817120000Z".getBytes(ISO_8859_1)) == "D:20260817120000Z")
    // end-to-end: a UTF-16BE /Title through the /Info probe
    val hexTitle = utf16.map(b => f"${b & 0xFF}%02X").mkString
    val pdf = MiniPdf.build(Seq(MiniPdf.streamFor(Seq(("body", 72, 700)))),
      info = Seq("Author" -> "Unidad OCR"), rawInfo = Seq("Title" -> s"<$hexTitle>"))
    val d = PdfExtractor.extract(pdf).toOption.get
    assert(d.metadata("title") == "Año 2026 — informe", s"got ${d.metadata}")
  }

  test("RunLengthDecode: literals, runs, EOD, truncation, end-to-end") {
    import PdfObjects.runLengthDecode
    // literal + run + EOD (PDF 1.7 §7.4.5)
    val enc = Array[Byte](2, 'a', 'b', 'c', (257 - 5).toByte, 'x', 0, 'z', 128.toByte)
    assert(runLengthDecode(enc).toOption.get.sameElements("abcxxxxxz".getBytes))
    // missing EOD tolerated
    assert(runLengthDecode(Array[Byte](1, 'h', 'i')).toOption.get
      .sameElements("hi".getBytes))
    // truncated literal / truncated run → typed errors
    assert(runLengthDecode(Array[Byte](5, 'a')).isLeft)
    assert(runLengthDecode(Array[Byte](200.toByte)).isLeft)
    // end-to-end: a RunLengthDecode content stream through the extractor
    // (the run branch is exercised by the repeated dots)
    val plain = "BT /F1 12 Tf 72 700 Td (RLE works.......) Tj ET".getBytes(ISO_8859_1)
    val bos = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < plain.length) { // literal-chunk encoder, runs left as literals
      val n = math.min(128, plain.length - i)
      bos.write(n - 1); bos.write(plain, i, n); i += n
    }
    bos.write(128)
    val payload = bos.toByteArray
    val pdf = ("%PDF-1.7\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [ 3 0 R ] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [ 0 0 612 792 ] " +
      "/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >> endobj\n" +
      "4 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj\n" +
      s"5 0 obj << /Length ${payload.length} /Filter /RunLengthDecode >> stream\n")
      .getBytes(ISO_8859_1) ++ payload ++
      "\nendstream endobj\n".getBytes(ISO_8859_1) ++
      // pad past the validity floor
      ("%" + "x" * 1024 + "\n%%EOF\n").getBytes(ISO_8859_1)
    val d = PdfExtractor.extract(pdf).toOption.get
    assert(d.text == "RLE works.......", s"got '${d.text}'")
  }

  test("property: extractor is total on corrupted variants") {
    val base = MiniPdf.build(Seq(MiniPdf.streamFor(Seq(("Some stable text here", 100, 700)))), flate = true)
    val rnd = new scala.util.Random(11)
    (1 to 200).foreach { _ =>
      val bytes = base.clone()
      rnd.nextInt(3) match {
        case 0 => bytes(rnd.nextInt(bytes.length)) = rnd.nextInt(256).toByte
        case 1 => // truncate
          val cut = rnd.nextInt(bytes.length)
          val r = Kernel.extractOne(bytes.take(cut)); assert(r != null)
        case _ =>
          val i = rnd.nextInt(bytes.length)
          bytes(i) = '('
      }
      val r = Kernel.extractOne(bytes)
      assert(r.status == "processed" || r.status == "error")
    }
  }

  // --- CID/Type0 fonts via /ToUnicode CMaps (FontDecode) ---

  test("type0-bfchar: 2-byte codes map through ToUnicode") {
    val cmap =
      """1 begincodespacerange
        |<0000> <FFFF>
        |endcodespacerange
        |3 beginbfchar
        |<0001> <0048>
        |<0002> <006F>
        |<0003> <006C0061>
        |endbfchar""".stripMargin
    val pdf = MiniPdf.buildType0(Seq(("000100020003", 72, 700)), cmap)
    assert(text(pdf) == "Hola")
  }

  test("type0-bfrange: contiguous range with incremented destination") {
    val cmap =
      """1 begincodespacerange
        |<0000> <FFFF>
        |endcodespacerange
        |1 beginbfrange
        |<0010> <0019> <0041>
        |endbfrange""".stripMargin
    val pdf = MiniPdf.buildType0(Seq(("00100011001200130014", 72, 700)), cmap)
    assert(text(pdf) == "ABCDE")
  }

  test("type0-bfrange-array: per-code destination list") {
    val cmap =
      """1 begincodespacerange
        |<0000> <FFFF>
        |endcodespacerange
        |1 beginbfrange
        |<0001> <0003> [<0058> <0059> <005A>]
        |endbfrange""".stripMargin
    val pdf = MiniPdf.buildType0(Seq(("000100020003", 72, 700)), cmap)
    assert(text(pdf) == "XYZ")
  }

  test("type0-accents: non-ASCII UTF-16BE destinations (Spanish docs)") {
    val cmap =
      """1 begincodespacerange
        |<0000> <FFFF>
        |endcodespacerange
        |2 beginbfchar
        |<0005> <00E9>
        |<0006> <00F1>
        |endbfchar""".stripMargin
    val pdf = MiniPdf.buildType0(Seq(("00050006", 72, 700)), cmap)
    assert(text(pdf) == "\u00e9\u00f1")
  }

  test("type0-identity-degrade: Type0 with unusable CMap decodes BMP codes") {
    // empty cmap body -> no sections -> FontDec(2, empty) Identity fallback
    val pdf = MiniPdf.buildType0(Seq(("00480069", 72, 700)), "")
    assert(text(pdf) == "Hi")
  }

  test("type0-multiline: ToUnicode decoding composes with span layout") {
    val cmap =
      """1 begincodespacerange
        |<0000> <FFFF>
        |endcodespacerange
        |2 beginbfchar
        |<0001> <0075 0070>
        |<0002> <0064 006F 0077 006E>
        |endbfchar""".stripMargin
    val pdf = MiniPdf.buildType0(Seq(("0001", 72, 700), ("0002", 72, 660)), cmap)
    assert(text(pdf) == "up\ndown")
  }

  test("type0-predef-ucs2: UniJIS-UCS2-H codes decode as UTF-16BE units") {
    // 日本語 = U+65E5 U+672C U+8A9E; no /ToUnicode, no embedded font —
    // the predefined Unicode CMap family decodes from the codes alone
    val pdf = MiniPdf.buildType0Predef(Seq(("65E5672C8A9E", 72, 700)), "UniJIS-UCS2-H")
    assert(text(pdf) == "日本語")
  }

  test("type0-predef-utf16: UniGB-UTF16-H pairs surrogates") {
    // U+20000 (𠀀, CJK ext-B) is D840 DC00 in UTF-16BE, followed by BMP 中
    val pdf = MiniPdf.buildType0Predef(Seq(("D840DC004E2D", 72, 700)), "UniGB-UTF16-H")
    assert(text(pdf) == new String(Character.toChars(0x20000)) + "中")
  }

  test("type0-predef-ucs2 does NOT pair surrogates (stray unit -> U+FFFD)") {
    val pdf = MiniPdf.buildType0Predef(Seq(("D840DC004E2D", 72, 700)), "UniKS-UCS2-H")
    assert(text(pdf) == "��中")
  }

  test("type0-predef-cid-keyed GBK-EUC-H decodes via the GBK charset") {
    // show-string bytes are GBK: D6D0 CEC4 41 = 中文A (mixed 2-byte CJK and
    // 1-byte ASCII — the variable-width case a fixed code length cannot do)
    val pdf = MiniPdf.buildType0Predef(Seq(("D6D0CEC441", 72, 700)), "GBK-EUC-H")
    assert(text(pdf) == "中文A")
  }

  test("type0-predef-cid-keyed 90ms-RKSJ-H decodes via windows-31j") {
    // 93FA 967B 41 = 日本A in Shift_JIS/windows-31j
    val pdf = MiniPdf.buildType0Predef(Seq(("93FA967B41", 72, 700)), "90ms-RKSJ-H")
    assert(text(pdf) == "日本A")
  }

  test("type0-predef unknown CMap names keep the degrade") {
    // not in the Unicode family and not a known CID-keyed CMap:
    // 0xBDF0 reads as fixed-width code -> BMP char U+BDF0 (degrade)
    val pdf = MiniPdf.buildType0Predef(Seq(("BDF0", 72, 700)), "Foo-Bar-H")
    assert(text(pdf) == 0xBDF0.toChar.toString)
  }

  test("type0-predef-utf16: truncated high surrogate at end -> U+FFFD") {
    val pdf = MiniPdf.buildType0Predef(Seq(("4E2DD840", 72, 700)), "UniJIS-UTF16-H")
    assert(text(pdf) == "中�")
  }

  // --- PDF table detection from span geometry (TableGrid) ---

  private val gridRows = Seq(
    Seq("name", "qty", "price"),
    Seq("ink", "2", "9.50"),
    Seq("pen", "10", "1.20"))

  test("table-grid: aligned columns across rows become a table") {
    val pdf = MiniPdf.build(Seq(MiniPdf.gridStream(gridRows, Seq(72, 200, 330))))
    val d = PdfExtractor.extract(pdf).toOption.get
    assert(d.tables.length == 1)
    assert(d.tables.head.data == gridRows.map(_.toVector).toVector)
    assert(d.tables.head.confidence == 1.0)
  }

  test("table-grid: main text still contains the cells (pdfplumber semantics)") {
    val pdf = MiniPdf.build(Seq(MiniPdf.gridStream(gridRows, Seq(72, 200, 330))))
    val d = PdfExtractor.extract(pdf).toOption.get
    assert(d.text == "name qty price\nink 2 9.50\npen 10 1.20")
  }

  test("table-grid: one table per page -> table_heavy (pdf_analyzer.py:96-122)") {
    val pdf = MiniPdf.build(Seq(MiniPdf.gridStream(gridRows, Seq(72, 200, 330))))
    val d = PdfExtractor.extract(pdf).toOption.get
    assert(d.docType == "table_heavy")
  }

  test("table-grid: ragged row -> empty cell, confidence < 1") {
    val ragged = Seq(Seq("a", "b", "c"), Seq("d", "", "f"))
    val pdf = MiniPdf.build(Seq(MiniPdf.gridStream(ragged, Seq(72, 200, 330))))
    val d = PdfExtractor.extract(pdf).toOption.get
    assert(d.tables.length == 1)
    assert(d.tables.head.data == Vector(Vector("a", "b", "c"), Vector("d", "", "f")))
    assert(math.abs(d.tables.head.confidence - 5.0 / 6.0) < 1e-9)
  }

  test("table-grid: prose above and below is not swallowed into the table") {
    val stream = Seq(
      MiniPdf.streamFor(Seq(("Informe de ventas", 72, 720))),
      MiniPdf.gridStream(gridRows, Seq(72, 200, 330), topY = 700),
      MiniPdf.streamFor(Seq(("fin del informe", 72, 640)))).mkString("\n")
    val d = PdfExtractor.extract(MiniPdf.build(Seq(stream))).toOption.get
    assert(d.tables.length == 1)
    assert(d.tables.head.data.length == 3)
    assert(d.text.startsWith("Informe de ventas\n"))
    assert(d.text.endsWith("\nfin del informe"))
  }

  test("table-grid: single-column prose never detects a table") {
    val pdf = MiniPdf.singlePage(Seq(("uno", 72, 700), ("dos", 72, 680), ("tres", 72, 660)))
    val d = PdfExtractor.extract(pdf).toOption.get
    assert(d.tables.isEmpty)
    assert(d.docType != "table_heavy")
  }

  test("table-grid: tables flow through the kernel row") {
    val pdf = MiniPdf.build(Seq(MiniPdf.gridStream(gridRows, Seq(72, 200, 330))))
    val r = Kernel.extractOne(pdf)
    assert(r.status == "processed")
    assert(r.tables.length == 1 && r.tables.head.data.length == 3)
  }

  // --- PDF 1.5 object streams (ObjStm expansion) ---

  test("objstm: page tree inside a compressed object stream is found") {
    val pdf = MiniPdf.buildObjStm("BT /F1 12 Tf 100 700 Td (Dentro del ObjStm) Tj ET")
    assert(text(pdf) == "Dentro del ObjStm")
  }

  test("objstm: classification and fonts work for ObjStm-packed dicts") {
    val pdf = MiniPdf.buildObjStm(
      "BT /F1 12 Tf 72 700 Td (" + ("palabra " * 20).trim + ") Tj ET")
    val d = PdfExtractor.extract(pdf).toOption.get
    assert(d.pageCount == 1)
    assert(d.confidence == 100.0)
    assert(d.docType == "native_text")
  }

  test("objstm: truncated container degrades to error, never throws") {
    val base = MiniPdf.buildObjStm("BT /F1 12 Tf 100 700 Td (x) Tj ET")
    (Seq(100, 400, 700) :+ (base.length - 40)).foreach { cut =>
      val r = Kernel.extractOne(base.take(cut) ++ Array.fill[Byte](1100)('%'))
      assert(r.status == "processed" || r.status == "error")
    }
  }

  test("contents-array: multiple content streams per page concatenate") {
    // hand-build: page /Contents [5 0 R 6 0 R]
    val c1 = "BT /F1 12 Tf 72 700 Td (parte uno) Tj ET"
    val c2 = "BT /F1 12 Tf 72 680 Td (parte dos) Tj ET"
    val sb = new StringBuilder
    sb.append("%PDF-1.7\n")
    sb.append("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    sb.append("2 0 obj\n<< /Type /Pages /Kids [ 4 0 R ] /Count 1 >>\nendobj\n")
    sb.append("3 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n")
    sb.append("4 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 612 792 ] " +
      "/Resources << /Font << /F1 3 0 R >> >> /Contents [ 5 0 R 6 0 R ] >>\nendobj\n")
    sb.append(s"5 0 obj\n<< /Length ${c1.length} >>\nstream\n$c1\nendstream\nendobj\n")
    sb.append(s"6 0 obj\n<< /Length ${c2.length} >>\nstream\n$c2\nendstream\nendobj\n")
    sb.append("%%EOF\n")
    while (sb.length < 1024) sb.append('%')
    assert(text(sb.toString.getBytes(ISO_8859_1)) == "parte uno\nparte dos")
  }

  // --- stream filters beyond Flate ---

  private def onePageWithStream(streamBody: Array[Byte], filter: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w(x: String): Unit = out.write(x.getBytes(ISO_8859_1))
    w("%PDF-1.7\n")
    w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    w("2 0 obj\n<< /Type /Pages /Kids [ 4 0 R ] /Count 1 >>\nendobj\n")
    w("3 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n")
    w("4 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 612 792 ] " +
      "/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>\nendobj\n")
    w(s"5 0 obj\n<< /Length ${streamBody.length} /Filter /$filter >>\nstream\n")
    out.write(streamBody)
    w("\nendstream\nendobj\n%%EOF\n")
    while (out.size() < 1024) out.write('%')
    out.toByteArray
  }

  test("asciihex filter: hex-encoded content stream decodes") {
    val content = "BT /F1 12 Tf 72 700 Td (hex ok) Tj ET"
    val hex = content.getBytes(ISO_8859_1).map(b => f"$b%02X").mkString(" ") + ">"
    assert(text(onePageWithStream(hex.getBytes(ISO_8859_1), "ASCIIHexDecode")) == "hex ok")
  }

  test("ascii85 filter: base-85 content stream decodes (z-group + partial tail)") {
    val content = "BT /F1 12 Tf 72 700 Td (a85 ok) Tj ET"
    val enc = encode85(content.getBytes(ISO_8859_1)) + "~>"
    assert(text(onePageWithStream(enc.getBytes(ISO_8859_1), "ASCII85Decode")) == "a85 ok")
    // round-trip property incl. zero runs and ragged tails
    val rnd = new scala.util.Random(3)
    (1 to 100).foreach { _ =>
      val n = rnd.nextInt(40)
      val bs = Array.fill[Byte](n)(if (rnd.nextInt(4) == 0) 0 else rnd.nextInt(256).toByte)
      val dec = PdfObjects.ascii85Decode((encode85(bs) + "~>").getBytes(ISO_8859_1))
      assert(dec.toOption.exists(_.sameElements(bs)))
    }
  }

  private def encode85(bs: Array[Byte]): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < bs.length) {
      val n = math.min(4, bs.length - i)
      var v = 0L
      (0 until 4).foreach { j =>
        v = (v << 8) | (if (j < n) bs(i + j) & 0xFF else 0)
      }
      if (n == 4 && v == 0) sb.append('z')
      else {
        val cs = new Array[Char](5)
        var k = 4
        var x = v
        while (k >= 0) { cs(k) = ('!' + (x % 85).toInt).toChar; x /= 85; k -= 1 }
        sb.appendAll(cs, 0, n + 1)
      }
      i += n
    }
    sb.toString
  }

  test("differences-encoding: simple font remaps bytes via glyph names") {
    // byte 0xE9 -> /ntilde, 0x40 -> /eacute, 0x23 -> /uni20AC; others identity
    val out = new java.io.ByteArrayOutputStream()
    def w(x: String): Unit = out.write(x.getBytes(ISO_8859_1))
    val content = "BT /F1 12 Tf 72 700 Td (pi\\351a @ #5) Tj ET" // \351 = 0xE9
    w("%PDF-1.7\n")
    w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    w("2 0 obj\n<< /Type /Pages /Kids [ 4 0 R ] /Count 1 >>\nendobj\n")
    w("3 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
      "/Encoding << /Type /Encoding /Differences [ 35 /uni20AC 64 /eacute 233 /ntilde ] >> >>\nendobj\n")
    w("4 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 612 792 ] " +
      "/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>\nendobj\n")
    w(s"5 0 obj\n<< /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n%%EOF\n")
    while (out.size() < 1024) out.write('%')
    assert(text(out.toByteArray) == "pi\u00f1a \u00e9 \u20ac5")
  }

  test("simple-font base encodings: WinAnsi smart punctuation, MacRoman high range") {
    def onePage(fontObj: String, content: String): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def w(x: String): Unit = out.write(x.getBytes(ISO_8859_1))
      w("%PDF-1.7\n")
      w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
      w("2 0 obj\n<< /Type /Pages /Kids [ 4 0 R ] /Count 1 >>\nendobj\n")
      w(s"3 0 obj\n$fontObj\nendobj\n")
      w("4 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 612 792 ] " +
        "/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>\nendobj\n")
      w(s"5 0 obj\n<< /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n%%EOF\n")
      while (out.size() < 1024) out.write('%')
      out.toByteArray
    }
    // WinAnsi: 0x93/0x94 curly double quotes, 0x97 em-dash, 0x80 euro —
    // the windows-1252 block Latin-1 reads as C1 controls
    val win = onePage(
      "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>",
      "BT /F1 12 Tf 72 700 Td (\\223ok\\224 \\227 \\2005) Tj ET")
    assert(text(win) == "“ok” — €5", s"got '${text(win)}'")
    // MacRoman: 0x8E é, 0xD2/0xD3 curly double quotes
    val mac = onePage(
      "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /MacRomanEncoding >>",
      "BT /F1 12 Tf 72 700 Td (caf\\216 \\322si\\323) Tj ET")
    assert(text(mac) == "café “si”", s"got '${text(mac)}'")
    // dict form: /BaseEncoding composes with /Differences, differences win
    val mixed = onePage(
      "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding " +
        "<< /Type /Encoding /BaseEncoding /WinAnsiEncoding /Differences [ 151 /ntilde ] >> >>",
      "BT /F1 12 Tf 72 700 Td (\\223a\\227b\\224) Tj ET")
    assert(text(mixed) == "“añb”", s"got '${text(mixed)}'")
  }

  test("glyph names starting with 'u' at hex-plausible lengths hit the AGL table") {
    // "uacute"/"ugrave" look like uXXXX systematic names (len 5-7, lead 'u')
    // but their tails are not hex — they must resolve via AGL, not die on
    // the failed hex parse
    assert(FontDecode.glyphToText("uacute").contains("ú"))
    assert(FontDecode.glyphToText("ugrave").contains("ù"))
    assert(FontDecode.glyphToText("u0041").contains("A"))   // systematic uXXXX
    assert(FontDecode.glyphToText("uni20AC").contains("€"))
    assert(FontDecode.glyphToText("uD800").isEmpty)         // valid hex, surrogate
    import PdfObjects._
    val font = PDict(Map("Encoding" -> PDict(Map("Differences" ->
      PArr(Vector(PNum(65), PName("uacute"), PName("ugrave")))))))
    val m = FontDecode.differencesMap(font, new Objects(Map.empty))
    assert(m == Map(65 -> "ú", 66 -> "ù"))
  }

  test("inherited /Resources: fonts and encodings come from the /Pages node") {
    // PDF 1.7 §7.7.3.4: /Resources is inheritable; a page without its own
    // entry uses the ancestor's. Font carries a Differences encoding so the
    // test fails visibly (garbled text) if inheritance is skipped.
    val out = new java.io.ByteArrayOutputStream()
    def w(x: String): Unit = out.write(x.getBytes(ISO_8859_1))
    val content = "BT /F1 12 Tf 72 700 Td (pi\\351a colada) Tj ET" // \351 = 0xE9
    w("%PDF-1.7\n")
    w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    w("2 0 obj\n<< /Type /Pages /Kids [ 4 0 R ] /Count 1 " +
      "/Resources << /Font << /F1 3 0 R >> >> >>\nendobj\n")
    w("3 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
      "/Encoding << /Differences [ 233 /ntilde ] >> >>\nendobj\n")
    w("4 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 612 792 ] " +
      "/Contents 5 0 R >>\nendobj\n") // NO page-level /Resources
    w(s"5 0 obj\n<< /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n%%EOF\n")
    while (out.size() < 1024) out.write('%')
    val doc = PdfExtractor.extract(out.toByteArray).toOption.get
    assert(doc.text == "piña colada", s"text='${doc.text}'")
    // sawFont sees the inherited font dict → not misclassified as scanned
    assert(doc.docType != "scanned", s"type=${doc.docType}")
  }

  test("MiniPdf info: xref offsets align with object numbers (authoritative path)") {
    // the Info object is numbered 4+2n and must be WRITTEN last so the
    // sequential xref table maps offsets to the right objects — a shifted
    // table silently demoted every Info fixture to the body-scan fallback
    val pdf = MiniPdf.build(Seq(MiniPdf.streamFor(Seq(("T", 72, 700)))),
      info = Seq("Title" -> "Aligned"))
    val entries = PdfObjects.parseXrefChain(pdf)
    assert(entries.nonEmpty)
    val bytes = new String(pdf, ISO_8859_1)
    entries.foreach { case (num, e) =>
      if (e.kind == 1)
        assert(bytes.startsWith(s"$num 0 obj", e.a.toInt),
          s"xref entry $num points at '${bytes.substring(e.a.toInt, math.min(bytes.length, e.a.toInt + 12))}'")
    }
    val doc = PdfExtractor.extract(pdf).toOption.get
    assert(doc.metadata.get("title").contains("Aligned"))
  }

  test("differences-encoding: consecutive names advance the code") {
    import PdfObjects._
    val font = PDict(Map("Encoding" -> PDict(Map("Differences" ->
      PArr(Vector(PNum(65), PName("aacute"), PName("eacute"), PNum(200), PName("Ntilde")))))))
    val m = FontDecode.differencesMap(font, new Objects(Map.empty))
    assert(m == Map(65 -> "\u00e1", 66 -> "\u00e9", 200 -> "\u00d1"))
  }

  test("tounicode: 1-byte codespacerange drives single-byte decode") {
    val cmap = ("1 begincodespacerange\n<00> <FF>\nendcodespacerange\n" +
      "1 beginbfchar\n<41> <0431>\nendbfchar").getBytes(ISO_8859_1)
    val Some((len, m)) = FontDecode.parseToUnicode(cmap)
    assert(len == 1 && m == Map(0x41 -> "\u0431"))
    val dec = FontDecode.FontDec(len, m)
    assert(dec.decode("ABC".getBytes(ISO_8859_1)) == "\u0431BC") // B,C identity
  }

  test("glyphToText: AGL names, uniXXXX/uXXXX forms, unknowns skipped") {
    assert(FontDecode.glyphToText("ntilde").contains("\u00f1"))
    assert(FontDecode.glyphToText("uni20AC").contains("\u20ac"))
    assert(FontDecode.glyphToText("u1F600").contains(new String(Character.toChars(0x1F600))))
    assert(FontDecode.glyphToText("g123").isEmpty)
    assert(FontDecode.glyphToText("uniZZZZ").isEmpty)
  }

  test("lzw filter: spec-shaped 9-bit code stream decodes") {
    // codes for input 45x5 65 45x3 66: clear, literals and table refs
    val codes = Seq(256, 45, 258, 258, 65, 259, 66, 257)
    val packed = packCodes(codes.map(c => (c, 9)))
    val got = PdfObjects.lzwDecode(packed).toOption.get
    val want = Array.fill[Byte](5)(45) ++ Array[Byte](65) ++
      Array.fill[Byte](3)(45) ++ Array[Byte](66)
    assert(got.sameElements(want))
  }

  test("lzw filter: encoder round-trip incl. width growth past 511 entries") {
    val rnd = new scala.util.Random(9)
    (1 to 30).foreach { _ =>
      // long enough to force dict past 511 -> 10-bit codes
      val n = 200 + rnd.nextInt(3000)
      val bs = Array.fill[Byte](n)((rnd.nextInt(8) + 'a').toByte)
      val enc = lzwEncode(bs, 1)
      val dec = PdfObjects.lzwDecode(enc, 1)
      assert(dec.toOption.exists(_.sameElements(bs)), s"round-trip failed at n=$n")
    }
  }

  test("lzw filter: end-to-end content stream") {
    val content = "BT /F1 12 Tf 72 700 Td (lzw ok) Tj ET"
    val enc = lzwEncode(content.getBytes(ISO_8859_1), 1)
    assert(text(onePageWithStream(enc, "LZWDecode")) == "lzw ok")
  }

  private def packCodes(codes: Seq[(Int, Int)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var buf = 0L; var bits = 0
    codes.foreach { case (c, w) =>
      buf = (buf << w) | c; bits += w
      while (bits >= 8) { out.write(((buf >>> (bits - 8)) & 0xFF).toInt); bits -= 8 }
    }
    if (bits > 0) out.write(((buf << (8 - bits)) & 0xFF).toInt)
    out.toByteArray
  }

  /** Minimal PDF LZW encoder mirroring the decoder's width rule. */
  private def lzwEncode(data: Array[Byte], earlyChange: Int): Array[Byte] = {
    val dict = scala.collection.mutable.Map.empty[Seq[Byte], Int]
    (0 until 256).foreach(i => dict(Seq(i.toByte)) = i)
    var next = 258; var width = 9
    val codes = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    codes += ((256, width))
    var cur = Seq.empty[Byte]
    data.foreach { b =>
      val ext = cur :+ b
      if (dict.contains(ext)) cur = ext
      else {
        codes += ((dict(cur), width))
        if (next < 4096) {
          dict(ext) = next; next += 1
          if (next + earlyChange > (1 << width) && width < 12) width += 1
        }
        cur = Seq(b)
      }
    }
    if (cur.nonEmpty) codes += ((dict(cur), width))
    codes += ((257, width))
    packCodes(codes.toSeq)
  }

  test("png predictor: sub/up/average/paeth rows round-trip") {
    val rnd = new scala.util.Random(13)
    (1 to 50).foreach { _ =>
      val cols = 1 + rnd.nextInt(24)
      val rows = 1 + rnd.nextInt(12)
      val plain = Array.fill[Byte](cols * rows)(rnd.nextInt(256).toByte)
      // encode: pick a filter per row, emit filter byte + filtered bytes
      val enc = new java.io.ByteArrayOutputStream()
      val prior = new Array[Byte](cols)
      (0 until rows).foreach { r =>
        val row = plain.slice(r * cols, (r + 1) * cols)
        val ft = rnd.nextInt(5)
        enc.write(ft)
        (0 until cols).foreach { i =>
          val left = if (i >= 1) row(i - 1) & 0xFF else 0
          val up = prior(i) & 0xFF
          val upLeft = if (i >= 1) prior(i - 1) & 0xFF else 0
          val x = row(i) & 0xFF
          val pred = ft match {
            case 0 => 0
            case 1 => left
            case 2 => up
            case 3 => (left + up) / 2
            case 4 =>
              val p = left + up - upLeft
              val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - upLeft)
              if (pa <= pb && pa <= pc) left else if (pb <= pc) up else upLeft
          }
          enc.write((x - pred) & 0xFF)
        }
        System.arraycopy(row, 0, prior, 0, cols)
      }
      val dec = PdfObjects.pngDepredict(enc.toByteArray, cols, 1, 8)
      assert(dec.toOption.exists(_.sameElements(plain)), s"cols=$cols rows=$rows")
    }
  }

  test("png predictor: end-to-end flate+predictor content stream") {
    val content = "BT /F1 12 Tf 72 700 Td (predicted ok) Tj ET"
    val bytes = content.getBytes(ISO_8859_1)
    val cols = 10
    // encode with filter type 2 (up) rows
    val enc = new java.io.ByteArrayOutputStream()
    val prior = new Array[Byte](cols)
    var i = 0
    while (i < bytes.length) {
      val len = math.min(cols, bytes.length - i)
      enc.write(2)
      (0 until len).foreach { j =>
        enc.write(((bytes(i + j) & 0xFF) - (prior(j) & 0xFF)) & 0xFF)
      }
      java.util.Arrays.fill(prior, 0.toByte)
      System.arraycopy(bytes, i, prior, 0, len)
      i += len
    }
    val packed = MiniPdf.deflate(enc.toByteArray)
    val out = new java.io.ByteArrayOutputStream()
    def w(x: String): Unit = out.write(x.getBytes(ISO_8859_1))
    w("%PDF-1.7\n")
    w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    w("2 0 obj\n<< /Type /Pages /Kids [ 4 0 R ] /Count 1 >>\nendobj\n")
    w("3 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n")
    w("4 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 612 792 ] " +
      "/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>\nendobj\n")
    w(s"5 0 obj\n<< /Length ${packed.length} /Filter /FlateDecode " +
      s"/DecodeParms << /Predictor 12 /Columns $cols >> >>\nstream\n")
    out.write(packed)
    w("\nendstream\nendobj\n%%EOF\n")
    while (out.size() < 1024) out.write('%')
    assert(text(out.toByteArray) == "predicted ok")
  }

  private def sfntWithCmap(sub: Array[Byte], plat: Int, enc: Int): Array[Byte] =
    MiniPdf.sfntWithCmap(sub, plat, enc)
  private def cmapFormat4(segs: Seq[(Int, Int, Int)]): Array[Byte] =
    MiniPdf.cmapFormat4(segs)
  private def cmapFormat12(groups: Seq[(Int, Int, Int)]): Array[Byte] =
    MiniPdf.cmapFormat12(groups)

  test("type0 no-tounicode: Identity-H decodes via embedded TrueType cmap (format 4)") {
    val ttf = sfntWithCmap(cmapFormat4(Seq((0x41, 0x5A, 1))), 3, 1) // A..Z → gid 1..26
    val pdf = MiniPdf.buildType0Embedded(Seq(("0008000F000C0001", 72, 700)), ttf)
    assert(text(pdf) == "HOLA") // gids 8,15,12,1
  }

  test("type0 no-tounicode: format-12 cmap with a non-ASCII codepoint") {
    val ttf = sfntWithCmap(cmapFormat12(
      Seq((0x61, 0x7A, 100), (0xF1, 0xF1, 200))), 3, 10) // a..z→100.., ñ→200
    // "mañana": m=112, a=100, ñ=200, a, n=113, a
    val pdf = MiniPdf.buildType0Embedded(
      Seq(("0070006400C80064 00710064".replace(" ", ""), 72, 700)), ttf)
    assert(text(pdf) == "mañana")
  }

  test("type0 no-tounicode: format-6 (trimmed table) cmap decodes") {
    // firstCode 'H': H→5, I→6, J→7 (an embedded subset font's minimal map)
    val ttf = sfntWithCmap(MiniPdf.cmapFormat6(0x48, Seq(5, 6, 7)), 1, 0)
    val pdf = MiniPdf.buildType0Embedded(Seq(("000500060007", 72, 700)), ttf)
    assert(text(pdf) == "HIJ")
  }

  test("type0 no-tounicode: format-0 (byte encoding) cmap decodes") {
    // gid = charCode - 0x40 for A..Z, 0 elsewhere
    val ttf = sfntWithCmap(
      MiniPdf.cmapFormat0(c => if (c >= 0x41 && c <= 0x5A) c - 0x40 else 0), 1, 0)
    val pdf = MiniPdf.buildType0Embedded(Seq(("0008000F000C0001", 72, 700)), ttf)
    assert(text(pdf) == "HOLA") // gids 8,15,12,1
  }

  test("truetype cmap: truncated format-6 table degrades, never throws") {
    val full = MiniPdf.cmapFormat6(0x41, Seq(1, 2, 3, 4))
    (0 until full.length).foreach { cut =>
      val m = TrueTypeCmap.reverseMap(MiniPdf.sfntWithCmap(full.take(cut), 1, 0))
      assert(m.values.forall(_.nonEmpty)) // total: partial or empty map, no throw
    }
  }

  test("type0 no-tounicode: garbage FontFile2 keeps the documented degrade") {
    val pdf = MiniPdf.buildType0Embedded(Seq(("00480069", 72, 700)),
      Array.fill[Byte](64)(0x5A)) // not an sfnt
    assert(text(pdf) == "Hi") // BMP-codepoint degrade, as before
  }

  test("truetype cmap reverse: lowest codepoint wins for shared glyphs") {
    // 'A'(0x41) and 'a'(0x61) both → gid 7
    val m = TrueTypeCmap.reverseMap(
      sfntWithCmap(cmapFormat4(Seq((0x41, 0x41, 7), (0x61, 0x61, 7))), 3, 1))
    assert(m(7) == "A")
  }

  test("ruled-grid: drawn rules with ragged text extract the correct table") {
    // per-cell x jitter means no column ever aligns across rows — the
    // span-alignment strategy cannot see this table, only the rules can
    val jitter = (r: Int, c: Int) => (r * 7 + c * 5) % 23
    val pdf = MiniPdf.build(Seq(MiniPdf.ruledGridStream(
      Seq(Seq("name", "qty"), Seq("ancho", "7"), Seq("bolt", "12")),
      Seq(72, 212), jitter = jitter)))
    val doc = PdfExtractor.extract(pdf).toOption.get
    assert(doc.tables.length == 1, s"tables=${doc.tables}")
    assert(doc.tables.head.data ==
      Seq(Seq("name", "qty"), Seq("ancho", "7"), Seq("bolt", "12")))
    assert(doc.tables.head.confidence == 1.0)
    // main text unaltered: cells still read as lines (pdfplumber semantics)
    assert(doc.text == "name qty\nancho 7\nbolt 12")
  }

  test("ruled-grid: thin filled rects act as rules") {
    val s = new StringBuilder
    // horizontal 1pt-high bars at y 704/684/664, vertical 1pt-wide at x 72/212/352
    Seq(704, 684, 664).foreach(y => s.append(s"72 $y 281 1 re f\n"))
    Seq(72, 212, 352).foreach(x => s.append(s"$x 664 1 41 re f\n"))
    s.append("BT /F1 12 Tf 80 690 Td (alpha) Tj ET\n")
    s.append("BT /F1 12 Tf 230 690 Td (beta) Tj ET\n")
    s.append("BT /F1 12 Tf 91 670 Td (gamma) Tj ET\n")
    s.append("BT /F1 12 Tf 219 670 Td (delta) Tj ET\n")
    val doc = PdfExtractor.extract(MiniPdf.build(Seq(s.toString))).toOption.get
    assert(doc.tables.length == 1, s"tables=${doc.tables}")
    assert(doc.tables.head.data == Seq(Seq("alpha", "beta"), Seq("gamma", "delta")))
  }

  test("ruled-grid: a plain border box around prose is not a table") {
    val s = "72 600 200 100 re S\nBT /F1 12 Tf 80 650 Td (solo en caja) Tj ET"
    val doc = PdfExtractor.extract(MiniPdf.build(Seq(s))).toOption.get
    assert(doc.tables.isEmpty, s"tables=${doc.tables}")
    assert(doc.text == "solo en caja")
  }

  test("ruled-grid: clip-only path (n) draws no rules") {
    val s = "72 600 400 200 re W n\nBT /F1 12 Tf 80 650 Td (clipped) Tj ET"
    val doc = PdfExtractor.extract(MiniPdf.build(Seq(s))).toOption.get
    assert(doc.tables.isEmpty)
    assert(doc.text == "clipped")
  }

  test("ruled-grid: ruled table and aligned-span table coexist, no double count") {
    val ruled = MiniPdf.ruledGridStream(
      Seq(Seq("a", "b"), Seq("c", "d")), Seq(72, 212),
      jitter = (r, c) => (r * 9 + c) % 13)
    // an aligned-span grid BELOW the ruled one (y 500 down)
    val aligned = MiniPdf.gridStream(
      Seq(Seq("k1", "v1"), Seq("k2", "v2"), Seq("k3", "v3")), Seq(72, 220), topY = 500)
    val doc = PdfExtractor.extract(MiniPdf.build(Seq(ruled + "\n" + aligned))).toOption.get
    assert(doc.tables.length == 2, s"tables=${doc.tables.map(_.data)}")
    assert(doc.tables.map(_.data).contains(Seq(Seq("a", "b"), Seq("c", "d"))))
    assert(doc.tables.map(_.data).contains(
      Seq(Seq("k1", "v1"), Seq("k2", "v2"), Seq("k3", "v3"))))
  }

  /** Offset-tracking builder for incremental-update fixtures. */
  private class IncrementalPdf {
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    def size: Int = out.size()

    /** Base document: catalog(1) pages(2) font(3) page(4) content(5). */
    def base(content: String): Map[Int, Int] = {
      w("%PDF-1.7\n")
      val offs = scala.collection.mutable.Map[Int, Int]()
      offs(1) = size; w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
      offs(2) = size; w("2 0 obj\n<< /Type /Pages /Kids [ 4 0 R ] /Count 1 >>\nendobj\n")
      offs(3) = size; w("3 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n")
      offs(4) = size; w("4 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 612 792 ] " +
        "/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>\nendobj\n")
      offs(5) = size; contentObj(5, content)
      offs.toMap
    }

    def contentObj(num: Int, content: String): Int = {
      val at = size
      val bytes = content.getBytes(ISO_8859_1)
      w(s"$num 0 obj\n<< /Length ${bytes.length} >>\nstream\n")
      out.write(bytes)
      w("\nendstream\nendobj\n")
      at
    }

    /** Classic xref section + trailer + startxref; one subsection per object. */
    def xrefClassic(entries: Map[Int, Int], free: Set[Int] = Set.empty,
                    prev: Option[Int] = None, extraTrailer: String = ""): Int = {
      val at = size
      w("xref\n0 1\n0000000000 65535 f \n")
      entries.toSeq.sortBy(_._1).foreach { case (n, o) =>
        w(s"$n 1\n"); w(f"$o%010d 00000 n \n")
      }
      free.toSeq.sorted.foreach { n => w(s"$n 1\n"); w("0000000000 00001 f \n") }
      val p = prev.map(x => s" /Prev $x").getOrElse("")
      w(s"trailer\n<< /Size 10 /Root 1 0 R$p$extraTrailer >>\nstartxref\n$at\n%%EOF\n")
      at
    }

    /** PDF 1.5 xref STREAM section (W [1 4 2], Flate) + startxref. */
    def xrefStream(objNum: Int, entries: Map[Int, Int], prev: Option[Int] = None,
                   standalone: Boolean = true): Int = {
      val at = size
      val rows = entries.toSeq.sortBy(_._1)
      val data = new java.io.ByteArrayOutputStream()
      rows.foreach { case (_, off) =>
        data.write(1)
        data.write((off >> 24) & 0xFF); data.write((off >> 16) & 0xFF)
        data.write((off >> 8) & 0xFF); data.write(off & 0xFF)
        data.write(0); data.write(0)
      }
      val packed = MiniPdf.deflate(data.toByteArray)
      val index = rows.map { case (n, _) => s"$n 1" }.mkString(" ")
      val p = prev.map(x => s" /Prev $x").getOrElse("")
      w(s"$objNum 0 obj\n<< /Type /XRef /Size 10 /W [ 1 4 2 ] /Index [ $index ] " +
        s"/Filter /FlateDecode /Length ${packed.length} /Root 1 0 R$p >>\nstream\n")
      out.write(packed)
      w("\nendstream\nendobj\n")
      if (standalone) w("startxref\n" + at + "\n%%EOF\n")
      at
    }

    def bytes: Array[Byte] = {
      while (out.size() < 1024) out.write('%')
      out.toByteArray
    }
  }

  test("incremental update: appended newer object wins through the xref chain") {
    val b = new IncrementalPdf
    val offs = b.base("BT /F1 12 Tf 72 700 Td (version one) Tj ET")
    val x1 = b.xrefClassic(offs)
    val v2 = b.contentObj(5, "BT /F1 12 Tf 72 700 Td (version two) Tj ET")
    b.xrefClassic(Map(5 -> v2), prev = Some(x1))
    assert(text(b.bytes) == "version two")
  }

  test("incremental update: xref ROLLBACK beats body-scan last-object-wins") {
    // the update appends a v2 body, but the newest xref section points the
    // object back at v1's offset — a pure body scan would return v2
    val b = new IncrementalPdf
    val offs = b.base("BT /F1 12 Tf 72 700 Td (version one) Tj ET")
    val x1 = b.xrefClassic(offs)
    b.contentObj(5, "BT /F1 12 Tf 72 700 Td (version two) Tj ET")
    b.xrefClassic(Map(5 -> offs(5)), prev = Some(x1))
    assert(text(b.bytes) == "version one")
  }

  test("incremental update: newest section marking the object FREE deletes it") {
    val b = new IncrementalPdf
    val offs = b.base("BT /F1 12 Tf 72 700 Td (version one) Tj ET")
    val x1 = b.xrefClassic(offs)
    b.xrefClassic(Map.empty, free = Set(5), prev = Some(x1))
    val got = PdfExtractor.extract(b.bytes).fold(_ => "", _.text)
    assert(!got.contains("version"), s"deleted object resurrected: '$got'")
  }

  test("xref-deleted object inside an /ObjStm is not resurrected by expansion") {
    // obj 7 lives only inside container 8 (/Type /ObjStm); the newest xref
    // section marks 7 free. Body-scan removal alone cannot delete it (it was
    // never a direct object) — the expansion loop must honor the deletion.
    val b = new IncrementalPdf
    val offs = b.base("BT /F1 12 Tf 72 700 Td (body) Tj ET")
    val payload = "7 0\n<< /Marker (hola) >>\n".getBytes(ISO_8859_1)
    val packed = MiniPdf.deflate(payload)
    val at8 = b.size
    b.w(s"8 0 obj\n<< /Type /ObjStm /N 1 /First 4 /Filter /FlateDecode " +
      s"/Length ${packed.length} >>\nstream\n")
    b.out.write(packed)
    b.w("\nendstream\nendobj\n")
    val x1 = b.xrefClassic(offs + (8 -> at8))
    b.xrefClassic(Map.empty, free = Set(7), prev = Some(x1))
    val objs = PdfObjects.parseAll(b.bytes)
    assert(!objs.byNum.contains(7), "xref-deleted ObjStm member resurrected")
    assert(objs.byNum.contains(8)) // the container itself still resolves
    // and without the deletion the member IS visible (the fixture is real)
    val b2 = new IncrementalPdf
    val offs2 = b2.base("BT /F1 12 Tf 72 700 Td (body) Tj ET")
    val at8b = b2.size
    b2.w(s"8 0 obj\n<< /Type /ObjStm /N 1 /First 4 /Filter /FlateDecode " +
      s"/Length ${packed.length} >>\nstream\n")
    b2.out.write(packed)
    b2.w("\nendstream\nendobj\n")
    b2.xrefClassic(offs2 + (8 -> at8b))
    assert(PdfObjects.parseAll(b2.bytes).byNum.contains(7))
  }

  test("incremental update: rollback via a PDF 1.5 xref STREAM section") {
    val b = new IncrementalPdf
    val offs = b.base("BT /F1 12 Tf 72 700 Td (version one) Tj ET")
    val x1 = b.xrefClassic(offs)
    b.contentObj(5, "BT /F1 12 Tf 72 700 Td (version two) Tj ET")
    b.xrefStream(9, Map(5 -> offs(5)), prev = Some(x1))
    assert(text(b.bytes) == "version one")
  }

  test("hybrid /XRefStm entries take precedence over the classic section") {
    // the newest CLASSIC section still lists obj 5 at the stale v1 offset,
    // but its /XRefStm maps 5 to v2 — PDF 1.7 §7.5.8.4: the stream wins
    val b = new IncrementalPdf
    val offs = b.base("BT /F1 12 Tf 72 700 Td (version one) Tj ET")
    val v2 = b.contentObj(5, "BT /F1 12 Tf 72 700 Td (version two) Tj ET")
    val xs = b.xrefStream(9, Map(5 -> v2), standalone = false)
    b.xrefClassic(Map(5 -> offs(5)), extraTrailer = s" /XRefStm $xs")
    assert(text(b.bytes) == "version two")
  }

  test("ruled-grid: stray footer line and underline do not veto the grid") {
    val grid = MiniPdf.ruledGridStream(
      Seq(Seq("a", "b"), Seq("c", "d")), Seq(72, 212),
      jitter = (r, c) => (r * 11 + c) % 13)
    // a short underline near the text and a full-width footer separator,
    // both crossing no vertical rule → they must drop out, not veto
    val strays = "80 500 m 130 500 l S\n40 60 m 560 60 l S\n"
    val doc = PdfExtractor.extract(MiniPdf.build(Seq(grid + "\n" + strays))).toOption.get
    assert(doc.tables.map(_.data).contains(Seq(Seq("a", "b"), Seq("c", "d"))),
      s"stray rules vetoed the grid: ${doc.tables.map(_.data)}")
  }

  test("ruled-grid: two disjoint grids on one page become two tables") {
    val g1 = MiniPdf.ruledGridStream(Seq(Seq("a", "b"), Seq("c", "d")), Seq(72, 212),
      topY = 700, jitter = (r, c) => (r * 7 + c) % 11)
    val g2 = MiniPdf.ruledGridStream(Seq(Seq("x", "y"), Seq("z", "w")), Seq(72, 212),
      topY = 400, jitter = (r, c) => (r * 5 + c) % 9)
    val doc = PdfExtractor.extract(MiniPdf.build(Seq(g1 + "\n" + g2))).toOption.get
    assert(doc.tables.map(_.data) ==
      Seq(Seq(Seq("a", "b"), Seq("c", "d")), Seq(Seq("x", "y"), Seq("z", "w"))),
      s"got ${doc.tables.map(_.data)}")
  }

  test("encrypted pdf: /Encrypt in the trailer refuses with a typed error") {
    val b = new IncrementalPdf
    val offs = b.base("BT /F1 12 Tf 72 700 Td (secreto) Tj ET")
    b.xrefClassic(offs, extraTrailer = " /Encrypt 9 0 R")
    assert(PdfExtractor.extract(b.bytes) == Left("pdf_encrypted"))
    // and through the kernel: a typed error row, never fabricated text
    val r = Kernel.extractOne(b.bytes)
    assert(r.status == "error" && r.error == "pdf_encrypted" && r.text.isEmpty)
  }

  test("property: xref-chain parsing is total on corrupted incremental files") {
    val b = new IncrementalPdf
    val offs = b.base("BT /F1 12 Tf 72 700 Td (fuzz base) Tj ET")
    val x1 = b.xrefClassic(offs)
    val v2 = b.contentObj(5, "BT /F1 12 Tf 72 700 Td (fuzz two) Tj ET")
    b.xrefClassic(Map(5 -> v2), prev = Some(x1))
    val clean = b.bytes
    val rnd = new scala.util.Random(23)
    (1 to 200).foreach { _ =>
      val mutated = clean.clone()
      (0 until 1 + rnd.nextInt(8)).foreach { _ =>
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      }
      PdfExtractor.extract(mutated) // must never throw (Left is fine)
      PdfObjects.parseXrefChainFull(mutated)
    }
  }

  test("broken startxref offset degrades to the body scan, never throws") {
    val b = new IncrementalPdf
    b.base("BT /F1 12 Tf 72 700 Td (still works) Tj ET")
    b.w("startxref\n999999999\n%%EOF\n")
    assert(text(b.bytes) == "still works")
  }

  test("objects: reference cycles resolve to PNull, never StackOverflowError") {
    val body = "%PDF-1.7\n1 0 obj\n2 0 R\nendobj\n2 0 obj\n1 0 R\nendobj\n" +
      "3 0 obj\n3 0 R\nendobj\n4 0 obj\n(ok)\nendobj\n"
    val objs = PdfObjects.parseAll(body.getBytes(ISO_8859_1))
    assert(objs.resolve(PdfObjects.PRef(1, 0)) == PdfObjects.PNull) // 2-cycle
    assert(objs.resolve(PdfObjects.PRef(3, 0)) == PdfObjects.PNull) // self-cycle
    assert(objs.resolve(PdfObjects.PRef(4, 0)) != PdfObjects.PNull)
  }

  test("png predictor: bpc<8 non-byte-aligned width rounds row bytes UP") {
    // Columns=10, Colors=1, bpc=1 → true row is ceil(10/8)=2 bytes; a floor
    // would shift every row boundary and depredict against the wrong priors
    val rows = Seq(Array[Byte](0x5A, 0x40), Array[Byte](0x33, 0x80.toByte),
      Array[Byte](0x0F, 0xC0.toByte))
    val enc = new java.io.ByteArrayOutputStream()
    var prior = Array[Byte](0, 0)
    rows.foreach { r =>
      enc.write(2) // up filter
      (0 until 2).foreach(i => enc.write(((r(i) & 0xFF) - (prior(i) & 0xFF)) & 0xFF))
      prior = r
    }
    val dec = PdfObjects.pngDepredict(enc.toByteArray, 10, 1, 1).toOption.get
    assert(dec.sameElements(rows.flatten), s"got ${dec.toSeq} want ${rows.flatten}")
  }

  test("tiff predictor 2: horizontal differencing round-trips end-to-end") {
    val content = "BT /F1 12 Tf 72 700 Td (tiff pred ok) Tj ET"
    val bytes = content.getBytes(ISO_8859_1)
    val cols = 10
    // encode: per row, byte[i] -= byte[i-1] (colors=1, bpc=8)
    val enc = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < bytes.length) {
      val len = math.min(cols, bytes.length - i)
      (0 until len).foreach { j =>
        val prev = if (j == 0) 0 else bytes(i + j - 1) & 0xFF
        enc.write(((bytes(i + j) & 0xFF) - prev) & 0xFF)
      }
      i += len
    }
    val packed = MiniPdf.deflate(enc.toByteArray)
    val out = new java.io.ByteArrayOutputStream()
    def w(x: String): Unit = out.write(x.getBytes(ISO_8859_1))
    w("%PDF-1.7\n")
    w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    w("2 0 obj\n<< /Type /Pages /Kids [ 4 0 R ] /Count 1 >>\nendobj\n")
    w("3 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n")
    w("4 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 612 792 ] " +
      "/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>\nendobj\n")
    w(s"5 0 obj\n<< /Length ${packed.length} /Filter /FlateDecode " +
      s"/DecodeParms << /Predictor 2 /Columns $cols >> >>\nstream\n")
    out.write(packed)
    w("\nendstream\nendobj\n%%EOF\n")
    while (out.size() < 1024) out.write('%')
    assert(text(out.toByteArray) == "tiff pred ok")
  }

  test("decodeparms array is filter-parallel, not first-entry-for-all") {
    // [/LZWDecode /FlateDecode] where ONLY the Flate entry carries the
    // Predictor: applying the first parms dict to every filter would skip
    // the depredict after inflate and garble the content stream
    val content = "BT /F1 12 Tf 72 700 Td (parallel parms) Tj ET"
    val bytes = content.getBytes(ISO_8859_1)
    val cols = 10
    val enc = new java.io.ByteArrayOutputStream()
    val prior = new Array[Byte](cols)
    var i = 0
    while (i < bytes.length) {
      val len = math.min(cols, bytes.length - i)
      enc.write(2)
      (0 until len).foreach { j =>
        enc.write(((bytes(i + j) & 0xFF) - (prior(j) & 0xFF)) & 0xFF)
      }
      java.util.Arrays.fill(prior, 0.toByte)
      System.arraycopy(bytes, i, prior, 0, len)
      i += len
    }
    val packed = lzwEncode(MiniPdf.deflate(enc.toByteArray), 1)
    val out = new java.io.ByteArrayOutputStream()
    def w(x: String): Unit = out.write(x.getBytes(ISO_8859_1))
    w("%PDF-1.7\n")
    w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    w("2 0 obj\n<< /Type /Pages /Kids [ 4 0 R ] /Count 1 >>\nendobj\n")
    w("3 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n")
    w("4 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 612 792 ] " +
      "/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>\nendobj\n")
    w(s"5 0 obj\n<< /Length ${packed.length} /Filter [ /LZWDecode /FlateDecode ] " +
      s"/DecodeParms [ << /EarlyChange 1 >> << /Predictor 12 /Columns $cols >> ] >>\nstream\n")
    out.write(packed)
    w("\nendstream\nendobj\n%%EOF\n")
    while (out.size() < 1024) out.write('%')
    assert(text(out.toByteArray) == "parallel parms")
  }

  test("inline image: binary body with stray '(' and ops never fabricates text") {
    // BI params ID <binary containing ( and Tj and EI-without-ws> EI, then real text
    val body = Array[Byte]('(', 'f', 'a', 'k', 'e', ')', ' ', 'T', 'j', ' ',
      0x00, 0x28, 'x', 'E', 'I', 'x', 0xFF.toByte, ' ')
    val out = new java.io.ByteArrayOutputStream()
    def w(x: String): Unit = out.write(x.getBytes(ISO_8859_1))
    w("BT /F1 12 Tf 72 700 Td (antes) Tj ET\n")
    w("BI /W 2 /H 2 /BPC 8 /CS /G ID ")
    out.write(body)
    w("EI\nBT /F1 12 Tf 72 680 Td (despues) Tj ET")
    val content = new String(out.toByteArray, ISO_8859_1)
    val d = PdfExtractor.extract(MiniPdf.build(Seq(content))).toOption.get
    assert(d.text == "antes\ndespues")
  }
}
