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
}
