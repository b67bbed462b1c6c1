package graft.ocr

import org.scalatest.funsuite.AnyFunSuite
import graft.ocr.GlyphFont._

class OcrSpec extends AnyFunSuite {

  test("every face: same-(w,h)-class trimmed templates pairwise distinct (hamming ≥ 3)") {
    // nearest-template matching at accept-threshold 1 is sound iff no two
    // glyphs of equal trimmed width AND height are within 2 bit flips: a
    // ≤1-bit corruption is then strictly nearest to the true glyph. Gated
    // per face — the bold derivation needs its M-counter override exactly
    // because plain dilation broke this for M/N
    GlyphFont.Faces.foreach { face =>
      val ts = Chars.map { c =>
        val (lo, hi) = face.trim(c)
        val (rlo, rhi) = face.rowTrim(c)
        val bits =
          for (row <- rlo to rhi; col <- lo to hi) yield face.ink(c, col, row)
        (c, hi - lo + 1, rhi - rlo + 1, bits)
      }
      for (a <- ts; b <- ts if a._1 < b._1 && a._2 == b._2 && a._3 == b._3) {
        val d = a._4.zip(b._4).count { case (x, y) => x != y }
        assert(d >= 3,
          s"${face.name} glyphs ${a._1}/${b._1} (${a._2}x${a._3}) too close: hamming $d")
      }
    }
  }

  test("font: every glyph starts within cell column 2 (pitch-space soundness)") {
    // space inference rounds Δstart/Pitch, exact iff in-cell start ≤ 2
    Chars.foreach { c =>
      val (lo, _) = trim(c)
      assert(lo <= 2, s"glyph $c starts at col $lo")
    }
  }

  test("clean render → exact recognition") {
    val lines = Vector("HELLO WORLD 42", "SECOND LINE 2026", "ABCDEFGHIJKLM",
      "NOPQRSTUVWXYZ 0123456789")
    val bmp = GlyphRender.render(lines)
    val r = GlyphOcr.recognize(bmp.gray, bmp.w, bmp.h)
    assert(r.text == lines.mkString("\n"))
    assert(r.matched == r.glyphs)
    assert(r.skew == 0.0)
  }

  test("mixed case and punctuation: clean render → exact recognition") {
    val lines = Vector(
      "Hello World, it's 2026!",
      "the quick brown fox jumps",
      "over the lazy dog? (yes)",
      "abcdefghijklmnopqrstuvwxyz",
      "punct: a.b c'd e-f \"g\" h;i",
      "Ascenders bdfhklt dotted ij")
    val bmp = GlyphRender.render(lines)
    val r = GlyphOcr.recognize(bmp.gray, bmp.w, bmp.h)
    assert(r.text == lines.mkString("\n"))
    assert(r.matched == r.glyphs)
  }

  test("mixed case survives skew + specks + RGB conversion") {
    val lines = Vector("Invoice no. 42, page 1", "Total: 99 euros (net)")
    GlyphOcr.SkewCandidates.grouped(5).map(_.head).foreach { s =>
      val bmp = GlyphRender.render(lines, skew0 = s, noiseSeed = 11L, noisePerGap = 3)
      val gray = GlyphOcr.rgbToGray(GlyphRender.toRgb(bmp), bmp.w, bmp.h)
      val r = GlyphOcr.recognize(gray, bmp.w, bmp.h)
      assert(r.text == lines.mkString("\n"), s"skew $s: '${r.text}'")
      assert(r.matchRate == 1.0)
    }
  }

  test("pitch-based spacing: narrow punctuation neither fakes nor eats spaces") {
    // '.' end-col 1 followed by col-1-start 'I' was the raw-gap threshold's
    // failure case; x-height-only lines exercise the 5-row band path
    val lines = Vector("a.I x.1 a. .a", "mm ii '' i'i w,w", "no uppercase here at all")
    val bmp = GlyphRender.render(lines)
    val r = GlyphOcr.recognize(bmp.gray, bmp.w, bmp.h)
    assert(r.text == lines.mkString("\n"), s"got '${r.text}'")
  }

  test("every skew candidate is recovered and un-sheared exactly") {
    val lines = Vector("SKEWED PAGE 7", "WITH TWO LINES")
    GlyphOcr.SkewCandidates.foreach { s =>
      val bmp = GlyphRender.render(lines, skew0 = s)
      val r = GlyphOcr.recognize(bmp.gray, bmp.w, bmp.h)
      assert(r.text == lines.mkString("\n"), s"skew $s broke recognition: '${r.text}'")
      assert(r.skew == s, s"estimated ${r.skew}, rendered $s")
      assert(r.matched == r.glyphs)
    }
  }

  test("gap specks are rejected by band height, not matched as glyphs") {
    val lines = Vector("NOISY SCAN 3", "MORE TEXT HERE")
    val bmp = GlyphRender.render(lines, skew0 = 0.025, noiseSeed = 99L, noisePerGap = 4)
    val r = GlyphOcr.recognize(bmp.gray, bmp.w, bmp.h)
    assert(r.text == lines.mkString("\n"), s"specks corrupted: '${r.text}'")
    assert(r.matchRate == 1.0)
  }

  test("RGB samples convert to luminance and recognize identically") {
    val lines = Vector("COLOR SCAN 88")
    val bmp = GlyphRender.render(lines, skew0 = -0.0375, noiseSeed = 5L, noisePerGap = 2)
    val gray = GlyphOcr.rgbToGray(GlyphRender.toRgb(bmp), bmp.w, bmp.h)
    val r = GlyphOcr.recognize(gray, bmp.w, bmp.h)
    assert(r.text == lines.mkString("\n"))
  }

  test("recognize is total on garbage and yields zero confidence") {
    assert(GlyphOcr.recognize(Array.emptyByteArray, 0, 0).glyphs == 0)
    assert(GlyphOcr.recognize(Array.fill[Byte](100)(0x40), 10, 10).matchRate == 0.0)
    // all-black page: zero local contrast → adaptive binarize finds no ink
    val black = GlyphOcr.recognize(Array.fill[Byte](400)(0), 20, 20)
    assert(black.matched == 0)
    // deterministic splitmix noise image
    val rnd = Array.tabulate[Byte](64 * 64)(i => graft.ops.Dedup.splitmix64(i).toByte)
    val r = GlyphOcr.recognize(rnd, 64, 64)
    assert(r.glyphs >= 0) // total, no throw
  }

  test("low-contrast scan (faded ink on gray paper) recognizes exactly") {
    // former fixed-128 rule: every pixel here is ≥ 128 → zero ink → blank
    val lines = Vector("Faded thermal receipt", "total 12.50, thanks!")
    val bmp = GlyphRender.render(lines, skew0 = 0.0125, noiseSeed = 6L, noisePerGap = 2)
    val faded = bmp.gray.map(b => (if ((b & 0xFF) < 128) 160 else 210).toByte)
    val r = GlyphOcr.recognize(faded, bmp.w, bmp.h)
    assert(r.text == lines.mkString("\n"), s"got '${r.text}'")
    assert(r.matchRate == 1.0)
  }

  test("illumination gradient (photographed page, one side shadowed) recognizes") {
    // background slides 140 → 250 across the width, ink tracks it at −60:
    // no single global threshold separates ink from background (left-side
    // background 140 is darker than right-side ink 190), but every 96-px
    // neighborhood is cleanly bimodal
    val lines = Vector("Photographed page, no scanner", "shadow on the left margin")
    val bmp = GlyphRender.render(lines, noiseSeed = 14L, noisePerGap = 2)
    val lit = new Array[Byte](bmp.gray.length)
    for (y <- 0 until bmp.h; x <- 0 until bmp.w) {
      val bg = 140 + x * 110 / math.max(1, bmp.w - 1)
      val i = y * bmp.w + x
      lit(i) = (if ((bmp.gray(i) & 0xFF) < 128) bg - 60 else bg).toByte
    }
    val r = GlyphOcr.recognize(lit, bmp.w, bmp.h)
    assert(r.text == lines.mkString("\n"), s"got '${r.text}'")
    assert(r.matchRate == 1.0)
  }

  test("blank gradient page binarizes to no ink (contrast floor)") {
    // a bare illumination gradient has per-neighborhood contrast below 40
    // even though the page-global range is 110 — nothing reads as ink
    val w = 300; val h = 120
    val grad = Array.tabulate[Byte](w * h)(i => (140 + (i % w) * 110 / (w - 1)).toByte)
    val r = GlyphOcr.recognize(grad, w, h)
    assert(r.glyphs == 0, s"gradient misread as ${r.glyphs} glyphs: '${r.text}'")
  }

  test("low-contrast scanned PDF end-to-end (Flate gray raster)") {
    val lines = Vector("Carbon copy, 3rd sheet")
    val bmp = GlyphRender.render(lines, skew0 = -0.025, noiseSeed = 15L, noisePerGap = 2)
    val faded = bmp.gray.map(b => (if ((b & 0xFF) < 128) 150 else 205).toByte)
    val pdf = graft.pdf.MiniPdf.buildScanned(faded, bmp.w, bmp.h)
    val doc = graft.pdf.PdfExtractor.extract(pdf).toOption.get
    assert(doc.docType == "scanned")
    assert(doc.text == lines.mkString("\n"), s"text='${doc.text}'")
    assert(doc.confidence == 100.0)
  }

  test("scanned PDF end-to-end: image XObject → OCR text, scanned class") {
    val lines = Vector("FACTURA 2024", "TOTAL 99 EUROS")
    Seq(false, true).foreach { rgb =>
      val bmp = GlyphRender.render(lines, skew0 = 0.0125, noiseSeed = 7L, noisePerGap = 2)
      val samples = if (rgb) GlyphRender.toRgb(bmp) else bmp.gray
      val pdf = graft.pdf.MiniPdf.buildScanned(samples, bmp.w, bmp.h, rgb)
      val doc = graft.pdf.PdfExtractor.extract(pdf).toOption.get
      assert(doc.docType == "scanned", s"rgb=$rgb type=${doc.docType}")
      assert(doc.text == lines.mkString("\n"), s"rgb=$rgb text='${doc.text}'")
      assert(doc.confidence == 100.0)
      assert(doc.spans.length == 2) // one span per OCR line
    }
  }

  test("DCTDecode scanned PDF: JPEG raster → OCR text, gray and RGB") {
    // JPEG is lossy; quality-1.0 round-trip error stays far inside the
    // binarization margin, so recovery is byte-exact — the real-world
    // scanned-PDF shape (reference ocr_adapters.py:62 via pdf2image)
    val lines = Vector("Jpeg scan, page 1!", "second line (ok)")
    Seq(false, true).foreach { rgb =>
      val bmp = GlyphRender.render(lines, skew0 = 0.025, noiseSeed = 3L, noisePerGap = 2)
      val samples = if (rgb) GlyphRender.toRgb(bmp) else bmp.gray
      val pdf = graft.pdf.MiniPdf.buildScanned(samples, bmp.w, bmp.h, rgb, dct = true)
      assert(new String(pdf, java.nio.charset.StandardCharsets.ISO_8859_1)
        .contains("/DCTDecode"))
      val doc = graft.pdf.PdfExtractor.extract(pdf).toOption.get
      assert(doc.docType == "scanned", s"rgb=$rgb type=${doc.docType}")
      assert(doc.text == lines.mkString("\n"), s"rgb=$rgb text='${doc.text}'")
      assert(doc.confidence == 100.0)
    }
  }

  test("truncated JPEG payload degrades to empty scanned doc, never throws") {
    val lines = Vector("Broken jpeg here")
    val bmp = GlyphRender.render(lines)
    val pdf = graft.pdf.MiniPdf.buildScanned(bmp.gray, bmp.w, bmp.h, dct = true)
    // corrupt the JPEG body: zero 300 bytes from its SOI marker (FFD8) —
    // kills the header tables, ImageIO.read returns null/throws → no OCR
    var soi = -1
    var i = 0
    while (soi < 0 && i + 1 < pdf.length) {
      if ((pdf(i) & 0xFF) == 0xFF && (pdf(i + 1) & 0xFF) == 0xD8) soi = i
      i += 1
    }
    assert(soi > 0)
    val bad = pdf.clone()
    java.util.Arrays.fill(bad, soi, math.min(soi + 300, bad.length), 0.toByte)
    val doc = graft.pdf.PdfExtractor.extract(bad).toOption.get
    assert(doc.text == "")
  }

  test("JBIG2Decode / JPXDecode rasters degrade to empty scanned text, never throw") {
    // real-world fax/JPEG2000 filters with no in-JDK codec (the reference
    // rides poppler's bundled decoders, ocr_adapters.py:62) — the
    // DOCUMENTED degrade: classification still sees an image-only page,
    // the unsupported stream yields no OCR, and confidence stays at 0,
    // under the reference's 60.0 threshold
    val lines = Vector("No codec for this one")
    val bmp = GlyphRender.render(lines)
    val plain = graft.pdf.MiniPdf.buildScanned(bmp.gray, bmp.w, bmp.h)
    val iso = java.nio.charset.StandardCharsets.ISO_8859_1
    Seq("/JBIG2Decode", "/JPXDecode").foreach { f =>
      val doc = new String(plain, iso).replace("/FlateDecode", f).getBytes(iso)
      val res = graft.pdf.PdfExtractor.extract(doc).toOption.get
      assert(res.text == "", s"$f text='${res.text}'")
      assert(res.confidence < 60.0, s"$f confidence=${res.confidence}")
    }
    // and the untouched fixture reads — the degrade above is the filter,
    // not the fixture
    assert(graft.pdf.PdfExtractor.extract(plain).toOption.get.text ==
      lines.mkString("\n"))
  }

  test("image-only PDF without decodable samples keeps the old empty degrade") {
    // 4-bit image: documented no-OCR case — empty text, scanned class
    val pdf = graft.pdf.MiniPdf.buildScanned(Array.fill[Byte](8)(0x55), 8, 8)
    // declare 4 bits per component by patching the dict bytes
    val s = new String(pdf, java.nio.charset.StandardCharsets.ISO_8859_1)
      .replace("/BitsPerComponent 8", "/BitsPerComponent 4")
    val doc = graft.pdf.PdfExtractor.extract(
      s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)).toOption.get
    assert(doc.docType == "scanned")
    assert(doc.text == "")
    assert(doc.confidence == 0.0)
  }

  test("/Decode [1 0] inverted raster is honored") {
    val lines = Vector("Inverted negative scan")
    val bmp = GlyphRender.render(lines, skew0 = 0.0125)
    val neg = bmp.gray.map(b => (~b).toByte)
    val pdf8 = graft.pdf.MiniPdf.buildScanned(neg, bmp.w, bmp.h)
    val pdf = new String(pdf8, java.nio.charset.StandardCharsets.ISO_8859_1)
      .replace("/BitsPerComponent 8", "/BitsPerComponent 8 /Decode [ 1 0 ]")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val doc = graft.pdf.PdfExtractor.extract(pdf).toOption.get
    assert(doc.text == lines.mkString("\n"), s"text='${doc.text}'")
    // and WITHOUT the Decode entry the negative reads as garbage/empty
    val raw = graft.pdf.PdfExtractor.extract(pdf8).toOption.get
    assert(raw.text != lines.mkString("\n"))
  }

  test("/BlackIs1 true composed with /Decode [1 0] is a net no-op (double inversion)") {
    // spec-composable two-flag combination: BlackIs1 inverts the decoded
    // bit convention (ccittGray), the generic /Decode [1 0] handler inverts
    // the luminance again — the same G4 payload must read identically to
    // the plain fixture, pinning the easy-to-regress doubled-inversion path
    val lines = Vector("Double negative fax")
    val bmp = GlyphRender.render(lines, noiseSeed = 9L, noisePerGap = 2)
    val plain = graft.pdf.MiniPdf.buildScanned(bmp.gray, bmp.w, bmp.h, ccitt = true)
    val composed = new String(plain, java.nio.charset.StandardCharsets.ISO_8859_1)
      .replace("/K -1", "/K -1 /BlackIs1 true")
      .replace("/BitsPerComponent 1", "/BitsPerComponent 1 /Decode [ 1 0 ]")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val base = graft.pdf.PdfExtractor.extract(plain).toOption.get
    val doc = graft.pdf.PdfExtractor.extract(composed).toOption.get
    assert(base.text == lines.mkString("\n"), s"plain text='${base.text}'")
    assert(doc.text == base.text, s"composed text='${doc.text}'")
    // and each flag ALONE inverts: the single-BlackIs1 form must NOT read
    // the same page (it sees a negative)
    val only = new String(plain, java.nio.charset.StandardCharsets.ISO_8859_1)
      .replace("/K -1", "/K -1 /BlackIs1 true")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(graft.pdf.PdfExtractor.extract(only).toOption.get.text != base.text)
  }

  test("/ImageMask true stencil (CCITT and Flate-packed) OCRs like 1-bit gray") {
    val lines = Vector("Stencil fax mask, 1994")
    val bmp = GlyphRender.render(lines, skew0 = -0.0125, noiseSeed = 4L, noisePerGap = 2)
    // CCITT-encoded mask: swap the colorspace entry for /ImageMask true
    val ccitt = graft.pdf.MiniPdf.buildScanned(bmp.gray, bmp.w, bmp.h, ccitt = true)
    val masked = new String(ccitt, java.nio.charset.StandardCharsets.ISO_8859_1)
      .replace("/ColorSpace /DeviceGray", "/ImageMask true")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val doc = graft.pdf.PdfExtractor.extract(masked).toOption.get
    assert(doc.text == lines.mkString("\n"), s"ccitt mask text='${doc.text}'")
    // Flate-packed 1-bit mask with NO BitsPerComponent (implied 1)
    val stride = (bmp.w + 7) / 8
    val packed = new Array[Byte](stride * bmp.h)
    for (y <- 0 until bmp.h; x <- 0 until bmp.w)
      if ((bmp.gray(y * bmp.w + x) & 0xFF) >= 128)
        packed(y * stride + (x >> 3)) =
          (packed(y * stride + (x >> 3)) | (1 << (7 - (x & 7)))).toByte
    val flate = graft.pdf.MiniPdf.buildScanned(packed, bmp.w, bmp.h)
    val fmask = new String(flate, java.nio.charset.StandardCharsets.ISO_8859_1)
      .replace("/ColorSpace /DeviceGray /BitsPerComponent 8", "/ImageMask true")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val doc2 = graft.pdf.PdfExtractor.extract(fmask).toOption.get
    assert(doc2.text == lines.mkString("\n"), s"flate mask text='${doc2.text}'")
  }

  test("CCITT G4 codec round-trips odd widths and random bilevel images") {
    // widths not divisible by 8 exercise row bit-padding in both codecs
    Seq((13, 9), (31, 17), (100, 3)).foreach { case (w, h) =>
      val gray = Array.tabulate[Byte](w * h)(i =>
        if ((graft.ops.Dedup.splitmix64(i * 77L + w) & 1L) == 0L) 0x00.toByte
        else 0xFF.toByte)
      val g4 = graft.pdf.CcittTiff.encodeG4(gray, w, h)
      val back = graft.pdf.CcittTiff.decodeG4Gray(g4, w, h).get
      assert(back.sameElements(gray), s"${w}x$h random round-trip")
    }
  }

  test("CCITT G4 codec round-trips bilevel pages exactly") {
    val lines = Vector("Fax class scan 77", "with a second line")
    Seq(0.0, 0.025, -0.04375).foreach { s =>
      val bmp = GlyphRender.render(lines, skew0 = s, noiseSeed = 21L, noisePerGap = 2)
      val g4 = graft.pdf.CcittTiff.encodeG4(bmp.gray, bmp.w, bmp.h)
      assert(g4.length < bmp.gray.length / 4, "G4 should compress bilevel text hard")
      val back = graft.pdf.CcittTiff.decodeG4Gray(g4, bmp.w, bmp.h).get
      assert(back.sameElements(bmp.gray), s"skew $s: lossless round-trip")
    }
    // garbage stream: total, None
    assert(graft.pdf.CcittTiff.decodeG4Gray(Array.fill[Byte](64)(0x3A), 40, 40).isEmpty)
  }

  test("CCITT G3 codec round-trips every TIFF-expressible fax shape") {
    // (compressionType, writer t4Options, decode Compression, decode T4Options):
    // RLE = 1-D MH byte-aligned no-EOL; T.4 t4=0/4 = 1-D with EOLs
    // (bare / fill-bit-aligned); t4=1/5 = 2-D with EOLs (bare / aligned)
    val shapes = Seq(
      ("CCITT RLE", -1, 2, -1),
      ("CCITT T.4", 0, 3, 0),
      ("CCITT T.4", 4, 3, 4),
      ("CCITT T.4", 1, 3, 1),
      ("CCITT T.4", 5, 3, 5))
    Seq((13, 9), (31, 17), (100, 3)).foreach { case (w, h) =>
      val gray = Array.tabulate[Byte](w * h)(i =>
        if ((graft.ops.Dedup.splitmix64(i * 77L + w) & 1L) == 0L) 0x00.toByte
        else 0xFF.toByte)
      shapes.foreach { case (ct, wOpts, comp, t4) =>
        val strip = graft.pdf.CcittTiff.encodeCcitt(gray, w, h, ct, wOpts)
        val back = graft.pdf.CcittTiff.decodeCcittGray(strip, w, h, comp, t4)
        assert(back.exists(_.sameElements(gray)),
          s"${w}x$h $ct t4=$wOpts round-trip via comp=$comp")
      }
    }
    // garbage stream under each shape: total, None
    shapes.foreach { case (_, _, comp, t4) =>
      assert(graft.pdf.CcittTiff
        .decodeCcittGray(Array.fill[Byte](64)(0x3A), 40, 40, comp, t4).isEmpty)
    }
  }

  test("CCITTFaxDecode G3 scanned PDFs end-to-end: 1-D and 2-D rasters → OCR text") {
    val lines = Vector("Group 3 fax, 1980!", "one and two dim")
    val bmp = GlyphRender.render(lines, skew0 = -0.025, noiseSeed = 5L, noisePerGap = 2)
    // K=0: 1-D MH, EncodedByteAlign true (the TIFF-Compression-2 shape)
    val oneD = graft.pdf.MiniPdf.buildScanned(bmp.gray, bmp.w, bmp.h,
      ccitt = true, ccittK = 0)
    val s1 = new String(oneD, java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(s1.contains("/K 0") && s1.contains("/EncodedByteAlign true"))
    val d1 = graft.pdf.PdfExtractor.extract(oneD).toOption.get
    assert(d1.docType == "scanned")
    assert(d1.text == lines.mkString("\n"), s"1-D text='${d1.text}'")
    // K>0: mixed 2-D with EOL framing
    val twoD = graft.pdf.MiniPdf.buildScanned(bmp.gray, bmp.w, bmp.h,
      ccitt = true, ccittK = 4)
    val s2 = new String(twoD, java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(s2.contains("/K 4") && s2.contains("/EndOfLine true"))
    val d2 = graft.pdf.PdfExtractor.extract(twoD).toOption.get
    assert(d2.text == lines.mkString("\n"), s"2-D text='${d2.text}'")
    // G3 /ImageMask stencil (the fax-pipeline form) reads the same
    val masked = new String(twoD, java.nio.charset.StandardCharsets.ISO_8859_1)
      .replace("/ColorSpace /DeviceGray", "/ImageMask true")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val dm = graft.pdf.PdfExtractor.extract(masked).toOption.get
    assert(dm.text == lines.mkString("\n"), s"G3 mask text='${dm.text}'")
    // the TIFF-inexpressible shape (K=0, no EOLs, no byte alignment)
    // degrades to no-OCR rather than garbage
    val unaligned = new String(oneD, java.nio.charset.StandardCharsets.ISO_8859_1)
      .replace("/EncodedByteAlign true ", "")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val du = graft.pdf.PdfExtractor.extract(unaligned).toOption.get
    assert(du.text == "", s"unaligned K=0 must degrade, got '${du.text}'")
  }

  test("CCITTFaxDecode scanned PDF end-to-end: G4 raster → OCR text") {
    val lines = Vector("Group 4 fax, 1987!", "bilevel but exact")
    val bmp = GlyphRender.render(lines, skew0 = 0.0125, noiseSeed = 9L, noisePerGap = 3)
    val pdf = graft.pdf.MiniPdf.buildScanned(bmp.gray, bmp.w, bmp.h, ccitt = true)
    val str = new String(pdf, java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(str.contains("/CCITTFaxDecode") && str.contains("/BitsPerComponent 1"))
    val doc = graft.pdf.PdfExtractor.extract(pdf).toOption.get
    assert(doc.docType == "scanned")
    assert(doc.text == lines.mkString("\n"), s"text='${doc.text}'")
    assert(doc.confidence == 100.0)
  }

  test("1-bit Flate DeviceGray image unpacks and OCRs") {
    val lines = Vector("One bit per pixel")
    val bmp = GlyphRender.render(lines)
    // pack to 1 bit/px, MSB first, byte-aligned rows (1 = white)
    val stride = (bmp.w + 7) / 8
    val packed = new Array[Byte](stride * bmp.h)
    for (y <- 0 until bmp.h; x <- 0 until bmp.w)
      if ((bmp.gray(y * bmp.w + x) & 0xFF) >= 128)
        packed(y * stride + (x >> 3)) =
          (packed(y * stride + (x >> 3)) | (1 << (7 - (x & 7)))).toByte
    val pdf8 = graft.pdf.MiniPdf.buildScanned(packed, bmp.w, bmp.h)
    val pdf = new String(pdf8, java.nio.charset.StandardCharsets.ISO_8859_1)
      .replace("/BitsPerComponent 8", "/BitsPerComponent 1")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val doc = graft.pdf.PdfExtractor.extract(pdf).toOption.get
    assert(doc.text == lines.mkString("\n"), s"text='${doc.text}'")
  }

  test("multi-DPI: 2x and 3x rasters auto-detect scale and recognize exactly") {
    val lines = Vector("Scanned at 300 dpi?", "or maybe 600, who knows")
    Seq(1, 2, 3).foreach { k =>
      val bmp = GlyphRender.upscale(
        GlyphRender.render(lines, skew0 = -0.025, noiseSeed = 13L, noisePerGap = 2), k)
      val r = GlyphOcr.recognizeAutoScale(bmp.gray, bmp.w, bmp.h)
      assert(r.text == lines.mkString("\n"), s"scale $k: '${r.text}'")
      assert(r.matchRate == 1.0, s"scale $k rate ${r.matchRate}")
    }
  }

  test("multi-DPI scanned PDF end-to-end (2x JPEG raster)") {
    val lines = Vector("High dpi jpeg scan")
    val bmp = GlyphRender.upscale(GlyphRender.render(lines), 2)
    val pdf = graft.pdf.MiniPdf.buildScanned(bmp.gray, bmp.w, bmp.h, dct = true)
    val doc = graft.pdf.PdfExtractor.extract(pdf).toOption.get
    assert(doc.text == lines.mkString("\n"), s"text='${doc.text}'")
  }

  test("mixed document: text pages extract spans, image pages OCR, in page order") {
    val scanLines = Vector("Scanned middle page 2")
    val bmp = GlyphRender.render(scanLines, skew0 = 0.0375, noiseSeed = 8L, noisePerGap = 2)
    val pdf = graft.pdf.MiniPdf.buildMixed(Seq(
      Left(graft.pdf.MiniPdf.streamFor(Seq(("Native first page", 72, 720)))),
      Right((bmp.gray, bmp.w, bmp.h)),
      Left(graft.pdf.MiniPdf.streamFor(Seq(("Native last page", 72, 720))))))
    val doc = graft.pdf.PdfExtractor.extract(pdf).toOption.get
    assert(doc.text ==
      "Native first page\n\nScanned middle page 2\n\nNative last page",
      s"text='${doc.text}'")
    assert(doc.pageCount == 3)
    // classification reads pre-OCR metrics: 2/3 extractable + fonts → mixed
    assert(doc.docType == "mixed", s"type=${doc.docType}")
    // confidence: 2 span pages + one fully-matched OCR page over 3 pages
    assert(doc.confidence == 100.0)
  }

  test("raster-path fuzz: mutated scanned PDFs of every encoding never throw") {
    val lines = Vector("Fuzz target text here")
    val bmp = GlyphRender.render(lines)
    val bold = GlyphRender.render(lines, proportional = true, face = GlyphFont.Bold)
    val faded = bmp.gray.map(b => (if ((b & 0xFF) < 128) 150 else 205).toByte)
    val fixtures = Seq(
      graft.pdf.MiniPdf.buildScanned(bmp.gray, bmp.w, bmp.h),
      graft.pdf.MiniPdf.buildScanned(GlyphRender.toRgb(bmp), bmp.w, bmp.h, rgb = true),
      graft.pdf.MiniPdf.buildScanned(bmp.gray, bmp.w, bmp.h, dct = true),
      graft.pdf.MiniPdf.buildScanned(bmp.gray, bmp.w, bmp.h, ccitt = true),
      graft.pdf.MiniPdf.buildScanned(bmp.gray, bmp.w, bmp.h, ccitt = true, mask = true),
      graft.pdf.MiniPdf.buildScanned(bold.gray, bold.w, bold.h),
      graft.pdf.MiniPdf.buildScanned(faded, bmp.w, bmp.h),
      graft.pdf.MiniPdf.buildScanned(bmp.gray, bmp.w, bmp.h, rotate = 270))
    var seed = 0xF1DDL
    fixtures.foreach { fx =>
      (0 until 40).foreach { _ =>
        val b = fx.clone()
        // 1-4 deterministic byte mutations anywhere in the file
        (0 to (seed & 3).toInt).foreach { j =>
          seed = graft.ops.Dedup.splitmix64(seed + j)
          b((java.lang.Long.remainderUnsigned(seed, b.length).toInt)) = (seed >> 32).toByte
        }
        graft.pipeline.Kernel.extractOne(b) // total: must never throw
      }
    }
  }

  test("proportional pitch: clean typeset render → exact recognition") {
    val lines = Vector(
      "Hello World, it's 2026!",
      "the quick brown fox jumps",
      "over the lazy dog? (yes)",
      "iiii mmmm narrow and wide mix",
      "punct: a.b c'd e-f \"g\" h;i")
    val bmp = GlyphRender.render(lines, proportional = true)
    val r = GlyphOcr.recognize(bmp.gray, bmp.w, bmp.h)
    assert(r.text == lines.mkString("\n"), s"got '${r.text}'")
    assert(r.matched == r.glyphs)
  }

  test("proportional pitch survives skew, specks, RGB and multi-DPI") {
    val lines = Vector("Typeset invoice no. 42", "total due: 17.50 (net)")
    Seq((0.025, 1), (-0.0375, 2), (0.0125, 3)).foreach { case (s, k) =>
      val bmp = GlyphRender.upscale(
        GlyphRender.render(lines, skew0 = s, noiseSeed = 31L, noisePerGap = 3,
          proportional = true), k)
      val gray = GlyphOcr.rgbToGray(GlyphRender.toRgb(bmp), bmp.w, bmp.h)
      val r = GlyphOcr.recognizeAutoScale(gray, bmp.w, bmp.h)
      assert(r.text == lines.mkString("\n"), s"skew $s scale $k: '${r.text}'")
      assert(r.matchRate == 1.0)
    }
  }

  test("bold face: clean typeset render → exact recognition") {
    val lines = Vector(
      "Bold Headline, 2026!",
      "the quick brown fox jumps",
      "iiii mmmm NARROW and WIDE",
      "punct: a.b c'd e-f \"g\" h;i")
    val bmp = GlyphRender.render(lines, proportional = true, face = GlyphFont.Bold)
    val r = GlyphOcr.recognize(bmp.gray, bmp.w, bmp.h)
    assert(r.text == lines.mkString("\n"), s"got '${r.text}'")
    assert(r.matched == r.glyphs)
  }

  test("bold face survives skew, specks and a JPEG scanned PDF end-to-end") {
    val lines = Vector("Bold jpeg scan no. 9", "second line (net)")
    val bmp = GlyphRender.render(lines, skew0 = -0.025, noiseSeed = 41L,
      noisePerGap = 3, proportional = true, face = GlyphFont.Bold)
    val r = GlyphOcr.recognize(bmp.gray, bmp.w, bmp.h)
    assert(r.text == lines.mkString("\n"), s"raw: '${r.text}'")
    val pdf = graft.pdf.MiniPdf.buildScanned(bmp.gray, bmp.w, bmp.h, dct = true)
    val doc = graft.pdf.PdfExtractor.extract(pdf).toOption.get
    assert(doc.text == lines.mkString("\n"), s"pdf: '${doc.text}'")
    assert(doc.confidence == 100.0)
  }

  test("face detection: the same text reads exactly in base and bold faces") {
    val lines = Vector("Mixed M N W watchwords", "minimum nominal wins")
    GlyphFont.Faces.foreach { face =>
      val bmp = GlyphRender.render(lines, proportional = true, face = face)
      val r = GlyphOcr.recognize(bmp.gray, bmp.w, bmp.h)
      assert(r.text == lines.mkString("\n"), s"${face.name}: '${r.text}'")
      assert(r.matchRate == 1.0, s"${face.name} rate ${r.matchRate}")
    }
  }

  test("one off-grid noise blob cannot flip a fixed-pitch page to typeset spacing") {
    // a 3-row blob at an off-grid column INSIDE band 0 (survives speck
    // rejection, reads '?'): pitch-mode majority vote keeps the page fixed,
    // so every other band's word spacing stays exact — the all-or-nothing
    // page flip would read "EF GH" as "EFGH" (typeset gap rule on
    // fixed-pitch geometry)
    val lines = Vector("AB CD", "EF GH", "IJ KL")
    val bmp = GlyphRender.render(lines)
    val blobX = GlyphRender.Margin + 15 // 15 % 6 = 3: off-grid beyond ±2
    val top = GlyphRender.Margin
    for (r <- top + 2 to top + 4) bmp.gray(r * bmp.w + blobX) = 0x00.toByte
    val res = GlyphOcr.recognize(bmp.gray, bmp.w, bmp.h)
    val got = res.text.split("\n", -1)
    assert(got.length == 3, s"got '${res.text}'")
    assert(got(1) == "EF GH" && got(2) == "IJ KL",
      s"clean bands corrupted: '${res.text}'")
    assert(got(0).contains("?") && got(0).filterNot(c => c == '?' || c == ' ') == "ABCD",
      s"blob band: '${got(0)}'")
    assert(res.matched == res.glyphs - 1) // everything but the blob reads
  }

  test("pitch-mode detection: the same text reads exactly in both layouts") {
    val lines = Vector("a.I x.1 a. .a", "mm ii '' i'i w,w", "both layouts agree")
    Seq(false, true).foreach { prop =>
      val bmp = GlyphRender.render(lines, proportional = prop)
      val r = GlyphOcr.recognize(bmp.gray, bmp.w, bmp.h)
      assert(r.text == lines.mkString("\n"), s"proportional=$prop: '${r.text}'")
    }
  }

  test("proportional scanned PDF end-to-end (JPEG raster)") {
    val lines = Vector("Typeset jpeg scan!", "second line here")
    val bmp = GlyphRender.render(lines, skew0 = 0.0125, noiseSeed = 23L,
      noisePerGap = 2, proportional = true)
    val pdf = graft.pdf.MiniPdf.buildScanned(bmp.gray, bmp.w, bmp.h, dct = true)
    val doc = graft.pdf.PdfExtractor.extract(pdf).toOption.get
    assert(doc.docType == "scanned")
    assert(doc.text == lines.mkString("\n"), s"text='${doc.text}'")
    assert(doc.confidence == 100.0)
  }

  test("rotateCW: quarter-turn algebra round-trips pixels exactly") {
    val bmp = GlyphRender.render(Vector("Rotate me 90", "second line!"))
    for (t <- 1 to 3) {
      val (r, rw, rh) = GlyphOcr.rotateCW(bmp.gray, bmp.w, bmp.h, t)
      val (back, bw, bh) = GlyphOcr.rotateCW(r, rw, rh, 4 - t)
      assert(bw == bmp.w && bh == bmp.h)
      assert(back.sameElements(bmp.gray), s"$t-turn round trip")
    }
    // identity turns and degenerate input are total
    assert(GlyphOcr.rotateCW(bmp.gray, bmp.w, bmp.h, 4)._1 eq bmp.gray)
    assert(GlyphOcr.rotateCW(Array.emptyByteArray, 0, 0, 1)._1.isEmpty)
  }

  test("/Rotate scanned pages un-rotate before OCR (90/180/270, incl. JPEG)") {
    // landscape-fed portrait pages and upside-down feeder stacks: the
    // stored raster is sideways, /Rotate says how the viewer rights it
    val lines = Vector("Sideways feeder scan", "page 2 of 9 (ok)")
    Seq((90, false), (180, true), (270, false)).foreach { case (deg, dct) =>
      val bmp = GlyphRender.render(lines, skew0 = 0.0125, noiseSeed = 19L, noisePerGap = 2)
      val (st, sw, sh) = GlyphOcr.rotateCW(bmp.gray, bmp.w, bmp.h, (4 - deg / 90) % 4)
      val pdf = graft.pdf.MiniPdf.buildScanned(st, sw, sh, dct = dct, rotate = deg)
      val doc = graft.pdf.PdfExtractor.extract(pdf).toOption.get
      assert(doc.docType == "scanned")
      assert(doc.text == lines.mkString("\n"), s"deg=$deg dct=$dct: '${doc.text}'")
      // and WITHOUT the rotation honor the sideways raster reads nothing
      val flat = graft.pdf.MiniPdf.buildScanned(st, sw, sh, dct = dct)
      assert(graft.pdf.PdfExtractor.extract(flat).toOption.get.text
        != lines.mkString("\n"))
    }
  }

  test("/Rotate inherited from the /Pages node is honored") {
    val lines = Vector("Inherited rotation")
    val bmp = GlyphRender.render(lines)
    val (st, sw, sh) = GlyphOcr.rotateCW(bmp.gray, bmp.w, bmp.h, 3) // viewer: +90
    val pdf = new String(graft.pdf.MiniPdf.buildScanned(st, sw, sh),
      java.nio.charset.StandardCharsets.ISO_8859_1)
      .replace("/Type /Pages ", "/Type /Pages /Rotate 90 ")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val doc = graft.pdf.PdfExtractor.extract(pdf).toOption.get
    assert(doc.text == lines.mkString("\n"), s"text='${doc.text}'")
  }

  test("narrow fallback page in the gradient-lighting corpus slice stays exact") {
    // a doc whose words carry no letters/digits falls back to "SCAN <id>"
    // (~50 px wide); with an uncapped 110-level gradient the whole page fits
    // one binarizer neighborhood and left-margin background crosses the
    // local midpoint — the span cap keeps recovery exact at any width
    val spec = graft.io.SyntheticPages.pageFor(17L, "!!! ??? --- ...", "en")
    val res = graft.pipeline.Kernel.extractOne(spec.payload)
    assert(res.status == "processed")
    assert(res.text == spec.golden, s"got '${res.text}' want '${spec.golden}'")
  }

  test("autoScale on a native-resolution page ties to k=1, never a decimated fluke") {
    // a 1-glyph page: no early exit below 3 glyphs, and equal (rate, glyphs)
    // ties must resolve to the smallest k — i.e. exactly what recognize sees
    val one = GlyphRender.render(Vector("a"))
    val auto = GlyphOcr.recognizeAutoScale(one.gray, one.w, one.h)
    assert(auto.text == "a", s"got '${auto.text}'")
    val full = GlyphRender.render(Vector("Native page, unscaled!"))
    val a2 = GlyphOcr.recognizeAutoScale(full.gray, full.w, full.h)
    assert(a2.text == GlyphOcr.recognize(full.gray, full.w, full.h).text)
  }

  test("alien face: invariants that make the open-world degrade spec-predictable") {
    // the alien face is OUT-OF-UNIVERSE (not in GlyphFont.Faces); the
    // degrade is predictable — one '?' per glyph, spacing intact — iff:
    // (1) every glyph is one contiguous column run; (2) leftmost ink
    // column ≤ 2; (3) letters/digits span ≥ 3 rows (band floor); (4) every
    // glyph is hamming ≥ 3 from EVERY known template of its trimmed
    // (w, h) class, so even a ±1-bit raster corruption cannot reach the
    // hamming-≤1 accept threshold
    val alien = GlyphFont.Alien
    assert(!GlyphFont.Faces.contains(alien))
    def trimmedBits(face: Face, c: Char): (Int, Int, Vector[Boolean]) = {
      val (lo, hi) = face.trim(c)
      val (rlo, rhi) = face.rowTrim(c)
      ((hi - lo + 1), (rhi - rlo + 1),
        (for (row <- rlo to rhi; col <- lo to hi) yield face.ink(c, col, row)).toVector)
    }
    val known = for { f <- GlyphFont.Faces; c <- Chars }
      yield { val (w, h, bits) = trimmedBits(f, c); (f.name, c, w, h, bits) }
    Chars.foreach { c =>
      val (w, h, bits) = trimmedBits(alien, c)
      assert(bits.exists(identity), s"'$c' empty")
      assert(w <= W, s"'$c' wider than cell")
      val (lo, hi) = alien.trim(c)
      assert(lo <= 2, s"'$c' leftmost col $lo")
      (lo to hi).foreach { col =>
        assert((0 until H).exists(alien.ink(c, col, _)), s"'$c' gap col $col")
      }
      if (Character.isLetterOrDigit(c))
        assert((0 until H).count(r => (0 until W).exists(alien.ink(c, _, r))) >= 3,
          s"'$c' under band floor")
      known.filter(k => k._3 == w && k._4 == h).foreach { case (fn, kc, _, _, kb) =>
        val d = bits.zip(kb).count { case (a, b) => a != b }
        assert(d >= 3, s"alien '$c' within hamming $d of $fn '$kc'")
      }
    }
  }

  test("light antialiasing halo (gray ≥ local midpoint) reads exactly on the primary rung") {
    // halo 160 vs full-contrast midpoint 127: classified background by the
    // Bernsen rule itself — no retry needed, hot path untouched
    val lines = Vector("The quick Brown fox,", "jumps over 13 dogs!")
    val b = GlyphRender.render(lines, haloGray = 160)
    val r = GlyphOcr.recognize(b.gray, b.w, b.h)
    assert(r.text == lines.mkString("\n"), s"got '${r.text}'")
    assert(r.matchRate == 1.0)
  }

  test("dark antialiasing halo (heavy-inked scan): contrast ladder reads exactly") {
    // halo 96 sits BELOW the midpoint (127) and ABOVE the low rung's
    // quarter threshold (63): the primary rung reads dilated garbage, the
    // retry rung drops the halo and recovers every glyph
    val lines = Vector("The quick Brown fox,", "jumps over 13 dogs!")
    val b = GlyphRender.render(lines, haloGray = 96)
    val r = GlyphOcr.recognize(b.gray, b.w, b.h)
    assert(r.text == lines.mkString("\n"), s"got '${r.text}'")
    assert(r.matchRate == 1.0)
    // proportional typeset + bold face: halo must not break pen-advance
    // spacing once the low rung restores the trimmed widths
    val tb = GlyphRender.render(lines, proportional = true,
      face = GlyphFont.Bold, haloGray = 96)
    val tr = GlyphOcr.recognize(tb.gray, tb.w, tb.h)
    assert(tr.text == lines.mkString("\n"), s"typeset got '${tr.text}'")
    // skewed dark-halo page: halo follows the sheared strokes; the ladder
    // composes with the deskew search
    val sb2 = GlyphRender.render(lines, skew0 = 0.0125, haloGray = 96)
    val sr = GlyphOcr.recognize(sb2.gray, sb2.w, sb2.h)
    assert(sr.text == lines.mkString("\n"), s"skewed got '${sr.text}'")
  }

  test("dark halo at 2x DPI reads exactly through autoScale") {
    val lines = Vector("Halo page at 2x, with", "enough glyphs to exit early")
    val b = GlyphRender.upscale(GlyphRender.render(lines, haloGray = 96), 2)
    val r = GlyphOcr.recognizeAutoScale(b.gray, b.w, b.h)
    assert(r.text == lines.mkString("\n"), s"got '${r.text}'")
    assert(r.matchRate == 1.0)
  }

  test("dark halo end-to-end: scanned PDF reads exactly, confidence 100") {
    val lines = Vector("End to end halo scan 7")
    val b = GlyphRender.render(lines, haloGray = 96)
    val pdf = graft.pdf.MiniPdf.buildScanned(b.gray, b.w, b.h)
    val doc = graft.pdf.PdfExtractor.extract(pdf).toOption.get
    assert(doc.docType == "scanned")
    assert(doc.text == lines.mkString("\n"), s"got '${doc.text}'")
    assert(doc.confidence == 100.0)
  }

  test("dark halo survives JPEG encoding (gray and RGB) through the ladder") {
    // JPEG ringing around the halo'd strokes must stay inside the low
    // rung's quarter-threshold margin — probed before the corpus DCT
    // slots took halo, pinned here
    val lines = Vector("The quick Brown fox,", "jumps over 13 dogs!")
    val b = GlyphRender.render(lines, haloGray = 96)
    val gray = graft.pdf.PdfExtractor.extract(
      graft.pdf.MiniPdf.buildScanned(b.gray, b.w, b.h, dct = true)).toOption.get
    assert(gray.text == lines.mkString("\n"), s"gray got '${gray.text}'")
    assert(gray.confidence == 100.0)
    val rgb = graft.pdf.PdfExtractor.extract(
      graft.pdf.MiniPdf.buildScanned(GlyphRender.toRgb(b), b.w, b.h,
        rgb = true, dct = true)).toOption.get
    assert(rgb.text == lines.mkString("\n"), s"rgb got '${rgb.text}'")
    assert(rgb.confidence == 100.0)
  }

  test("ladder does not regress the adaptive-lighting or blank-floor behavior") {
    // faded low-contrast page (ink 150 / bg 205) still reads on the
    // primary rung, and a bare illumination gradient still binarizes to
    // blank on BOTH rungs (the contrast floor is rung-independent)
    val lines = Vector("Faded but readable text")
    val b = GlyphRender.render(lines)
    val faded = b.gray.map(v => (if ((v & 0xFF) < 128) 150 else 205).toByte)
    val r = GlyphOcr.recognize(faded, b.w, b.h)
    assert(r.text == lines.mkString("\n"), s"got '${r.text}'")
    val w = 256; val h = 96
    val bare = Array.tabulate(w * h)(i => (140 + (i % w) * 36 / (w - 1)).toByte)
    val br = GlyphOcr.recognize(bare, w, h)
    assert(br.glyphs == 0 && br.text.isEmpty)
  }

  test("alien face page degrades to '?' runs with matchRate 0, confidence < 60") {
    val lines = Vector("Unknown typeface here", "second line, 42")
    val bmp = GlyphRender.render(lines, skew0 = 0.0125, noiseSeed = 7L,
      noisePerGap = 2, proportional = true, face = GlyphFont.Alien)
    val want = lines.map(_.map(c => if (c == ' ') c else '?')).mkString("\n")
    val res = GlyphOcr.recognizeAutoScale(bmp.gray, bmp.w, bmp.h)
    assert(res.text == want, s"got '${res.text}'")
    assert(res.matched == 0 && res.glyphs > 0)
    // end-to-end: the scanned PDF reports honest low confidence — below
    // the reference's 60.0 threshold (domain/constants/__init__.py:12),
    // where a recognizer-seen page reports 100
    val pdf = graft.pdf.MiniPdf.buildScanned(bmp.gray, bmp.w, bmp.h)
    val doc = graft.pdf.PdfExtractor.extract(pdf).toOption.get
    assert(doc.docType == "scanned")
    assert(doc.text == want)
    assert(doc.confidence == 0.0 && doc.confidence < 60.0)
    // fixed-pitch (typewriter) alien page: cell-grid spacing inference
    // must survive the unknown face too
    val fbmp = GlyphRender.render(lines, skew0 = -0.025, noiseSeed = 3L,
      noisePerGap = 2, face = GlyphFont.Alien)
    val fres = GlyphOcr.recognizeAutoScale(fbmp.gray, fbmp.w, fbmp.h)
    assert(fres.text == want, s"fixed-pitch got '${fres.text}'")
    assert(fres.matched == 0)
  }

  test("autoScale: short true-2x pages still read exactly (no decimated early exit)") {
    // below PerfectExitGlyphs the decimated pass cannot early-exit; the
    // k=1 pass runs and must LOSE to the perfect decimated candidate
    // (giant glyphs exceed template width at k=1 → rate 0)
    val lines = Vector("Hi 5")
    val bmp = GlyphRender.upscale(GlyphRender.render(lines), 2)
    val res = GlyphOcr.recognizeAutoScale(bmp.gray, bmp.w, bmp.h)
    assert(res.text == "Hi 5", s"got '${res.text}'")
    assert(res.matchRate == 1.0 && res.glyphs < GlyphOcr.PerfectExitGlyphs)
    // 2-glyph floor: a perfect decimated read of exactly two glyphs is
    // still admitted (two simultaneous template coincidences on a
    // glyph-commensurate page are not a realistic fluke)
    val two = GlyphRender.upscale(GlyphRender.render(Vector("Hi")), 2)
    val r2 = GlyphOcr.recognizeAutoScale(two.gray, two.w, two.h)
    assert(r2.text == "Hi", s"2-glyph got '${r2.text}'")
    assert(r2.matchRate == 1.0)
  }

  test("synthetic scanned corpus pages OCR back to their golden byte-exactly") {
    // ids cover variants 0-9: every raster encoding (Flate gray/RGB, JPEG
    // gray/RGB, CCITT), DPI scales 1/2/3, all skew/noise rotations;
    // 517/1017 are the gray-Flate lighting variants (faded low-contrast at
    // variant 10, illumination gradient at 3×-DPI variant 20); 317 is bold
    // typeset gray-Flate at 3×-DPI, 717 bold typeset JPEG-RGB, and 1517
    // (variant 30) stacks bold typeset WITH faded low-contrast lighting
    // (bold ∧ Flate-RGB is unreachable: bold needs variant ≡ 6 mod 8, even,
    // while Flate-RGB needs variant odd). ALIEN-face slots — 417 (variant
    // 8: fixed-pitch, G4 /ImageMask stencil), 917 (variant 18: typeset,
    // G3-1-D mask) and 2517 (variant 50: typeset, faded gray-Flate) — have
    // '?'-mapped degrade goldens, so this also pins the open-world
    // behavior byte-exactly (DCT and 2×/3×-DPI slots never render alien)
    val ids = Seq(17L, 67L, 117L, 167L, 217L, 267L, 317L, 367L, 417L, 467L,
      517L, 717L, 917L, 1017L, 1517L, 2517L)
    ids.foreach { id =>
      val spec = graft.io.SyntheticPages.pageFor(id,
        "palabras de prueba numero " + id + " con mas contenido util aqui", "es")
      val res = graft.pipeline.Kernel.extractOne(spec.payload)
      assert(res.docType == "scanned", s"id=$id type=${res.docType}")
      assert(res.status == "processed")
      assert(res.text == spec.golden, s"id=$id got '${res.text}' want '${spec.golden}'")
    }
  }

  test("scratch reuse is invisible: interleaved pages reproduce fresh-thread results") {
    // The kernel's page buffers live in a per-thread OcrScratch reused
    // across pages (grid under an all-false invariant, byte slots
    // overwrite-before-read). A stale-state bug would show as a page
    // reading differently AFTER a different page ran on the same thread.
    // Pin: big page → small page → big page on one thread equals each
    // page recognized on its own fresh thread, across sizes that force
    // buffer growth and distinct ink patterns.
    def onFreshThread[A](body: => A): A = {
      var out: Option[A] = None
      val t = new Thread(() => { out = Some(body) })
      t.start(); t.join()
      out.get
    }
    val big = GlyphRender.upscale(GlyphRender.render(Vector(
      "The quick brown fox jumps over 13 lazy dogs!",
      "SECOND LINE with MIXED case and (punct); ok?",
      "abcdefghijklmnopqrstuvwxyz 0123456789")), 3)
    val small = GlyphRender.render(Vector("tiny page 1"), skew0 = 0.025,
      noiseSeed = 7L, noisePerGap = 2)
    val mid = GlyphRender.render(Vector("Middle size page, two words more",
      "and a second line"), skew0 = -0.0375)
    def run(b: GlyphRender.Bitmap) = GlyphOcr.recognizeAutoScale(b.gray, b.w, b.h)
    val fresh = Seq(big, small, mid).map(b => onFreshThread(run(b)))
    val interleaved = onFreshThread(Seq(big, small, mid, big, small, mid).map(run))
    assert(interleaved.take(3) == fresh, "first pass diverged from fresh-thread runs")
    assert(interleaved.drop(3) == fresh, "repeat pass diverged (stale scratch state)")
    // and all of them must actually read the text (non-degenerate pin)
    assert(fresh.forall(r => r.glyphs > 0 && r.matchRate == 1.0))
  }
}
