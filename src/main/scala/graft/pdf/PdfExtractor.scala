package graft.pdf

import graft.model.{SpanRow, TableRow}
import PdfObjects._

/** PDF text-extraction facade (SURVEY.md E8/S5/C1-C2).
  *
  * Pipeline: body object scan → page-tree walk (catalog `/Pages` → `/Kids`;
  * fallback: `/Type /Page` objects in file order when the catalog is broken)
  * → per-page content streams (FlateDecode via java.util.zip) → text-operator
  * interpretation → reading-order span layout → page texts joined `"\n\n"`
  * (assembly contract E3, ocr_adapters.py:73).
  *
  * Span offsets are char offsets into the document's final extracted text
  * (the PDF path has no meaningful "decoded source" string to offset into).
  *
  * Classification = the reference's rule classifier thresholds
  * (pdf_analyzer.py:96-122): scanned / table_heavy / image_heavy /
  * native_text / mixed. Tables come from span-geometry grid detection
  * ([[TableGrid]]); composite-font text from /ToUnicode CMaps
  * ([[FontDecode]]).
  *
  * Confidence (E12): 100 × pages-with-spans / pages.
  */
object PdfExtractor {

  final case class PdfDoc(
    text: String,
    spans: Vector[SpanRow],
    tables: Vector[TableRow],
    pageCount: Int,
    confidence: Double,
    docType: String,
    metadata: Map[String, String])

  def extract(bytes: Array[Byte]): Either[String, PdfDoc] = {
    val objs = parseAll(bytes)
    // /Encrypt documents: [[PdfCrypt]] removes standard-security-handler
    // encryption for the empty-user-password class (the set poppler /
    // pdfplumber / PyPDF2 open transparently, so the reference's corpus diet
    // includes it — pdf_info_adapter.py reads such files without a prompt).
    // Anything still ciphertext after that (non-empty password, scheme
    // outside the matrix) refuses with a typed error, never garbage:
    // "pdf_encrypted_locked" vs "pdf_encrypted".
    if (objs.encrypted) return Left(objs.cryptFail.getOrElse("pdf_encrypted"))
    if (objs.byNum.isEmpty) return Left("pdf_no_objects")

    val pages = findPages(objs)
    if (pages.isEmpty) return Left("pdf_no_pages")

    var sawFont = false
    var images = 0
    var filterError: String = null

    val pageResults = pages.zipWithIndex.map { case (page, idx) =>
      val contents = contentBytes(page, objs) match {
        case Right(b) => b
        case Left(err) => if (filterError == null) filterError = err; Array.empty[Byte]
      }
      val ops = ContentStream.run(contents, FontDecode.fontsFor(page, objs))
      if (ops.sawFontOp) sawFont = true
      images += ops.imageDraws
      if (resourcesHaveFont(page, objs)) sawFont = true
      (idx, ops, page)
    }

    // a filter we cannot decode on every page with no text at all → error
    if (filterError != null && pageResults.forall(_._2.spans.isEmpty))
      return Left(filterError)

    // OCR (E1/E2): a page with NO text spans but image XObjects goes
    // through the pixel-OCR kernel — the reference's rasterize+Tesseract
    // path (ocr_adapters.py:49-76), here reading the embedded samples
    // directly. Pages that yield no glyphs stay empty, as before.
    val ocrPages: Map[Int, graft.ocr.GlyphOcr.OcrResult] =
      pageResults.iterator.collect {
        case (idx, ops, page) if ops.spans.isEmpty =>
          ocrPage(page, objs).map(idx -> _)
      }.flatten.toMap

    val sb = new java.lang.StringBuilder
    val allSpans = Vector.newBuilder[SpanRow]
    var off = 0
    var spanTextLen = 0 // span-path text only (classification input)
    pageResults.foreach { case (idx, ops, _) =>
      if (idx > 0) { sb.append("\n\n"); off += 2 }
      if (ops.spans.nonEmpty) {
        val pt = SpanLayout.layoutPage(idx, ops.spans, off)
        sb.append(pt.text)
        off += pt.text.length
        spanTextLen += pt.text.length
        allSpans ++= pt.spans
      } else ocrPages.get(idx).foreach { res =>
        var lineOff = off
        res.text.split("\n", -1).foreach { line =>
          allSpans += SpanRow(idx, lineOff, line.length)
          lineOff += line.length + 1
        }
        sb.append(res.text)
        off += res.text.length
      }
    }
    val text = sb.toString
    // tables: drawn-rule grids first (pdfplumber "lines" strategy), then
    // span-alignment detection over the spans OUTSIDE every rule grid — one
    // table is detected by exactly one strategy
    val tables: Vector[TableRow] = pageResults.flatMap { case (_, ops, _) =>
      val ruled = RuleGrid.detect(ops.rules, ops.spans)
      val outside = ops.spans.filterNot(s => ruled.exists {
        case (_, (x0, y0, x1, y1)) =>
          s.x >= x0 && s.x <= x1 && s.y >= y0 && s.y <= y1
      })
      ruled.map(_._1) ++ TableGrid.detect(outside)
    }.toVector

    val pageCount = pages.length
    // classification reads the PRE-OCR metrics (the reference classifies
    // before extraction and routes scanned docs TO the OCR engine,
    // pdf_analyzer.py:96-122 + routers/documents.py:226-236) — OCR output
    // must not reclassify the doc as native text
    val pagesWithText = pageResults.count(_._2.spans.nonEmpty)
    val extractableRatio = pagesWithText.toDouble / pageCount
    val avgTextPerPage = spanTextLen.toDouble / pageCount
    val imgRatio = images.toDouble / pageCount
    val tableRatio = tables.length.toDouble / pageCount

    // pdf_analyzer.py:96-122 thresholds (incl. table_heavy at ratio > 0.8)
    val docType =
      if (!sawFont && extractableRatio < 0.3 && imgRatio > 0.5) "scanned"
      else if (tableRatio > 0.8) "table_heavy"
      else if (imgRatio > 1.5) "image_heavy"
      else if (sawFont && extractableRatio > 0.8 && avgTextPerPage > 100) "native_text"
      else if (!sawFont && pagesWithText == 0) "scanned"
      else "mixed"

    // E12: span pages score 1, OCR pages their glyph match rate
    val confidence = 100.0 *
      (pagesWithText + ocrPages.valuesIterator.map(_.matchRate).sum) / pageCount
    Right(PdfDoc(text, allSpans.result(), tables, pageCount, confidence, docType, docInfo(objs)))
  }

  /** Document metadata from the /Info dictionary (S5: the reference's
    * `get_file_metadata` title/author/producer/dates probe,
    * pdf_info_adapter.py:55-90). The /Info dict is found by key shape
    * (no /Type on Info dicts; trailer parsing skipped — body scan keeps
    * this xref-independent, consistent with `parseAll`).
    */
  def docInfo(objs: Objects): Map[String, String] = {
    val keys = Seq("Title", "Author", "Subject", "Producer", "Creator",
      "CreationDate", "ModDate")
    objs.byNum.toSeq.sortBy(_._1).iterator.map(_._2).collectFirst {
      case d: PDict if keys.count(d.m.contains) >= 1 &&
        !d.m.contains("Type") && !d.m.contains("Kids") && !d.m.contains("Contents") =>
        keys.flatMap { k =>
          d.m.get(k) match {
            case Some(PStr(b)) =>
              // text-string decode: UTF-16BE/UTF-8 by BOM, else
              // PDFDocEncoding (PDF 1.7 §7.9.2.2)
              Some(k.toLowerCase(java.util.Locale.ROOT) -> textString(b))
            case _ => None
          }
        }.toMap
    }.getOrElse(Map.empty)
  }

  /** Walk the catalog page tree; fall back to file-order /Type /Page scan. */
  private[graft] def findPages(objs: Objects): Vector[PDict] = {
    val catalogPages: Option[PVal] = objs.byNum.values.collectFirst {
      case d: PDict if objs.name(d.m.getOrElse("Type", PNull)).contains("Catalog") &&
        d.m.contains("Pages") => d.m("Pages")
    }
    val out = Vector.newBuilder[PDict]
    val seen = scala.collection.mutable.Set.empty[Int]

    def walk(v: PVal, depth: Int): Unit = {
      if (depth > 64) return
      v match {
        case PRef(n, _) =>
          if (seen.add(n)) walk(objs.resolve(v), depth + 1)
        case d: PDict =>
          objs.name(d.m.getOrElse("Type", PNull)) match {
            case Some("Pages") =>
              objs.arr(d.m.getOrElse("Kids", PNull)).foreach(_.foreach(walk(_, depth + 1)))
            case Some("Page") => out += d
            case _ =>
          }
        case _ =>
      }
    }

    catalogPages.foreach(walk(_, 0))
    val viaTree = out.result()
    if (viaTree.nonEmpty) viaTree
    else // fallback: file order (byNum is built from a file scan; sort by objnum as proxy)
      objs.byNum.toVector.sortBy(_._1).collect {
        case (_, d: PDict) if objs.name(d.m.getOrElse("Type", PNull)).contains("Page") => d
      }
  }

  /** Concatenate a page's /Contents streams (single ref or array). */
  private[graft] def contentBytes(page: PDict, objs: Objects): Either[String, Array[Byte]] = {
    val contents = page.m.getOrElse("Contents", PNull)
    val streams: Vector[PStream] = objs.resolve(contents) match {
      case s: PStream => Vector(s)
      case PArr(items) => items.flatMap(i => objs.resolve(i) match {
        case s: PStream => Some(s); case _ => None
      })
      case _ => Vector.empty
    }
    if (streams.isEmpty) return Right(Array.empty[Byte])
    val out = new java.io.ByteArrayOutputStream
    var err: String = null
    streams.foreach { s =>
      decodeStream(s, objs) match {
        case Right(b) => if (out.size() > 0) out.write('\n'); out.write(b, 0, b.length)
        case Left(e) => if (err == null) err = e
      }
    }
    if (out.size() == 0 && err != null) Left(err) else Right(out.toByteArray)
  }

  /** Inheritable page attribute (PDF 1.7 §7.7.3.4): nearest definition up
    * the /Parent chain wins. Bounded walk; cycles terminate.
    */
  private def inheritedAttr(page: PDict, objs: Objects, key: String): Option[PVal] = {
    var cur: Option[PDict] = Some(page)
    var depth = 0
    while (cur.isDefined && depth < 32) {
      val d = cur.get
      if (d.m.contains(key)) return Some(objs.resolve(d.m(key)))
      cur = objs.dict(d.m.getOrElse("Parent", PNull))
      depth += 1
    }
    None
  }

  /** Page /Resources with inheritance — a common real-world writer pattern
    * puts shared font/XObject dicts on the /Pages tree node.
    */
  private[graft] def pageResources(page: PDict, objs: Objects): Option[PDict] =
    inheritedAttr(page, objs, "Resources").flatMap(objs.dict)

  /** Page /Rotate (inheritable) as clockwise quarter turns; non-multiples
    * of 90 (spec-invalid) and absence both mean 0.
    */
  private def pageRotation(page: PDict, objs: Objects): Int =
    inheritedAttr(page, objs, "Rotate").flatMap(objs.num).map { d =>
      val norm = ((d.toInt % 360) + 360) % 360
      if (norm % 90 == 0) norm / 90 else 0
    }.getOrElse(0)

  /** Classifier probe: deliberately page-LOCAL, no inheritance — a shared
    * template font on the /Pages node (stamps/headers) must not flip a
    * raster-only scan from `scanned` to `mixed`; the probe asks "does THIS
    * page declare fonts", inheritance applies only to actually decoding
    * (fontsFor) and OCR resource lookup.
    */
  private def resourcesHaveFont(page: PDict, objs: Objects): Boolean =
    objs.dict(page.m.getOrElse("Resources", PNull))
      .exists(r => r.m.contains("Font"))

  /** Run pixel OCR over a page's image XObjects (8-bit DeviceGray/DeviceRGB,
    * any supported stream filter). Multiple images concatenate in resource
    * order — placement geometry is untracked (no CTM, SURVEY §7.5.1), so
    * a rotated multi-image page keeps resource order even where the
    * rotation reverses the images' visual stacking; real scanned pages are
    * one full-page raster. None when no image yields glyphs.
    */
  private def ocrPage(page: PDict, objs: Objects): Option[graft.ocr.GlyphOcr.OcrResult] = {
    val imgs: Seq[PStream] = pageResources(page, objs)
      .flatMap(r => objs.dict(r.m.getOrElse("XObject", PNull)))
      .map(_.m.toSeq.sortBy(_._1).flatMap { case (_, v) =>
        objs.resolve(v) match {
          case s: PStream
            if objs.name(s.dict.m.getOrElse("Subtype", PNull)).contains("Image") => Some(s)
          case _ => None
        }
      }).getOrElse(Seq.empty)
    val rot = pageRotation(page, objs)
    val results = imgs.flatMap { s =>
      val d = s.dict.m
      val w = objs.num(d.getOrElse("Width", PNull)).map(_.toInt).getOrElse(0)
      val h = objs.num(d.getOrElse("Height", PNull)).map(_.toInt).getOrElse(0)
      // /ImageMask true (PDF 1.7 §8.9.6.2): a 1-bit stencil, no color
      // space, painted with the current fill (black in practice) — the
      // classic fax-pipeline shape, usually CCITT-encoded. Bit semantics
      // (default Decode [0 1]: 0 paints, 1 transparent-over-white-page)
      // coincide with DeviceGray 1-bit luminance, so the same unpack
      // applies; a /Decode [1 0] mask flips via the inversion below.
      val isMask = d.get("ImageMask").exists(v => objs.resolve(v) == PBool(true))
      val bits = objs.num(d.getOrElse("BitsPerComponent", PNull)).map(_.toInt)
        .getOrElse(if (isMask) 1 else 0)
      val cs = objs.name(d.getOrElse("ColorSpace", PNull)).getOrElse("")
      if (w <= 0 || h <= 0 || w.toLong * h > (1L << 26) || (bits != 8 && bits != 1)) None
      else {
        // the two real-world scanned-raster filters (cf. reference
        // ocr_adapters.py:62 feeding pdf2image) get dedicated decodes:
        // DCTDecode payloads ARE JPEGs (in-JDK reader → luminance), and
        // CCITTFaxDecode G4 payloads go through the in-JDK TIFF codec
        // (CcittTiff). Only the sole-filter forms are handled (a fax/JPEG
        // inside a second compression layer does not occur in practice).
        // JBIG2Decode and JPXDecode have no in-JDK codec (the reference
        // rides poppler's bundled decoders) — DOCUMENTED degrade: the
        // unsupported stream yields no OCR and the page reads empty at
        // confidence 0 (OcrSpec pins this path never throws).
        val filters = filterNames(s, objs)
        val gray: Option[Array[Byte]] =
          if (filters == Vector("DCTDecode"))
            jpegGray(rawData(s, objs), w, h)
          else if (filters == Vector("CCITTFaxDecode"))
            ccittGray(s, objs, w, h)
          else decodeStream(s, objs).toOption.flatMap { raw =>
            if (bits == 1 && (cs == "DeviceGray" || isMask)) unpack1Bit(raw, w, h)
            else if (bits == 8 && cs == "DeviceGray" && raw.length >= w * h) Some(raw)
            else if (bits == 8 && cs == "DeviceRGB" && raw.length >= 3 * w * h)
              Some(graft.ocr.GlyphOcr.rgbToGrayScratch(raw, w, h))
            else None // 2/4-bit/CMYK/ICC images: no OCR, page stays empty
          }
        // /Decode [1 0] (PDF 1.7 §8.9.5.2): sample values are inverted
        // relative to the color space — common on real scans; honor it by
        // inverting the luminance (first component suffices for gray/RGB
        // gray-derived output)
        val inverted = objs.resolve(s.dict.m.getOrElse("Decode", PNull)) match {
          case PArr(items) if items.length >= 2 =>
            (objs.num(items(0)), objs.num(items(1))) match {
              case (Some(a), Some(b)) => a > b
              case _ => false
            }
          case _ => false
        }
        val lum = if (!inverted) gray else gray.map { g =>
          // bound by the page extent, not g.length: g may be a reused
          // scratch buffer longer than this page
          var i = 0
          while (i < w * h) { g(i) = (~g(i)).toByte; i += 1 }
          g
        }
        // /Rotate (inheritable): rotated scans are everyday input — portrait
        // pages scanned landscape, upside-down feeder stacks; without the
        // un-rotate the recognizer sees sideways glyph shapes and reads
        // nothing. Then auto-scale: scans arrive at 1-3× the font's native
        // DPI (reference profiles 150/300/600, system_config.py:19-33)
        lum.map { g =>
          val (rg, rw, rh) = graft.ocr.GlyphOcr.rotateCWScratch(g, w, h, rot)
          graft.ocr.GlyphOcr.recognizeAutoScale(rg, rw, rh)
        }
      }
    }.filter(_.glyphs > 0)
    if (results.isEmpty) None
    else Some(results.reduce((a, b) => graft.ocr.GlyphOcr.OcrResult(
      a.text + "\n" + b.text, a.glyphs + b.glyphs, a.matched + b.matched, a.skew)))
  }

  /** CCITTFaxDecode image → luminance via [[CcittTiff]], covering the fax
    * family real scanned PDFs carry (the reference's poppler rasterizer
    * decodes the same set, ocr_adapters.py:62):
    *  - K < 0: pure 2-D Group 4 (the overwhelming case) — rejects
    *    EncodedByteAlign (a G4 stream with aligned rows is not expressible
    *    as one TIFF T.6 strip);
    *  - K = 0: 1-D Group 3 MH — byte-aligned-without-EOLs maps to TIFF
    *    Compression 2, with-EOLs to Compression 3 (fill bits iff aligned);
    *    the unaligned no-EOL form has no TIFF expression and degrades;
    *  - K > 0: mixed 2-D Group 3 (per-row EOL + mode bit) → Compression 3
    *    with T4Options bit 0 (+ fill bits iff aligned).
    * Columns must match the dict width; anything else degrades to no-OCR.
    * BlackIs1 only flips the packed-bit convention, which the run-based
    * codec never sees — honoring it means inverting the luminance.
    */
  private def ccittGray(s: PStream, objs: Objects, w: Int, h: Int): Option[Array[Byte]] = {
    val parms = objs.dict(s.dict.m.getOrElse("DecodeParms",
      s.dict.m.getOrElse("DP", PNull)))
    def num(key: String, dflt: Double): Double =
      parms.flatMap(d => objs.num(d.m.getOrElse(key, PNull))).getOrElse(dflt)
    def bool(key: String): Boolean =
      parms.exists(_.m.get(key).contains(PBool(true)))
    if (num("Columns", 1728).toInt != w) return None
    val k = num("K", 0)
    val align = bool("EncodedByteAlign")
    val eol = bool("EndOfLine")
    val tags: Option[(Int, Int)] = // (TIFF Compression, T4Options or -1)
      if (k < 0) { if (align) None else Some((4, -1)) }
      else if (k == 0) {
        if (eol) Some((3, if (align) 4 else 0))
        else if (align) Some((2, -1))
        else None
      } else Some((3, if (align) 5 else 1))
    tags.flatMap { case (comp, t4) =>
      CcittTiff.decodeCcittGray(rawData(s, objs), w, h, comp, t4,
        dest = graft.ocr.GlyphOcr.OcrScratch.local.get.decodeBuf(w * h))
    }.map { g =>
      if (bool("BlackIs1")) {
        var i = 0
        while (i < w * h) { g(i) = (~g(i)).toByte; i += 1 }
      }
      g
    }
  }

  /** Packed 1-bit DeviceGray rows → 8-bit luminance: bit 1 = white
    * (DeviceGray max), 0 = black. Shared unpack loop in [[CcittTiff]].
    */
  private def unpack1Bit(packed: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
    CcittTiff.unpackBilevel(packed, w, h, whiteWhenSet = true,
      dest = graft.ocr.GlyphOcr.OcrScratch.local.get.decodeBuf(w * h))

  /** Per-thread JPEG decode scratch: one cached reader instance plus
    * reusable destination images keyed by (BufferedImage type, w, h).
    * Without the destination, ImageIO allocates a fresh raster per page —
    * up to 3·w·h bytes, the single biggest allocation on the scanned
    * route, and allocation bandwidth is what caps wide-executor scaling
    * (BENCH/ATTRIBUTION_r5.md). The destination is created from the
    * reader's FIRST legal image type — exactly the type the decoder would
    * otherwise allocate itself — so a type mismatch cannot occur on the
    * happy path; a defensive fallback decodes fresh if it ever does.
    */
  private final class JpegScratch {
    val reader: javax.imageio.ImageReader = {
      val it = javax.imageio.ImageIO.getImageReadersByFormatName("jpeg")
      if (it.hasNext) it.next() else null
    }
    val dests = scala.collection.mutable.HashMap
      .empty[(Int, Int, Int), java.awt.image.BufferedImage]
  }
  private val jpegScratch: ThreadLocal[JpegScratch] =
    ThreadLocal.withInitial(() => new JpegScratch)

  /** JPEG bytes → 8-bit luminance samples (None on decode failure or a
    * dict/JPEG dimension mismatch). Gray JPEGs pass through; color ones
    * take the same integer 299/587/114 weights as
    * [[graft.ocr.GlyphOcr.rgbToGray]]. Total: never throws.
    */
  private def jpegGray(data: Array[Byte], w: Int, h: Int): Option[Array[Byte]] = {
    try {
      val js = jpegScratch.get
      val reader = js.reader
      if (reader == null) return None
      // check the JPEG's OWN header dimensions BEFORE decoding: the dict
      // gate caps declared w×h, but a crafted payload with small dict dims
      // and huge internal dims would otherwise allocate its full raster
      // inside ImageIO.read before we could compare
      // MemoryCacheImageInputStream directly: ImageIO.createImageInputStream
      // defaults to a DISK-backed cache stream — one temp file created and
      // deleted per decoded page, pure I/O overhead for in-memory payloads
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(data))
      val img =
        try {
          reader.setInput(iis)
          if (reader.getWidth(0) != w || reader.getHeight(0) != h) return None
          val param = reader.getDefaultReadParam
          val types = reader.getImageTypes(0)
          val spec = if (types != null && types.hasNext) types.next() else null
          if (spec != null) {
            val t = spec.getBufferedImageType
            if (t == java.awt.image.BufferedImage.TYPE_BYTE_GRAY ||
                t == java.awt.image.BufferedImage.TYPE_3BYTE_BGR) {
              if (js.dests.size > 8) js.dests.clear() // bound retained rasters
              param.setDestination(
                js.dests.getOrElseUpdate((t, w, h), spec.createBufferedImage(w, h)))
            }
          }
          try reader.read(0, param)
          catch {
            case scala.util.control.NonFatal(_) if param.getDestination != null =>
              // defensive: a destination the decoder rejects — decode fresh
              // (prior behavior) rather than degrade the page
              param.setDestination(null)
              val iis2 = new javax.imageio.stream.MemoryCacheImageInputStream(
                new java.io.ByteArrayInputStream(data))
              try { reader.setInput(iis2); reader.read(0, param) }
              finally iis2.close()
          }
        } finally { reader.setInput(null); iis.close() }
      if (img == null) return None
      val n = w * h
      val out = graft.ocr.GlyphOcr.OcrScratch.local.get.decodeBuf(n)
      // fast paths read the decoder's backing byte buffer directly — the
      // getSamples API would copy each band into a fresh int[w*h] (~2 MB of
      // churn per 3×-DPI color page), and allocation bandwidth is exactly
      // what stops wide executors scaling
      img.getType match {
        case java.awt.image.BufferedImage.TYPE_BYTE_GRAY =>
          // hand the decoder's backing buffer straight out — it is fully
          // overwritten by the next decode into this (possibly cached)
          // image, and nothing downstream outlives the page
          val d = img.getRaster.getDataBuffer
            .asInstanceOf[java.awt.image.DataBufferByte].getData
          if (d.length < n) return None
          return Some(d)
        case java.awt.image.BufferedImage.TYPE_3BYTE_BGR =>
          val d = img.getRaster.getDataBuffer
            .asInstanceOf[java.awt.image.DataBufferByte].getData
          if (d.length < 3 * n) return None
          var i = 0
          while (i < n) {
            out(i) = (((d(3 * i + 2) & 0xFF) * 299 + (d(3 * i + 1) & 0xFF) * 587 +
              (d(3 * i) & 0xFF) * 114) / 1000).toByte
            i += 1
          }
        case _ =>
          val raster = img.getRaster
          if (raster.getNumBands == 1) {
            val px = raster.getSamples(0, 0, w, h, 0, null.asInstanceOf[Array[Int]])
            var i = 0
            while (i < n) { out(i) = px(i).toByte; i += 1 }
          } else if (raster.getNumBands >= 3) {
            val r = raster.getSamples(0, 0, w, h, 0, null.asInstanceOf[Array[Int]])
            val g = raster.getSamples(0, 0, w, h, 1, null.asInstanceOf[Array[Int]])
            val b = raster.getSamples(0, 0, w, h, 2, null.asInstanceOf[Array[Int]])
            var i = 0
            while (i < n) {
              out(i) = ((r(i) * 299 + g(i) * 587 + b(i) * 114) / 1000).toByte
              i += 1
            }
          } else return None
      }
      Some(out)
    } catch { case scala.util.control.NonFatal(_) => None }
  }
}
