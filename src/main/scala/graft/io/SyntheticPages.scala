package graft.io

import java.nio.charset.{Charset, StandardCharsets}
import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.model.Page
import graft.pdf.MiniPdf

/** Deterministic synthetic pages table (FIXTURES.md §3.5; SURVEY §7.2 step 1).
  *
  * Derives a Common-Crawl-shaped `pages(url, warc_ts, html, text, lang)`
  * table from the driver's `documents.parquet` — every byte a pure function
  * of `(doc_id, text, lang)`, no wall clock, no RNG. The `text` column is the
  * GOLDEN expected extraction output, computed from the content actually
  * injected into the payload (never by running the extractor — the golden is
  * spec-derived, mirroring the reference's old-vs-new MD5 gate,
  * tests/validation_test.py:19-66).
  *
  * Shape knobs (exercise the scale mechanics):
  *  - hosts are Zipf-ish: doc_id % 5 == 0 → one heavy host (~20% of rows —
  *    salting fixture), else one of 97 tail hosts;
  *  - ~10% of payloads are PDFs (doc_id % 10 == 9), half of them Flate;
  *  - HTML charsets rotate UTF-8 / UTF-8+BOM / windows-1252 / ISO-8859-1
  *    (zh pages pinned to UTF-8 — single-byte charsets can't carry CJK);
  *  - boilerplate: header, nav link list, related-links paragraph
  *    (link density 1.0), footer — all absent from golden;
  *  - doc_id % 7 == 3 pages embed a data table (tables column, not golden
  *    text); entity escapes appear in paragraph 1 of every multi-paragraph
  *    page.
  */
object SyntheticPages {

  final case class Spec(url: String, tsMillis: Long, payload: Array[Byte],
                        golden: String, lang: String)

  val Epoch: Long = 1704067200000L // 2024-01-01T00:00:00Z, fixed

  // precompiled: String.split("\\s+") recompiles the Pattern on every call
  // — once per document per x-query, once per replica row in the bench
  // corpus build
  private val Ws = java.util.regex.Pattern.compile("\\s+")

  def hostOf(docId: Long): String =
    if (docId % 5 == 0) "big.example.com" else s"h${docId % 97}.example.com"

  def urlOf(docId: Long): String = s"https://${hostOf(docId)}/p/$docId"

  def isPdfDoc(docId: Long): Boolean = docId % 10 == 9

  /** ~2%: image-only PDF (no fonts, no text ops) → docType `scanned`,
    * golden = the text rasterized INTO the page image, recoverable only by
    * the pixel-OCR path (the reference's scanned class + Tesseract route,
    * pdf_analyzer.py:101-105, ocr_adapters.py:49-76). Docs rotate through
    * skew slopes, gap specks, and a DeviceRGB variant, so deskew, speck
    * rejection and grayscale conversion are all load-bearing in the golden
    * gate.
    */
  def isScannedDoc(docId: Long): Boolean = docId % 50 == 17

  /** ~2%: valid `%PDF-` magic over undecodable garbage → status `error`
    * with empty text (the reference's error lifecycle, files.py:245-253);
    * ≥1024 bytes so it clears the validity floor and reaches the parser.
    */
  def isBrokenDoc(docId: Long): Boolean = docId % 50 == 41

  /** Half the native-PDF docs ship ENCRYPTED with an empty user password
    * (the "permissions restricted" class poppler opens transparently),
    * rotating RC4-128 / AES-128 / AES-256 by `(id/20) % 3`. Decryption is
    * text-transparent: golden, classification and accounting are identical
    * to the plaintext build, so the slice is oracle-neutral — the x02 gate
    * proves the decrypt path byte-exact at corpus scale. Disjoint from the
    * scanned (%50==17 → %20 ∈ {17,7}) and broken (%50==41 → %20 ∈ {1,11})
    * slots; always ≡3 mod 4, so never the Identity-H Type0 branch.
    */
  def isEncryptedDoc(docId: Long): Boolean =
    docId % 20 == 19 && !isLockedDoc(docId)

  /** ~0.5%: AES-256 encrypted under a NON-empty user password — the typed
    * `pdf_encrypted_locked` refusal (status error, empty golden), mirroring
    * the reference's open-failure lifecycle for password-protected uploads.
    */
  def isLockedDoc(docId: Long): Boolean = docId % 200 == 99

  private val accentWord = Map(
    "es" -> "información", "de" -> "übrigens", "fr" -> "déjà",
    "en" -> "naïve", "zh" -> "中文测试")

  def pageFor(docId: Long, docText: String, lang: String): Spec = {
    val words0 = Ws.split(docText.trim).toVector.filter(_.nonEmpty)
    if (isScannedDoc(docId)) {
      // mixed case + punctuation, filtered to the glyph set (a real scan of
      // unsupported characters simply has no ink for them). Words must keep
      // ≥1 letter/digit: a line of only dot-height punctuation would fall
      // under the recognizer's 3-row band floor and read as specks.
      val ocrWords = words0.take(24)
        .map(_.filter(graft.ocr.GlyphFont.supported))
        .filter(_.exists(Character.isLetterOrDigit))
      val lines = (if (ocrWords.isEmpty) Vector(s"SCAN $docId") else ocrWords)
        .grouped(6).map(_.mkString(" ")).toVector
      val variant = docId / 50
      val skew = graft.ocr.GlyphOcr.SkewCandidates(
        (variant % graft.ocr.GlyphOcr.SkewCandidates.length).toInt)
      // DPI rotation: some scans arrive at 2×/3× the font's native
      // resolution (reference profiles 150/300/600); the recognizer
      // auto-detects the scale
      val dpiScale = (variant % 7) match { case 5 => 2; case 6 => 3; case _ => 1 }
      // a quarter of the scans are typeset (proportional pitch) rather than
      // typewriter fixed-pitch, and half of those set in the bold face —
      // the recognizer auto-detects pitch mode and typeface per page.
      // One sub-slot of each pitch mode renders in the UNSEEN "alien" face
      // instead — out-of-universe input measuring the open-world degrade:
      // every glyph reads '?' (OcrSpec gates hamming ≥ 3 from every known
      // template), spacing/lines stay exact, and confidence drops to 0,
      // below the reference's 60.0 threshold
      // (domain/constants/__init__.py:12). The golden ENCODES the degrade.
      // Excluded from alien (those slots keep their previous face):
      //  - 2×/3×-DPI slots — an unreadable decimated pass falls through to
      //    the k=1 read of the upscaled raster, whose spacing is
      //    scale-dependent (outside the spec-predictable form);
      //  - DCT/JPEG slots — the checkerboard-dense alien glyphs are
      //    worst-case high-frequency content for JPEG, whose ringing
      //    crosses the binarization threshold and fabricates ink runs
      //    (observed: spurious punctuation matches); the degrade
      //    measurement wants a lossless raster, so alien ships Flate and
      //    CCITT only
      val typeset = variant % 4 == 2
      val losslessEnc = { val e = variant % 5; e != 2 && e != 4 }
      val alien = dpiScale == 1 && losslessEnc &&
        ((typeset && (variant / 4) % 4 == 0) ||
          (variant % 4 == 0 && (variant / 4) % 4 == 2))
      val face =
        if (alien) graft.ocr.GlyphFont.Alien
        else if (typeset && (variant / 4) % 2 == 1) graft.ocr.GlyphFont.Bold
        else graft.ocr.GlyphFont.Base
      // antialiasing halo (scanner point-spread): rotated through the
      // Flate AND DCT/JPEG slots with clean lighting — light halo (160,
      // above the Bernsen midpoint, invisible to the primary rung) and
      // dark halo (96, the heavy-ink class only the contrast ladder's low
      // rung reads; JPEG ringing stays inside the quarter-threshold
      // margin, probed gray+RGB before inclusion). Excluded: CCITT
      // (bilevel by construction), the lighting slots (gradient/fade
      // remap assumes binary input), and alien (a midpoint-rung dilated
      // fluke could beat the '?' degrade, making the open-world golden
      // unpredictable)
      val halo =
        if (alien || variant % 5 == 3 || variant % 10 == 0) 0
        else (variant % 3) match { case 1 => 160; case 2 => 96; case _ => 0 }
      val bmp = graft.ocr.GlyphRender.upscale(
        graft.ocr.GlyphRender.render(lines, skew,
          noiseSeed = docId, noisePerGap = 2 + (variant % 3).toInt,
          proportional = typeset, face = face, haloGray = halo), dpiScale)
      // raster encodings rotate through the real-world scanned-PDF filter
      // mix: Flate (gray + RGB), DCTDecode/JPEG (gray + RGB) and
      // CCITTFaxDecode (bilevel) — all load-bearing in the golden gate
      val enc = variant % 5
      val dct = enc == 2 || enc == 4
      val ccitt = enc == 3
      val rgb = !ccitt && (if (dct) enc == 4 else variant % 2 == 1)
      // half the CCITT stencils ship as /ImageMask (the fax-pipeline form)
      val mask = ccitt && (variant / 5) % 2 == 1
      // the CCITT slice itself rotates the fax flavor: pure-2-D G4 (K=-1),
      // 1-D G3 MH (K=0, byte-aligned — the TIFF-Compression-2 shape) and
      // mixed-2-D G3 (K=4, EOL-framed) — the reference's poppler front end
      // decodes all three (ocr_adapters.py:62), so the golden gate must too
      val ccittK = if (!ccitt) -1 else ((variant / 15) % 3) match {
        case 1 => 0
        case 2 => 4
        case _ => -1
      }
      // the gray-Flate slice (variant % 10 == 0, lossless so recognition
      // stays byte-exact) rotates through realistic lighting: an
      // illumination gradient (photographed page, one margin shadowed) or
      // uniformly faded low-contrast ink — the adaptive-binarization
      // territory a global threshold cannot read
      val upGray: Array[Byte] =
        if (rgb) bmp.gray
        else if (variant % 10 == 0 && (variant / 10) % 2 == 0) {
          // gradient span capped so any 96-px binarizer neighborhood sees
          // ≤ 36 levels of background drift: < 40 keeps blank neighborhoods
          // under the contrast floor, < 60 keeps ink/background separable
          // by the local midpoint — exact recovery at ANY page width (a
          // narrow fallback page with the full 110-level span would put
          // left-margin background below the midpoint and read as garbage)
          val span = math.min(110, (bmp.w - 1) * 3 / 8)
          val lit = new Array[Byte](bmp.gray.length)
          var y = 0
          while (y < bmp.h) {
            var x = 0
            while (x < bmp.w) {
              val bg = 140 + x * span / math.max(1, bmp.w - 1)
              val i = y * bmp.w + x
              lit(i) = (if ((bmp.gray(i) & 0xFF) < 128) bg - 60 else bg).toByte
              x += 1
            }
            y += 1
          }
          lit
        } else if (variant % 10 == 0)
          bmp.gray.map(b => (if ((b & 0xFF) < 128) 150 else 205).toByte)
        else bmp.gray
      // /Rotate rotation (quarter turns CW a viewer must apply): the stored
      // raster is the upright page rotated CCW by the same amount — rotated
      // scans (landscape-fed portrait pages, upside-down feeder stacks) are
      // everyday input and the extractor must un-rotate before OCR
      val quarter = ((variant / 3) % 4).toInt
      val (stGray, sw, sh) =
        graft.ocr.GlyphOcr.rotateCW(upGray, bmp.w, bmp.h, (4 - quarter) % 4)
      val samples =
        if (rgb) graft.ocr.GlyphRender.toRgb(graft.ocr.GlyphRender.Bitmap(stGray, sw, sh))
        else stGray
      Spec(urlOf(docId), Epoch + docId * 1000L,
        MiniPdf.buildScanned(samples, sw, sh, rgb, dct = dct,
          ccitt = ccitt, mask = mask, rotate = quarter * 90, ccittK = ccittK),
        // alien golden = the degrade itself: every glyph '?', structure kept
        if (alien)
          lines.map(_.map(c => if (c == ' ') c else '?')).mkString("\n")
        else lines.mkString("\n"),
        lang)
    } else if (isBrokenDoc(docId)) {
      val junk = new java.lang.StringBuilder("%PDF-1.7\n")
      var x = docId
      while (junk.length < 1400) { // hex digits + spaces can never form "N G obj"
        x = graft.ops.Dedup.splitmix64(x)
        junk.append(java.lang.Long.toHexString(x)).append(' ')
      }
      Spec(urlOf(docId), Epoch + docId * 1000L,
        junk.toString.getBytes(StandardCharsets.ISO_8859_1), "", lang)
    } else if (isPdfDoc(docId)) {
      // PDF v1 string scope is Latin-1 (SURVEY §7.5.1) — CJK can't round-trip
      val safe = if (lang == "zh") "zhongwen-ceshi" else accentWord.getOrElse(lang, "extra")
      pdfPage(docId, words0 :+ safe, lang)
    } else htmlPage(docId, words0 :+ accentWord.getOrElse(lang, "extra"), lang)
  }

  /** HTML payload + golden. Golden = title + paragraphs joined "\n\n". */
  private def htmlPage(docId: Long, words: Vector[String], lang: String): Spec = {
    val paras0 = words.grouped(12).map(_.mkString(" ")).toVector
    // entity fixture: paragraph 1 gets an ampersand pair
    val paras = paras0.zipWithIndex.map { case (p, i) =>
      if (i == 1) p + " A & B" else p
    }
    val title = s"Documento $docId"
    val golden = (title +: paras).mkString("\n\n")

    val charset: Charset =
      if (lang == "zh") StandardCharsets.UTF_8
      else (docId % 4) match {
        case 0 | 1 => StandardCharsets.UTF_8
        case 2 => Charset.forName("windows-1252")
        case _ => StandardCharsets.ISO_8859_1
      }
    val withBom = lang != "zh" && docId % 4 == 1
    val metaDecl = charset.name match {
      case "windows-1252" => "<meta charset=\"windows-1252\">"
      case "ISO-8859-1" =>
        "<meta http-equiv=\"Content-Type\" content=\"text/html; charset=ISO-8859-1\">"
      case _ => "<meta charset=\"utf-8\">"
    }

    val paraHtml = paras.zipWithIndex.map { case (p, i) =>
      val body = if (i == 1) p.replace(" A & B", " A &amp; B") else p
      s"  <p>$body</p>"
    }.mkString("\n")
    val tableHtml =
      if (docId % 7 == 3)
        s"  <table><tr><th>key</th><th>value</th></tr><tr><td>id</td><td>$docId</td></tr></table>\n"
      else ""
    val html =
      s"""<!DOCTYPE html>
         |<html lang="$lang"><head>
         |$metaDecl
         |<title>doc $docId — site</title>
         |<script>var page=$docId;</script>
         |<style>.m{color:#333}</style>
         |</head><body>
         |<header><div><a href="/">Example Site</a></div></header>
         |<nav><ul><li><a href="/s1">Section one</a></li><li><a href="/s2">Section two</a></li><li><a href="/s3">More</a></li></ul></nav>
         |<main>
         |  <h1>$title</h1>
         |$paraHtml
         |$tableHtml  <p><a href="/rel/1">related</a> <a href="/rel/2">links</a> <a href="/rel/3">here</a></p>
         |</main>
         |<aside><p>Subscribe to our newsletter for more.</p></aside>
         |<footer><p>© example.com — <a href="/legal">legal</a></p></footer>
         |</body></html>""".stripMargin

    val bytes =
      if (withBom) Array(0xEF, 0xBB, 0xBF).map(_.toByte) ++ html.getBytes(charset)
      else html.getBytes(charset)
    Spec(urlOf(docId), Epoch + docId * 1000L, bytes, golden, lang)
  }

  /** PDF payload + golden. Golden = lines joined "\n" per page, pages "\n\n".
    * The `% 7 == 3` slot (same as the HTML table slot) appends a RULED-grid
    * table page: structure carried by drawn lines, text x ragged per row —
    * extractable only via [[graft.pdf.RuleGrid]]. Cell text stays in the
    * golden (pdfplumber semantics: text and tables are independent views).
    *
    * The `% 4 == 1` slot (excluding the table slot) is an Identity-H Type0
    * doc WITHOUT /ToUnicode: show strings are glyph ids at a +0x1000 offset
    * from the codepoints, mapped only by the embedded TrueType cmap — the
    * golden matches ONLY if [[graft.pdf.TrueTypeCmap]] reversal works (the
    * BMP degrade path would emit U+10xx garbage).
    */
  private def pdfPage(docId: Long, words: Vector[String], lang: String): Spec = {
    val lines = words.grouped(8).map(_.mkString(" ")).toVector
    if (docId % 4 == 1 && docId % 7 != 3 &&
        lines.forall(_.forall(c => c >= ' ' && c <= 'ÿ'))) {
      val ttf = MiniPdf.sfntWithCmap(
        MiniPdf.cmapFormat4(Seq((0x20, 0xFF, 0x1020))), 3, 1)
      val shows = lines.zipWithIndex.map { case (l, i) =>
        (l.map(c => f"${c + 0x1000}%04X").mkString, 72, 720 - 14 * i)
      }
      return Spec(urlOf(docId), Epoch + docId * 1000L,
        MiniPdf.buildType0Embedded(shows, ttf, padTo = 1024),
        lines.mkString("\n"), lang)
    }
    val pages = lines.grouped(10).toVector
    val textPages = pages.map(_.mkString("\n"))
    val streams0 = pages.map { pageLines =>
      MiniPdf.streamFor(pageLines.zipWithIndex.map { case (l, i) => (l, 72, 720 - 14 * i) })
    }
    val (streams, goldenPages) =
      if (docId % 7 == 3) {
        val rows = Seq(Seq("key", "value"), Seq("id", docId.toString))
        val ruled = MiniPdf.ruledGridStream(rows, Seq(72, 212),
          jitter = (r, c) => ((docId % 7).toInt + r * 4 + c * 6) % 17)
        (streams0 :+ ruled, textPages :+ s"key value\nid $docId")
      } else (streams0, textPages)
    val golden = goldenPages.mkString("\n\n")
    val flate = (docId / 10) % 2 == 0
    if (isLockedDoc(docId))
      // non-empty user password: the reader must refuse typed; golden is
      // the refusal contract (empty text), not the unreachable plaintext
      Spec(urlOf(docId), Epoch + docId * 1000L,
        MiniPdf.buildEncrypted(streams, "aesv3", userPw = s"pw-$docId", flate = flate),
        "", lang)
    else if (isEncryptedDoc(docId)) {
      val variant = Vector("rc4-128", "aesv2", "aesv3")(((docId / 20) % 3).toInt)
      Spec(urlOf(docId), Epoch + docId * 1000L,
        MiniPdf.buildEncrypted(streams, variant, flate = flate), golden, lang)
    } else
      Spec(urlOf(docId), Epoch + docId * 1000L, MiniPdf.build(streams, flate = flate),
        golden, lang)
  }

  /** Spark derivation: documents.parquet → pages DataFrame (Page schema).
    *
    * The narrow source rows are repartitioned BEFORE the generative
    * flatMap: documents.parquet is a single row-group at small SF, so
    * without it the whole payload synthesis would run in ONE scan task
    * and serialize the job regardless of core count.
    *
    * `replicas` > 1 amplifies the corpus deterministically for throughput
    * benchmarks: variant v of doc d gets id `d * replicas + v` and a
    * v-rotated word stream (distinct content, same statistical shape).
    *
    * `slice` restricts the generated corpus by ROUTE (scaling-attribution
    * benchmarks, VERDICT r4 directive 1): "all" (default), "text" (the
    * HTML/native-PDF diet — scanned and broken docs excluded) or "scan"
    * (ONLY the pixel-OCR docs). Filtering happens before payload
    * synthesis, so a slice costs nothing to skip.
    */
  def fromDocuments(spark: SparkSession, sfDir: String, replicas: Int = 1,
                    partitions: Int = 0, slice: String = "all"): DataFrame = {
    import spark.implicits._
    require(Set("all", "text", "scan")(slice), s"unknown corpus slice: $slice")
    val p = if (partitions > 0) partitions else spark.sparkContext.defaultParallelism
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang")
      .as[(Long, String, String)]
      .repartition(p)
      .mapPartitions(_.flatMap { case (id, text0, lang0) =>
        val text = if (text0 == null) "" else text0
        val lang = if (lang0 == null) "en" else lang0
        (0 until replicas).iterator.flatMap { v =>
          val vid = id * replicas + v
          val keep = slice match {
            case "text" => !isScannedDoc(vid) && !isBrokenDoc(vid)
            case "scan" => isScannedDoc(vid)
            case _ => true
          }
          if (!keep) None
          else {
            val vtext = if (v == 0) text else rotateWords(text, v)
            val s = pageFor(vid, vtext, lang)
            Some(Page(s.url, new Timestamp(s.tsMillis), s.payload, s.golden, s.lang))
          }
        }
      })
      .toDF()
  }

  private def rotateWords(text: String, v: Int): String = {
    val w = Ws.split(text.trim)
    if (w.length < 2) return text + " v" + v
    val k = v % w.length
    (w.drop(k) ++ w.take(k)).mkString(" ") + " v" + v
  }
}
