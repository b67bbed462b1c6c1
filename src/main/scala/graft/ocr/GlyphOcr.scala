package graft.ocr

import GlyphFont._

/** Pixel OCR for image-only ("scanned") PDF pages — the capability the
  * reference delegates to Tesseract over poppler rasters
  * (`ocr_adapters.py:49-76`; rasterize :62,144), rebuilt as a deterministic
  * JVM kernel:
  *
  *   1. binarize adaptively (reference E6): per-32px-tile local contrast
  *      over a 3×3-tile neighborhood; threshold = (min+max)/2 where the
  *      neighborhood contrast ≥ 40, else no ink there. On a clean bimodal
  *      0/255 scan every text neighborhood thresholds at 127 — identical
  *      to the former fixed-128 rule (and the same wide margin JPEG decode
  *      error must cross) — while low-contrast scans (faded ink, gray
  *      paper) and illumination gradients (photographed pages, one side in
  *      shadow) binarize by their LOCAL ink/background levels instead of
  *      reading blank or solid;
  *   2. deskew: search vertical-shear slopes, keep the one maximizing the
  *      row-projection energy Σ count² (reference E7 takes the median
  *      Hough-line angle — same robust-alignment idea, projection profiles
  *      instead of Hough);
  *   3. line segmentation by row-projection bands (bands under 3 px are
  *      specks, dropped);
  *   4. glyph segmentation by column runs inside each band; spacing is
  *      pitch-mode aware: the page is fixed-pitch (typewriter) when the
  *      MAJORITY of its multi-run bands fit a Pitch grid ± 2 (ties →
  *      fixed), else proportional (typeset) — fixed infers
  *      round(Δstart/Pitch)−1 spaces, proportional
  *      round((gap−PropGap)/PropSpace);
  *   5. template match against [[GlyphFont]], trimmed to the run's ink box;
  *      hamming distance ≤ 1 accepts (sound because every same-width
  *      template pair is ≥ 3 apart, spec-gated), else `?`.
  *
  * Totally deterministic: integer math, fixed tie-breaks (smallest |slope|,
  * then smallest slope; lowest char on template ties). Never throws on
  * arbitrary bytes; garbage yields empty text with zero confidence.
  */
object GlyphOcr {

  /** Slopes the deskew search tries (±0.05 in 1/160 steps). The synthetic
    * renderer draws FROM this same grid, so recovery is integer-exact —
    * mirroring how the reference only corrects skew beyond 0.5°
    * (`ocr_adapters.py:246`).
    */
  val SkewCandidates: Vector[Double] = (-8 to 8).map(_ * 0.00625).toVector

  /** Per-thread reusable page-sized buffers. The scanned slice allocates
    * several MB per page (decode output, un-rotation copy, decimation
    * buffers, the un-shear grid) and at wide core counts that allocation +
    * zeroing traffic saturates the shared memory bus before the cores do:
    * the route-sliced scaling run measured 4→16-core efficiency 0.45 on a
    * scan-only corpus vs 0.82 on the full mix (BENCH/ATTRIBUTION_r5.md).
    * Buffers live per executor thread (Spark tasks are single-threaded per
    * partition) and are reused across pages; anything above [[OcrScratch.MaxReuse]]
    * elements is allocated fresh and NOT retained, bounding the per-thread
    * footprint. The byte slots are only handed to writers that overwrite
    * every element they later read, so no clearing is ever paid; the grid
    * keeps an all-false invariant restored by un-setting exactly the ink
    * cells each call set (~5% of cells — 20× cheaper than re-zeroing).
    */
  private[graft] final class OcrScratch {
    import OcrScratch.MaxReuse
    private var a = Array.emptyByteArray   // decode output slot
    private var b = Array.emptyByteArray   // un-rotation slot
    private var d = Array.emptyByteArray   // decimation slot
    private[ocr] var inkXY = new Array[Int](1024)
    private var cnt: Array[Int] = Array.emptyIntArray
    private var grid: Array[Boolean] = Array.emptyBooleanArray // all-false between uses
    private[ocr] val runBits = new Array[Int](GlyphFont.H)
    private[graft] def decodeBuf(n: Int): Array[Byte] =
      if (a.length >= n) a
      else if (n > MaxReuse) new Array[Byte](n)
      else { a = new Array[Byte](n); a }
    private[graft] def rotateBuf(n: Int): Array[Byte] =
      if (b.length >= n) b
      else if (n > MaxReuse) new Array[Byte](n)
      else { b = new Array[Byte](n); b }
    private[ocr] def dsBuf(n: Int): Array[Byte] =
      if (d.length >= n) d
      else if (n > MaxReuse) new Array[Byte](n)
      else { d = new Array[Byte](n); d }
    private[ocr] def countsBuf(n: Int): Array[Int] =
      if (cnt.length >= n) cnt
      else if (n > MaxReuse) new Array[Int](n)
      else { cnt = new Array[Int](n); cnt }
    private[ocr] def gridBuf(n: Int): Array[Boolean] =
      if (grid.length >= n) grid
      else if (n > MaxReuse) new Array[Boolean](n)
      else { grid = new Array[Boolean](n); grid }
  }
  private[graft] object OcrScratch {
    /** Retention cap (elements): a page at the 2²⁶-pixel dict gate would
      * otherwise pin ~64 MB per slot per thread forever; pages past the cap
      * pay the one-off allocation instead (rare — the synthetic 3×-DPI page
      * is ~2.7 M cells).
      */
    val MaxReuse: Int = 1 << 23
    val local: ThreadLocal[OcrScratch] =
      ThreadLocal.withInitial(() => new OcrScratch)
  }

  final case class OcrResult(text: String, glyphs: Int, matched: Int, skew: Double) {
    def matchRate: Double = if (glyphs == 0) 0.0 else matched.toDouble / glyphs
  }

  /** Templates trimmed in BOTH dimensions: (char, width, height, per-row
    * bit masks over the trim box). Matching competes only within the
    * (width, height) class — this is what makes mixed case work: an
    * x-height 'o' (5 rows) and a capital 'O' (7 rows) never compare, and a
    * run's bits are extracted relative to its OWN ink box, so the glyph's
    * vertical position inside the line band (ascender vs x-height vs
    * punctuation row) cancels out. One template set per [[GlyphFont.Face]];
    * the page-level face pick happens after segmentation (the runs are
    * face-independent, only matching differs).
    */
  private def buildTemplates(face: GlyphFont.Face): Vector[(Char, Int, Int, Array[Int])] =
    Chars.map { c =>
      val (lo, hi) = face.trim(c)
      val (rlo, rhi) = face.rowTrim(c)
      val width = hi - lo + 1
      val height = rhi - rlo + 1
      val colsBits = Array.tabulate(height) { r =>
        var bits = 0
        var col = lo
        while (col <= hi) {
          if (face.ink(c, col, rlo + r)) bits |= 1 << (col - lo)
          col += 1
        }
        bits
      }
      (c, width, height, colsBits)
    }.toVector

  private val faceTemplates: Vector[(GlyphFont.Face, Vector[(Char, Int, Int, Array[Int])])] =
    GlyphFont.Faces.map(f => (f, buildTemplates(f)))

  /** Tile edge for adaptive binarization (power of two: tile index is a
    * shift). 32 px ≫ glyph size (W×H ≤ 16×16) and ≪ page size, so a 3×3
    * neighborhood (96 px) always sees background around any text, and ink
    * whenever a glyph is near.
    */
  private final val TileShift = 5
  /** Minimum neighborhood (max−min) for a tile to binarize at all: below
    * this, local variation is sensor/JPEG noise or a bare illumination
    * gradient, not ink — the tile stays blank (Bernsen's contrast floor).
    */
  private final val MinContrast = 40

  /** Per-tile min/max (one full-page read) — rung-INDEPENDENT, so the
    * contrast ladder computes it once and derives both rungs' thresholds
    * from it; the retry pays only the re-classification pass.
    */
  private def tileMinMax(gray: Array[Byte], w: Int, h: Int): (Array[Int], Array[Int], Int) = {
    val tw = ((w - 1) >> TileShift) + 1
    val th = ((h - 1) >> TileShift) + 1
    val mins = Array.fill(tw * th)(255)
    val maxs = new Array[Int](tw * th)
    var y = 0
    while (y < h) {
      val rowBase = (y >> TileShift) * tw
      var x = 0
      while (x < w) {
        val v = gray(y * w + x) & 0xFF
        val t = rowBase + (x >> TileShift)
        if (v < mins(t)) mins(t) = v
        if (v > maxs(t)) maxs(t) = v
        x += 1
      }
      y += 1
    }
    (mins, maxs, tw)
  }

  /** Per-tile binarization thresholds: Bernsen local midpoint over the
    * 3×3-tile neighborhood, 0 (nothing passes `<0`... `<=` never used) for
    * low-contrast tiles. Deterministic integer math. `lowRung` biases the
    * threshold to the dark quarter of the local range (min + range/4) —
    * the retry rung of the contrast ladder, which classifies mid-gray
    * antialiasing halo as background while keeping true ink.
    */
  private def tileThresholds(mins: Array[Int], maxs: Array[Int], tw: Int,
                             lowRung: Boolean): Array[Int] = {
    val th = mins.length / tw
    val thr = new Array[Int](tw * th)
    var ty = 0
    while (ty < th) {
      var tx = 0
      while (tx < tw) {
        var nMin = 255
        var nMax = 0
        var dy = math.max(0, ty - 1)
        val eY = math.min(th - 1, ty + 1)
        while (dy <= eY) {
          var dx = math.max(0, tx - 1)
          val eX = math.min(tw - 1, tx + 1)
          while (dx <= eX) {
            val t = dy * tw + dx
            if (mins(t) < nMin) nMin = mins(t)
            if (maxs(t) > nMax) nMax = maxs(t)
            dx += 1
          }
          dy += 1
        }
        thr(ty * tw + tx) =
          if (nMax - nMin < MinContrast) 0
          else if (lowRung) nMin + ((nMax - nMin) >> 2)
          else (nMin + nMax) >> 1
        tx += 1
      }
      ty += 1
    }
    thr
  }

  /** Contrast-ladder recognition (the adaptive-binarization retry a real
    * OCR stack gets from trying Otsu/adaptive variants): the primary rung
    * binarizes at the Bernsen local midpoint; if it does not read the page
    * perfectly, a second rung retries at the dark quarter of the local
    * range — a heavily-inked or antialiased scan carries a mid-gray halo
    * around every stroke (below the midpoint, above the quarter), which
    * the primary rung reads as ink, dilating every glyph past its
    * template; the low rung drops the halo and recovers the exact shapes.
    * The better read wins (match rate, then glyphs; ties → primary), but
    * the low rung is CREDIBLE only when it substantially reads
    * (matchRate ≥ [[DecimatedMinRate]], the same rationale as the
    * decimation floor): on a page outside the template universe — an
    * unseen face under gradient lighting — the re-binarized ink set is a
    * different random sample whose few fluke matches would otherwise beat
    * the honest matchRate-0 `?`-degrade and return garbage. A clean page
    * reads 1.0 on the primary rung and never pays the retry, so the hot
    * path is unchanged; only degraded pages pay 2×.
    */
  def recognize(gray: Array[Byte], w: Int, h: Int): OcrResult = {
    if (w <= 0 || h <= 0 || gray.length < w * h) return OcrResult("", 0, 0, 0.0)
    val (mins, maxs, tw) = tileMinMax(gray, w, h) // rung-independent, shared
    val primary = recognizeAt(gray, w, h,
      tileThresholds(mins, maxs, tw, lowRung = false), tw)
    // glyphs == 0 skips the retry PROVABLY: the low rung's threshold is
    // pointwise ≤ the midpoint's, so its ink set is a subset — bands and
    // runs can only shrink, never appear. A blank page pays one pass.
    if (primary.glyphs == 0 || primary.matched == primary.glyphs) primary
    else {
      val low = recognizeAt(gray, w, h,
        tileThresholds(mins, maxs, tw, lowRung = true), tw)
      if (low.matchRate >= DecimatedMinRate &&
          (low.matchRate > primary.matchRate ||
            (low.matchRate == primary.matchRate && low.glyphs > primary.glyphs))) low
      else primary
    }
  }

  /** One rung: binarize at the given bias and recognize. */
  private def recognizeSingle(gray: Array[Byte], w: Int, h: Int,
                              lowRung: Boolean): OcrResult = {
    if (w <= 0 || h <= 0 || gray.length < w * h) return OcrResult("", 0, 0, 0.0)
    val (mins, maxs, tw) = tileMinMax(gray, w, h)
    recognizeAt(gray, w, h, tileThresholds(mins, maxs, tw, lowRung), tw)
  }

  private def recognizeAt(gray: Array[Byte], w: Int, h: Int,
                          thr: Array[Int], tw: Int): OcrResult = {

    // 1+2 fused: ONE binarize pass collects the sparse ink coordinates
    // (~5% of pixels on a text page); the 17-candidate deskew search and
    // the un-shear then iterate the ink list instead of re-reading every
    // pixel 18 times — the scanned slice is 2% of the corpus but was ~half
    // its extraction wall, dominated by exactly these full-image passes.
    // (The tile min/max pre-pass adds one more read of the page — still
    // O(pixels), no allocation beyond the tiny tile grid.)
    val scratch = OcrScratch.local.get
    var nInk = 0
    var inkXY: Array[Int] = scratch.inkXY // packed y*w+x, grown on demand
    locally {
      var y = 0
      while (y < h) {
        val rowBase = (y >> TileShift) * tw
        var x = 0
        while (x < w) {
          if ((gray(y * w + x) & 0xFF) < thr(rowBase + (x >> TileShift))) {
            if (nInk == inkXY.length) {
              inkXY = java.util.Arrays.copyOf(inkXY, nInk * 2)
              // retention honors the MaxReuse cap like every other slot: a
              // pathologically dense page must not pin a huge int[] forever
              if (inkXY.length <= OcrScratch.MaxReuse) scratch.inkXY = inkXY
            }
            inkXY(nInk) = y * w + x
            nInk += 1
          }
          x += 1
        }
        y += 1
      }
    }

    // deskew — maximize Σ rowcount² over shear candidates
    var bestSkew = 0.0
    var bestScore = -1L
    val pad = math.abs(math.round(SkewCandidates.last * (w - 1)).toInt) + 1
    val nRows = h + 2 * pad
    val counts = scratch.countsBuf(nRows) // fill/read windowed to [0, nRows)
    SkewCandidates.foreach { s =>
      java.util.Arrays.fill(counts, 0, nRows, 0)
      var k = 0
      while (k < nInk) {
        val p = inkXY(k)
        counts(p / w - GlyphRender.shift(s, p % w) + pad) += 1
        k += 1
      }
      var score = 0L
      var i = 0
      while (i < nRows) { val c = counts(i); score += c.toLong * c; i += 1 }
      val better = score > bestScore ||
        (score == bestScore && (math.abs(s) < math.abs(bestSkew) ||
          (math.abs(s) == math.abs(bestSkew) && s < bestSkew)))
      if (better) { bestScore = score; bestSkew = s }
    }

    // 3: un-shear into a binary grid (integer-exact inverse of the shear).
    // The grid comes from scratch under an all-false invariant; the
    // `finally` below restores it by un-setting exactly the cells this
    // call sets (the ink list mapped through bestSkew — deterministic, so
    // the clear hits precisely the written cells even on an early return).
    val gh = h + 2 * pad
    val grid = scratch.gridBuf(w * gh)
    locally {
      var k = 0
      while (k < nInk) {
        val p = inkXY(k)
        val x = p % w
        grid((p / w - GlyphRender.shift(bestSkew, x) + pad) * w + x) = true
        k += 1
      }
    }
    try {
    @inline def rowHasInk(r: Int): Boolean = {
      var x = 0
      while (x < w) { if (grid(r * w + x)) return true; x += 1 }
      false
    }

    // line bands
    val bands = Vector.newBuilder[(Int, Int)]
    var r = 0
    while (r < gh) {
      if (rowHasInk(r)) {
        var e = r
        while (e + 1 < gh && rowHasInk(e + 1)) e += 1
        if (e - r + 1 >= 3) bands += ((r, math.min(e, r + H - 1)))
        r = e + 1
      } else r += 1
    }

    // glyph runs per band (start, end columns), collected once — both the
    // pitch-mode detection and the emit pass read them
    val bandList = bands.result()
    val runsPerBand: Vector[Vector[(Int, Int)]] = bandList.map { case (top, bot) =>
      @inline def colInk(x: Int): Boolean = {
        var rr = top
        while (rr <= bot) { if (grid(rr * w + x)) return true; rr += 1 }
        false
      }
      val rs = Vector.newBuilder[(Int, Int)]
      var x = 0
      while (x < w) {
        if (colInk(x)) {
          var e = x
          while (e + 1 < w && colInk(e + 1)) e += 1
          rs += ((x, e))
          x = e + 1
        } else x += 1
      }
      rs.result()
    }

    // pitch-mode detection: a fixed-pitch (typewriter) page puts every run
    // start on a Pitch grid ± the glyph's in-cell start column (≤ 2,
    // OcrSpec-gated); proportional (typeset) layout walks off that grid as
    // soon as trimmed widths vary. The page votes by MAJORITY of its
    // multi-run bands (ties → fixed): majority is robust both ways — one
    // noise blob at an off-grid column inside a text band cannot flip a
    // fixed-pitch page to proportional spacing (the blob reads '?' locally,
    // spacing stays right page-wide), and one short grid-coincident line
    // (e.g. "i i") cannot flip a typeset page to fixed spacing.
    val fixedPitch = {
      var fits = 0
      var off = 0
      runsPerBand.foreach { rs =>
        if (rs.length > 1) {
          val ok = (0 to 2).exists { o =>
            val phi = rs.head._1 - o
            rs.forall { case (s, _) => s - phi >= 0 && (s - phi) % Pitch <= 2 }
          }
          if (ok) fits += 1 else off += 1
        }
      }
      fits >= off
    }

    // face selection: match every run against each face's template set and
    // keep the face that reads the most glyphs (ties → earliest face, i.e.
    // Base). Segmentation is face-independent, so the extra face costs only
    // a template pass over the page's few dozen runs, not an image pass.
    val flatRuns: Vector[(Int, Int, Int, Int)] =
      bandList.zipWithIndex.flatMap { case ((top, bot), bi) =>
        runsPerBand(bi).map { case (x, e) => (top, bot, x, e) }
      }
    val matchedChars: Vector[Option[Char]] = faceTemplates
      .map { case (face, ts) =>
        flatRuns.map { case (top, bot, x, e) =>
          matchGlyph(grid, w, top, bot, x, e, ts, face.width, scratch)
        }
      }
      .maxBy(_.count(_.isDefined))
    val matched = matchedChars.count(_.isDefined)

    val sb = new java.lang.StringBuilder
    var glyphs = 0
    bandList.zipWithIndex.foreach { case ((_, _), bi) =>
      if (bi > 0) sb.append('\n')
      var prevStart = -1
      var prevEnd = -1
      runsPerBand(bi).foreach { case (x, e) =>
        if (prevStart >= 0) {
          // fixed pitch: consecutive glyph STARTS sit at cell boundaries ±
          // their in-cell start column, so round(Δstart / Pitch) is the
          // exact cell distance and cells-1 the exact space count — robust
          // to narrow punctuation, unlike a raw ink-gap threshold (a '.'
          // before an 'I' would fake a space). Proportional: ink gaps are
          // PropGap + n·PropSpace by construction, so round back to n.
          var k =
            if (fixedPitch)
              (2 * (x - prevStart) + Pitch) / (2 * Pitch) - 1 // round(Δ/Pitch)-1
            else {
              val gap = x - prevEnd - 1
              (2 * (gap - GlyphRender.PropGap) + GlyphRender.PropSpace) /
                (2 * GlyphRender.PropSpace) // round((gap-PropGap)/PropSpace)
            }
          while (k > 0) { sb.append(' '); k -= 1 }
        }
        sb.append(matchedChars(glyphs).getOrElse('?'))
        glyphs += 1
        prevStart = x
        prevEnd = e
      }
    }
    OcrResult(sb.toString, glyphs, matched, bestSkew)
    } finally {
      var k = 0
      while (k < nInk) {
        val p = inkXY(k)
        val x = p % w
        grid((p / w - GlyphRender.shift(bestSkew, x) + pad) * w + x) = false
        k += 1
      }
    }
  }

  /** Nearest trimmed template of the run [x0, x1] × its own ink-row box
    * inside [top, bot]; accept at hamming ≤ 1 — sound because every
    * template pair in the same (width, height) class is ≥ 3 apart (OcrSpec
    * gate), so a ≤ 1-bit corruption is still strictly nearest to the true
    * glyph. Ties: lowest char wins (deterministic).
    */
  private def matchGlyph(grid: Array[Boolean], w: Int, top: Int, bot: Int,
                         x0: Int, x1: Int,
                         templates: Vector[(Char, Int, Int, Array[Int])],
                         maxW: Int, scratch: OcrScratch): Option[Char] = {
    val width = x1 - x0 + 1
    if (width > maxW) return None
    // run's own ink-row bounding box (vertical trim, mirroring the templates)
    var rTop = -1; var rBot = -1
    var r = top
    while (r <= bot) {
      var col = x0
      var any = false
      while (col <= x1 && !any) { any = grid(r * w + col); col += 1 }
      if (any) { if (rTop < 0) rTop = r; rBot = r }
      r += 1
    }
    if (rTop < 0) return None
    val height = rBot - rTop + 1
    if (height > H) return None
    // height ≤ H, so the fixed H-length scratch row buffer always fits;
    // rows [0, height) are overwritten before the compare loop reads them
    val runBits = scratch.runBits
    var row0 = 0
    while (row0 < height) {
      var bits = 0
      var col = 0
      while (col < width) {
        if (grid((rTop + row0) * w + x0 + col)) bits |= 1 << col
        col += 1
      }
      runBits(row0) = bits
      row0 += 1
    }
    var best: Char = 0
    var bestDist = Int.MaxValue
    templates.foreach { case (c, tw, th, tbits) =>
      if (tw == width && th == height) {
        var d = 0
        var row = 0
        while (row < height && d < bestDist) {
          d += java.lang.Integer.bitCount(runBits(row) ^ tbits(row))
          row += 1
        }
        if (d < bestDist) { bestDist = d; best = c }
      }
    }
    if (bestDist <= 1) Some(best) else None
  }

  /** Multi-DPI recognition (the reference's 150/300/600 DPI profiles,
    * `system_config.py:19-33`): scans arrive at unknown integer multiples
    * of the font's native resolution. Each candidate scale k downsamples by
    * taking the top-left sample of every k×k block (exact for
    * block-replicated rasters; a real scanner's area sampling lands within
    * the binarization margin) and runs the recognizer; the best match rate
    * wins, ties to the smallest k (deterministic). Cost ≤ maxScale
    * recognize passes, paid only on the ~2% scanned slice.
    */
  /** A decimated (k > 1) pass may early-exit the search only on a PERFECT
    * read of at least this many glyphs: each extra perfectly-matching
    * glyph is an independent template coincidence, so a decimation fluke
    * clearing 8 is not a realistic event, while a true 2×/3× page of any
    * substance clears it trivially. Shorter true high-DPI pages (down to
    * 2 glyphs, perfect-read) pay the remaining passes and prevail on
    * match rate through the candidate list; a 1-glyph high-DPI page is
    * k=1-only and degrades — a single decimated blob matching a template
    * is exactly the fluke the candidate floors exist to reject.
    */
  val PerfectExitGlyphs = 8

  /** A decimated pass must read at least two-thirds of its glyphs to be a
    * CANDIDATE at all: the "this page is k×-DPI" hypothesis is only
    * credible if the decimated read substantially succeeds. Without the
    * floor, a native-resolution page outside the template universe (an
    * unseen face, photographed text) would lose to any decimation fluke
    * matching a few tiny blobs — nonzero rate beats zero — and return
    * garbage; with it, such pages deterministically fall through to the
    * k=1 read, whose `?`-runs keep line/space structure and report
    * matchRate 0 (the honest low confidence the reference gets from
    * Tesseract and thresholds at 60.0, `domain/constants/__init__.py:12`).
    *
    * Raised 0.5 → 2/3 after sweeping the variant space with adversarial
    * word sets: an out-of-universe page can decimate each glyph into ~2
    * blobs of which HALF fluke-match punctuation (rate ≈ 0.5, glyph count
    * commensurate), so one-half is reachable by chance; two-thirds demands
    * the blobs read substantially better than a coin flip per run. A
    * degraded true-k× page below the floor falls back to the k=1
    * structured `?`-degrade (honest low confidence) instead of a
    * two-thirds-garbled decimated read.
    */
  val DecimatedMinRate = 2.0 / 3

  def recognizeAutoScale(gray: Array[Byte], w: Int, h: Int,
                         maxScale: Int = 3): OcrResult = {
    // descending k, early exit on a perfect decimated pass of ≥
    // PerfectExitGlyphs glyphs: a downsampled try costs 1/k² of the
    // full-resolution one, so a substantial 3×-DPI page is settled by its
    // cheapest pass and never pays the 9×-pixel k=1 recognize; a
    // native-resolution page pays ~(1 + Σ 1/k²) ≈ 1.36× one pass. Ties on
    // (rate, glyphs): prefer the k=1 interpretation — a perfect k=1 read
    // cannot be a decimation artifact (it sees the actual pixels, and
    // higher-DPI glyphs exceed the template width so they can't fake it) —
    // while among decimated candidates the larger k, seen first, stands
    // (replacing it with a smaller-k tie would trade a true 3× read for a
    // k=2 fluke).
    // Decimated candidates are held PROVISIONALLY and only admitted once
    // the k=1 read is known: a true k×-DPI page segments into ~the same
    // glyph runs at k=1 (each giant glyph is still one run — it just
    // matches nothing), so its decimated glyph count is commensurate with
    // the k=1 count; a decimation FLUKE on a native page collapses many
    // glyphs into few blobs. Requiring glyphs×2 ≥ k=1-glyphs kills the
    // fluke class (an out-of-universe page whose ~50 `?`-runs decimate
    // into ~18 quote/dot blobs at ≥0.5 rate) that would otherwise replace
    // the honest structured degrade with garbage. A PERFECT decimated read
    // is additionally admitted at 2 glyphs (a short true high-DPI page —
    // "Hi" at 2× — reads 1.0 with both runs; two simultaneous template
    // coincidences on a commensurate page are not a realistic fluke);
    // 1-glyph pages stay k=1-only, a documented limitation.
    //
    // COST model: decimated passes run the PRIMARY rung only — the
    // contrast-ladder retry is paid at k>1 only when the native read comes
    // back imperfect (the dark-halo high-DPI case: its decimation misreads
    // at the midpoint exactly like its native read does). A clean native
    // page thus keeps the pre-ladder ~(1 + Σ 1/k²) ≈ 1.36× cost.
    def admissible(r: OcrResult): Boolean =
      r.matchRate >= DecimatedMinRate &&
        (r.glyphs >= 3 || (r.glyphs == 2 && r.matchRate == 1.0))
    def decimated(k: Int, lowRung: Boolean): OcrResult = {
      val wk = w / k
      val hk = h / k
      if (wk <= 0 || hk <= 0) OcrResult("", 0, 0, 0.0)
      else {
        // scratch slot: every element of [0, wk*hk) is written below
        // before recognize reads it
        val ds = OcrScratch.local.get.dsBuf(wk * hk)
        var y = 0
        while (y < hk) {
          var x = 0
          while (x < wk) { ds(y * wk + x) = gray(y * k * w + x * k); x += 1 }
          y += 1
        }
        recognizeSingle(ds, wk, hk, lowRung)
      }
    }
    var cands: List[OcrResult] = Nil // prepended: reverse = evaluation order
    var k = maxScale
    while (k >= 2) {
      val r = decimated(k, lowRung = false)
      if (r.matchRate == 1.0 && r.glyphs >= PerfectExitGlyphs) return r
      if (admissible(r)) cands ::= r
      k -= 1
    }
    val r1 = recognize(gray, w, h)
    if (!(r1.glyphs > 0 && r1.matched == r1.glyphs)) {
      // imperfect native read: give DPI detection its low-rung chance
      k = maxScale
      while (k >= 2) {
        val r = decimated(k, lowRung = true)
        if (r.matchRate == 1.0 && r.glyphs >= PerfectExitGlyphs) return r
        if (admissible(r)) cands ::= r
        k -= 1
      }
    }
    var best = r1
    // evaluation order: primary-rung candidates k-descending, then
    // low-rung candidates k-descending; strict-better replacement keeps
    // the earlier (larger-k, primary-rung) candidate on ties, and k=1
    // wins equal (rate, glyphs) because it is the baseline
    cands.reverse.foreach { r =>
      if (r.glyphs * 2 >= r1.glyphs &&
          (r.matchRate > best.matchRate ||
            (r.matchRate == best.matchRate && r.glyphs > best.glyphs)))
        best = r
    }
    best
  }

  /** Rotate a row-major gray raster CLOCKWISE by `quarterTurns` × 90°.
    * Returns (pixels, w, h) — odd turns swap the dimensions. Lossless and
    * block-structure-preserving, so multi-DPI auto-scale stays exact on
    * rotated block-replicated scans. Used for the PDF `/Rotate` page
    * attribute (the viewer rotates the page CW by that many degrees to
    * display it upright — so CW-rotating the stored raster recovers the
    * upright text).
    */
  def rotateCW(gray: Array[Byte], w: Int, h: Int,
               quarterTurns: Int): (Array[Byte], Int, Int) = {
    val t = ((quarterTurns % 4) + 4) % 4
    if (t == 0 || w <= 0 || h <= 0 || gray.length < w * h) return (gray, w, h)
    rotateInto(gray, w, h, t, new Array[Byte](w * h))
  }

  /** [[rotateCW]] writing into the thread's rotation scratch slot — the
    * pipeline variant (one full-page copy per rotated scan otherwise).
    * `gray` must not itself be the rotation slot: it may be the decode
    * slot, a fresh decode array, or caller-owned memory.
    */
  private[graft] def rotateCWScratch(gray: Array[Byte], w: Int, h: Int,
                                     quarterTurns: Int): (Array[Byte], Int, Int) = {
    val t = ((quarterTurns % 4) + 4) % 4
    if (t == 0 || w <= 0 || h <= 0 || gray.length < w * h) return (gray, w, h)
    rotateInto(gray, w, h, t, OcrScratch.local.get.rotateBuf(w * h))
  }

  /** The rotation is a bijection of [0, w*h), so `out` is fully overwritten
    * — safe for reused scratch with no clearing.
    */
  private def rotateInto(gray: Array[Byte], w: Int, h: Int, t: Int,
                         out: Array[Byte]): (Array[Byte], Int, Int) = {
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = gray(y * w + x)
        t match {
          case 1 => out(x * h + (h - 1 - y)) = v           // 90° CW
          case 2 => out((h - 1 - y) * w + (w - 1 - x)) = v // 180°
          case _ => out((w - 1 - x) * h + y) = v           // 270° CW
        }
        x += 1
      }
      y += 1
    }
    if (t == 2) (out, w, h) else (out, h, w)
  }

  /** RGB (3 bytes/px, interleaved) → 8-bit luminance (reference E4's
    * grayscale convert, integer 299/587/114 weights).
    */
  def rgbToGray(rgb: Array[Byte], w: Int, h: Int): Array[Byte] =
    rgbToGrayInto(rgb, w, h, new Array[Byte](w * h))

  /** [[rgbToGray]] into the thread's decode scratch slot (pipeline variant;
    * `rgb` is a fresh stream-decode array, never the decode slot itself).
    */
  private[graft] def rgbToGrayScratch(rgb: Array[Byte], w: Int, h: Int): Array[Byte] =
    rgbToGrayInto(rgb, w, h, OcrScratch.local.get.decodeBuf(w * h))

  private def rgbToGrayInto(rgb: Array[Byte], w: Int, h: Int,
                            out: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < w * h) {
      val lum = ((rgb(3 * i) & 0xFF) * 299 + (rgb(3 * i + 1) & 0xFF) * 587 +
        (rgb(3 * i + 2) & 0xFF) * 114) / 1000
      out(i) = lum.toByte
      i += 1
    }
    out
  }
}
