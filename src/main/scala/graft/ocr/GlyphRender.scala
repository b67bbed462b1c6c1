package graft.ocr

import GlyphFont._

/** Deterministic "scanner" for the synthetic corpus: rasterizes text lines
  * with [[GlyphFont]] at fixed OR proportional pitch (typewriter vs.
  * typeset — the recognizer auto-detects which), applies a vertical shear
  * (the integer-exact stand-in for page skew) and salt-and-pepper specks in
  * the inter-line gaps — the input class the reference feeds through
  * poppler+OpenCV+Tesseract (`ocr_adapters.py:49-76,170-258`). Pure
  * function of its arguments; every byte reproducible.
  */
object GlyphRender {

  val Margin = 4
  /** White background / black ink, 8-bit gray. */
  val Bg: Byte = 0xFF.toByte
  val Ink: Byte = 0x00.toByte

  /** Rendered page: `gray` is row-major w×h. */
  final case class Bitmap(gray: Array[Byte], w: Int, h: Int)

  /** Vertical-shear shift of column x at slope `s` (shared with the
    * recognizer's un-shear — integer-exact inverse).
    */
  @inline def shift(s: Double, x: Int): Int = math.round(s * x).toInt

  /** Block-replicate a bitmap by an integer factor — the 2×/3×-DPI scan
    * variant (the reference's 150/300/600 DPI profiles,
    * `system_config.py:19-33`). Shear and specks are applied at logical
    * resolution first, so the top-left sample of every k×k block recovers
    * the logical page exactly (what [[GlyphOcr.recognizeAutoScale]] relies
    * on).
    */
  def upscale(b: Bitmap, k: Int): Bitmap = {
    if (k <= 1) return b
    val w2 = b.w * k
    val h2 = b.h * k
    val out = new Array[Byte](w2 * h2)
    var y = 0
    while (y < h2) {
      var x = 0
      while (x < w2) {
        out(y * w2 + x) = b.gray((y / k) * b.w + (x / k))
        x += 1
      }
      y += 1
    }
    Bitmap(out, w2, h2)
  }

  /** Proportional-mode metrics: pen advances by the glyph's trimmed width
    * plus `PropGap` blank columns; a space adds `PropSpace` more, so an
    * inter-run ink gap is exactly `PropGap + n·PropSpace` for n spaces and
    * the recognizer recovers n = round((gap − PropGap) / PropSpace).
    */
  val PropGap = 2
  val PropSpace = 4

  /** Pen advance of one line in proportional mode. */
  def propAdvance(line: String, face: GlyphFont.Face = GlyphFont.Base): Int = {
    var adv = 0
    var k = 0
    while (k < line.length) {
      val c = line.charAt(k)
      if (c == ' ') adv += PropSpace
      else {
        val (lo, hi) = face.trim(c)
        if (hi >= lo) adv += (hi - lo + 1) + PropGap
      }
      k += 1
    }
    adv
  }

  def render(lines: Seq[String], skew0: Double = 0.0, noiseSeed: Long = 0L,
             noisePerGap: Int = 0, proportional: Boolean = false,
             face: GlyphFont.Face = GlyphFont.Base, haloGray: Int = 0): Bitmap = {
    // a face as wide as the fixed-pitch cell (bold: 6 columns, zero gap
    // would merge adjacent runs) can only render proportionally; any
    // narrower face (base, alien) works in either layout
    require(face.width < Pitch || proportional,
      s"face ${face.name} (width ${face.width}) requires proportional layout")
    // snap to the recognizer's candidate grid BIT-EXACTLY (the same Double,
    // not just the same value): round(s*x) flips at half-integer products,
    // so a slope differing in the last ulp would shear one pixel row apart
    // from what the deskew search can undo
    val skew =
      if (skew0 == 0.0) 0.0
      else GlyphOcr.SkewCandidates.minBy(c => math.abs(c - skew0))
    val w =
      if (proportional)
        2 * Margin + math.max(Pitch, (lines.map(propAdvance(_, face)) :+ 1).max)
      else {
        val cols = math.max(1, if (lines.isEmpty) 1 else lines.map(_.length).max)
        2 * Margin + cols * Pitch
      }
    val hl = 2 * Margin + math.max(lines.length, 1) * LinePitch
    val maxShift = shift(skew, w - 1)
    val base = math.max(0, -maxShift) // keep sheared y >= 0 for negative slopes
    val h = hl + math.abs(maxShift) + 1
    val gray = Array.fill[Byte](w * h)(Bg)

    @inline def put(x: Int, yLogical: Int): Unit = {
      val y = yLogical + shift(skew, x) + base
      if (x >= 0 && x < w && y >= 0 && y < h) gray(y * w + x) = Ink
    }

    lines.zipWithIndex.foreach { case (line, li) =>
      val top = Margin + li * LinePitch
      if (proportional) {
        // pen-based layout: draw the TRIMMED glyph at the pen (same trimmed
        // shape the recognizer matches), advance by its width + PropGap
        var pen = Margin
        var k = 0
        while (k < line.length) {
          val c = line.charAt(k)
          if (c == ' ') pen += PropSpace
          else {
            val (lo, hi) = face.trim(c)
            if (hi >= lo) {
              var row = 0
              while (row < H) {
                var col = lo
                while (col <= hi) {
                  if (face.ink(c, col, row)) put(pen + col - lo, top + row)
                  col += 1
                }
                row += 1
              }
              pen += (hi - lo + 1) + PropGap
            }
          }
          k += 1
        }
      } else {
        var k = 0
        while (k < line.length) {
          val c = line.charAt(k)
          var row = 0
          while (row < H) {
            var col = 0
            while (col < face.width) {
              if (face.ink(c, col, row)) put(Margin + k * Pitch + col, top + row)
              col += 1
            }
            row += 1
          }
          k += 1
        }
      }
    }

    // antialiasing halo (a scanner's point-spread / a rescaler's edge
    // blend): every background pixel 8-adjacent to glyph ink takes the
    // given gray. Applied BEFORE specks — the halo models optics acting on
    // printed strokes; specks are sensor salt and stay single-pixel (a
    // halo'd 3×3 speck blob would clear the recognizer's 3-row band floor
    // and read as a phantom glyph, which real salt noise does not).
    // Writing only Bg pixels from Ink neighbors cannot cascade.
    if (haloGray > 0) {
      val hb = haloGray.toByte
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          if (gray(y * w + x) == Bg) {
            var found = false
            var dy = math.max(0, y - 1)
            val ey = math.min(h - 1, y + 1)
            while (dy <= ey && !found) {
              var dx = math.max(0, x - 1)
              val ex = math.min(w - 1, x + 1)
              while (dx <= ex && !found) {
                found = gray(dy * w + dx) == Ink
                dx += 1
              }
              dy += 1
            }
            if (found) gray(y * w + x) = hb
          }
          x += 1
        }
        y += 1
      }
    }

    // specks in safe logical rows only (gap middles + outer margin rows):
    // ≥ 2 rows from every glyph band, so the recognizer must reject them by
    // band height, never by luck
    if (noisePerGap > 0) {
      val safeRows = Seq(1, hl - 2) ++ lines.indices.dropRight(1)
        .map(li => Margin + li * LinePitch + H + 1)
      var s = noiseSeed
      safeRows.foreach { row =>
        var j = 0
        while (j < noisePerGap) {
          s = graft.ops.Dedup.splitmix64(s + 0x9E37L * j + row)
          put(java.lang.Long.remainderUnsigned(s, w).toInt, row)
          j += 1
        }
      }
    }
    Bitmap(gray, w, h)
  }

  /** Gray bitmap as interleaved RGB (each channel = the gray value) — the
    * 3-component variant that exercises the recognizer's RGB→luminance
    * conversion (reference E4, `ocr_adapters.py:180-184`).
    */
  def toRgb(b: Bitmap): Array[Byte] = {
    val out = new Array[Byte](b.gray.length * 3)
    var i = 0
    while (i < b.gray.length) {
      out(3 * i) = b.gray(i); out(3 * i + 1) = b.gray(i); out(3 * i + 2) = b.gray(i)
      i += 1
    }
    out
  }
}
