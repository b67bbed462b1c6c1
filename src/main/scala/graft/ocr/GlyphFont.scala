package graft.ocr

/** 5×7 monochrome glyph set for the OCR path (A-Z, a-z, 0-9 and basic
  * punctuation; space renders empty). This is the pipeline's OWN font —
  * both the synthetic "scanned" page renderer and the recognizer's
  * templates derive from these bitmaps, the same way the reference's
  * Tesseract ships its trained glyph models (`ocr_adapters.py:49-76`).
  * Each glyph is 7 rows of 5 bits (bit 4 = leftmost column).
  *
  * Vertical convention (what makes mixed case work): ascender glyphs span
  * cell rows 0-6, x-height lowercase rows 2-6, dotted i/j rows 1-6,
  * punctuation its natural rows. The recognizer trims templates in BOTH
  * dimensions and matches within the (trimmed-width, trimmed-height)
  * class; OcrSpec gates that every same-class pair is ≥ 3 hamming apart
  * (so hamming-≤1 acceptance stays sound) and that every glyph's leftmost
  * inked column is ≤ 2 (so pitch-based space inference never mis-rounds).
  */
object GlyphFont {

  val W = 5
  val H = 7
  /** fixed-pitch cell: glyph columns + 1 gap column */
  val Pitch = 6
  /** line pitch: glyph rows + 3 gap rows */
  val LinePitch = 10

  val Chars: String =
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789abcdefghijklmnopqrstuvwxyz" +
      ".,-:;!?'\"()"

  private val rows: Map[Char, Array[Int]] = Map(
    'A' -> Array(0x0E, 0x11, 0x11, 0x1F, 0x11, 0x11, 0x11),
    'B' -> Array(0x1E, 0x11, 0x11, 0x1E, 0x11, 0x11, 0x1E),
    'C' -> Array(0x0F, 0x10, 0x10, 0x10, 0x10, 0x10, 0x0F),
    'D' -> Array(0x1C, 0x12, 0x11, 0x11, 0x11, 0x12, 0x1C),
    'E' -> Array(0x1F, 0x10, 0x10, 0x1E, 0x10, 0x10, 0x1F),
    'F' -> Array(0x1F, 0x10, 0x10, 0x1E, 0x10, 0x10, 0x10),
    'G' -> Array(0x0E, 0x11, 0x10, 0x17, 0x11, 0x11, 0x0F),
    'H' -> Array(0x11, 0x11, 0x11, 0x1F, 0x11, 0x11, 0x11),
    'I' -> Array(0x0E, 0x04, 0x04, 0x04, 0x04, 0x04, 0x0E),
    'J' -> Array(0x07, 0x02, 0x02, 0x02, 0x02, 0x12, 0x0C),
    'K' -> Array(0x11, 0x12, 0x14, 0x18, 0x14, 0x12, 0x11),
    'L' -> Array(0x10, 0x10, 0x10, 0x10, 0x10, 0x10, 0x1F),
    'M' -> Array(0x11, 0x1B, 0x15, 0x15, 0x11, 0x11, 0x11),
    'N' -> Array(0x11, 0x19, 0x15, 0x13, 0x11, 0x11, 0x11),
    'O' -> Array(0x0E, 0x11, 0x11, 0x11, 0x11, 0x11, 0x0E),
    'P' -> Array(0x1E, 0x11, 0x11, 0x1E, 0x10, 0x10, 0x10),
    'Q' -> Array(0x0E, 0x11, 0x11, 0x11, 0x15, 0x12, 0x0D),
    'R' -> Array(0x1E, 0x11, 0x11, 0x1E, 0x14, 0x12, 0x11),
    'S' -> Array(0x0F, 0x10, 0x10, 0x0E, 0x01, 0x01, 0x1E),
    'T' -> Array(0x1F, 0x04, 0x04, 0x04, 0x04, 0x04, 0x04),
    'U' -> Array(0x11, 0x11, 0x11, 0x11, 0x11, 0x11, 0x0E),
    'V' -> Array(0x11, 0x11, 0x11, 0x11, 0x11, 0x0A, 0x04),
    'W' -> Array(0x11, 0x11, 0x11, 0x15, 0x15, 0x1B, 0x11),
    'X' -> Array(0x11, 0x11, 0x0A, 0x04, 0x0A, 0x11, 0x11),
    'Y' -> Array(0x11, 0x11, 0x0A, 0x04, 0x04, 0x04, 0x04),
    'Z' -> Array(0x1F, 0x01, 0x02, 0x04, 0x08, 0x10, 0x1F),
    '0' -> Array(0x0E, 0x11, 0x13, 0x15, 0x19, 0x11, 0x0E),
    '1' -> Array(0x04, 0x0C, 0x04, 0x04, 0x04, 0x04, 0x0E),
    '2' -> Array(0x0E, 0x11, 0x01, 0x06, 0x08, 0x10, 0x1F),
    '3' -> Array(0x0E, 0x11, 0x01, 0x06, 0x01, 0x11, 0x0E),
    '4' -> Array(0x02, 0x06, 0x0A, 0x12, 0x1F, 0x02, 0x02),
    '5' -> Array(0x1F, 0x10, 0x1E, 0x01, 0x01, 0x11, 0x0E),
    '6' -> Array(0x06, 0x08, 0x10, 0x1E, 0x11, 0x11, 0x0E),
    '7' -> Array(0x1F, 0x01, 0x02, 0x04, 0x08, 0x08, 0x08),
    '8' -> Array(0x0E, 0x11, 0x11, 0x0E, 0x11, 0x11, 0x0E),
    '9' -> Array(0x0E, 0x11, 0x11, 0x0F, 0x01, 0x02, 0x0C),
    // x-height lowercase (rows 2-6)
    'a' -> Array(0x00, 0x00, 0x0E, 0x01, 0x0F, 0x11, 0x0F),
    'c' -> Array(0x00, 0x00, 0x0E, 0x10, 0x10, 0x10, 0x0E),
    'e' -> Array(0x00, 0x00, 0x0E, 0x11, 0x1F, 0x10, 0x0E),
    'g' -> Array(0x00, 0x00, 0x0F, 0x11, 0x0F, 0x01, 0x0E),
    'm' -> Array(0x00, 0x00, 0x1A, 0x15, 0x15, 0x15, 0x15),
    'n' -> Array(0x00, 0x00, 0x1E, 0x11, 0x11, 0x11, 0x11),
    'o' -> Array(0x00, 0x00, 0x0E, 0x11, 0x11, 0x11, 0x0E),
    'p' -> Array(0x00, 0x00, 0x1E, 0x11, 0x1E, 0x10, 0x10),
    'q' -> Array(0x00, 0x00, 0x0F, 0x11, 0x0F, 0x01, 0x01),
    'r' -> Array(0x00, 0x00, 0x16, 0x19, 0x10, 0x10, 0x10),
    's' -> Array(0x00, 0x00, 0x0F, 0x10, 0x0E, 0x01, 0x1E),
    'u' -> Array(0x00, 0x00, 0x11, 0x11, 0x11, 0x13, 0x0D),
    'v' -> Array(0x00, 0x00, 0x11, 0x11, 0x11, 0x0A, 0x04),
    'w' -> Array(0x00, 0x00, 0x11, 0x11, 0x15, 0x15, 0x0A),
    'x' -> Array(0x00, 0x00, 0x11, 0x0A, 0x04, 0x0A, 0x11),
    'y' -> Array(0x00, 0x00, 0x11, 0x11, 0x0F, 0x01, 0x0E),
    'z' -> Array(0x00, 0x00, 0x1F, 0x02, 0x04, 0x08, 0x1F),
    // ascender lowercase (rows 0-6)
    'b' -> Array(0x10, 0x10, 0x1E, 0x11, 0x11, 0x11, 0x1E),
    'd' -> Array(0x01, 0x01, 0x0F, 0x11, 0x11, 0x11, 0x0F),
    'f' -> Array(0x06, 0x09, 0x08, 0x1E, 0x08, 0x08, 0x08),
    'h' -> Array(0x10, 0x10, 0x1E, 0x11, 0x11, 0x11, 0x11),
    'k' -> Array(0x10, 0x10, 0x11, 0x12, 0x1C, 0x12, 0x11),
    'l' -> Array(0x0C, 0x04, 0x04, 0x04, 0x04, 0x04, 0x03),
    't' -> Array(0x08, 0x08, 0x1E, 0x08, 0x08, 0x09, 0x06),
    // dotted (rows 1-6, dot fused to the stem so a solo-i line still forms
    // one ≥3-row band — an isolated dot row would be rejected as a speck)
    'i' -> Array(0x00, 0x04, 0x0C, 0x04, 0x04, 0x04, 0x0E),
    'j' -> Array(0x00, 0x02, 0x06, 0x02, 0x02, 0x12, 0x0C),
    // punctuation (natural rows; distinct (w,h) classes where shapes rhyme)
    '.' -> Array(0x00, 0x00, 0x00, 0x00, 0x00, 0x18, 0x18),
    ',' -> Array(0x00, 0x00, 0x00, 0x00, 0x0C, 0x0C, 0x08),
    '-' -> Array(0x00, 0x00, 0x00, 0x00, 0x1E, 0x00, 0x00),
    ':' -> Array(0x00, 0x00, 0x18, 0x18, 0x00, 0x18, 0x18),
    ';' -> Array(0x00, 0x00, 0x0C, 0x0C, 0x00, 0x0C, 0x18),
    '!' -> Array(0x04, 0x04, 0x04, 0x04, 0x04, 0x00, 0x04),
    '?' -> Array(0x0E, 0x11, 0x01, 0x02, 0x04, 0x00, 0x04),
    '\'' -> Array(0x04, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00),
    // '"' needs its ticks column-connected (an empty middle column would
    // split the glyph into two runs that each read as an apostrophe)
    '"' -> Array(0x0E, 0x0A, 0x00, 0x00, 0x00, 0x00, 0x00),
    '(' -> Array(0x02, 0x04, 0x08, 0x08, 0x08, 0x04, 0x02),
    ')' -> Array(0x08, 0x04, 0x02, 0x02, 0x02, 0x04, 0x08))

  /** Is `c` a renderable glyph of this font? Space is NOT a glyph and
    * returns false — the renderer advances an empty cell for it, so filter
    * per word (after splitting on whitespace), never a whole line, or the
    * spaces vanish.
    */
  def supported(c: Char): Boolean = rows.contains(c)

  /** (top, bottom) inked rows of glyph `c` — the [[Base]] face's. */
  def rowTrim(c: Char): (Int, Int) = Base.rowTrim(c)

  /** Ink at (col, row) of glyph `c`? Unknown chars render empty. The
    * [[Base]] face's — one implementation of glyph geometry per face.
    */
  def ink(c: Char, col: Int, row: Int): Boolean = Base.ink(c, col, row)

  /** Glyph as a 35-bit mask (row-major, bit 0 = (0,0)). */
  def mask(c: Char): Long = {
    var m = 0L
    var row = 0
    while (row < H) {
      var col = 0
      while (col < W) {
        if (ink(c, col, row)) m |= 1L << (row * W + col)
        col += 1
      }
      row += 1
    }
    m
  }

  /** (leftmost, rightmost) inked columns of glyph `c` — the [[Base]]
    * face's.
    */
  def trim(c: Char): (Int, Int) = Base.trim(c)

  /** One typeface: per-char H-row bitmaps over `width` columns (leftmost
    * column = bit `width-1`). [[Base]] is the hand-drawn 5-column set
    * above; [[Bold]] derives from it by horizontal dilation (ink at col c ∪
    * c−1, over 6 columns) with one hand-tuned override — bold 'M' reopens
    * its center counter at (row 1, col 2), because plain dilation leaves
    * bold M/N only 2 bits apart and hamming-≤1 acceptance needs every
    * same-(w,h)-class pair ≥ 3 apart (OcrSpec gates the property for every
    * face). The recognizer carries a template set per face and picks the
    * face that reads a page best — the multi-font shape of Tesseract's
    * trained models (`ocr_adapters.py:49-76`), with faces as pure data.
    */
  final case class Face(name: String, width: Int, glyphs: Map[Char, Array[Int]]) {
    @inline def ink(c: Char, col: Int, row: Int): Boolean =
      col >= 0 && col < width && row >= 0 && row < H &&
        glyphs.get(c).exists(r => ((r(row) >> (width - 1 - col)) & 1) == 1)

    /** (leftmost, rightmost) inked columns of glyph `c` (trim box). */
    def trim(c: Char): (Int, Int) = {
      var lo = width; var hi = -1
      var col = 0
      while (col < width) {
        var row = 0
        var any = false
        while (row < H && !any) { any = ink(c, col, row); row += 1 }
        if (any) { if (col < lo) lo = col; hi = col }
        col += 1
      }
      (lo, hi)
    }

    /** (top, bottom) inked rows of glyph `c` (vertical trim box). */
    def rowTrim(c: Char): (Int, Int) = {
      var lo = H; var hi = -1
      var row = 0
      while (row < H) {
        if (glyphs.get(c).exists(_(row) != 0)) { if (row < lo) lo = row; hi = row }
        row += 1
      }
      (lo, hi)
    }
  }

  val Base: Face = Face("base", W, rows)

  val Bold: Face = {
    val derived = rows.map { case (c, rs) =>
      c -> Array.tabulate(H) { row =>
        @inline def at(cc: Int) =
          cc >= 0 && cc < W && ((rs(row) >> (W - 1 - cc)) & 1) == 1
        var v = 0
        var col = 0
        while (col < 6) {
          if (at(col) || at(col - 1)) v |= 1 << (5 - col)
          col += 1
        }
        v
      }
    }
    derived('M')(1) &= ~(1 << 3) // reopen M's counter: row 1, col 2 of 6
    Face("bold", 6, derived)
  }

  /** Faces the recognizer knows. Order matters: ties go to the earliest. */
  val Faces: Vector[Face] = Vector(Base, Bold)

  /** An OUT-OF-UNIVERSE face the recognizer does NOT know (deliberately
    * absent from [[Faces]]): Base with every cell row XOR'd against a
    * checkerboard — an adversarially jittered rendering maximally far from
    * the known template sets. Purpose: measure the open-world degrade. The
    * reference's Tesseract reports honest low confidence on faces outside
    * its trained models and the 60.0 threshold consumes it
    * (`domain/constants/__init__.py:12`, `system_config.py:21-31`); this
    * engine's analogue is a scanned page whose every glyph reads `?` with
    * matchRate 0 → confidence 0. That degrade is SPEC-PREDICTABLE (the
    * corpus golden encodes it) because OcrSpec gates, for every alien
    * glyph: one contiguous column run, leftmost ink column ≤ 2, ≥ 3 inked
    * rows for letters/digits, and hamming ≥ 3 from every known template of
    * the same trimmed (w, h) class — so segmentation and spacing stay
    * exact while every match fails with margin.
    */
  val Alien: Face = {
    val cb = Array(0x15, 0x0A, 0x15, 0x0A, 0x15, 0x0A, 0x15)
    Face("alien", W, rows.map { case (c, rs) =>
      c -> Array.tabulate(H)(r => rs(r) ^ cb(r))
    })
  }
}
