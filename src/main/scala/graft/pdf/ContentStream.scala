package graft.pdf

import scala.collection.mutable.ArrayBuffer

/** PDF content-stream interpreter, text operators only (SURVEY.md E8;
  * PDF 1.7 §9.4). Tracks the text line position through
  * `BT/ET, Tf, TL, Td, TD, Tm, T*, Tj, TJ, ', "` and emits one raw span per
  * show op: `(text, x, y)`. Graphics-state operators are consumed and
  * ignored (no CTM — scope per SURVEY §7.5.1: fixture grammar first).
  * String bytes are decoded at show time: with the current font's
  * [[FontDecode.FontDec]] when one is supplied (CID/Type0 + ToUnicode),
  * Latin-1 otherwise (standard single-byte encodings).
  */
object ContentStream {

  final case class RawSpan(text: String, x: Double, y: Double)

  /** An axis-parallel painted segment (drawn table rule). */
  final case class Rule(x0: Double, y0: Double, x1: Double, y1: Double) {
    def isHorizontal: Boolean = math.abs(y1 - y0) <= math.abs(x1 - x0)
  }

  final case class PageOps(
    spans: Vector[RawSpan],
    sawFontOp: Boolean,
    imageDraws: Int,
    rules: Vector[Rule] = Vector.empty)

  /** Segments within 1pt of axis-parallel count as rules. */
  private val AxisTol = 1.0
  /** Filled rects at most this thick are rules drawn as fills. */
  private val ThinTol = 2.5

  def run(content: Array[Byte],
          fonts: Map[String, FontDecode.FontDec] = Map.empty): PageOps = {
    val spans = new ArrayBuffer[RawSpan]
    val rules = new ArrayBuffer[Rule]
    var sawFont = false
    var images = 0

    // text state
    var lineX = 0.0; var lineY = 0.0      // start of current line
    var leading = 0.0
    var fontSize = 0.0
    var curDec: FontDecode.FontDec = null // null = Latin-1 single-byte path

    val operands = new ArrayBuffer[Operand]

    def num(i: Int): Double = {
      // i-th operand from the END (TJ-style: last operand nearest the op)
      val idx = operands.length - 1 - i
      if (idx >= 0 && idx < operands.length) operands(idx) match {
        case ONum(v) => v
        case _ => 0.0
      } else 0.0
    }

    def nameOperand(i: Int): String = {
      val idx = operands.length - 1 - i
      if (idx >= 0 && idx < operands.length) operands(idx) match {
        case OName(s) => s
        case _ => null
      } else null
    }

    def decode(b: Array[Byte]): String =
      if (curDec != null) curDec.decode(b)
      else new String(b, java.nio.charset.StandardCharsets.ISO_8859_1)

    def newline(): Unit = { lineY -= leading }

    // path state (ruling-line table extraction, E9): straight segments from
    // m/l/h and rects from re accumulate until a PAINTING operator commits
    // them (stroke or fill) or `n` discards them (clip-only path). No CTM —
    // same device-space scope as the text layout.
    val pendSegs = new ArrayBuffer[(Double, Double, Double, Double)]
    val pendRects = new ArrayBuffer[(Double, Double, Double, Double)] // x,y,w,h
    var curX = 0.0; var curY = 0.0; var subX = 0.0; var subY = 0.0

    def commitPaint(): Unit = {
      pendSegs.foreach { case (x0, y0, x1, y1) =>
        // only axis-parallel, non-degenerate segments can be table rules —
        // a close-op on an empty/stale subpath yields a zero-length segment
        val dx = math.abs(x1 - x0); val dy = math.abs(y1 - y0)
        if ((dy <= AxisTol || dx <= AxisTol) && math.max(dx, dy) > 0.5)
          rules += Rule(x0, y0, x1, y1)
      }
      pendRects.foreach { case (x, y, w, h) =>
        if (h <= ThinTol && w > ThinTol) // thin filled bar = horizontal rule
          rules += Rule(x, y + h / 2, x + w, y + h / 2)
        else if (w <= ThinTol && h > ThinTol)
          rules += Rule(x + w / 2, y, x + w / 2, y + h)
        else { // full rect: its four edges are rules (bordered cell/grid)
          rules += Rule(x, y, x + w, y)
          rules += Rule(x, y + h, x + w, y + h)
          rules += Rule(x, y, x, y + h)
          rules += Rule(x + w, y, x + w, y + h)
        }
      }
      pendSegs.clear(); pendRects.clear()
    }

    def showLast(): Unit = operands.lastOption match {
      case Some(OStr(b)) =>
        val s = decode(b)
        if (s.nonEmpty) spans += RawSpan(s, lineX, lineY)
      case _ =>
    }

    val lexer = new Lexer(content)
    var tok = lexer.next()
    while (tok != null) {
      tok match {
        case o: Operand => operands += o
        case OOp(op) =>
          op match {
            case "BT" => lineX = 0.0; lineY = 0.0
            case "ET" =>
            case "Tf" =>
              sawFont = true; fontSize = num(0)
              val fn = nameOperand(1)
              curDec = if (fn != null) fonts.getOrElse(fn, null) else curDec
            case "TL" => leading = num(0)
            case "Td" => lineX += num(1); lineY += num(0)
            case "TD" => leading = -num(0); lineX += num(1); lineY += num(0)
            case "Tm" => lineX = num(1); lineY = num(0) // e, f of [a b c d e f]
            case "T*" => newline()
            case "Tj" => showLast()
            case "'" => newline(); showLast()
            case "\"" => newline(); showLast()
            case "TJ" => operands.lastOption match {
              case Some(OArr(items)) =>
                val sb = new java.lang.StringBuilder
                items.foreach { case OStr(b) => sb.append(decode(b)); case _ => }
                if (sb.length > 0) spans += RawSpan(sb.toString, lineX, lineY)
              case _ =>
            }
            // path construction (PDF 1.7 §8.5.2)
            case "m" => curX = num(1); curY = num(0); subX = curX; subY = curY
            case "l" =>
              val nx = num(1); val ny = num(0)
              pendSegs += ((curX, curY, nx, ny)); curX = nx; curY = ny
            case "h" =>
              pendSegs += ((curX, curY, subX, subY)); curX = subX; curY = subY
            case "re" =>
              pendRects += ((num(3), num(2), num(1), num(0)))
              curX = num(3); curY = num(2); subX = curX; subY = curY
            case "c" | "v" | "y" => curX = num(1); curY = num(0) // curves: not rules
            // path painting (§8.5.3): commit; `n` = clip-only, discard
            case "s" | "b" | "b*" => // close-then-paint variants
              pendSegs += ((curX, curY, subX, subY)); commitPaint()
            case "S" | "f" | "F" | "f*" | "B" | "B*" => commitPaint()
            case "n" => pendSegs.clear(); pendRects.clear()
            case "Do" => images += 1 // XObject draw; counted as potential image
            case "BI" => // inline image: skip params + binary body to EI —
              // raw image bytes must never be tokenized (a stray '(' would
              // otherwise fabricate a text span)
              images += 1
              lexer.skipInlineImage()
            case _ => // ignore any other operator
          }
          operands.clear()
      }
      tok = lexer.next()
    }
    PageOps(spans.toVector, sawFont, images, rules.toVector)
  }

  sealed trait Token
  sealed trait Operand extends Token
  final case class ONum(v: Double) extends Operand
  final case class OStr(bytes: Array[Byte]) extends Operand
  final case class OName(s: String) extends Operand
  final case class OArr(items: Vector[Operand]) extends Operand
  final case class OOp(op: String) extends Token

  /** Content-stream lexer; reuses the object-layer string/number grammar.
    * Package-visible: [[FontDecode.parseToUnicode]] reuses it for the
    * PostScript-ish CMap grammar (hex strings, arrays, bare operators).
    */
  private[pdf] final class Lexer(bytes: Array[Byte]) {
    private var pos = 0
    private val n = bytes.length

    @inline private def isWs(b: Int): Boolean =
      b == ' ' || b == '\t' || b == '\r' || b == '\n' || b == '\f' || b == 0
    @inline private def isDelim(b: Int): Boolean =
      b == '(' || b == ')' || b == '<' || b == '>' || b == '[' || b == ']' ||
      b == '{' || b == '}' || b == '/' || b == '%'

    def next(): Token = {
      // skip whitespace/comments
      var go = true
      while (go && pos < n) {
        val b = bytes(pos) & 0xFF
        if (isWs(b)) pos += 1
        else if (b == '%') { while (pos < n && bytes(pos) != '\n' && bytes(pos) != '\r') pos += 1 }
        else go = false
      }
      if (pos >= n) return null
      (bytes(pos) & 0xFF) match {
        case '(' => OStr(parseLiteral())
        case '<' =>
          if (pos + 1 < n && bytes(pos + 1) == '<') { skipDict(); next() }
          else OStr(parseHex())
        case '[' =>
          pos += 1
          val items = Vector.newBuilder[Operand]
          var t = next()
          var guard = 0
          while (t != null && t != OOp("]") && guard < 100000) {
            t match { case o: Operand => items += o; case _ => }
            t = next(); guard += 1
          }
          OArr(items.result())
        case ']' => pos += 1; OOp("]")
        case '/' =>
          pos += 1
          val s = pos
          while (pos < n && !isWs(bytes(pos) & 0xFF) && !isDelim(bytes(pos) & 0xFF)) pos += 1
          OName(new String(bytes, s, pos - s, java.nio.charset.StandardCharsets.ISO_8859_1))
        case c if c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9') =>
          val s = pos
          pos += 1
          while (pos < n && ((bytes(pos) >= '0' && bytes(pos) <= '9') || bytes(pos) == '.' ||
                 bytes(pos) == '-' || bytes(pos) == '+')) pos += 1
          val str = new String(bytes, s, pos - s, java.nio.charset.StandardCharsets.US_ASCII)
          ONum(try str.toDouble catch { case _: NumberFormatException => 0.0 })
        case _ =>
          val s = pos
          while (pos < n && !isWs(bytes(pos) & 0xFF) && !isDelim(bytes(pos) & 0xFF)) pos += 1
          if (pos == s) { pos += 1; next() }
          else OOp(new String(bytes, s, pos - s, java.nio.charset.StandardCharsets.US_ASCII))
      }
    }

    private def parseLiteral(): Array[Byte] = {
      val p = new PdfObjects.Parser(bytes, pos)
      val r = p.parseLiteralString()
      pos = p.pos
      r.bytes
    }

    private def parseHex(): Array[Byte] = {
      val p = new PdfObjects.Parser(bytes, pos)
      val r = p.parseHexString()
      pos = p.pos
      r.bytes
    }

    private def skipDict(): Unit = {
      val p = new PdfObjects.Parser(bytes, pos)
      p.parseDict()
      pos = p.pos
    }

    /** After a BI operator: skip the parameter dict to `ID`, then the raw
      * binary body to a whitespace-preceded `EI` token (PDF 1.7 §8.9.7).
      */
    def skipInlineImage(): Unit = {
      // params end at the ID operator
      while (pos + 1 < n && !(bytes(pos) == 'I' && bytes(pos + 1) == 'D' &&
             (pos + 2 >= n || isWs(bytes(pos + 2) & 0xFF)))) pos += 1
      if (pos + 1 < n) pos += 2
      if (pos < n && isWs(bytes(pos) & 0xFF)) pos += 1 // single ws before data
      // binary body ends at ws-delimited EI
      while (pos + 1 < n && !(bytes(pos) == 'E' && bytes(pos + 1) == 'I' &&
             (pos == 0 || isWs(bytes(pos - 1) & 0xFF)) &&
             (pos + 2 >= n || isWs(bytes(pos + 2) & 0xFF) || isDelim(bytes(pos + 2) & 0xFF)))) {
        pos += 1
      }
      pos = if (pos + 1 < n) pos + 2 else n
    }
  }
}
