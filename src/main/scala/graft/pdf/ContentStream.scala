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
  *
  * Allocation discipline (this is the per-page extraction hot loop, and
  * the 4→16-core scaling residual is allocation bandwidth — BENCH/
  * BASELINE.md): the interpreter runs on the lexer's allocation-free
  * `nextKind()` protocol — no token case objects, no operator strings, a
  * primitive operand stack — so the only per-page allocations left are the
  * string payloads themselves (parsed bytes, decoded spans) and the
  * output buffers. The [[Token]] ADT and `next()` remain as a thin wrapper
  * for the cold CMap-parse path ([[FontDecode.parseToUnicode]], amortized
  * by the font cache).
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

  // packed operator codes: byte0 | byte1<<8 | length<<16 (all PDF operators
  // this interpreter dispatches on are 1-2 bytes; longer ones are unknown
  // and ignored, so the packing is collision-free)
  @inline private def oc(s: String): Int =
    if (s.length == 1) s.charAt(0) | (1 << 16)
    else s.charAt(0) | (s.charAt(1) << 8) | (2 << 16)
  private final val OpBT = oc("BT"); private final val OpET = oc("ET")
  private final val OpTf = oc("Tf"); private final val OpTL = oc("TL")
  private final val OpTd = oc("Td"); private final val OpTD = oc("TD")
  private final val OpTm = oc("Tm"); private final val OpTs = oc("T*")
  private final val OpTj = oc("Tj"); private final val OpTJ = oc("TJ")
  private final val OpQuote = oc("'"); private final val OpDQuote = oc("\"")
  private final val Opm = oc("m"); private final val Opl = oc("l")
  private final val Oph = oc("h"); private final val Opre = oc("re")
  private final val Opc = oc("c"); private final val Opv = oc("v")
  private final val Opy = oc("y")
  private final val Ops = oc("s"); private final val Opb = oc("b")
  private final val OpbS = oc("b*")
  private final val OpS = oc("S"); private final val Opf = oc("f")
  private final val OpF = oc("F"); private final val OpfS = oc("f*")
  private final val OpB = oc("B"); private final val OpBS = oc("B*")
  private final val Opn = oc("n")
  private final val OpDo = oc("Do"); private final val OpBI = oc("BI")

  // operand kinds on the primitive stack
  private final val KdNum = 0; private final val KdStr = 1
  private final val KdName = 2; private final val KdArr = 3

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

    // operand stack: parallel primitive arrays, cleared per operator
    var opdKind = new Array[Byte](16)
    var opdNum = new Array[Double](16)
    var opdRef = new Array[AnyRef](16)
    var opdLen = 0
    @inline def push(k: Int, d: Double, r: AnyRef): Unit = {
      if (opdLen == opdKind.length) {
        opdKind = java.util.Arrays.copyOf(opdKind, opdLen * 2)
        opdNum = java.util.Arrays.copyOf(opdNum, opdLen * 2)
        opdRef = java.util.Arrays.copyOf(opdRef, opdLen * 2)
      }
      opdKind(opdLen) = k.toByte; opdNum(opdLen) = d; opdRef(opdLen) = r
      opdLen += 1
    }

    def num(i: Int): Double = {
      // i-th operand from the END (TJ-style: last operand nearest the op)
      val idx = opdLen - 1 - i
      if (idx >= 0 && opdKind(idx) == KdNum) opdNum(idx) else 0.0
    }

    def nameOperand(i: Int): String = {
      val idx = opdLen - 1 - i
      if (idx >= 0 && opdKind(idx) == KdName) opdRef(idx).asInstanceOf[String]
      else null
    }

    def decode(b: Array[Byte]): String =
      if (curDec != null) curDec.decode(b)
      else new String(b, java.nio.charset.StandardCharsets.ISO_8859_1)

    def newline(): Unit = { lineY -= leading }

    // most-recent array operand's shown text, decoded eagerly at parse time
    // (equivalent to TJ-time decode: any operator between `]` and `TJ`
    // clears the operand stack, so the font cannot change in between)
    val arrStr = new java.lang.StringBuilder

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

    def showLast(): Unit =
      if (opdLen > 0 && opdKind(opdLen - 1) == KdStr) {
        val s = decode(opdRef(opdLen - 1).asInstanceOf[Array[Byte]])
        if (s.nonEmpty) spans += RawSpan(s, lineX, lineY)
      }

    val lexer = new Lexer(content)
    var kind = lexer.nextKind()
    while (kind != Lexer.KEof) {
      kind match {
        case Lexer.KNum => push(KdNum, lexer.numVal, null)
        case Lexer.KStr => push(KdStr, 0.0, lexer.strVal)
        case Lexer.KName => push(KdName, 0.0, lexer.nameVal)
        case Lexer.KArrOpen =>
          // consume the whole array as ONE operand; only its top-level
          // string items matter (TJ show text), decoded as they stream by
          arrStr.setLength(0)
          var depth = 1
          var guard = 0
          var k = lexer.nextKind()
          while (k != Lexer.KEof && depth > 0 && guard < 100000) {
            k match {
              case Lexer.KArrOpen => depth += 1
              case Lexer.KArrClose => depth -= 1
              case Lexer.KStr if depth == 1 => arrStr.append(decode(lexer.strVal))
              case _ => // numbers/names/ops inside arrays are discarded
            }
            guard += 1
            if (depth > 0) k = lexer.nextKind()
          }
          push(KdArr, 0.0, null)
        case Lexer.KArrClose =>
          // stray `]`: the pre-split lexer surfaced it as an unknown
          // operator — consume and clear, never dispatch (opCode is stale)
          opdLen = 0
        case _ => // KOp: dispatch, then clear operands
          lexer.opCode match {
            case OpBT => lineX = 0.0; lineY = 0.0
            case OpET =>
            case OpTf =>
              sawFont = true; fontSize = num(0)
              val fn = nameOperand(1)
              curDec = if (fn != null) fonts.getOrElse(fn, null) else curDec
            case OpTL => leading = num(0)
            case OpTd => lineX += num(1); lineY += num(0)
            case OpTD => leading = -num(0); lineX += num(1); lineY += num(0)
            case OpTm => lineX = num(1); lineY = num(0) // e, f of [a b c d e f]
            case OpTs => newline()
            case OpTj => showLast()
            case OpQuote => newline(); showLast()
            case OpDQuote => newline(); showLast()
            case OpTJ =>
              if (opdLen > 0 && opdKind(opdLen - 1) == KdArr && arrStr.length > 0)
                spans += RawSpan(arrStr.toString, lineX, lineY)
            // path construction (PDF 1.7 §8.5.2)
            case Opm => curX = num(1); curY = num(0); subX = curX; subY = curY
            case Opl =>
              val nx = num(1); val ny = num(0)
              pendSegs += ((curX, curY, nx, ny)); curX = nx; curY = ny
            case Oph =>
              pendSegs += ((curX, curY, subX, subY)); curX = subX; curY = subY
            case Opre =>
              pendRects += ((num(3), num(2), num(1), num(0)))
              curX = num(3); curY = num(2); subX = curX; subY = curY
            case Opc | Opv | Opy => curX = num(1); curY = num(0) // curves: not rules
            // path painting (§8.5.3): commit; `n` = clip-only, discard
            case Ops | Opb | OpbS => // close-then-paint variants
              pendSegs += ((curX, curY, subX, subY)); commitPaint()
            case OpS | Opf | OpF | OpfS | OpB | OpBS => commitPaint()
            case Opn => pendSegs.clear(); pendRects.clear()
            case OpDo => images += 1 // XObject draw; counted as potential image
            case OpBI => // inline image: skip params + binary body to EI —
              // raw image bytes must never be tokenized (a stray '(' would
              // otherwise fabricate a text span)
              images += 1
              lexer.skipInlineImage()
            case _ => // ignore any other operator
          }
          opdLen = 0
      }
      kind = lexer.nextKind()
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

  private[pdf] object Lexer {
    /** 10^k exactly representable for k ≤ 15 (needed by the exact parse). */
    final val Pow10: Array[Double] = Array.tabulate(16)(k => math.pow(10, k))
    final val KEof = 0
    final val KNum = 1
    final val KStr = 2
    final val KName = 3
    final val KOp = 4
    final val KArrOpen = 5
    final val KArrClose = 6
  }

  /** Content-stream lexer; reuses the object-layer string/number grammar.
    * Package-visible: [[FontDecode.parseToUnicode]] reuses it for the
    * PostScript-ish CMap grammar (hex strings, arrays, bare operators) via
    * the allocating `next(): Token` wrapper; the hot interpreter loop uses
    * `nextKind()` which allocates only string payloads, never tokens:
    * after it returns, the matching field (`numVal`/`strVal`/`nameVal`/
    * `opCode`) holds the value.
    */
  private[pdf] final class Lexer(bytes: Array[Byte]) {
    private var pos = 0
    private val n = bytes.length
    // reusable object-grammar parser (strings, dicts) — one per lexer, not
    // one per string token
    private val sub = new PdfObjects.Parser(bytes, 0)

    var numVal: Double = 0.0
    var strVal: Array[Byte] = null
    var nameVal: String = null
    /** Packed operator code (byte0 | byte1<<8 | len<<16); -1 when the
      * operator is longer than 2 bytes (never one this interpreter knows).
      * The raw bytes stay addressable via `opStart`/`opLen` for the
      * Token-mode wrapper.
      */
    var opCode: Int = 0
    private var opStart = 0
    private var opLen = 0

    @inline private def isWs(b: Int): Boolean =
      b == ' ' || b == '\t' || b == '\r' || b == '\n' || b == '\f' || b == 0
    @inline private def isDelim(b: Int): Boolean =
      b == '(' || b == ')' || b == '<' || b == '>' || b == '[' || b == ']' ||
      b == '{' || b == '}' || b == '/' || b == '%'

    def nextKind(): Int = {
      // skip whitespace/comments
      var go = true
      while (go && pos < n) {
        val b = bytes(pos) & 0xFF
        if (isWs(b)) pos += 1
        else if (b == '%') { while (pos < n && bytes(pos) != '\n' && bytes(pos) != '\r') pos += 1 }
        else go = false
      }
      if (pos >= n) return Lexer.KEof
      (bytes(pos) & 0xFF) match {
        case '(' =>
          sub.pos = pos
          strVal = sub.parseLiteralString().bytes
          pos = sub.pos
          Lexer.KStr
        case '<' =>
          if (pos + 1 < n && bytes(pos + 1) == '<') {
            sub.pos = pos
            sub.parseDict()
            pos = sub.pos
            nextKind()
          } else {
            sub.pos = pos
            strVal = sub.parseHexString().bytes
            pos = sub.pos
            Lexer.KStr
          }
        case '[' => pos += 1; Lexer.KArrOpen
        case ']' => pos += 1; Lexer.KArrClose
        case '/' =>
          pos += 1
          val s = pos
          while (pos < n && !isWs(bytes(pos) & 0xFF) && !isDelim(bytes(pos) & 0xFF)) pos += 1
          nameVal = new String(bytes, s, pos - s, java.nio.charset.StandardCharsets.ISO_8859_1)
          Lexer.KName
        case c if c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9') =>
          val s = pos
          pos += 1
          while (pos < n && ((bytes(pos) >= '0' && bytes(pos) <= '9') || bytes(pos) == '.' ||
                 bytes(pos) == '-' || bytes(pos) == '+')) pos += 1
          numVal = parseNum(s, pos)
          Lexer.KNum
        case _ =>
          val s = pos
          while (pos < n && !isWs(bytes(pos) & 0xFF) && !isDelim(bytes(pos) & 0xFF)) pos += 1
          if (pos == s) { pos += 1; nextKind() }
          else {
            opStart = s
            opLen = pos - s
            opCode =
              if (opLen == 1) (bytes(s) & 0xFF) | (1 << 16)
              else if (opLen == 2) (bytes(s) & 0xFF) | ((bytes(s + 1) & 0xFF) << 8) | (2 << 16)
              else -1
            Lexer.KOp
          }
      }
    }

    /** Exact allocation-free decimal parse over bytes [s, e): optional
      * sign, digits, at most one dot. `mant / 10^k` with both operands
      * exactly representable (≤ 15 digits) is one correctly-rounded
      * division, so it equals `Double.parseDouble` bit-for-bit on this
      * grammar. Anything irregular — a second dot, an embedded sign, > 15
      * digits — falls back to the allocating String path, preserving the
      * old NumberFormatException → 0.0 behavior exactly.
      */
    private def parseNum(s: Int, e: Int): Double = {
      var i = s
      var neg = false
      if (i < e && (bytes(i) == '+' || bytes(i) == '-')) {
        neg = bytes(i) == '-'; i += 1
      }
      var mant = 0L
      var digits = 0
      var frac = -1
      var ok = true
      while (ok && i < e) {
        val b = bytes(i)
        if (b >= '0' && b <= '9') {
          mant = mant * 10 + (b - '0'); digits += 1
          if (frac >= 0) frac += 1
          if (digits > 15) ok = false
        } else if (b == '.' && frac < 0) frac = 0
        else ok = false
        i += 1
      }
      if (ok) {
        if (digits == 0) 0.0 // ".", "-", "+" — toDouble would throw → 0.0
        else {
          val v = if (frac > 0) mant / Lexer.Pow10(frac) else mant.toDouble
          if (neg) -v else v
        }
      } else {
        val str = new String(bytes, s, e - s, java.nio.charset.StandardCharsets.US_ASCII)
        try str.toDouble catch { case _: NumberFormatException => 0.0 }
      }
    }

    /** Allocating Token view over `nextKind()` — the cold-path protocol
      * (CMap parsing). Arrays materialize as [[OArr]]; a stray `]` surfaces
      * as `OOp("]")`, exactly as the pre-split lexer did.
      */
    def next(): Token = nextKind() match {
      case Lexer.KEof => null
      case Lexer.KNum => ONum(numVal)
      case Lexer.KStr => OStr(strVal)
      case Lexer.KName => OName(nameVal)
      case Lexer.KArrClose => OOp("]")
      case Lexer.KArrOpen =>
        val items = Vector.newBuilder[Operand]
        var t = next()
        var guard = 0
        while (t != null && t != OOp("]") && guard < 100000) {
          t match { case o: Operand => items += o; case _ => }
          t = next(); guard += 1
        }
        OArr(items.result())
      case _ =>
        OOp(new String(bytes, opStart, opLen, java.nio.charset.StandardCharsets.US_ASCII))
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
