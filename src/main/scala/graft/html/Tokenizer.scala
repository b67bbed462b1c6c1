package graft.html

import scala.collection.mutable.ArrayBuffer

/** Streaming HTML tokenizer (SURVEY.md E10, first stage).
  *
  * A single-pass state machine over the charset-decoded character stream,
  * WHATWG-tokenizer-shaped but scoped to what block extraction needs:
  * data / tag-open / end-tag / attributes / comment / doctype-bogus /
  * rawtext (script, style, textarea, title — content swallowed until the
  * matching case-insensitive `</name`). Never throws on any input string
  * (property-tested); unparseable markup degrades to text.
  *
  * Offsets: every token carries `pos` (start) and `end` (exclusive) char
  * offsets into the decoded source — these feed the span column
  * (FIXTURES.md §2: char offsets into the decoded source).
  */
object Tokenizer {

  sealed trait Tok { def pos: Int; def end: Int }
  final case class TStart(name: String, attrs: List[(String, String)],
                          selfClosing: Boolean, pos: Int, end: Int) extends Tok
  final case class TEnd(name: String, pos: Int, end: Int) extends Tok
  /** Raw text run — entities NOT yet decoded (normalization decodes later). */
  final case class TText(raw: String, pos: Int, end: Int) extends Tok
  final case class TComment(pos: Int, end: Int) extends Tok
  final case class TDoctype(pos: Int, end: Int) extends Tok

  /** Elements whose content is raw text (no markup inside). */
  val RawText: Set[String] = Set("script", "style", "textarea", "title", "xmp", "noscript")

  def tokenize(s: String): ArrayBuffer[Tok] = {
    val out = new ArrayBuffer[Tok](64)
    val n = s.length
    var i = 0
    var textStart = 0

    def flushText(upto: Int): Unit =
      if (upto > textStart) out += TText(s.substring(textStart, upto), textStart, upto)

    while (i < n) {
      val c = s.charAt(i)
      if (c == '<' && i + 1 < n) {
        val c1 = s.charAt(i + 1)
        if (c1 == '!') {
          if (s.startsWith("<!--", i)) { // comment
            flushText(i)
            val close = s.indexOf("-->", i + 4)
            val end = if (close < 0) n else close + 3
            out += TComment(i, end); i = end; textStart = i
          } else { // doctype / bogus markup declaration
            flushText(i)
            val close = s.indexOf('>', i + 2)
            val end = if (close < 0) n else close + 1
            out += TDoctype(i, end); i = end; textStart = i
          }
        } else if (c1 == '/') {
          if (i + 2 < n && isNameStart(s.charAt(i + 2))) {
            flushText(i)
            var j = i + 2
            while (j < n && isNameChar(s.charAt(j))) j += 1
            val name = lower(s.substring(i + 2, j))
            val close = s.indexOf('>', j)
            val end = if (close < 0) n else close + 1
            out += TEnd(name, i, end); i = end; textStart = i
          } else i += 1 // "</3" etc → text
        } else if (isNameStart(c1)) {
          flushText(i)
          val (tok, next) = parseStartTag(s, i)
          out += tok
          i = next; textStart = i
          // rawtext swallow
          if (!tok.selfClosing && RawText.contains(tok.name)) {
            val closeAt = indexOfCi(s, "</" + tok.name, i)
            val contentEnd = if (closeAt < 0) n else closeAt
            if (contentEnd > i) out += TText(s.substring(i, contentEnd), i, contentEnd)
            if (closeAt < 0) { i = n; textStart = n }
            else {
              val gt = s.indexOf('>', closeAt)
              val end = if (gt < 0) n else gt + 1
              out += TEnd(tok.name, closeAt, end); i = end; textStart = i
            }
          }
        } else i += 1 // "<3" → text
      } else i += 1
    }
    flushText(n)
    out
  }

  private def parseStartTag(s: String, start: Int): (TStart, Int) = {
    val n = s.length
    var i = start + 1
    while (i < n && isNameChar(s.charAt(i))) i += 1
    val name = lower(s.substring(start + 1, i))
    var attrs: List[(String, String)] = Nil
    var selfClosing = false
    var done = false
    while (!done && i < n) {
      while (i < n && isWs(s.charAt(i))) i += 1
      if (i >= n) done = true
      else s.charAt(i) match {
        case '>' => i += 1; done = true
        case '/' =>
          if (i + 1 < n && s.charAt(i + 1) == '>') { selfClosing = true; i += 2; done = true }
          else i += 1
        case _ =>
          // attribute name
          val an = i
          while (i < n && !isWs(s.charAt(i)) && s.charAt(i) != '=' &&
                 s.charAt(i) != '>' && s.charAt(i) != '/') i += 1
          val aname = lower(s.substring(an, i))
          while (i < n && isWs(s.charAt(i))) i += 1
          var avalue = ""
          if (i < n && s.charAt(i) == '=') {
            i += 1
            while (i < n && isWs(s.charAt(i))) i += 1
            if (i < n) {
              val q = s.charAt(i)
              if (q == '"' || q == '\'') {
                val vs = i + 1
                val ve = s.indexOf(q, vs)
                if (ve < 0) { avalue = s.substring(vs, n); i = n }
                else { avalue = s.substring(vs, ve); i = ve + 1 }
              } else {
                val vs = i
                while (i < n && !isWs(s.charAt(i)) && s.charAt(i) != '>') i += 1
                avalue = s.substring(vs, i)
              }
            }
          }
          if (aname.nonEmpty) attrs = (aname, avalue) :: attrs
      }
    }
    (TStart(name, attrs.reverse, selfClosing, start, i), i)
  }

  private def indexOfCi(hay: String, needleLower: String, from: Int): Int = {
    val n = hay.length; val m = needleLower.length
    var i = math.max(from, 0)
    while (i + m <= n) {
      var j = 0
      var ok = true
      while (ok && j < m) {
        if (lowerCh(hay.charAt(i + j)) != needleLower.charAt(j)) ok = false
        j += 1
      }
      if (ok) {
        // must be followed by '>', whitespace, '/' or EOF to be a real close tag
        val after = i + m
        if (after >= n || hay.charAt(after) == '>' || isWs(hay.charAt(after)) ||
            hay.charAt(after) == '/') return i
      }
      i += 1
    }
    -1
  }

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'
  @inline private def isNameStart(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  @inline private def isNameChar(c: Char): Boolean =
    isNameStart(c) || (c >= '0' && c <= '9') || c == '-' || c == '_' || c == ':'
  @inline private def lowerCh(c: Char): Char =
    if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
  private def lower(s: String): String = {
    var i = 0; var needs = false
    while (i < s.length && !needs) { val c = s.charAt(i); if (c >= 'A' && c <= 'Z') needs = true; i += 1 }
    if (!needs) s else {
      val a = s.toCharArray
      var j = 0
      while (j < a.length) { a(j) = lowerCh(a(j)); j += 1 }
      new String(a)
    }
  }
}
