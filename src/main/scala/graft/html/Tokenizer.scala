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
  /** Raw text run — a SLICE of the decoded source (`src`, [pos, end)), not a
    * substring: text is most of a page's bytes, and copying every run was
    * the tokenizer's dominant allocation. Entities are NOT yet decoded
    * (normalization decodes later, scanning the slice in place).
    */
  final case class TText(src: String, pos: Int, end: Int) extends Tok {
    def raw: String = src.substring(pos, end)
  }
  final case class TComment(pos: Int, end: Int) extends Tok
  final case class TDoctype(pos: Int, end: Int) extends Tok

  /** Elements whose content is raw text (no markup inside). */
  val RawText: Set[String] = Set("script", "style", "textarea", "title", "xmp", "noscript")

  /** Interned lower-case names for the tags web markup actually uses —
    * resolved from a slice by hash + char compare, so the hot loop
    * allocates NO name string per tag (per-tag substrings were a measured
    * chunk of the kernel's garbage; unknown tags still substring).
    */
  private val InternedNames: Array[String] = Array(
    "a", "abbr", "address", "article", "aside", "b", "blockquote", "body",
    "br", "button", "canvas", "caption", "cite", "code", "col", "datalist",
    "dd", "div", "dl", "dt", "em", "embed", "fieldset", "figcaption",
    "figure", "footer", "form", "h1", "h2", "h3", "h4", "h5", "h6", "head",
    "header", "hr", "html", "i", "iframe", "img", "input", "label", "li",
    "link", "main", "meta", "nav", "noscript", "object", "ol", "option",
    "p", "pre", "s", "script", "section", "select", "small", "source",
    "span", "strong", "style", "sub", "sup", "svg", "table", "tbody", "td",
    "template", "textarea", "tfoot", "th", "thead", "title", "tr", "u",
    "ul", "wbr", "xmp")
  // open-addressed int-keyed table (a boxed-Integer HashMap lookup would
  // allocate one Integer per tag in the hot loop — the exact garbage the
  // interning exists to remove). Slots = 512 (power of two, load < 0.2);
  // an empty slot is cands == null, so hash value 0 needs no sentinel.
  private val InternSlots = 512
  private val internHashes = new Array[Int](InternSlots)
  private val internCands = new Array[Array[String]](InternSlots)
  locally {
    InternedNames.groupBy { n =>
      var h = 0; var i = 0
      while (i < n.length) { h = h * 31 + n.charAt(i); i += 1 }
      h
    }.foreach { case (h, names) =>
      var s = h & (InternSlots - 1)
      while (internCands(s) != null) s = (s + 1) & (InternSlots - 1)
      internHashes(s) = h
      internCands(s) = names.toArray
    }
  }
  private def internLookup(h: Int): Array[String] = {
    var s = h & (InternSlots - 1)
    while (internCands(s) != null) {
      if (internHashes(s) == h) return internCands(s)
      s = (s + 1) & (InternSlots - 1)
    }
    null
  }
  private def equalsLowerSlice(name: String, s: String, a: Int, b: Int): Boolean = {
    if (name.length != b - a) return false
    var i = 0
    while (i < name.length) {
      if (name.charAt(i) != lowerCh(s.charAt(a + i))) return false
      i += 1
    }
    true
  }
  /** Lower-cased name of the slice [a, b) — interned when known. */
  private def lowerName(s: String, a: Int, b: Int): String = {
    var h = 0; var i = a
    while (i < b) { h = h * 31 + lowerCh(s.charAt(i)); i += 1 }
    val cands = internLookup(h)
    if (cands != null) {
      var k = 0
      while (k < cands.length) {
        if (equalsLowerSlice(cands(k), s, a, b)) return cands(k)
        k += 1
      }
    }
    lower(s.substring(a, b))
  }

  /** Push-mode tokenizer consumer: primitive-argument callbacks, so the
    * streaming extraction path allocates NO token objects and NO token
    * buffer (comments/doctype carry no callback — they contribute nothing
    * downstream). Token boundaries and ordering are identical to
    * [[tokenize]]; `StreamSegmenterSpec`'s token-equivalence property
    * pins that.
    */
  trait Sink {
    def onStart(name: String, selfClosing: Boolean, pos: Int, end: Int): Unit
    def onEnd(name: String, pos: Int, end: Int): Unit
    def onText(src: String, a: Int, b: Int): Unit
  }

  /** Tokenize `s` into `sink` with `keepAttrs = false` semantics: attribute
    * syntax is parsed past but never materialized. This is the per-document
    * hot path — at 100 TB allocation rate, not CPU, is what stops wide
    * executors scaling, so the pull-mode token stream (one object + one
    * buffer slot per token) is bypassed entirely.
    */
  def stream(s: String, sink: Sink): Unit = {
    val n = s.length
    var i = 0
    var textStart = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<' && i + 1 < n) {
        val c1 = s.charAt(i + 1)
        if (c1 == '!') {
          if (textStart < i) sink.onText(s, textStart, i)
          if (s.startsWith("<!--", i)) { // comment (dropped)
            val close = s.indexOf("-->", i + 4)
            i = if (close < 0) n else close + 3
          } else { // doctype / bogus markup declaration (dropped)
            val close = s.indexOf('>', i + 2)
            i = if (close < 0) n else close + 1
          }
          textStart = i
        } else if (c1 == '/') {
          if (i + 2 < n && isNameStart(s.charAt(i + 2))) {
            if (textStart < i) sink.onText(s, textStart, i)
            var j = i + 2
            while (j < n && isNameChar(s.charAt(j))) j += 1
            val name = lowerName(s, i + 2, j)
            val close = s.indexOf('>', j)
            val end = if (close < 0) n else close + 1
            sink.onEnd(name, i, end); i = end; textStart = i
          } else i += 1 // "</3" etc → text
        } else if (isNameStart(c1)) {
          if (textStart < i) sink.onText(s, textStart, i)
          val start = i
          var j = i + 1
          while (j < n && isNameChar(s.charAt(j))) j += 1
          val name = lowerName(s, start + 1, j)
          val packed = skipAttrs(s, j)
          val selfClosing = packed < 0
          val next = if (packed < 0) -(packed + 1) else packed
          sink.onStart(name, selfClosing, start, next)
          i = next; textStart = i
          // rawtext swallow
          if (!selfClosing && RawText.contains(name)) {
            val closeAt = indexOfCi(s, "</" + name, i)
            val contentEnd = if (closeAt < 0) n else closeAt
            if (contentEnd > i) sink.onText(s, i, contentEnd)
            if (closeAt < 0) { i = n; textStart = n }
            else {
              val gt = s.indexOf('>', closeAt)
              val end = if (gt < 0) n else gt + 1
              sink.onEnd(name, closeAt, end); i = end; textStart = i
            }
          }
        } else i += 1 // "<3" → text
      } else i += 1
    }
    if (textStart < n) sink.onText(s, textStart, n)
  }

  /** Parse past the attribute section starting at `i` (just after the tag
    * name). Returns the index after `>`; self-closing is signalled by the
    * encoded value `-(end + 1)`. Scan structure identical to
    * [[parseStartTag]] with `keepAttrs = false`.
    */
  private def skipAttrs(s: String, start: Int): Int = {
    val n = s.length
    var i = start
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
          while (i < n && !isWs(s.charAt(i)) && s.charAt(i) != '=' &&
                 s.charAt(i) != '>' && s.charAt(i) != '/') i += 1
          while (i < n && isWs(s.charAt(i))) i += 1
          if (i < n && s.charAt(i) == '=') {
            i += 1
            while (i < n && isWs(s.charAt(i))) i += 1
            if (i < n) {
              val q = s.charAt(i)
              if (q == '"' || q == '\'') {
                val qe = s.indexOf(q, i + 1)
                i = if (qe < 0) n else qe + 1
              } else {
                while (i < n && !isWs(s.charAt(i)) && s.charAt(i) != '>') i += 1
              }
            }
          }
      }
    }
    if (selfClosing) -(i + 1) else i
  }

  /** `keepAttrs = false` parses past attributes without materializing the
    * name/value strings — the extraction pipeline reads no attribute (the
    * boilerplate rules are purely structural), so its hot path skips that
    * garbage; callers that want the attrs (tests, future classifiers) keep
    * the default.
    */
  def tokenize(s: String): ArrayBuffer[Tok] = tokenize(s, keepAttrs = true)

  def tokenize(s: String, keepAttrs: Boolean): ArrayBuffer[Tok] = {
    val out = new ArrayBuffer[Tok](64)
    val n = s.length
    var i = 0
    var textStart = 0

    def flushText(upto: Int): Unit =
      if (upto > textStart) out += TText(s, textStart, upto)

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
            val name = lowerName(s, i + 2, j)
            val close = s.indexOf('>', j)
            val end = if (close < 0) n else close + 1
            out += TEnd(name, i, end); i = end; textStart = i
          } else i += 1 // "</3" etc → text
        } else if (isNameStart(c1)) {
          flushText(i)
          val (tok, next) = parseStartTag(s, i, keepAttrs)
          out += tok
          i = next; textStart = i
          // rawtext swallow
          if (!tok.selfClosing && RawText.contains(tok.name)) {
            val closeAt = indexOfCi(s, "</" + tok.name, i)
            val contentEnd = if (closeAt < 0) n else closeAt
            if (contentEnd > i) out += TText(s, i, contentEnd)
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

  private def parseStartTag(s: String, start: Int, keepAttrs: Boolean): (TStart, Int) = {
    val n = s.length
    var i = start + 1
    while (i < n && isNameChar(s.charAt(i))) i += 1
    val name = lowerName(s, start + 1, i)
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
          val ae = i
          while (i < n && isWs(s.charAt(i))) i += 1
          var vs = -1; var ve = -1
          if (i < n && s.charAt(i) == '=') {
            i += 1
            while (i < n && isWs(s.charAt(i))) i += 1
            if (i < n) {
              val q = s.charAt(i)
              if (q == '"' || q == '\'') {
                vs = i + 1
                val qe = s.indexOf(q, vs)
                if (qe < 0) { ve = n; i = n }
                else { ve = qe; i = qe + 1 }
              } else {
                vs = i
                while (i < n && !isWs(s.charAt(i)) && s.charAt(i) != '>') i += 1
                ve = i
              }
            }
          }
          if (keepAttrs && ae > an)
            attrs = (lower(s.substring(an, ae)),
              if (vs >= 0) s.substring(vs, ve) else "") :: attrs
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
