package graft.text

import java.nio.charset.{Charset, StandardCharsets}

/** Encoding detection (SURVEY.md E11; FIXTURES.md §3.2).
  *
  * The reference (ROD-LAR-GILLES/OCR-MAIN) never decodes bytes itself — Python
  * hands it `str` everywhere — but the rebuild ingests raw page bytes
  * (`pages.html BINARY`, BASELINE input_hint), so detection is required.
  * Deterministic, pure `Array[Byte] => (Charset, String)`:
  *
  *   1. BOM sniff (UTF-8 / UTF-16LE / UTF-16BE), BOM stripped from output.
  *   2. `<meta charset=...>` / `<meta http-equiv=Content-Type content="...charset=...">`
  *      scanned in the first 1024 bytes only (frozen sniff window —
  *      `enc-decl-beyond-1024` fixture: declarations past the window are ignored).
  *   3. Strict UTF-8 validation of the whole payload.
  *   4. Fallback: windows-1252 (never produces replacement chars — total function
  *      over bytes).
  */
object Charsets {

  private val Win1252: Charset = Charset.forName("windows-1252")
  val SniffWindow = 1024

  /** Detected charset name + decoded text. Total: never throws on any byte input. */
  def decode(bytes: Array[Byte]): (String, String) = {
    sniffBom(bytes) match {
      case Some((cs, bomLen)) =>
        (cs.name, decodeWith(bytes, bomLen, cs))
      case None =>
        metaCharset(bytes) match {
          case Some(cs) => (cs.name, decodeWith(bytes, 0, cs))
          case None =>
            if (isValidUtf8(bytes)) ("UTF-8", decodeWith(bytes, 0, StandardCharsets.UTF_8))
            else ("windows-1252", decodeWith(bytes, 0, Win1252))
        }
    }
  }

  /** BOM → (charset, bom length in bytes). */
  def sniffBom(b: Array[Byte]): Option[(Charset, Int)] = {
    if (b.length >= 3 && b(0) == 0xEF.toByte && b(1) == 0xBB.toByte && b(2) == 0xBF.toByte)
      Some((StandardCharsets.UTF_8, 3))
    else if (b.length >= 2 && b(0) == 0xFF.toByte && b(1) == 0xFE.toByte)
      Some((StandardCharsets.UTF_16LE, 2))
    else if (b.length >= 2 && b(0) == 0xFE.toByte && b(1) == 0xFF.toByte)
      Some((StandardCharsets.UTF_16BE, 2))
    else None
  }

  /** Scan the first 1024 bytes (treated as latin-1, charset labels are ASCII) for
    * `charset=NAME` inside a `<meta ...>` tag. The scan is ANCHORED to meta
    * tag bounds — an early `<script>var charset="utf-16"</script>`, comment,
    * or visible text containing `charset=` must not hijack detection.
    * Returns a resolvable charset only.
    *
    * Runs directly over the byte window (latin-1 char per byte, lowercased
    * per char) — this is a per-document hot path and the former
    * `new String(...).toLowerCase` materialized ~4 KB per doc just to search
    * it; at 100 TB allocation rate is what stops wide executors scaling.
    */
  def metaCharset(bytes: Array[Byte]): Option[Charset] = {
    val n = math.min(bytes.length, SniffWindow)
    @inline def at(i: Int): Char = Character.toLowerCase((bytes(i) & 0xFF).toChar)
    // indexOf of a lowercase ASCII literal over the lowercased window
    def find(lit: String, from: Int, until: Int): Int = {
      val m = lit.length
      var i = math.max(from, 0)
      while (i + m <= until) {
        var k = 0
        while (k < m && at(i + k) == lit.charAt(k)) k += 1
        if (k == m) return i
        i += 1
      }
      -1
    }
    var from = 0
    while (from < n) {
      val tag = find("<meta", from, n)
      if (tag < 0) return None
      var close = tag
      while (close < n && at(close) != '>') close += 1
      val end = if (close >= n) n else close
      // try every charset occurrence inside this tag's bounds — the first
      // may belong to another attribute (data-charset-mode="...")
      var idx = find("charset", tag, end)
      while (idx >= 0 && idx < end) {
        val found = parseCharsetValue(at, idx + "charset".length, end)
        if (found.isDefined) return found
        idx = find("charset", idx + 1, end)
      }
      from = tag + "<meta".length
    }
    None
  }

  /** `= "name" | 'name' | name` starting at `i`, bounded by `end` (tag close). */
  private def parseCharsetValue(at: Int => Char, start: Int, end: Int): Option[Charset] = {
    var i = start
    while (i < end && (at(i) == ' ' || at(i) == '\t')) i += 1
    if (i >= end || at(i) != '=') return None
    i += 1
    while (i < end && (at(i) == ' ' || at(i) == '\t')) i += 1
    if (i >= end) return None
    val quote = at(i)
    val isQuoted = quote == '"' || quote == '\''
    @inline def terminates(c: Char): Boolean =
      if (isQuoted) c == quote
      else c == ' ' || c == '\t' || c == '"' || c == '\'' || c == ';' || c == '>' || c == '/'
    val valStart = if (isQuoted) i + 1 else i
    var j = valStart
    while (j < end && !terminates(at(j))) j += 1
    // trim (the window's whitespace inventory is space/\t plus control chars
    // String.trim would strip: anything <= ' ')
    var a = valStart
    var b = j
    while (a < b && at(a) <= ' ') a += 1
    while (b > a && at(b - 1) <= ' ') b -= 1
    if (a >= b) None
    else {
      val name = {
        val sb = new java.lang.StringBuilder(b - a)
        var k = a
        while (k < b) { sb.append(at(k)); k += 1 }
        sb.toString
      }
      try { if (Charset.isSupported(name)) Some(Charset.forName(name)) else None }
      catch { case _: IllegalArgumentException => None }
    }
  }

  /** Strict UTF-8 validity check (no decoding allocation beyond the validator). */
  def isValidUtf8(b: Array[Byte]): Boolean = {
    var i = 0
    val n = b.length
    while (i < n) {
      val c = b(i) & 0xFF
      if (c < 0x80) i += 1
      else if (c < 0xC2) return false // continuation byte or overlong lead
      else if (c < 0xE0) { // 2-byte
        if (i + 1 >= n || (b(i + 1) & 0xC0) != 0x80) return false
        i += 2
      } else if (c < 0xF0) { // 3-byte
        if (i + 2 >= n) return false
        val c1 = b(i + 1) & 0xFF; val c2 = b(i + 2) & 0xFF
        if ((c1 & 0xC0) != 0x80 || (c2 & 0xC0) != 0x80) return false
        if (c == 0xE0 && c1 < 0xA0) return false         // overlong
        if (c == 0xED && c1 >= 0xA0) return false        // surrogate range
        i += 3
      } else if (c < 0xF5) { // 4-byte
        if (i + 3 >= n) return false
        val c1 = b(i + 1) & 0xFF; val c2 = b(i + 2) & 0xFF; val c3 = b(i + 3) & 0xFF
        if ((c1 & 0xC0) != 0x80 || (c2 & 0xC0) != 0x80 || (c3 & 0xC0) != 0x80) return false
        if (c == 0xF0 && c1 < 0x90) return false         // overlong
        if (c == 0xF4 && c1 >= 0x90) return false        // > U+10FFFF
        i += 4
      } else return false
    }
    true
  }

  private def decodeWith(bytes: Array[Byte], offset: Int, cs: Charset): String =
    // String's charset constructor specifies REPLACE for malformed input and
    // unmappable characters — identical semantics to the explicit decoder it
    // replaces, but one allocation instead of three (decoder, CharBuffer,
    // copy-out) and it produces compact latin-1-backed strings, halving the
    // resident size of ASCII documents through the whole downstream kernel
    new String(bytes, offset, bytes.length - offset, cs)
}
