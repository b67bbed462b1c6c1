package graft.text

import java.nio.charset.{Charset, StandardCharsets, CodingErrorAction}
import java.nio.{ByteBuffer, CharBuffer}

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
    */
  def metaCharset(bytes: Array[Byte]): Option[Charset] = {
    val n = math.min(bytes.length, SniffWindow)
    val window = new String(bytes, 0, n, StandardCharsets.ISO_8859_1)
      .toLowerCase(java.util.Locale.ROOT)
    var from = 0
    while (from < window.length) {
      val tag = window.indexOf("<meta", from)
      if (tag < 0) return None
      val close = window.indexOf('>', tag)
      val end = if (close < 0) window.length else close
      // try every charset occurrence inside this tag's bounds — the first
      // may belong to another attribute (data-charset-mode="...")
      var idx = window.indexOf("charset", tag)
      while (idx >= 0 && idx < end) {
        val found = parseCharsetValue(window, idx + "charset".length, end)
        if (found.isDefined) return found
        idx = window.indexOf("charset", idx + 1)
      }
      from = tag + "<meta".length
    }
    None
  }

  /** `= "name" | 'name' | name` starting at `i`, bounded by `end` (tag close). */
  private def parseCharsetValue(window: String, start: Int, end: Int): Option[Charset] = {
    var i = start
    while (i < end && (window.charAt(i) == ' ' || window.charAt(i) == '\t')) i += 1
    if (i >= end || window.charAt(i) != '=') return None
    i += 1
    while (i < end && (window.charAt(i) == ' ' || window.charAt(i) == '\t')) i += 1
    if (i >= end) return None
    val quote = window.charAt(i)
    val (valStart, terms) =
      if (quote == '"' || quote == '\'') (i + 1, Set(quote))
      else (i, Set(' ', '\t', '"', '\'', ';', '>', '/'))
    var j = valStart
    while (j < end && !terms.contains(window.charAt(j))) j += 1
    val name = window.substring(valStart, j).trim
    if (name.isEmpty) None
    else
      try { if (Charset.isSupported(name)) Some(Charset.forName(name)) else None }
      catch { case _: IllegalArgumentException => None }
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

  private def decodeWith(bytes: Array[Byte], offset: Int, cs: Charset): String = {
    val dec = cs.newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    val out: CharBuffer = dec.decode(ByteBuffer.wrap(bytes, offset, bytes.length - offset))
    out.toString
  }
}
