package graft.text

/** HTML character-reference decoding (part of E10's normalization contract,
  * FIXTURES.md §3.1 `bp-whitespace`: "entities decoded").
  *
  * Frozen behavior: named entities from the table below and numeric references
  * (`&#NNN;` / `&#xHH;`) are decoded; anything unrecognized is left verbatim
  * (including a bare '&'). Deterministic, locale-free.
  */
object Entities {

  // The common subset seen in web text; unknown names pass through verbatim.
  private val named: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> "\u0020", "copy" -> "©", "reg" -> "®", "trade" -> "™",
    "hellip" -> "…", "mdash" -> "—", "ndash" -> "–",
    "lsquo" -> "‘", "rsquo" -> "’", "ldquo" -> "“", "rdquo" -> "”",
    "laquo" -> "«", "raquo" -> "»", "middot" -> "·", "bull" -> "•",
    "deg" -> "°", "plusmn" -> "±", "times" -> "×", "divide" -> "÷",
    "sect" -> "§", "para" -> "¶", "micro" -> "µ", "cent" -> "¢",
    "pound" -> "£", "euro" -> "€", "yen" -> "¥", "curren" -> "¤",
    "aacute" -> "á", "eacute" -> "é", "iacute" -> "í",
    "oacute" -> "ó", "uacute" -> "ú", "ntilde" -> "ñ",
    "Aacute" -> "Á", "Eacute" -> "É", "Iacute" -> "Í",
    "Oacute" -> "Ó", "Uacute" -> "Ú", "Ntilde" -> "Ñ",
    "uuml" -> "ü", "ouml" -> "ö", "auml" -> "ä", "szlig" -> "ß",
    "Uuml" -> "Ü", "Ouml" -> "Ö", "Auml" -> "Ä",
    "agrave" -> "à", "egrave" -> "è", "ugrave" -> "ù",
    "ccedil" -> "ç", "Ccedil" -> "Ç", "ordm" -> "º", "ordf" -> "ª",
    "iexcl" -> "¡", "iquest" -> "¿", "shy" -> "­",
  )

  /** Decode all character references in `s`. */
  def decode(s: String): String = {
    var i = s.indexOf('&')
    if (i < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var last = 0
    while (i >= 0 && i < s.length) {
      val r = refAt(s, i, s.length)
      if (r != null) {
        sb.append(s, last, i).append(r._1)
        last = r._2
        i = s.indexOf('&', r._2)
      } else i = s.indexOf('&', i + 1)
    }
    sb.append(s, last, s.length)
    sb.toString
  }

  /** Character reference starting at `s(i) == '&'`, never looking past
    * `limit` (exclusive — callers decoding a SLICE of a larger source pass
    * the slice end, so a `;` beyond the slice stays invisible, exactly as
    * it was when slices were substrings). Returns (replacement, index just
    * after the `;`), or null when the run is not a recognized reference.
    */
  def refAt(s: String, i: Int, limit: Int): (String, Int) = {
    // entity names are short: scan for ';' only within [i+1, i+11) ∩ limit —
    // a bounded charAt loop, NOT String.indexOf over the whole source (on
    // '&'-dense pages with sparse ';' that per-'&' scan is O(doc), making
    // decode quadratic on the per-document hot path)
    var semi = -1
    val scanEnd = math.min(limit, i + 11)
    var j = i + 1
    while (semi < 0 && j < scanEnd) {
      if (s.charAt(j) == ';') semi = j
      j += 1
    }
    if (semi <= i) return null
    val body = s.substring(i + 1, semi)
    val rep: String =
      if (body.startsWith("#x") || body.startsWith("#X")) {
        val hex = body.substring(2)
        if (hex.nonEmpty && hex.forall(c => Character.digit(c, 16) >= 0))
          codePointStr(java.lang.Long.parseLong(hex, 16)) else null
      } else if (body.startsWith("#")) {
        val dec = body.substring(1)
        if (dec.nonEmpty && dec.forall(_.isDigit) && dec.length <= 8)
          codePointStr(java.lang.Long.parseLong(dec)) else null
      } else named.getOrElse(body, null)
    if (rep == null) null else (rep, semi + 1)
  }

  private def codePointStr(cp: Long): String =
    if (cp <= 0 || cp > 0x10FFFF || (cp >= 0xD800 && cp <= 0xDFFF)) "�"
    else new String(Character.toChars(cp.toInt))
}
