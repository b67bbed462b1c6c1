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
      val semi = s.indexOf(';', i + 1)
      // entity names are short; cap the scan so a lone '&' doesn't search far
      if (semi > i && semi - i <= 10) {
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
        if (rep != null) {
          sb.append(s, last, i).append(rep)
          last = semi + 1
          i = s.indexOf('&', semi + 1)
        } else i = s.indexOf('&', i + 1)
      } else i = s.indexOf('&', i + 1)
    }
    sb.append(s, last, s.length)
    sb.toString
  }

  private def codePointStr(cp: Long): String =
    if (cp <= 0 || cp > 0x10FFFF || (cp >= 0xD800 && cp <= 0xDFFF)) "�"
    else new String(Character.toChars(cp.toInt))
}
