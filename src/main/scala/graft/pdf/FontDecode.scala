package graft.pdf

import PdfObjects._

/** CID/Type0 font text decoding via /ToUnicode CMaps (PDF 1.7 §9.10.3).
  *
  * The reference never decodes composite fonts (its extractors shell out to
  * Tesseract/pdfplumber); this closes the rebuild's own v1 deferral
  * (SURVEY.md §7.5.1 "no CID/Type0 in v1"). Scope: per-page /Resources /Font
  * lookup, ToUnicode CMap `codespacerange`/`bfchar`/`bfrange` sections,
  * UTF-16BE destination strings. Fonts with neither /ToUnicode nor
  * /Subtype /Type0 keep the existing single-byte Latin-1 path, so all
  * previously-golden output is byte-identical.
  *
  * Degrade ladder (frozen, deterministic): mapped code → CMap string;
  * unmapped non-zero code that is a valid BMP scalar → that code point
  * (Identity-H convention); other unmapped non-zero codes → U+FFFD;
  * code 0 → dropped (padding); trailing partial code → Latin-1 bytes.
  */
object FontDecode {

  /** Cross-document font-work cache. Embedded font programs and ToUnicode
    * CMap streams repeat across a crawl (the same subset font is embedded by
    * thousands of pages from one generator), so the expensive pure steps —
    * reversing a TrueType `cmap` table, parsing a ToUnicode CMap — are
    * cached keyed by the DECODED stream bytes. Keying on decoded bytes keeps
    * the entry a pure function of its key (raw bytes alone would not be:
    * the filter chain and /DecodeParms live outside the stream body).
    * Bounded by epoch clear at [[CacheCap]] entries; thread-safe; executors
    * warm it once per distinct font, not once per document.
    */
  private final class BytesKey(val bytes: Array[Byte]) {
    override val hashCode: Int = java.util.Arrays.hashCode(bytes)
    override def equals(o: Any): Boolean = o match {
      case k: BytesKey => (k eq this) || java.util.Arrays.equals(k.bytes, bytes)
      case _ => false
    }
  }
  /** Bound is RETAINED BYTES, not entry count: one adversarial crawl of
    * multi-MB fonts with million-entry cmaps must not pin cap×MB of heap.
    * Key bytes + an estimate of the value's map footprint are charged; at
    * the cap the cache epoch-clears (simple, thread-safe, and at worst
    * re-pays one font decode per distinct font per epoch).
    */
  private val CacheCapBytes = 64L << 20
  private final class SizedCache[V <: AnyRef](sizeOf: V => Long) {
    // an Epoch pairs the map with its byte counter so the cap check is
    // exact: only the thread whose putIfAbsent WINS charges the counter
    // (concurrent misses on one key no longer double-charge), and eviction
    // swaps the whole epoch atomically via CAS — no clear()/set() window in
    // which concurrently-inserted entries end up retained but uncounted.
    // Entries raced into a just-retired epoch die with it (GC), at worst
    // re-paying one font decode in the new epoch.
    private final class Epoch {
      val map = new java.util.concurrent.ConcurrentHashMap[BytesKey, V]()
      val bytes = new java.util.concurrent.atomic.AtomicLong()
    }
    private val epoch = new java.util.concurrent.atomic.AtomicReference(new Epoch)
    def getOrCompute(data: Array[Byte])(compute: => V): V = {
      val e = epoch.get()
      val k = new BytesKey(data)
      val hit = e.map.get(k)
      if (hit != null) return hit
      val v = compute
      val prev = e.map.putIfAbsent(k, v)
      if (prev != null) return prev // lost the insert race: no charge
      val cost = data.length + sizeOf(v) + 64L
      if (e.bytes.addAndGet(cost) > CacheCapBytes)
        epoch.compareAndSet(e, new Epoch) // one swapper wins; rest no-op
      v
    }
  }
  private def mapBytes(m: Map[Int, String]): Long =
    m.size.toLong * 56L // entry + boxed key + small string, estimated
  private val gidMapCache = new SizedCache[Map[Int, String]](mapBytes)
  private val toUniCache = new SizedCache[Option[(Int, Map[Int, String])]](
    v => v.map(p => mapBytes(p._2)).getOrElse(0L))

  /** Decoder for one font: fixed code width + code→text map.
    * `pairSurrogates` is set for the predefined UniXX-UTF16-H/V encodings,
    * whose 2-byte codes are UTF-16BE units: a high/low surrogate unit pair
    * decodes to one supplementary code point (UCS2 variants never emit
    * surrogates, so the flag stays off and a stray surrogate is U+FFFD).
    * `legacy`, when non-null, decodes the whole show string through that
    * charset (predefined CID-keyed CMaps: the codes are bytes of a legacy
    * CJK encoding, which is inherently variable-width — the charset decoder
    * handles 1-byte ASCII runs mixed with 2-byte CJK codes, which a fixed
    * `codeLen` cannot).
    */
  final case class FontDec(codeLen: Int, toUni: Map[Int, String],
                           pairSurrogates: Boolean = false,
                           legacy: java.nio.charset.Charset = null) {
    def decode(bytes: Array[Byte]): String = {
      if (legacy != null) return new String(bytes, legacy) // REPLACE on malformed
      val sb = new java.lang.StringBuilder(bytes.length)
      var i = 0
      val n = bytes.length
      def codeAt(p: Int): Int = {
        var code = 0
        var k = 0
        while (k < codeLen) { code = (code << 8) | (bytes(p + k) & 0xFF); k += 1 }
        code
      }
      while (i < n) {
        if (i + codeLen <= n) {
          val code = codeAt(i)
          toUni.get(code) match {
            case Some(s) => sb.append(s)
            case None =>
              if (pairSurrogates && code >= 0xD800 && code <= 0xDBFF &&
                  i + 2 * codeLen <= n) {
                val next = codeAt(i + codeLen)
                if (next >= 0xDC00 && next <= 0xDFFF) {
                  sb.append(code.toChar).append(next.toChar)
                  i += codeLen // the low unit is consumed too
                } else sb.append('\uFFFD')
              }
              else if (code >= 0x20 && code <= 0xFFFD && !(code >= 0xD800 && code <= 0xDFFF))
                sb.append(code.toChar)
              else if (code != 0) sb.append('\uFFFD')
          }
          i += codeLen
        } else {
          sb.append((bytes(i) & 0xFF).toChar)
          i += 1
        }
      }
      sb.toString
    }
  }

  /** Build the font-name → decoder map for one page. Only fonts that need
    * non-default decoding get an entry; absence = Latin-1 single-byte path.
    */
  def fontsFor(page: PDict, objs: Objects): Map[String, FontDec] = {
    val fontDict = for {
      res <- PdfExtractor.pageResources(page, objs) // /Resources inherits
      fd <- objs.dict(res.m.getOrElse("Font", PNull))
    } yield fd
    fontDict match {
      case None => Map.empty
      case Some(fd) =>
        fd.m.flatMap { case (fname, fref) =>
          objs.dict(fref).flatMap { f =>
            val subtype = objs.name(f.m.getOrElse("Subtype", PNull))
            val parsed = objs.resolve(f.m.getOrElse("ToUnicode", PNull)) match {
              case s: PStream =>
                decodeStream(s, objs).toOption
                  .flatMap(d => toUniCache.getOrCompute(d)(parseToUnicode(d)))
              case _ => None
            }
            parsed match {
              case Some((len, m)) =>
                val cl =
                  if (len >= 1 && len <= 4) len
                  else if (subtype.contains("Type0")) 2
                  else 1
                Some(fname -> FontDec(cl, m))
              case None if subtype.contains("Type0") =>
                objs.name(f.m.getOrElse("Encoding", PNull)) match {
                  case Some(PredefUnicodeCMap(variant, _)) =>
                    // predefined UniXX-UCS2/UTF16-H/V CMaps (PDF 1.7 §9.7.5.2,
                    // Adobe CMap resources): show-string codes ARE UTF-16BE
                    // units, so text extraction needs no external CMap table —
                    // decode codes directly (surrogate pairing for UTF16)
                    Some(fname -> FontDec(2, Map.empty,
                      pairSurrogates = variant == "UTF16"))
                  case Some(enc) if legacyCharsetFor(enc).isDefined =>
                    // predefined CID-keyed CMaps (GBK-EUC-H, 90ms-RKSJ-H, …):
                    // the show-string bytes ARE a legacy CJK encoding of the
                    // text (the CMap maps those byte codes to CIDs of the
                    // matching ordering), so for TEXT extraction the JDK's
                    // charset decoder recovers it without Adobe's CMap tables
                    Some(fname -> FontDec(2, Map.empty,
                      legacy = legacyCharsetFor(enc).get))
                  case _ =>
                    // no /ToUnicode: for Identity-H/V the codes are glyph ids —
                    // reverse the embedded TrueType's cmap when one is present;
                    // empty map keeps the documented BMP-codepoint degrade
                    Some(fname -> FontDec(2, identityGidMap(f, objs)))
                }
              case None =>
                // simple font: base encoding (WinAnsi's 0x80-0x9F
                // smart-punctuation block, MacRoman's full high range)
                // overridden by /Encoding /Differences single-byte remaps
                val m = baseEncodingMap(f, objs) ++ differencesMap(f, objs)
                if (m.nonEmpty) Some(fname -> FontDec(1, m))
                else None // default Latin-1 path
            }
          }
        }
    }
  }

  /** The predefined CMap names whose codes are Unicode: UniGB (Adobe-GB1),
    * UniCNS (Adobe-CNS1), UniJIS/UniJISX0213 (Adobe-Japan1), UniKS
    * (Adobe-Korea1/KR), UniAKR (Adobe-KR) × UCS2|UTF16 × H|V. CID-keyed
    * predefined CMaps (GBK-EUC-H, 90ms-RKSJ-H, …) are NOT matched — their
    * codes are legacy charset bytes needing the external CMap tables, and
    * they keep the documented empty-map degrade.
    */
  private val PredefUnicodeCMap =
    "Uni(?:GB|CNS|JIS|JISX0213|KS|AKR)-(UCS2|UTF16)-([HV])".r

  /** Predefined CID-keyed CMap name (PDF 1.7 §9.7.5.2 table 118, sans the
    * -H/-V suffix) → the legacy charset its show-string codes are bytes of.
    * Mapped only if the running JDK ships the charset; anything else (or an
    * unknown CMap name) keeps the documented empty-map degrade. The
    * RKSJ "ms" variants use windows-31j (MS extensions), "pv"/plain use
    * Shift_JIS; the Mac GB/B5/KSC ("pc") variants share the common plane
    * with their mainline encodings, which is the extractable subset.
    */
  private val LegacyCMapCharsets: Map[String, java.nio.charset.Charset] = {
    def cs(n: String): Option[java.nio.charset.Charset] =
      try {
        if (java.nio.charset.Charset.isSupported(n))
          Some(java.nio.charset.Charset.forName(n))
        else None
      } catch { case _: IllegalArgumentException => None }
    Seq(
      "GB-EUC" -> "GB2312", "GBpc-EUC" -> "GB2312",
      "GBK-EUC" -> "GBK", "GBKp-EUC" -> "GBK", "GBK2K" -> "GB18030",
      "B5pc" -> "Big5", "ETen-B5" -> "Big5", "ETenms-B5" -> "Big5",
      "HKscs-B5" -> "Big5-HKSCS", "CNS-EUC" -> "x-EUC-TW",
      "90ms-RKSJ" -> "windows-31j", "90msp-RKSJ" -> "windows-31j",
      "90pv-RKSJ" -> "Shift_JIS", "83pv-RKSJ" -> "Shift_JIS",
      "Add-RKSJ" -> "Shift_JIS", "Ext-RKSJ" -> "Shift_JIS",
      "EUC" -> "EUC-JP",
      "KSC-EUC" -> "EUC-KR", "KSCpc-EUC" -> "EUC-KR",
      "KSCms-UHC" -> "x-windows-949", "KSCms-UHC-HW" -> "x-windows-949",
    ).flatMap { case (cmap, charset) => cs(charset).map(cmap -> _) }.toMap
  }

  /** Charset for a predefined CID-keyed CMap /Encoding name, if decodable. */
  def legacyCharsetFor(encoding: String): Option[java.nio.charset.Charset] = {
    val base =
      if (encoding.endsWith("-H")) encoding.dropRight(2)
      else if (encoding.endsWith("-V")) encoding.dropRight(2)
      else encoding
    LegacyCMapCharsets.get(base)
  }

  /** Identity-H/V Type0 without /ToUnicode: show-string codes are CIDs and
    * (with /CIDToGIDMap /Identity or absent) glyph ids; the descendant's
    * embedded /FontFile2 TrueType `cmap` reversed gives gid → unicode
    * ([[TrueTypeCmap]]). Any other predefined CMap (UniGB-UCS2-H, …) or a
    * stream CIDToGIDMap keeps the documented degrade (empty map).
    */
  private def identityGidMap(f: PDict, objs: Objects): Map[Int, String] = {
    val enc = objs.name(f.m.getOrElse("Encoding", PNull))
    if (!enc.exists(e => e == "Identity-H" || e == "Identity-V")) return Map.empty
    val desc = objs.arr(f.m.getOrElse("DescendantFonts", PNull))
      .flatMap(_.headOption).flatMap(objs.dict)
    desc match {
      case Some(d) =>
        val identity = d.m.get("CIDToGIDMap")
          .forall(v => objs.name(v).contains("Identity"))
        if (!identity) return Map.empty
        (for {
          fd <- objs.dict(d.m.getOrElse("FontDescriptor", PNull))
          ff <- Some(objs.resolve(fd.m.getOrElse("FontFile2", PNull)))
            .collect { case s: PStream => s }
          data <- decodeStream(ff, objs).toOption
        } yield gidMapCache.getOrCompute(data)(TrueTypeCmap.reverseMap(data)))
          .getOrElse(Map.empty)
      case None => Map.empty
    }
  }

  /** Simple-font /Encoding << /Differences [ code /name ... ] >> →
    * byte-code → text map (PDF 1.7 §9.6.6.1). Codes the array does not
    * remap keep the default Latin-1 path via the decoder's identity
    * fallback. Glyph names resolve through a Latin/AGL subset plus the
    * `uniXXXX`/`uXXXX` systematic forms; unknown names are skipped
    * (those bytes fall back to identity).
    */
  /** Codes where a named base encoding disagrees with the default Latin-1
    * interpretation (PDF 1.7 Annex D): /WinAnsiEncoding is windows-1252
    * (the 0x80–0x9F smart quotes/dashes/€ block Word-authored PDFs use),
    * /MacRomanEncoding is the in-JDK x-MacRoman (its whole high range
    * differs). Built once per encoding via the JDK charset — only bytes
    * whose decode differs from the byte's own codepoint are mapped, so
    * the ASCII/Latin-1-agreeing majority stays on the default path.
    * /StandardEncoding's Adobe-specific high range has no JDK charset and
    * keeps the documented Latin-1 degrade. /Encoding may be the bare name
    * or a dict carrying /BaseEncoding (composed with /Differences by the
    * caller — differences override the base).
    */
  private def buildBaseMap(charsetName: String): Map[Int, String] =
    try {
      val cs = java.nio.charset.Charset.forName(charsetName)
      (128 until 256).flatMap { b =>
        val s = new String(Array(b.toByte), cs)
        if (s.length == 1 && s.charAt(0) != '�' && s.charAt(0).toInt != b)
          Some(b -> s)
        else None
      }.toMap
    } catch { case scala.util.control.NonFatal(_) => Map.empty }
  private lazy val winAnsiMap: Map[Int, String] = buildBaseMap("windows-1252")
  private lazy val macRomanMap: Map[Int, String] = buildBaseMap("x-MacRoman")

  def baseEncodingMap(font: PDict, objs: Objects): Map[Int, String] = {
    val encName = objs.resolve(font.m.getOrElse("Encoding", PNull)) match {
      case PName(n) => Some(n)
      case d: PDict => objs.name(d.m.getOrElse("BaseEncoding", PNull))
      case _ => None
    }
    encName match {
      case Some("WinAnsiEncoding") => winAnsiMap
      case Some("MacRomanEncoding") => macRomanMap
      case _ => Map.empty
    }
  }

  def differencesMap(font: PDict, objs: Objects): Map[Int, String] = {
    val diffs = for {
      enc <- objs.dict(font.m.getOrElse("Encoding", PNull))
      arr <- objs.arr(enc.m.getOrElse("Differences", PNull))
    } yield arr
    diffs match {
      case None => Map.empty
      case Some(items) =>
        val out = Map.newBuilder[Int, String]
        var code = -1
        items.foreach {
          case PNum(v) => code = v.toInt
          case PName(g) if code >= 0 && code <= 255 =>
            glyphToText(g).foreach(t => out += (code -> t))
            code += 1
          case _ =>
        }
        out.result()
    }
  }

  /** Latin-focused AGL subset + systematic uniXXXX/uXXXX names. The
    * systematic path claims a name only when its tail is ALL hex digits:
    * AGL names that merely start with 'u' at hex-plausible lengths
    * ("uacute", "ugrave") must fall through to the table, not die on the
    * failed hex parse.
    */
  def glyphToText(name: String): Option[String] = {
    if ((name.startsWith("uni") && name.length >= 7) ||
        (name.startsWith("u") && name.length >= 5 && name.length <= 7)) {
      val hex = if (name.startsWith("uni")) name.substring(3, 7) else name.substring(1)
      if (hex.forall(c => Character.digit(c, 16) >= 0)) {
        val cp = Integer.parseInt(hex, 16)
        return if (cp >= 0x20 && cp <= 0x10FFFF && !(cp >= 0xD800 && cp <= 0xDFFF))
          Some(new String(Character.toChars(cp)))
        else None
      }
    }
    Agl.get(name)
  }

  private val Agl: Map[String, String] = Map(
    "space" -> " ", "exclam" -> "!", "quotedbl" -> "\"", "numbersign" -> "#",
    "dollar" -> "$", "percent" -> "%", "ampersand" -> "&", "quotesingle" -> "'",
    "parenleft" -> "(", "parenright" -> ")", "asterisk" -> "*", "plus" -> "+",
    "comma" -> ",", "hyphen" -> "-", "period" -> ".", "slash" -> "/",
    "colon" -> ":", "semicolon" -> ";", "less" -> "<", "equal" -> "=",
    "greater" -> ">", "question" -> "?", "at" -> "@", "bracketleft" -> "[",
    "backslash" -> "\\", "bracketright" -> "]", "underscore" -> "_",
    "braceleft" -> "{", "bar" -> "|", "braceright" -> "}",
    "exclamdown" -> "¡", "questiondown" -> "¿", "cent" -> "¢", "sterling" -> "£",
    "Euro" -> "€", "degree" -> "°", "ordfeminine" -> "ª", "ordmasculine" -> "º",
    "guillemotleft" -> "«", "guillemotright" -> "»", "copyright" -> "©",
    "registered" -> "®", "trademark" -> "™", "section" -> "§", "paragraph" -> "¶",
    "middot" -> "·", "periodcentered" -> "·", "bullet" -> "•",
    "endash" -> "–", "emdash" -> "—", "quoteleft" -> "‘", "quoteright" -> "’",
    "quotedblleft" -> "“", "quotedblright" -> "”", "ellipsis" -> "…",
    "aacute" -> "á", "agrave" -> "à", "acircumflex" -> "â", "adieresis" -> "ä",
    "atilde" -> "ã", "aring" -> "å", "ae" -> "æ", "ccedilla" -> "ç",
    "eacute" -> "é", "egrave" -> "è", "ecircumflex" -> "ê", "edieresis" -> "ë",
    "iacute" -> "í", "igrave" -> "ì", "icircumflex" -> "î", "idieresis" -> "ï",
    "ntilde" -> "ñ", "oacute" -> "ó", "ograve" -> "ò", "ocircumflex" -> "ô",
    "odieresis" -> "ö", "otilde" -> "õ", "oslash" -> "ø", "uacute" -> "ú",
    "ugrave" -> "ù", "ucircumflex" -> "û", "udieresis" -> "ü", "yacute" -> "ý",
    "ydieresis" -> "ÿ", "thorn" -> "þ", "eth" -> "ð", "germandbls" -> "ß",
    "Aacute" -> "Á", "Agrave" -> "À", "Acircumflex" -> "Â", "Adieresis" -> "Ä",
    "Atilde" -> "Ã", "Aring" -> "Å", "AE" -> "Æ", "Ccedilla" -> "Ç",
    "Eacute" -> "É", "Egrave" -> "È", "Ecircumflex" -> "Ê", "Edieresis" -> "Ë",
    "Iacute" -> "Í", "Igrave" -> "Ì", "Icircumflex" -> "Î", "Idieresis" -> "Ï",
    "Ntilde" -> "Ñ", "Oacute" -> "Ó", "Ograve" -> "Ò", "Ocircumflex" -> "Ô",
    "Odieresis" -> "Ö", "Otilde" -> "Õ", "Oslash" -> "Ø", "Uacute" -> "Ú",
    "Ugrave" -> "Ù", "Ucircumflex" -> "Û", "Udieresis" -> "Ü", "Yacute" -> "Ý",
    "Thorn" -> "Þ", "Eth" -> "Ð")

  /** Parse a decoded ToUnicode CMap stream → (code byte width, code→text).
    * Tolerant: unknown PostScript operators are skipped; a CMap with no
    * usable sections yields None.
    */
  def parseToUnicode(bytes: Array[Byte]): Option[(Int, Map[Int, String])] = {
    import ContentStream._
    val lexer = new Lexer(bytes)
    val pending = scala.collection.mutable.ArrayBuffer.empty[Operand]
    val map = scala.collection.mutable.Map.empty[Int, String]
    var codeLen = 0
    var sawSection = false

    def codeOf(s: OStr): Int = {
      var v = 0
      val b = s.bytes
      var i = 0
      val n = math.min(b.length, 4)
      while (i < n) { v = (v << 8) | (b(i) & 0xFF); i += 1 }
      v
    }
    def utf16(b: Array[Byte]): String =
      new String(b, java.nio.charset.StandardCharsets.UTF_16BE)
    def bumped(base: Array[Byte], inc: Int): Array[Byte] = {
      // bfrange destination increment: add to the string's final byte,
      // carrying defensively (spec constrains ranges to one byte's span)
      val out = base.clone()
      var carry = inc
      var i = out.length - 1
      while (carry > 0 && i >= 0) {
        val v = (out(i) & 0xFF) + carry
        out(i) = (v & 0xFF).toByte
        carry = v >> 8
        i -= 1
      }
      out
    }

    var tok = lexer.next()
    while (tok != null) {
      tok match {
        case o: Operand => pending += o
        case OOp(op) =>
          op match {
            case "endcodespacerange" =>
              pending.collectFirst { case s: OStr if s.bytes.nonEmpty => s.bytes.length }
                .foreach { l => codeLen = l; sawSection = true }
            case "endbfchar" =>
              var i = 0
              while (i + 1 < pending.length) {
                (pending(i), pending(i + 1)) match {
                  case (src: OStr, dst: OStr) =>
                    map(codeOf(src)) = utf16(dst.bytes)
                    sawSection = true
                  case _ =>
                }
                i += 2
              }
            case "endbfrange" =>
              var i = 0
              while (i + 2 < pending.length) {
                (pending(i), pending(i + 1), pending(i + 2)) match {
                  case (lo: OStr, hi: OStr, dst) =>
                    val l = codeOf(lo); val h = codeOf(hi)
                    if (h >= l && h - l <= 65535) {
                      dst match {
                        case d: OStr =>
                          var c = l
                          while (c <= h) { map(c) = utf16(bumped(d.bytes, c - l)); c += 1 }
                          sawSection = true
                        case OArr(items) =>
                          var c = l
                          items.foreach {
                            case d: OStr if c <= h => map(c) = utf16(d.bytes); c += 1
                            case _ =>
                          }
                          sawSection = true
                        case _ =>
                      }
                    }
                  case _ =>
                }
                i += 3
              }
            case _ => // any other operator ends its operand run
          }
          pending.clear()
      }
      tok = lexer.next()
    }
    if (!sawSection) None
    else Some((if (codeLen >= 1) codeLen else 2, map.toMap))
  }
}
