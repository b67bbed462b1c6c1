package graft.pdf

/** Minimal TrueType/OpenType `cmap` reader (SURVEY.md E8; closes the
  * "composite fonts without /ToUnicode" gap): for an Identity-H Type0 font
  * the show-string codes ARE glyph ids, so reversing the embedded font
  * program's unicode→glyph `cmap` recovers text the PDF itself never maps.
  * The reference sidesteps fonts entirely by rasterizing
  * (ocr_adapters.py:62); this is the text-domain equivalent.
  *
  * Scope: subtable formats 0 (byte table), 4 (BMP segments), 6 (trimmed
  * table) and 12 (sequential groups), preferring Windows (3,1), then
  * Unicode (0,*), then Windows (3,10). External predefined CMaps
  * (UniGB-UCS2-H etc.) remain the documented degrade-to-empty.
  * Deterministic: when several codepoints map to one glyph, the LOWEST
  * codepoint wins. Total: malformed bytes yield an empty map, never a
  * throw; a hostile font is bounded by a mapping-count cap.
  */
object TrueTypeCmap {

  private val MaxMappings = 1 << 20

  /** glyph id → unicode string. Empty on any malformed/unsupported input. */
  def reverseMap(font: Array[Byte]): Map[Int, String] =
    try parse(font)
    catch { case scala.util.control.NonFatal(_) => Map.empty }

  private def parse(b: Array[Byte]): Map[Int, String] = {
    def u16(o: Int): Int =
      if (o < 0 || o + 2 > b.length) -1
      else ((b(o) & 0xFF) << 8) | (b(o + 1) & 0xFF)
    def u32(o: Int): Long =
      if (o < 0 || o + 4 > b.length) -1L
      else ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) |
           ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)

    if (b.length < 12) return Map.empty
    val numTables = u16(4)
    if (numTables <= 0 || numTables > 512) return Map.empty
    var cmapOff = -1
    var t = 0
    while (t < numTables && cmapOff < 0) {
      val rec = 12 + 16 * t
      if (rec + 16 <= b.length &&
          b(rec) == 'c' && b(rec + 1) == 'm' && b(rec + 2) == 'a' && b(rec + 3) == 'p')
        cmapOff = u32(rec + 8).toInt
      t += 1
    }
    if (cmapOff < 0 || cmapOff + 4 > b.length) return Map.empty

    val nSub = u16(cmapOff + 2)
    if (nSub <= 0 || nSub > 64) return Map.empty
    var best = -1
    var bestScore = -1
    var s = 0
    while (s < nSub) {
      val rec = cmapOff + 4 + 8 * s
      val plat = u16(rec); val enc = u16(rec + 2)
      val off = u32(rec + 4)
      val score = (plat, enc) match {
        case (3, 1) => 3
        case (0, _) => 2
        case (3, 10) => 1
        case _ => 0
      }
      if (score > bestScore && off >= 0 && cmapOff + off + 4 <= b.length) {
        bestScore = score
        best = cmapOff + off.toInt
      }
      s += 1
    }
    if (best < 0) return Map.empty

    // forward map: lowest codepoint per glyph wins. `count` is an
    // ITERATION budget, not an accepted-mapping count — a hostile cmap
    // whose entries all fail validation must still terminate.
    val gidToCp = scala.collection.mutable.HashMap.empty[Int, Int]
    var count = 0
    def put(cp: Int, gid: Int): Unit = {
      count += 1
      if (gid != 0 && cp >= 0x20 && cp <= 0x10FFFF && !(cp >= 0xD800 && cp <= 0xDFFF)) {
        val cur = gidToCp.getOrElse(gid, Int.MaxValue)
        if (cp < cur) gidToCp(gid) = cp
      }
    }

    u16(best) match {
      case 0 =>
        // byte encoding table: 256-entry glyphIdArray, charCode 0..255
        var c = 0
        while (c < 256 && count < MaxMappings) {
          val off = best + 6 + c
          if (off < b.length) put(c, b(off) & 0xFF)
          c += 1
        }
      case 6 =>
        // trimmed table mapping: firstCode + entryCount u16 glyph ids
        val first = u16(best + 6); val cnt = u16(best + 8)
        if (first < 0 || cnt < 0 || cnt > 65536) return Map.empty
        var i = 0
        while (i < cnt && count < MaxMappings) {
          val g = u16(best + 10 + 2 * i)
          if (g > 0) put(first + i, g) else count += 1 // OOB/zero: budget still ticks
          i += 1
        }
      case 4 =>
        val segX2 = u16(best + 6)
        if (segX2 <= 0 || (segX2 & 1) == 1) return Map.empty
        val segCount = segX2 / 2
        val endOff = best + 14
        val startOff = endOff + segX2 + 2 // +2 reservedPad
        val deltaOff = startOff + segX2
        val roOff = deltaOff + segX2
        var seg = 0
        while (seg < segCount && count < MaxMappings) {
          val end = u16(endOff + 2 * seg)
          val start = u16(startOff + 2 * seg)
          val delta = u16(deltaOff + 2 * seg)
          val ro = u16(roOff + 2 * seg)
          if (end < 0 || start < 0 || delta < 0 || ro < 0) return gidText(gidToCp)
          if (start <= end) {
            var c = start // 0xFFFF (the terminator sentinel) is skipped below
            while (c <= end && c != 0xFFFF && count < MaxMappings) {
              val gid =
                if (ro == 0) (c + delta) & 0xFFFF
                else {
                  val addr = roOff + 2 * seg + ro + 2 * (c - start)
                  val g0 = u16(addr)
                  if (g0 <= 0) 0 else (g0 + delta) & 0xFFFF
                }
              put(c, gid)
              c += 1
            }
          }
          seg += 1
        }
      case 12 =>
        val nGroups = u32(best + 12)
        if (nGroups < 0 || nGroups > 65536) return Map.empty
        var g = 0
        while (g < nGroups && count < MaxMappings) {
          val rec = best + 16 + 12 * g
          val start = u32(rec); val end = u32(rec + 4); val gid0 = u32(rec + 8)
          if (start < 0 || end < start || end - start > MaxMappings) return gidText(gidToCp)
          var c = start
          while (c <= end && count < MaxMappings) {
            put(c.toInt, (gid0 + (c - start)).toInt)
            c += 1
          }
          g += 1
        }
      case _ => return Map.empty
    }
    gidText(gidToCp)
  }

  private def gidText(m: scala.collection.mutable.HashMap[Int, Int]): Map[Int, String] =
    m.iterator.map { case (gid, cp) => gid -> new String(Character.toChars(cp)) }.toMap
}
