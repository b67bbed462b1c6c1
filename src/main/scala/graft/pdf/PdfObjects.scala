package graft.pdf

import scala.collection.mutable

/** PDF object-layer parser (SURVEY.md E8/S5; PDF 1.7 / ISO 32000-1 subset).
  *
  * Scope (SURVEY §7.5.1): body scan for `N G obj` (xref-independent — robust
  * against broken xref tables), dictionaries/arrays/names/numbers/strings/
  * refs, stream payloads with `FlateDecode` (java.util.zip.Inflater).
  * Anything beyond the scope yields `Left(error)` at the extractor level,
  * never an exception. Input bytes are never mutated.
  */
object PdfObjects {

  sealed trait PVal
  final case class PNum(v: Double) extends PVal
  final case class PName(v: String) extends PVal
  /** String object payload as raw bytes (escapes already resolved). */
  final case class PStr(bytes: Array[Byte]) extends PVal
  final case class PArr(items: Vector[PVal]) extends PVal
  final case class PDict(m: Map[String, PVal]) extends PVal
  final case class PRef(num: Int, gen: Int) extends PVal
  final case class PBool(v: Boolean) extends PVal
  case object PNull extends PVal
  final case class PStream(dict: PDict, raw: Array[Byte]) extends PVal

  /** `encrypted` = payloads REMAIN ciphertext (refuse at the extractor);
    * a document whose standard-security-handler encryption was removed by
    * [[PdfCrypt]] (empty user password) has `encrypted = false` and
    * `wasDecrypted = true`. `cryptFail` carries the typed refusal reason.
    */
  final class Objects(val byNum: Map[Int, PVal], val encrypted: Boolean = false,
                      val cryptFail: Option[String] = None,
                      val wasDecrypted: Boolean = false) {
    def resolve(v: PVal): PVal = v match {
      case r: PRef => resolveRef(r, Set.empty)
      case x => x
    }
    // A malformed reference cycle (1 0 obj 2 0 R / 2 0 obj 1 0 R) must
    // degrade to PNull, not StackOverflowError.
    @annotation.tailrec
    private def resolveRef(r: PRef, seen: Set[Int]): PVal =
      if (seen(r.num)) PNull
      else byNum.get(r.num) match {
        case Some(next: PRef) => resolveRef(next, seen + r.num)
        case Some(x) => x
        case None => PNull
      }
    def dict(v: PVal): Option[PDict] = resolve(v) match {
      case d: PDict => Some(d)
      case s: PStream => Some(s.dict)
      case _ => None
    }
    def name(v: PVal): Option[String] = resolve(v) match {
      case PName(n) => Some(n); case _ => None
    }
    def num(v: PVal): Option[Double] = resolve(v) match {
      case PNum(n) => Some(n); case _ => None
    }
    def arr(v: PVal): Option[Vector[PVal]] = resolve(v) match {
      case PArr(a) => Some(a); case _ => None
    }
  }

  @inline private def isWs(b: Int): Boolean =
    b == ' ' || b == '\t' || b == '\r' || b == '\n' || b == '\f' || b == 0
  @inline private def isDelim(b: Int): Boolean =
    b == '(' || b == ')' || b == '<' || b == '>' || b == '[' || b == ']' ||
    b == '{' || b == '}' || b == '/' || b == '%'
  @inline private def isRegular(b: Int): Boolean = !isWs(b) && !isDelim(b)

  /** Parse all indirect objects in the file by scanning for `N G obj`,
    * then expand PDF 1.5 object streams (`/Type /ObjStm`) — compressed
    * containers whose member objects (catalog/page/font dicts; never
    * streams) are invisible to a body scan until the container is inflated.
    *
    * When the file carries a parseable `startxref` → xref/`/Prev` chain
    * (classic tables, xref streams, or hybrid `/XRefStm`), that chain is
    * AUTHORITATIVE for object resolution: incremental updates can point an
    * object number at an EARLIER offset (rollback) or mark it free
    * (deletion), both of which last-object-wins body scanning resolves
    * wrongly. The body scan stays as the robustness baseline for files with
    * broken or absent xref data.
    */
  def parseAll(bytes: Array[Byte]): Objects = {
    val (out, scanOffsets, gens) = scanObjects(bytes)
    val chain =
      try parseXrefChainFull(bytes)
      catch { case scala.util.control.NonFatal(_) => XrefChain.empty }
    val xref = chain.entries
    // type-1 entries: authoritative offset. When it equals the offset the
    // body scan already parsed the object at (the common, non-updated case)
    // the scan result IS the xref result — skip the re-parse; PDFs only pay
    // double parsing for objects an incremental update actually moved.
    // type-0 entries: the newest chain entry says deleted. Track the set —
    // removal from `out` alone is not enough, because a deleted object that
    // lives inside an /ObjStm container (the common PDF 1.5+ shape for dict
    // objects) would be re-added by the expansion loop below.
    val deleted = xref.collect { case (num, XrefEntry(0, _, _)) => num }.toSet
    xref.foreach {
      case (num, XrefEntry(1, off, g)) =>
        gens(num) = g
        if (!scanOffsets.get(num).contains(off.toInt))
          parseObjectAt(bytes, off.toInt, num).foreach(v => out(num) = v)
      case (num, XrefEntry(0, _, _)) =>
        out.remove(num)
      case _ =>
    }
    // Standard-security-handler decryption (PdfCrypt, empty user password)
    // happens BEFORE ObjStm expansion: the container stream is ciphertext as
    // a whole, and its members inherit the container's decryption (ISO
    // 32000-1 §7.6.2 — member strings are NOT individually re-decrypted).
    var cryptFail: Option[String] = None
    var wasDecrypted = false
    // broken-xref robustness: when the startxref chain is unparseable, the
    // /Encrypt sighting falls back to the newest `trailer` keyword — without
    // it, an encrypted document with a corrupt xref would body-scan its
    // ciphertext into garbage text instead of decrypting (or refusing typed)
    val encryptSighting: Option[(PVal, Array[Byte])] =
      chain.encryptRef.map(r => (r, chain.id0)).orElse {
        if (chain.entries.isEmpty) scanTrailerEncrypt(bytes) else None
      }
    encryptSighting.foreach { case (encVal, chainId0) =>
      val prov = new Objects(out.toMap)
      prov.dict(encVal) match {
        case Some(encDict) =>
          PdfCrypt.forDocument(encDict, prov, chainId0) match {
            case Right(dec) =>
              val encNum = encVal match { case PRef(n, _) => n; case _ => -1 }
              out.keysIterator.toVector.foreach { num =>
                if (num != encNum)
                  out(num) = decryptVal(out(num), num, gens.getOrElse(num, 0), dec, prov)
              }
              wasDecrypted = true
            case Left(PdfCrypt.Locked) => cryptFail = Some("pdf_encrypted_locked")
            case Left(PdfCrypt.Unsupported(_)) => cryptFail = Some("pdf_encrypted")
          }
        case None => cryptFail = Some("pdf_encrypted")
      }
    }
    val base = new Objects(out.toMap)
    out.values.toVector.foreach {
      case s: PStream if base.name(s.dict.m.getOrElse("Type", PNull)).contains("ObjStm") =>
        expandObjStm(s, base).foreach { case (num, v) =>
          // direct objects win; xref-deleted members stay deleted
          if (!out.contains(num) && !deleted.contains(num)) out(num) = v
        }
      case _ =>
    }
    // type-2 entries: the designated container's member is authoritative
    xref.collect { case (num, XrefEntry(2, stmNum, _)) => (num, stmNum.toInt) }
      .groupBy(_._2).foreach { case (stmNum, members) =>
        out.get(stmNum) match {
          case Some(s: PStream) =>
            val mem = expandObjStm(s, new Objects(out.toMap)).toMap
            members.foreach { case (num, _) =>
              mem.get(num).foreach(v => out(num) = v)
            }
          case _ =>
        }
      }
    new Objects(out.toMap, encrypted = cryptFail.isDefined, cryptFail = cryptFail,
      wasDecrypted = wasDecrypted)
  }

  /** Decrypt one indirect object's strings and stream payload in place
    * (recursively through arrays/dicts). XRef streams are never encrypted
    * (ISO 32000-1 §7.5.8.2); /Type /Metadata streams stay plaintext when
    * the document set /EncryptMetadata false. The stream payload is trimmed
    * to /Length FIRST — /Length counts CIPHERTEXT bytes, and AES needs the
    * exact IV+blocks run (the scan-delimited raw may over-read toward
    * `endstream`).
    */
  private def decryptVal(v: PVal, num: Int, gen: Int, dec: PdfCrypt.Decryptor,
                         objs: Objects): PVal = v match {
    case PStr(b) => PStr(dec.decString(num, gen, b))
    case PArr(items) => PArr(items.map(decryptVal(_, num, gen, dec, objs)))
    case PDict(m) =>
      PDict(m.map { case (k, x) => k -> decryptVal(x, num, gen, dec, objs) })
    case s @ PStream(d, _) =>
      val tpe = d.m.get("Type") match { case Some(PName(t)) => t; case _ => "" }
      if (tpe == "XRef" || (tpe == "Metadata" && !dec.encryptMetadata)) s
      else {
        val dd = decryptVal(d, num, gen, dec, objs).asInstanceOf[PDict]
        PStream(dd, dec.decStream(num, gen, rawData(s, objs)))
      }
    case x => x
  }

  /** Newest `trailer`-keyword dict carrying /Encrypt, walking backward from
    * EOF (the xref-chain-unparseable fallback — only consulted when the
    * startxref chain produced nothing, so a literal "trailer" inside a
    * well-formed document's content stream can never shadow real trailers).
    */
  private def scanTrailerEncrypt(bytes: Array[Byte]): Option[(PVal, Array[Byte])] = {
    var at = lastIndexOfKeyword(bytes, "trailer", bytes.length)
    var guard = 0
    while (at >= 0 && guard < 16) {
      guard += 1
      try {
        val p = new Parser(bytes, at + 7)
        p.parseValue() match {
          case d: PDict if d.m.contains("Encrypt") =>
            val id0 = d.m.get("ID") match {
              case Some(PArr(items)) => items.headOption match {
                case Some(PStr(b)) => b
                case _ => Array.emptyByteArray
              }
              case _ => Array.emptyByteArray
            }
            return d.m.get("Encrypt").map(r => (r, id0))
          case _ =>
        }
      } catch { case scala.util.control.NonFatal(_) => }
      at = lastIndexOfKeyword(bytes, "trailer", at)
    }
    None
  }

  /** One xref entry: kind 0 = free (deleted), kind 1 = at byte offset `a`,
    * kind 2 = member of the object stream numbered `a` (at index `b`).
    */
  final case class XrefEntry(kind: Int, a: Long, b: Int)

  /** Chain-walk result: newest-wins object locations + the newest
    * trailer's /Encrypt value (`encryptRef`, when present — the document is
    * encrypted and the extractor must decrypt or refuse typed) and first
    * /ID string.
    */
  final case class XrefChain(entries: Map[Int, XrefEntry],
                             encryptRef: Option[PVal] = None,
                             id0: Array[Byte] = Array.emptyByteArray) {
    def encrypted: Boolean = encryptRef.isDefined
  }
  object XrefChain {
    val empty: XrefChain = XrefChain(Map.empty)
  }

  /** Newest-wins object locations from the `startxref` → `/Prev` chain
    * (with hybrid `/XRefStm` branches). Empty when no chain parses.
    */
  def parseXrefChain(bytes: Array[Byte]): Map[Int, XrefEntry] =
    parseXrefChainFull(bytes).entries

  def parseXrefChainFull(bytes: Array[Byte]): XrefChain = {
    val sx = lastIndexOfKeyword(bytes, "startxref")
    if (sx < 0) return XrefChain.empty
    val p0 = new Parser(bytes, sx + "startxref".length)
    p0.skipWs()
    val first = readAsciiInt(bytes, p0.pos)
    if (first < 0) return XrefChain.empty
    val acc = mutable.Map.empty[Int, XrefEntry]
    val visited = mutable.Set.empty[Long]
    // first (= newest) sighting wins, same as the entry merge: incremental
    // updates copy /Encrypt and /ID forward, and the newest trailer is the
    // authoritative one
    var encryptRef: Option[PVal] = None
    var id0: Array[Byte] = Array.emptyByteArray
    def sight(trailer: PDict): Unit = {
      if (encryptRef.isEmpty) encryptRef = trailer.m.get("Encrypt")
      if (id0.isEmpty) trailer.m.get("ID") match {
        case Some(PArr(items)) => items.headOption match {
          case Some(PStr(b)) => id0 = b
          case _ =>
        }
        case _ =>
      }
    }
    def merge(entries: Vector[(Int, XrefEntry)]): Unit =
      entries.foreach { case (n, e) => if (!acc.contains(n)) acc(n) = e }
    // newest section first; only the FIRST sighting of an object num counts
    val queue = mutable.Queue[Long](first)
    var guard = 0
    while (queue.nonEmpty && guard < 64) {
      guard += 1
      val off = queue.dequeue()
      if (off >= 0 && off < bytes.length && visited.add(off)) {
        val (trailerOpt, entries) = parseXrefSection(bytes, off.toInt)
        trailerOpt match {
          case Some(trailer) =>
            sight(trailer)
            // hybrid (PDF 1.7 §7.5.8.4): the /XRefStm's entries take
            // PRECEDENCE over this classic section's own — merge the
            // stream section first, then the classic entries
            trailer.m.get("XRefStm").collect { case PNum(v)
                if v >= 0 && v < bytes.length && visited.add(v.toLong) =>
              val (stmDict, stmEntries) = parseXrefSection(bytes, v.toInt)
              stmDict.foreach(sight)
              merge(stmEntries)
            }
            merge(entries)
            trailer.m.get("Prev").collect { case PNum(v) => queue.enqueue(v.toLong) }
          case None => merge(entries)
        }
      }
    }
    XrefChain(acc.toMap, encryptRef, id0)
  }

  /** One xref section (classic table or xref stream) at `off`: returns the
    * trailer/stream dict for chaining plus the section's entries in file
    * order (the CALLER merges first-sighting-wins, so hybrid precedence
    * can be decided there).
    */
  private def parseXrefSection(bytes: Array[Byte],
                               off: Int): (Option[PDict], Vector[(Int, XrefEntry)]) = {
    val acc = Vector.newBuilder[(Int, XrefEntry)]
    val p = new Parser(bytes, off)
    p.skipWs()
    if (p.matchesAt("xref")) {
      p.pos += 4
      var done = false
      var guard = 0
      while (!done && guard < 1000000) {
        guard += 1
        p.skipWs()
        if (p.matchesAt("trailer")) {
          p.pos += 7
          val trailer = p.parseValue() match { case d: PDict => Some(d); case _ => None }
          return (trailer, acc.result())
        }
        val start = readAsciiInt(bytes, p.pos)
        if (start < 0) { done = true }
        else {
          p.pos = skipAsciiInt(bytes, p.pos); p.skipWs()
          val count = readAsciiInt(bytes, p.pos)
          if (count < 0 || count > 1000000) { done = true }
          else {
            p.pos = skipAsciiInt(bytes, p.pos)
            var k = 0
            var ok = true
            while (k < count && ok) {
              p.skipWs()
              val o = readAsciiLong(bytes, p.pos)
              p.pos = skipAsciiInt(bytes, p.pos); p.skipWs()
              val g = readAsciiInt(bytes, p.pos)
              p.pos = skipAsciiInt(bytes, p.pos); p.skipWs()
              val flag = if (p.pos < bytes.length) bytes(p.pos).toChar else ' '
              if (o < 0 || g < 0 || (flag != 'n' && flag != 'f')) ok = false
              else {
                p.pos += 1
                val num = start + k
                acc += (num -> (if (flag == 'n') XrefEntry(1, o, g)
                                else XrefEntry(0, 0L, 0)))
                k += 1
              }
            }
            if (!ok) done = true
          }
        }
      }
      (None, acc.result())
    } else {
      // xref STREAM: `N G obj << /Type /XRef ... >> stream`
      val objs = new Objects(Map.empty) // xref-stream dict entries are direct
      p.parseValue(); p.parseValue() // object and generation numbers
      p.skipWs()
      if (!p.matchesAt("obj")) return (None, Vector.empty)
      p.pos += 3
      p.maybeStream(p.parseValue()) match {
        case s: PStream if objs.name(s.dict.m.getOrElse("Type", PNull)).contains("XRef") =>
          decodeStream(s, objs) match {
            case Right(data) =>
              val w = objs.arr(s.dict.m.getOrElse("W", PNull))
                .map(_.flatMap(v => objs.num(v)).map(_.toInt)).getOrElse(Vector.empty)
              if (w.length < 2 || w.exists(x => x < 0 || x > 8)) return (None, Vector.empty)
              val w0 = w(0); val w1 = w(1); val w2 = if (w.length > 2) w(2) else 0
              val rowLen = w0 + w1 + w2
              if (rowLen <= 0) return (None, Vector.empty)
              val size = objs.num(s.dict.m.getOrElse("Size", PNull)).map(_.toInt).getOrElse(0)
              val index: Vector[Int] = objs.arr(s.dict.m.getOrElse("Index", PNull))
                .map(_.flatMap(v => objs.num(v)).map(_.toInt))
                .getOrElse(Vector(0, size))
              var row = 0
              index.grouped(2).foreach {
                case Vector(start, count) =>
                  var k = 0
                  while (k < count && (row + 1) * rowLen <= data.length) {
                    val base = row * rowLen
                    def field(o: Int, len: Int, dflt: Long): Long = {
                      if (len == 0) return dflt
                      var v = 0L; var i = 0
                      while (i < len) { v = (v << 8) | (data(base + o + i) & 0xFF); i += 1 }
                      v
                    }
                    val t = field(0, w0, 1L).toInt // type defaults to 1 when W[0]=0
                    val f2 = field(w0, w1, 0L)
                    val f3 = field(w0 + w1, w2, 0L).toInt
                    val num = start + k
                    if (t >= 0 && t <= 2) acc += (num -> XrefEntry(t, f2, f3))
                    row += 1; k += 1
                  }
                case _ =>
              }
              (Some(s.dict), acc.result())
            case Left(_) => (None, Vector.empty)
          }
        case _ => (None, Vector.empty)
      }
    }
  }

  /** Parse the object whose header sits exactly at `off`; the header's
    * object number must equal `expected` (a mismatch means the xref is
    * stale/corrupt and the body-scan value stands).
    */
  private def parseObjectAt(bytes: Array[Byte], off: Int, expected: Int): Option[PVal] = {
    if (off < 0 || off >= bytes.length) return None
    try {
      val p = new Parser(bytes, off)
      (p.parseValue(), p.parseValue()) match {
        case (PNum(num), PNum(_)) if num == expected.toDouble =>
          p.skipWs()
          if (!p.matchesAt("obj")) None
          else {
            p.pos += 3
            Some(p.maybeStream(p.parseValue()))
          }
        case _ => None
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  private def readAsciiInt(b: Array[Byte], at: Int): Int = {
    var i = at; var v = 0L; var any = false
    while (i < b.length && b(i) >= '0' && b(i) <= '9') {
      v = v * 10 + (b(i) - '0'); any = true
      if (v > Int.MaxValue) return -1
      i += 1
    }
    if (any) v.toInt else -1
  }

  private def readAsciiLong(b: Array[Byte], at: Int): Long = {
    var i = at; var v = 0L; var any = false
    while (i < b.length && b(i) >= '0' && b(i) <= '9') {
      v = v * 10 + (b(i) - '0'); any = true
      if (v > (1L << 60)) return -1L
      i += 1
    }
    if (any) v else -1L
  }

  private def skipAsciiInt(b: Array[Byte], at: Int): Int = {
    var i = at
    while (i < b.length && b(i) >= '0' && b(i) <= '9') i += 1
    i
  }

  private def lastIndexOfKeyword(hay: Array[Byte], needle: String): Int =
    lastIndexOfKeyword(hay, needle, hay.length)

  /** Last occurrence of `needle` strictly before byte position `before`. */
  private def lastIndexOfKeyword(hay: Array[Byte], needle: String, before: Int): Int = {
    val m = needle.length
    var i = math.min(before - 1, hay.length - m)
    while (i >= 0) {
      var j = 0
      var ok = true
      while (ok && j < m) { if (hay(i + j) != needle.charAt(j)) ok = false; j += 1 }
      if (ok) return i
      i -= 1
    }
    -1
  }

  /** Member objects of one object stream: header is N (objnum, offset)
    * integer pairs, bodies start at /First. Malformed entries are skipped,
    * never thrown.
    */
  private def expandObjStm(s: PStream, objs: Objects): Vector[(Int, PVal)] = {
    val out = Vector.newBuilder[(Int, PVal)]
    decodeStream(s, objs) match {
      case Right(data) =>
        val n = objs.num(s.dict.m.getOrElse("N", PNull)).map(_.toInt).getOrElse(0)
        val first = objs.num(s.dict.m.getOrElse("First", PNull)).map(_.toInt).getOrElse(-1)
        if (n > 0 && n <= 100000 && first >= 0 && first <= data.length) {
          val hp = new Parser(data, 0)
          var k = 0
          var ok = true
          while (k < n && ok) {
            (hp.parseValue(), hp.parseValue()) match {
              case (PNum(objNum), PNum(off)) if objNum >= 0 && off >= 0 &&
                  first + off.toInt < data.length =>
                try {
                  val p = new Parser(data, first + off.toInt)
                  out += (objNum.toInt -> p.parseValue())
                } catch { case _: Exception => /* skip malformed member */ }
              case _ => ok = false
            }
            k += 1
          }
        }
      case Left(_) => // undecodable container: members stay missing
    }
    out.result()
  }

  /** One pass over the raw bytes collecting `N G obj` bodies, plus the
    * header offset each surviving object was parsed at (for xref-offset
    * short-circuiting in [[parseAll]]) and its generation number (the
    * per-object decryption key input).
    */
  private def scanObjects(bytes: Array[Byte])
      : (mutable.Map[Int, PVal], mutable.Map[Int, Int], mutable.Map[Int, Int]) = {
    val out = mutable.Map.empty[Int, PVal]
    val offs = mutable.Map.empty[Int, Int]
    val gens = mutable.Map.empty[Int, Int]
    val n = bytes.length
    var i = 0
    while (i + 3 <= n) {
      // find "obj" preceded by two integers
      if (bytes(i) == 'o' && i + 2 < n && bytes(i + 1) == 'b' && bytes(i + 2) == 'j' &&
          (i + 3 >= n || !isRegular(bytes(i + 3) & 0xFF))) {
        // walk back: ws, gen int, ws, num int
        var j = i - 1
        while (j >= 0 && isWs(bytes(j) & 0xFF)) j -= 1
        val genEnd = j + 1
        while (j >= 0 && bytes(j) >= '0' && bytes(j) <= '9') j -= 1
        val genStart = j + 1
        if (genEnd > genStart) {
          while (j >= 0 && isWs(bytes(j) & 0xFF)) j -= 1
          val numEnd = j + 1
          while (j >= 0 && bytes(j) >= '0' && bytes(j) <= '9') j -= 1
          val numStart = j + 1
          val boundaryOk = j < 0 || isWs(bytes(j) & 0xFF) || isDelim(bytes(j) & 0xFF)
          if (numEnd > numStart && boundaryOk) {
            val objNum = parseIntAscii(bytes, numStart, numEnd)
            val p = new Parser(bytes, i + 3)
            try {
              val v = p.parseValue()
              val v2 = p.maybeStream(v)
              if (objNum >= 0) {
                out(objNum) = v2; offs(objNum) = numStart
                gens(objNum) = math.max(0, parseIntAscii(bytes, genStart, genEnd))
              }
            } catch { case _: Exception => /* skip malformed object */ }
          }
        }
      }
      i += 1
    }
    (out, offs, gens)
  }

  private def parseIntAscii(b: Array[Byte], s: Int, e: Int): Int = {
    var v = 0L
    var i = s
    while (i < e) { v = v * 10 + (b(i) - '0'); if (v > Int.MaxValue) return -1; i += 1 }
    v.toInt
  }

  /** Recursive-descent parser for one value starting at `pos`. */
  final class Parser(bytes: Array[Byte], var pos: Int) {
    private val n = bytes.length

    // reusable scratch for string parsing (replaces a ByteArrayOutputStream
    // per string token — strings are the most numerous allocation on the
    // content-stream hot path). Lazily sized; strings complete before the
    // next token starts, so serial reuse is safe even under dict nesting.
    private var strBuf: Array[Byte] = null
    private var strLen = 0
    @inline private def sput(b: Int): Unit = {
      if (strBuf == null) strBuf = new Array[Byte](64)
      else if (strLen == strBuf.length)
        strBuf = java.util.Arrays.copyOf(strBuf, strLen * 2)
      strBuf(strLen) = b.toByte
      strLen += 1
    }
    @inline private def strTake(): Array[Byte] = {
      val r =
        if (strBuf == null || strLen == 0) Array.emptyByteArray
        else java.util.Arrays.copyOf(strBuf, strLen)
      strLen = 0
      r
    }

    def skipWs(): Unit = {
      var go = true
      while (go && pos < n) {
        val b = bytes(pos) & 0xFF
        if (isWs(b)) pos += 1
        else if (b == '%') { // comment to EOL
          while (pos < n && bytes(pos) != '\n' && bytes(pos) != '\r') pos += 1
        } else go = false
      }
    }

    def parseValue(): PVal = {
      skipWs()
      if (pos >= n) return PNull
      (bytes(pos) & 0xFF) match {
        case '<' =>
          if (pos + 1 < n && bytes(pos + 1) == '<') parseDict()
          else parseHexString()
        case '[' => parseArray()
        case '/' => parseName()
        case '(' => parseLiteralString()
        case c if c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9') =>
          parseNumberOrRef()
        case 't' if matches("true") => pos += 4; PBool(true)
        case 'f' if matches("false") => pos += 5; PBool(false)
        case 'n' if matches("null") => pos += 4; PNull
        case _ => pos += 1; PNull // unknown token byte: skip
      }
    }

    private def matches(s: String): Boolean = {
      if (pos + s.length > n) return false
      var i = 0
      while (i < s.length) { if (bytes(pos + i) != s.charAt(i)) return false; i += 1 }
      true
    }

    /** Keyword lookahead at the current position (xref-section parsing). */
    private[pdf] def matchesAt(s: String): Boolean = matches(s)

    def parseName(): PName = {
      pos += 1 // '/'
      val sb = new java.lang.StringBuilder
      while (pos < n && isRegular(bytes(pos) & 0xFF)) {
        val b = bytes(pos) & 0xFF
        if (b == '#' && pos + 2 < n) {
          val h1 = Character.digit(bytes(pos + 1), 16); val h2 = Character.digit(bytes(pos + 2), 16)
          if (h1 >= 0 && h2 >= 0) { sb.append(((h1 << 4) | h2).toChar); pos += 3 }
          else { sb.append(b.toChar); pos += 1 }
        } else { sb.append(b.toChar); pos += 1 }
      }
      PName(sb.toString)
    }

    private def parseNumberOrRef(): PVal = {
      val start = pos
      if (bytes(pos) == '+' || bytes(pos) == '-') pos += 1
      var isInt = true
      while (pos < n && ((bytes(pos) >= '0' && bytes(pos) <= '9') || bytes(pos) == '.')) {
        if (bytes(pos) == '.') isInt = false
        pos += 1
      }
      val numStr = new String(bytes, start, pos - start, java.nio.charset.StandardCharsets.US_ASCII)
      val value = try numStr.toDouble catch { case _: NumberFormatException => 0.0 }
      if (isInt && value >= 0) {
        // lookahead for "G R"
        val save = pos
        skipWs()
        val genStart = pos
        while (pos < n && bytes(pos) >= '0' && bytes(pos) <= '9') pos += 1
        if (pos > genStart) {
          val gen = parseIntAscii(bytes, genStart, pos)
          skipWs()
          if (pos < n && bytes(pos) == 'R' &&
              (pos + 1 >= n || !isRegular(bytes(pos + 1) & 0xFF))) {
            pos += 1
            return PRef(value.toInt, gen)
          }
        }
        pos = save
      }
      PNum(value)
    }

    def parseArray(): PArr = {
      pos += 1 // '['
      val items = Vector.newBuilder[PVal]
      var guard = 0
      skipWs()
      while (pos < n && bytes(pos) != ']' && guard < 1000000) {
        items += parseValue()
        skipWs()
        guard += 1
      }
      if (pos < n) pos += 1 // ']'
      PArr(items.result())
    }

    def parseDict(): PDict = {
      pos += 2 // '<<'
      val m = Map.newBuilder[String, PVal]
      var done = false
      var guard = 0
      while (!done && pos < n && guard < 1000000) {
        skipWs()
        if (pos + 1 < n && bytes(pos) == '>' && bytes(pos + 1) == '>') { pos += 2; done = true }
        else if (pos < n && bytes(pos) == '/') {
          val k = parseName().v
          val v = parseValue()
          m += (k -> v)
        } else pos += 1 // junk: skip a byte
        guard += 1
      }
      PDict(m.result())
    }

    def parseLiteralString(): PStr = {
      pos += 1 // '('
      var depth = 1
      while (pos < n && depth > 0) {
        val b = bytes(pos) & 0xFF
        if (b == '\\' && pos + 1 < n) {
          val e = bytes(pos + 1) & 0xFF
          e match {
            case 'n' => sput('\n'); pos += 2
            case 'r' => sput('\r'); pos += 2
            case 't' => sput('\t'); pos += 2
            case 'b' => sput('\b'); pos += 2
            case 'f' => sput('\f'); pos += 2
            case '(' => sput('('); pos += 2
            case ')' => sput(')'); pos += 2
            case '\\' => sput('\\'); pos += 2
            case '\r' => // line continuation
              pos += 2; if (pos < n && bytes(pos) == '\n') pos += 1
            case '\n' => pos += 2
            case d if d >= '0' && d <= '7' => // octal, 1-3 digits
              var v = 0; var k = 0; pos += 1
              while (k < 3 && pos < n && bytes(pos) >= '0' && bytes(pos) <= '7') {
                v = v * 8 + (bytes(pos) - '0'); pos += 1; k += 1
              }
              sput(v & 0xFF)
            case _ => sput(e); pos += 2
          }
        } else if (b == '(') { depth += 1; sput(b); pos += 1 }
        else if (b == ')') { depth -= 1; if (depth > 0) sput(b); pos += 1 }
        else { sput(b); pos += 1 }
      }
      PStr(strTake())
    }

    def parseHexString(): PStr = {
      pos += 1 // '<'
      var hi = -1
      var done = false
      while (!done && pos < n) {
        val b = bytes(pos) & 0xFF
        if (b == '>') { pos += 1; done = true }
        else {
          val d = Character.digit(b, 16)
          if (d >= 0) {
            if (hi < 0) hi = d
            else { sput((hi << 4) | d); hi = -1 }
          }
          pos += 1
        }
      }
      if (hi >= 0) sput(hi << 4) // odd digit: pad 0
      PStr(strTake())
    }

    /** If a `stream` keyword follows a dict, attach the payload.
      *
      * A DIRECT sane /Length delimits the payload EXACTLY (verified by the
      * `endstream` keyword following it, so a stale /Length from a broken
      * writer falls through): this is the spec rule (ISO 32000-1 §7.3.8.2)
      * and the only correct one for payloads whose final bytes happen to BE
      * EOL bytes — ciphertext, Flate/JPEG tails — which the search path's
      * trailing-EOL strip would otherwise truncate. Indirect/absent/broken
      * /Length falls back to the `endstream` search with at-most-one-EOL
      * strip (robustness baseline; scope note in object doc).
      */
    def maybeStream(v: PVal): PVal = v match {
      case d: PDict =>
        val save = pos
        skipWs()
        if (matches("stream")) {
          pos += 6
          if (pos < n && bytes(pos) == '\r') pos += 1
          if (pos < n && bytes(pos) == '\n') pos += 1
          val dataStart = pos
          d.m.get("Length") match {
            case Some(PNum(l)) if l >= 0 && l <= n - dataStart && {
                // accept only if `endstream` follows (after optional EOL)
                var q = dataStart + l.toInt
                if (q < n && bytes(q) == '\r') q += 1
                if (q < n && bytes(q) == '\n') q += 1
                q + 9 <= n && matchesKeywordAt(q, "endstream")
              } =>
              val raw = java.util.Arrays.copyOfRange(bytes, dataStart, dataStart + l.toInt)
              pos = indexOf(bytes, "endstream", dataStart + l.toInt) + 9
              PStream(d, raw)
            case _ =>
              val end = indexOf(bytes, "endstream", dataStart)
              val dataEnd0 = if (end < 0) n else end
              // strip at most one trailing EOL
              var dataEnd = dataEnd0
              if (dataEnd > dataStart && bytes(dataEnd - 1) == '\n') dataEnd -= 1
              if (dataEnd > dataStart && bytes(dataEnd - 1) == '\r') dataEnd -= 1
              val raw = java.util.Arrays.copyOfRange(bytes, dataStart, math.max(dataEnd, dataStart))
              pos = if (end < 0) n else end + 9
              PStream(d, raw)
          }
        } else { pos = save; d }
      case other => other
    }

    private def matchesKeywordAt(at: Int, s: String): Boolean = {
      if (at < 0 || at + s.length > n) return false
      var i = 0
      while (i < s.length) { if (bytes(at + i) != s.charAt(i)) return false; i += 1 }
      true
    }
  }

  private def indexOf(hay: Array[Byte], needle: String, from: Int): Int = {
    val m = needle.length
    var i = math.max(from, 0)
    while (i + m <= hay.length) {
      var j = 0
      var ok = true
      while (ok && j < m) { if (hay(i + j) != needle.charAt(j)) ok = false; j += 1 }
      if (ok) return i
      i += 1
    }
    -1
  }

  /** Resolved filter-chain names of a stream (empty = unfiltered). */
  def filterNames(s: PStream, objs: Objects): Vector[String] =
    objs.resolve(s.dict.m.getOrElse("Filter", PNull)) match {
      case PName(f) => Vector(f)
      case PArr(fs) => fs.flatMap(f => objs.name(f))
      case _ => Vector.empty
    }

  /** Stream payload bytes, honoring /Length when it is a resolvable sane
    * number (the scan-delimited raw can over-read up to `endstream`).
    */
  def rawData(s: PStream, objs: Objects): Array[Byte] = {
    var data = s.raw
    objs.num(s.dict.m.getOrElse("Length", PNull)).foreach { len =>
      val l = len.toInt
      if (l >= 0 && l <= s.raw.length) data = java.util.Arrays.copyOfRange(s.raw, 0, l)
    }
    data
  }

  /** Apply the stream's filter chain. Supported: none, FlateDecode.
    * Returns Left(filterName) on an unsupported filter.
    */
  def decodeStream(s: PStream, objs: Objects): Either[String, Array[Byte]] = {
    val filters: Vector[String] = filterNames(s, objs)
    val data = rawData(s, objs)
    // /DecodeParms: a dict applies to a single filter; an ARRAY is
    // filter-parallel (one entry per /Filter, entries may be null), so each
    // fold step gets its index-matched dict — e.g. in
    // [/ASCII85Decode /FlateDecode] only the second entry carries a
    // Predictor. EarlyChange for LZW, PNG predictors (10-15) for Flate/LZW.
    val parmsPerFilter: Int => Option[PDict] =
      objs.resolve(s.dict.m.getOrElse("DecodeParms",
        s.dict.m.getOrElse("DP", PNull))) match {
        case d: PDict => _ => Some(d)
        case PArr(items) => i => items.lift(i).flatMap(objs.dict)
        case _ => _ => None
      }
    def parm(pd: Option[PDict], key: String, dflt: Int): Int =
      pd.flatMap(d => objs.num(d.m.getOrElse(key, PNull))).map(_.toInt).getOrElse(dflt)
    filters.zipWithIndex.foldLeft[Either[String, Array[Byte]]](Right(data)) {
      case (Right(d), (f, idx)) =>
        val pd = parmsPerFilter(idx)
        def depredict(x: Array[Byte]): Either[String, Array[Byte]] = {
          val pred = parm(pd, "Predictor", 1)
          if (pred >= 10)
            pngDepredict(x, parm(pd, "Columns", 1), parm(pd, "Colors", 1),
              parm(pd, "BitsPerComponent", 8))
          else if (pred == 2)
            tiffDepredict(x, parm(pd, "Columns", 1), parm(pd, "Colors", 1),
              parm(pd, "BitsPerComponent", 8))
          else Right(x) // predictor 1 = none
        }
        f match {
          case "FlateDecode" => inflate(d).flatMap(depredict)
          case "ASCIIHexDecode" => asciiHexDecode(d)
          case "ASCII85Decode" => ascii85Decode(d)
          case "LZWDecode" => lzwDecode(d, parm(pd, "EarlyChange", 1)).flatMap(depredict)
          case "RunLengthDecode" => runLengthDecode(d)
          case other => Left(s"unsupported_filter:$other")
        }
      case (l, _) => l
    }
  }

  /** Undo TIFF predictor 2 (PDF 1.7 §7.4.4.3): horizontal differencing —
    * each byte-aligned component adds its left neighbor, rows independent.
    * Only bpc = 8 differencing is supported (the form seen in PDF streams);
    * other depths pass through unchanged (never corrupt what we cannot
    * reverse).
    */
  def tiffDepredict(data: Array[Byte], columns: Int, colors: Int,
                    bpc: Int): Either[String, Array[Byte]] = {
    if (bpc != 8) return Right(data)
    val rowLen = math.max(1, columns * colors)
    val out = data.clone()
    var row = 0
    while (row * rowLen < out.length) {
      val start = row * rowLen
      val end = math.min(start + rowLen, out.length)
      var i = start + colors
      while (i < end) {
        out(i) = ((out(i) & 0xFF) + (out(i - colors) & 0xFF)).toByte
        i += 1
      }
      row += 1
    }
    Right(out)
  }

  /** Undo PNG row filters (predictors 10-15, PDF 1.7 §7.4.4.4 / RFC 2083):
    * each row is one filter-type byte (0 none, 1 sub, 2 up, 3 average,
    * 4 paeth) followed by `ceil(columns × colors × bpc / 8)` bytes — rows
    * are byte-aligned per RFC 2083, so bpc<8 with non-byte-aligned widths
    * (Columns=10, bpc=1 → 2 bytes) must round UP or every subsequent row
    * depredicts against the wrong prior bytes. A ragged final row is
    * processed to its actual length.
    */
  def pngDepredict(data: Array[Byte], columns: Int, colors: Int,
                   bpc: Int): Either[String, Array[Byte]] = {
    val rowLen = math.max(1, (columns * colors * bpc + 7) / 8)
    val bpp = math.max(1, colors * bpc / 8) // bytes per pixel (left distance)
    if (data.isEmpty) return Right(data)
    val out = new java.io.ByteArrayOutputStream(data.length)
    val prior = new Array[Byte](rowLen) // zero row above the first
    val cur = new Array[Byte](rowLen)
    var pos = 0
    while (pos < data.length) {
      val ft = data(pos) & 0xFF
      pos += 1
      val len = math.min(rowLen, data.length - pos)
      if (len <= 0) return Right(out.toByteArray)
      java.util.Arrays.fill(cur, 0.toByte)
      System.arraycopy(data, pos, cur, 0, len)
      pos += len
      var i = 0
      while (i < len) {
        val left = if (i >= bpp) cur(i - bpp) & 0xFF else 0
        val up = prior(i) & 0xFF
        val upLeft = if (i >= bpp) prior(i - bpp) & 0xFF else 0
        val raw = cur(i) & 0xFF
        val v = ft match {
          case 0 => raw
          case 1 => raw + left
          case 2 => raw + up
          case 3 => raw + ((left + up) / 2)
          case 4 =>
            val p = left + up - upLeft
            val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - upLeft)
            raw + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else upLeft)
          case _ => return Left(s"png_bad_filter:$ft")
        }
        cur(i) = (v & 0xFF).toByte
        i += 1
      }
      out.write(cur, 0, len)
      System.arraycopy(cur, 0, prior, 0, rowLen)
    }
    Right(out.toByteArray)
  }

  /** PDF 1.7 §7.4.4 LZW: MSB-first variable-width codes 9→12 bits,
    * 256 = clear table, 257 = EOD; with EarlyChange (default 1) the code
    * width grows one code early. No predictor support (xref-stream
    * concern); missing EOD just ends at input exhaustion.
    */
  def lzwDecode(data: Array[Byte], earlyChange: Int = 1): Either[String, Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(data.length * 3)
    val dict = new Array[Array[Byte]](4096)
    var i = 0
    while (i < 256) { dict(i) = Array(i.toByte); i += 1 }
    var dictSize = 258
    var width = 9
    var buf = 0L
    var bits = 0
    var prev: Array[Byte] = null
    var pos = 0
    val n = data.length
    while (pos < n || bits >= width) {
      if (bits < width) {
        buf = (buf << 8) | (data(pos) & 0xFF); bits += 8; pos += 1
      } else {
        val code = ((buf >>> (bits - width)) & ((1 << width) - 1)).toInt
        bits -= width
        if (code == 256) {
          dictSize = 258; width = 9; prev = null
          java.util.Arrays.fill(dict.asInstanceOf[Array[AnyRef]], 258, 4096, null)
        } else if (code == 257) {
          return Right(out.toByteArray)
        } else {
          val entry: Array[Byte] =
            if (code < 4096 && dict(code) != null) dict(code)
            else if (code == dictSize && prev != null) prev :+ prev(0)
            else return Left("lzw_bad_code")
          out.write(entry, 0, entry.length)
          if (prev != null && dictSize < 4096) { dict(dictSize) = prev :+ entry(0); dictSize += 1 }
          if (dictSize + earlyChange >= (1 << width) && width < 12) width += 1
          prev = entry
        }
      }
    }
    Right(out.toByteArray)
  }

  /** PDF 1.7 §7.4.2: hex pairs, whitespace ignored, `>` is EOD, odd final
    * digit pads with 0.
    */
  def asciiHexDecode(data: Array[Byte]): Either[String, Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 1)
    var hi = -1
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val b = data(i) & 0xFF
      if (b == '>') done = true
      else if (!isWs(b)) {
        val d = Character.digit(b, 16)
        if (d < 0) return Left("asciihex_bad_digit")
        if (hi < 0) hi = d else { out.write((hi << 4) | d); hi = -1 }
      }
      i += 1
    }
    if (hi >= 0) out.write(hi << 4)
    Right(out.toByteArray)
  }

  /** PDF 1.7 §7.4.3: base-85 groups of 5 chars → 4 bytes, `z` = four zero
    * bytes, `~>` is EOD, partial final group keeps n-1 bytes.
    */
  def ascii85Decode(data: Array[Byte]): Either[String, Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(data.length * 4 / 5 + 4)
    val group = new Array[Int](5)
    var k = 0
    var i = 0
    var done = false
    def flush(n: Int): Unit = {
      // pad missing chars with 'u' (84), emit n-1 bytes
      var v = 0L
      var j = 0
      while (j < 5) { v = v * 85 + (if (j < n) group(j) else 84); j += 1 }
      val bs = Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
        ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
      out.write(bs, 0, n - 1)
    }
    while (i < data.length && !done) {
      val b = data(i) & 0xFF
      if (b == '~') done = true
      else if (b == 'z' && k == 0) out.write(Array[Byte](0, 0, 0, 0), 0, 4)
      else if (!isWs(b)) {
        if (b < '!' || b > 'u') return Left("ascii85_bad_char")
        group(k) = b - '!'
        k += 1
        if (k == 5) { flush(5); k = 0 }
      }
      i += 1
    }
    if (k == 1) return Left("ascii85_truncated_group")
    if (k > 1) flush(k)
    Right(out.toByteArray)
  }

  /** PDF text string (PDF 1.7 §7.9.2.2) → Unicode: a FE FF BOM marks
    * UTF-16BE (how Acrobat/Word write every non-ASCII /Info value), an
    * EF BB BF BOM marks UTF-8 (PDF 2.0 §7.9.2.2.1); everything else is
    * PDFDocEncoding — Latin-1 except the 0x18–0x1F accent modifiers and
    * the 0x80–0xA0 publishing block (Annex D.3: bullets, daggers, smart
    * quotes, ligatures, Euro at 0xA0), mapped here so a PDFDocEncoding
    * title's smart punctuation doesn't surface as C1 control bytes.
    */
  def textString(b: Array[Byte]): String = {
    if (b.length >= 2 && b(0) == 0xFE.toByte && b(1) == 0xFF.toByte)
      new String(b, 2, b.length - 2, java.nio.charset.StandardCharsets.UTF_16BE)
    else if (b.length >= 3 && b(0) == 0xEF.toByte && b(1) == 0xBB.toByte &&
             b(2) == 0xBF.toByte)
      new String(b, 3, b.length - 3, java.nio.charset.StandardCharsets.UTF_8)
    else {
      val sb = new java.lang.StringBuilder(b.length)
      var i = 0
      while (i < b.length) {
        val c = b(i) & 0xFF
        val mapped = PdfDocEncodingHigh.getOrElse(c, c.toChar)
        sb.append(mapped)
        i += 1
      }
      sb.toString
    }
  }

  /** PDFDocEncoding codes that differ from Latin-1 (PDF 1.7 Annex D.3). */
  private val PdfDocEncodingHigh: Map[Int, Char] = Map(
    0x18 -> '˘', 0x19 -> 'ˇ', 0x1A -> 'ˆ', 0x1B -> '˙',
    0x1C -> '˝', 0x1D -> '˛', 0x1E -> '˚', 0x1F -> '˜',
    0x80 -> '•', 0x81 -> '†', 0x82 -> '‡', 0x83 -> '…',
    0x84 -> '—', 0x85 -> '–', 0x86 -> 'ƒ', 0x87 -> '⁄',
    0x88 -> '‹', 0x89 -> '›', 0x8A -> '−', 0x8B -> '‰',
    0x8C -> '„', 0x8D -> '“', 0x8E -> '”', 0x8F -> '‘',
    0x90 -> '’', 0x91 -> '‚', 0x92 -> '™', 0x93 -> 'ﬁ',
    0x94 -> 'ﬂ', 0x95 -> 'Ł', 0x96 -> 'Œ', 0x97 -> 'Š',
    0x98 -> 'Ÿ', 0x99 -> 'Ž', 0x9A -> 'ı', 0x9B -> 'ł',
    0x9C -> 'œ', 0x9D -> 'š', 0x9E -> 'ž', 0xA0 -> '€')

  /** PDF 1.7 §7.4.5 RunLengthDecode: length byte L ∈ [0,127] copies the
    * next L+1 bytes literally; L ∈ [129,255] repeats the next byte
    * 257−L times; L = 128 is EOD. A run that would read past the input is
    * truncation → typed error (never emit a partial row silently).
    */
  def runLengthDecode(data: Array[Byte]): Either[String, Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(data.length * 2)
    var i = 0
    while (i < data.length) {
      val l = data(i) & 0xFF
      if (l == 128) return Right(out.toByteArray) // EOD
      else if (l < 128) {
        if (i + 1 + l + 1 > data.length) return Left("rle_truncated_literal")
        out.write(data, i + 1, l + 1)
        i += l + 2
      } else {
        if (i + 1 >= data.length) return Left("rle_truncated_run")
        val b = data(i + 1)
        var n = 257 - l
        while (n > 0) { out.write(b); n -= 1 }
        i += 2
      }
    }
    Right(out.toByteArray) // missing EOD tolerated (common in the wild)
  }

  // per-thread Inflater + copy buffer: a PDF doc inflates several streams
  // (xref/ObjStm/content/raster) and `new Inflater()` allocates native zlib
  // state each time — reset() returns the SAME state to pristine for the
  // next stream at a fraction of create+end. One native handle per pooled
  // executor thread, never per call.
  private val inflaterLocal: ThreadLocal[java.util.zip.Inflater] =
    ThreadLocal.withInitial(() => new java.util.zip.Inflater())
  private val inflateBuf: ThreadLocal[Array[Byte]] =
    ThreadLocal.withInitial(() => new Array[Byte](8192))

  def inflate(data: Array[Byte]): Either[String, Array[Byte]] = {
    val inf = inflaterLocal.get
    try {
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(math.max(data.length * 4, 1024))
      val buf = inflateBuf.get
      var guard = 0
      while (!inf.finished() && guard < 100000) {
        val k = inf.inflate(buf)
        if (k > 0) out.write(buf, 0, k)
        else if (inf.needsInput() || inf.needsDictionary()) guard = 100000 // truncated
        guard += 1
      }
      if (out.size() == 0 && data.nonEmpty) Left("flate_decode_failed")
      else Right(out.toByteArray)
    } catch {
      case _: Exception => Left("flate_decode_failed")
    } finally inf.reset()
  }
}
