package graft.pdf

import java.security.MessageDigest
import javax.crypto.Cipher
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}
import PdfObjects._

/** PDF standard security handler (ISO 32000-1 §7.6.3, 32000-2 §7.6.4) —
  * decryption for the empty-user-password case.
  *
  * The reference's stack decrypts such files transparently (poppler /
  * pdfplumber / PyPDF2 all try the empty user password before failing,
  * which covers the common "owner password only" permissions-restricted
  * class; `pdf_info_adapter.py` reads them without any password prompt), so
  * a corpus diet that refuses every `/Encrypt` document silently drops a
  * real-world slice. Supported: V1 (RC4-40), V2 (RC4 ≤128), V4 crypt
  * filters (/V2 RC4 and /AESV2 AES-128-CBC), V5 R5/R6 (/AESV3
  * AES-256-CBC). A non-empty user password is reported as [[PdfCrypt.Locked]]
  * (typed refuse, never garbage); anything outside this matrix as
  * [[PdfCrypt.Unsupported]].
  *
  * All primitives are in-JDK (MessageDigest MD5/SHA-2, javax.crypto AES);
  * ARCFOUR is implemented inline (public-domain algorithm) rather than via
  * the provider, whose legacy-cipher availability varies.
  */
object PdfCrypt {

  sealed trait Fail
  /** Document requires a (non-empty) password we do not have. */
  case object Locked extends Fail
  /** Encryption scheme outside the supported matrix — payloads stay ciphertext. */
  final case class Unsupported(why: String) extends Fail

  /** 32-byte password pad, ISO 32000-1 Table 21 / Algorithm 2 step a. */
  val Pad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  sealed trait Method
  case object MethodRc4 extends Method
  case object MethodAesV2 extends Method
  case object MethodAesV3 extends Method
  case object MethodIdentity extends Method

  /** Per-document decryptor: per-object keys for RC4/AESV2 (Algorithm 1),
    * the file key directly for AESV3 (Algorithm 1.A).
    */
  final class Decryptor(fileKey: Array[Byte], stmMethod: Method, strMethod: Method,
                        val encryptMetadata: Boolean = true) {
    def decStream(num: Int, gen: Int, data: Array[Byte]): Array[Byte] =
      apply(stmMethod, num, gen, data)
    def decString(num: Int, gen: Int, data: Array[Byte]): Array[Byte] =
      apply(strMethod, num, gen, data)
    private def apply(m: Method, num: Int, gen: Int, data: Array[Byte]): Array[Byte] =
      m match {
        case MethodIdentity => data
        case MethodRc4 => rc4(objectKey(fileKey, num, gen, aes = false), data)
        case MethodAesV2 => aesCbcDecrypt(objectKey(fileKey, num, gen, aes = true), data)
        case MethodAesV3 => aesCbcDecrypt(fileKey, data)
      }
  }

  /** Build a decryptor for a document's /Encrypt dict + first /ID string,
    * trying ONLY the empty user password (the poppler-compatible subset).
    */
  def forDocument(enc: PDict, objs: Objects, id0: Array[Byte]): Either[Fail, Decryptor] = {
    def str(k: String): Array[Byte] = objs.resolve(enc.m.getOrElse(k, PNull)) match {
      case PStr(b) => b
      case _ => Array.emptyByteArray
    }
    def int(k: String, d: Int): Int =
      objs.num(enc.m.getOrElse(k, PNull)).map(_.toInt).getOrElse(d)
    def nm(k: String): String = objs.name(enc.m.getOrElse(k, PNull)).getOrElse("")
    try {
      if (nm("Filter") != "Standard")
        return Left(Unsupported(s"security_handler:${nm("Filter")}"))
      val r = int("R", 0)
      val p = int("P", -1)
      val o = str("O")
      val u = str("U")
      val encryptMetadata = objs.resolve(enc.m.getOrElse("EncryptMetadata", PNull)) match {
        case PBool(b) => b
        case _ => true
      }
      int("V", 0) match {
        case 1 | 2 =>
          val bits = if (int("V", 0) == 1) 40 else int("Length", 40)
          val keyBytes = math.max(5, math.min(16, bits / 8))
          emptyUserFileKey(o, u, p, id0, keyBytes, r, encryptMetadata)
            .map(fk => new Decryptor(fk, MethodRc4, MethodRc4))
        case 4 =>
          val cf = objs.dict(enc.m.getOrElse("CF", PNull))
          def methodOf(fname: String): Either[Fail, Method] =
            if (fname == "Identity") Right(MethodIdentity)
            else cf.flatMap(c => objs.dict(c.m.getOrElse(fname, PNull))) match {
              case Some(fd) =>
                objs.name(fd.m.getOrElse("CFM", PNull)).getOrElse("") match {
                  case "V2" => Right(MethodRc4)
                  case "AESV2" => Right(MethodAesV2)
                  case other => Left(Unsupported(s"cfm:$other"))
                }
              case None => Left(Unsupported(s"missing_crypt_filter:$fname"))
            }
          val stmF = objs.name(enc.m.getOrElse("StmF", PNull)).getOrElse("Identity")
          val strF = objs.name(enc.m.getOrElse("StrF", PNull)).getOrElse("Identity")
          // /Length is bits in the encrypt dict; some writers put bytes in
          // the CF entry — values < 40 are unambiguously bytes
          val lenRaw = int("Length", 128)
          val keyBytes = math.max(5, math.min(16, if (lenRaw >= 40) lenRaw / 8 else lenRaw))
          for {
            sm <- methodOf(stmF)
            tm <- methodOf(strF)
            fk <- emptyUserFileKey(o, u, p, id0, keyBytes, r, encryptMetadata)
          } yield new Decryptor(fk, sm, tm, encryptMetadata)
        case 5 =>
          // R5 (deprecated AESV3 extension) / R6 (PDF 2.0): SHA-2 password
          // check against the validation salt, file key unwrapped from /UE
          if (r != 5 && r != 6) return Left(Unsupported(s"r:$r"))
          v5FileKey(r, u, str("UE"))
            .map(fk => new Decryptor(fk, MethodAesV3, MethodAesV3, encryptMetadata))
        case other => Left(Unsupported(s"v:$other"))
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        Left(Unsupported(s"crypt_error:${e.getClass.getSimpleName}"))
    }
  }

  /** V5 empty-user-password derivation, MEMOIZED on its exact inputs
    * (R, /U, /UE): the R6 hash (Algorithm 2.B) is password-hardening —
    * ~64+ AES+SHA rounds, ~2 ms — deliberately slow so brute force is
    * expensive, and it is a pure function of (password, U-salts, UE). A
    * reader pays it once per distinct security handler: corpora where many
    * documents share one handler (bulk exports, our synthetic corpus)
    * derive once; real-world per-file /ID collections pay once per file,
    * which is the spec-mandated cost. Bounded: the map is cleared past
    * [[V5CacheCap]] entries (~7 MB) so a billion-file executor never pins
    * unbounded memory.
    */
  private val V5CacheCap = 65536
  private val v5Cache =
    new java.util.concurrent.ConcurrentHashMap[String, Either[Fail, Array[Byte]]]()

  private def v5FileKey(r: Int, u: Array[Byte], ue: Array[Byte]): Either[Fail, Array[Byte]] = {
    def hex(b: Array[Byte]) = b.map(x => f"${x & 0xFF}%02x").mkString
    val key = s"$r|${hex(u)}|${hex(ue)}"
    val hit = v5Cache.get(key)
    if (hit != null) return hit
    val computed: Either[Fail, Array[Byte]] =
      if (u.length < 48) Left(Unsupported("bad_u"))
      else {
        val hash = hash2B(Array.emptyByteArray, java.util.Arrays.copyOfRange(u, 32, 40),
          Array.emptyByteArray, r)
        if (!java.util.Arrays.equals(hash, java.util.Arrays.copyOf(u, 32))) Left(Locked)
        else if (ue.length < 32) Left(Unsupported("bad_ue"))
        else {
          val ik = hash2B(Array.emptyByteArray, java.util.Arrays.copyOfRange(u, 40, 48),
            Array.emptyByteArray, r)
          Right(aesCbcNoIv(Cipher.DECRYPT_MODE, ik, java.util.Arrays.copyOf(ue, 32)))
        }
      }
    if (v5Cache.size >= V5CacheCap) v5Cache.clear()
    v5Cache.put(key, computed)
    computed
  }

  /** Algorithms 2 + 4/5/6: derive the file key from the EMPTY user password
    * and accept it only if the recomputed /U matches.
    */
  private def emptyUserFileKey(o: Array[Byte], u: Array[Byte], p: Int, id0: Array[Byte],
                               keyBytes: Int, r: Int,
                               encryptMetadata: Boolean): Either[Fail, Array[Byte]] = {
    if (r < 2 || r > 4) return Left(Unsupported(s"r:$r"))
    if (o.length < 32) return Left(Unsupported("bad_o"))
    val fk = fileKeyR4(Array.emptyByteArray, o, p, id0, keyBytes, r, encryptMetadata)
    val uCalc = computeU(fk, id0, r)
    val n = if (r == 2) 32 else 16
    if (u.length >= n &&
        java.util.Arrays.equals(java.util.Arrays.copyOf(uCalc, n),
          java.util.Arrays.copyOf(u, n))) Right(fk)
    else Left(Locked)
  }

  /** Algorithm 2 (R2–R4): MD5 over padded password ‖ /O ‖ P(le32) ‖ ID[0]
    * (‖ FFFFFFFF when R4 with /EncryptMetadata false), then for R≥3 fifty
    * MD5 rounds over the first `keyBytes` of each digest.
    */
  def fileKeyR4(password: Array[Byte], o: Array[Byte], p: Int, id0: Array[Byte],
                keyBytes: Int, r: Int, encryptMetadata: Boolean): Array[Byte] = {
    val md = MessageDigest.getInstance("MD5")
    md.update(padPassword(password))
    md.update(o, 0, 32)
    md.update(Array((p & 0xFF).toByte, ((p >> 8) & 0xFF).toByte,
      ((p >> 16) & 0xFF).toByte, ((p >>> 24) & 0xFF).toByte))
    md.update(id0)
    if (r >= 4 && !encryptMetadata)
      md.update(Array(0xFF.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte))
    var h = md.digest()
    if (r >= 3) {
      var i = 0
      while (i < 50) {
        val m2 = MessageDigest.getInstance("MD5")
        m2.update(h, 0, keyBytes)
        h = m2.digest()
        i += 1
      }
    }
    java.util.Arrays.copyOf(h, keyBytes)
  }

  /** Algorithm 3 (R2–R4): the /O entry — RC4 of the padded user password
    * under a key derived from the owner password (50 full-width MD5 rounds
    * for R≥3, then 19 xor-variant RC4 passes).
    */
  def computeO(ownerPw: Array[Byte], userPw: Array[Byte], keyBytes: Int, r: Int): Array[Byte] = {
    var h = MessageDigest.getInstance("MD5").digest(padPassword(ownerPw))
    if (r >= 3) {
      var i = 0
      while (i < 50) { h = MessageDigest.getInstance("MD5").digest(h); i += 1 }
    }
    val key = java.util.Arrays.copyOf(h, keyBytes)
    var o = rc4(key, padPassword(userPw))
    if (r >= 3) {
      var i = 1
      while (i <= 19) {
        o = rc4(key.map(b => (b ^ i).toByte), o)
        i += 1
      }
    }
    o
  }

  /** Algorithms 4 (R2) / 5 (R3–R4): the /U entry for a file key. R≥3 output
    * is 16 significant bytes padded to 32 (padding bytes are arbitrary per
    * spec; zeros here).
    */
  def computeU(fileKey: Array[Byte], id0: Array[Byte], r: Int): Array[Byte] = {
    if (r == 2) rc4(fileKey, Pad)
    else {
      val md = MessageDigest.getInstance("MD5")
      md.update(Pad)
      md.update(id0)
      var u = rc4(fileKey, md.digest())
      var i = 1
      while (i <= 19) {
        u = rc4(fileKey.map(b => (b ^ i).toByte), u)
        i += 1
      }
      u ++ new Array[Byte](16)
    }
  }

  /** Algorithm 2.B (R6) / plain SHA-256 (R5): the iterated password hash.
    * R6 loops AES-128-CBC over (pwd ‖ K ‖ udata)×64 with a digest chosen by
    * the first-16-byte sum mod 3, until ≥64 rounds AND the last cipher byte
    * ≤ rounds−32 (the shape pdf.js/mupdf implement).
    */
  def hash2B(password: Array[Byte], salt: Array[Byte], udata: Array[Byte], r: Int): Array[Byte] = {
    val first = MessageDigest.getInstance("SHA-256")
    first.update(password)
    first.update(salt)
    first.update(udata)
    var k = first.digest()
    if (r == 5) return k
    var rounds = 0
    var lastE = 256
    // one Cipher instance re-init'd per round: getInstance is a provider
    // lookup (~µs + allocation) that would otherwise run 64+ times
    val c = Cipher.getInstance("AES/CBC/NoPadding")
    while (rounds < 64 || lastE > rounds - 32) {
      val block = new Array[Byte](password.length + k.length + udata.length)
      System.arraycopy(password, 0, block, 0, password.length)
      System.arraycopy(k, 0, block, password.length, k.length)
      System.arraycopy(udata, 0, block, password.length + k.length, udata.length)
      val k1 = new Array[Byte](block.length * 64)
      var i = 0
      while (i < 64) {
        System.arraycopy(block, 0, k1, i * block.length, block.length)
        i += 1
      }
      c.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(k, 0, 16, "AES"),
        new IvParameterSpec(k, 16, 16))
      val e = c.doFinal(k1)
      var sum = 0
      i = 0
      while (i < 16) { sum += e(i) & 0xFF; i += 1 }
      val alg = (sum % 3) match {
        case 0 => "SHA-256"
        case 1 => "SHA-384"
        case _ => "SHA-512"
      }
      k = MessageDigest.getInstance(alg).digest(e)
      lastE = e(e.length - 1) & 0xFF
      rounds += 1
    }
    java.util.Arrays.copyOf(k, 32)
  }

  /** Algorithm 1 per-object key: MD5(fileKey ‖ num(le24) ‖ gen(le16)
    * [‖ "sAlT" for AESV2]), truncated to min(len+5, 16).
    */
  def objectKey(fileKey: Array[Byte], num: Int, gen: Int, aes: Boolean): Array[Byte] = {
    val md = MessageDigest.getInstance("MD5")
    md.update(fileKey)
    md.update(Array((num & 0xFF).toByte, ((num >> 8) & 0xFF).toByte,
      ((num >> 16) & 0xFF).toByte, (gen & 0xFF).toByte, ((gen >> 8) & 0xFF).toByte))
    if (aes) md.update(Array(0x73.toByte, 0x41.toByte, 0x6C.toByte, 0x54.toByte))
    java.util.Arrays.copyOf(md.digest(), math.min(fileKey.length + 5, 16))
  }

  /** ARCFOUR (symmetric). */
  def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = new Array[Int](256)
    var i = 0
    while (i < 256) { s(i) = i; i += 1 }
    var j = 0
    i = 0
    while (i < 256) {
      j = (j + s(i) + (key(i % key.length) & 0xFF)) & 0xFF
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    var x = 0
    var y = 0
    var k = 0
    while (k < data.length) {
      x = (x + 1) & 0xFF
      y = (y + s(x)) & 0xFF
      val t = s(x); s(x) = s(y); s(y) = t
      out(k) = (data(k) ^ s((s(x) + s(y)) & 0xFF)).toByte
      k += 1
    }
    out
  }

  /** AES-CBC with leading IV, PKCS#7 padding stripped leniently (a bad pad
    * byte keeps the full block rather than throwing — degrade, don't die).
    */
  def aesCbcDecrypt(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    if (data.length <= 16 || (data.length - 16) % 16 != 0) return Array.emptyByteArray
    val c = Cipher.getInstance("AES/CBC/NoPadding")
    c.init(Cipher.DECRYPT_MODE, new SecretKeySpec(key, "AES"), new IvParameterSpec(data, 0, 16))
    val plain = c.doFinal(data, 16, data.length - 16)
    val pad = plain(plain.length - 1) & 0xFF
    if (pad >= 1 && pad <= 16 && pad <= plain.length)
      java.util.Arrays.copyOf(plain, plain.length - pad)
    else plain
  }

  /** AES-CBC encrypt with an explicit IV prepended to the output and PKCS#7
    * padding applied (fixture writer; the IV is caller-chosen so output
    * stays deterministic).
    */
  def aesCbcEncrypt(key: Array[Byte], iv: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val padLen = 16 - (data.length % 16)
    val padded = java.util.Arrays.copyOf(data, data.length + padLen)
    java.util.Arrays.fill(padded, data.length, padded.length, padLen.toByte)
    val c = Cipher.getInstance("AES/CBC/NoPadding")
    c.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(key, "AES"), new IvParameterSpec(iv))
    iv ++ c.doFinal(padded)
  }

  /** Raw AES-CBC with a zero IV and no padding (the /UE//OE 32-byte key
    * wrap, Algorithm 8/9 step b).
    */
  def aesCbcNoIv(mode: Int, key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val c = Cipher.getInstance("AES/CBC/NoPadding")
    c.init(mode, new SecretKeySpec(key, "AES"), new IvParameterSpec(new Array[Byte](16)))
    c.doFinal(data)
  }

  private def padPassword(pw: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](32)
    val n = math.min(32, pw.length)
    System.arraycopy(pw, 0, out, 0, n)
    System.arraycopy(Pad, 0, out, n, 32 - n)
    out
  }
}
