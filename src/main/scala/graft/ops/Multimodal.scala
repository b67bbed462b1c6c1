package graft.ops

import java.nio.charset.StandardCharsets
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.util.control.NonFatal

/** Multimodal column plumbing: image/audio/video as opaque `BINARY` columns
  * with typed metadata, processed in batched per-partition passes.
  *
  * Codec reality (by kind):
  *  - image: REAL — payloads are PNG bytes; decode/resize run through
  *    `javax.imageio` (PNG/BMP/GIF/JPEG ship in the JDK), features derive
  *    from actual decoded pixels;
  *  - audio: REAL — payloads are RIFF/PCM WAV; decode runs through
  *    `javax.sound.sampled`, features derive from actual PCM samples;
  *  - video: REAL frame decode — payloads are an MJPEG-style container
  *    (`GMJ1` magic, length-prefixed PNG frames); frame sampling picks
  *    evenly-spaced frame INDICES, each sampled frame decodes through the
  *    image path, features average real per-frame histograms. Only the
  *    container format is synthetic (no mp4 demuxer in the JDK — an
  *    FFM-bound ffmpeg swaps in at `decodeVideoFrames` alone).
  *
  * Undecodable payloads degrade to `fakeDecode` (byte statistics), never
  * throw — the batch loop is total.
  */
object Multimodal {

  final case class AssetMeta(kind: String, width: Int, height: Int,
                             duration_ms: Int, format: String)
  final case class Asset(doc_id: Long, kind: String, payload: Array[Byte],
                         width: Int, height: Int, duration_ms: Int, format: String)
  /** `features` is the L1-normalized histogram (the training-pipeline
    * feature vector); `hist` carries the RAW integer bin counts the
    * normalization divided away — pure integer functions of the decoded
    * pixels/samples, which is what the DuckDB oracle re-derives (floats
    * would compare on formatting, counts compare exactly).
    */
  final case class AssetFeatures(doc_id: Long, kind: String, byte_len: Int,
                                 features: Array[Double], frames_sampled: Int,
                                 width: Int, height: Int, hist: Array[Long])

  val SampleRate = 8000
  val FrameW = 16
  val FrameH = 12

  /** Per-thread ImageIO scratch: cached PNG reader instance.
    * `ImageIO.read` re-instantiates a plugin and re-scans the registry on
    * every call — across hundreds of thousands of small assets that setup
    * dominates the pixel work itself (the assets are 16–40 px tiles). The
    * reader fast path applies only to payloads carrying the PNG magic;
    * anything else falls back to the auto-detecting generic path, so
    * behavior on non-PNG bytes (BMP/GIF/JPEG or garbage) is unchanged.
    */
  private final class IoScratch {
    val reader: javax.imageio.ImageReader = {
      val it = javax.imageio.ImageIO.getImageReadersByFormatName("png")
      if (it.hasNext) it.next() else null
    }
  }
  private val ioScratch: ThreadLocal[IoScratch] =
    ThreadLocal.withInitial(() => new IoScratch)

  private def isPng(b: Array[Byte]): Boolean =
    b.length > 8 && b(0) == 0x89.toByte && b(1) == 0x50 && b(2) == 0x4E && b(3) == 0x47

  /** `ImageIO.read` with the cached PNG reader on the magic-gated fast
    * path (throws on undecodable input like the generic path can — every
    * caller already catches).
    */
  private def readImage(payload: Array[Byte]): java.awt.image.BufferedImage = {
    val r = ioScratch.get.reader
    if (r != null && isPng(payload)) {
      // MemoryCacheImageInputStream directly: ImageIO.createImageInputStream
      // defaults to a DISK-backed cache stream (one temp file per decode —
      // pure I/O overhead for payloads already in memory)
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try { r.setInput(iis); r.read(0) } finally { r.setInput(null); iis.close() }
    } else javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
  }

  /** Minimal RGB8 PNG encoder: color type 2, bit depth 8, filter None,
    * STORED-deflate zlib blocks. The ImageIO writer spends its time on the
    * adaptive per-scanline filter search and an LZ77 pass that win nothing
    * on these tile-sized pseudo-random assets (≤ 40×28; splitmix64 pixels
    * are incompressible), and the decode side inflates stored blocks as a
    * straight copy. PNG is lossless regardless of deflate strategy, so
    * decoded PIXELS — the only thing any declared output derives from —
    * are bit-identical; payload bytes differ, which is why byte_len is
    * deliberately absent from m01 (encoder-dependent).
    */
  private def encodePngRgb(pix: Array[Int], w: Int, h: Int): Array[Byte] = {
    val stride = 3 * w + 1
    val raw = new Array[Byte](stride * h)
    var p = 0; var i = 0; var y = 0
    while (y < h) {
      raw(p) = 0 // filter: None
      p += 1
      var x = 0
      while (x < w) {
        val v = pix(i); i += 1
        raw(p) = ((v >> 16) & 0xFF).toByte
        raw(p + 1) = ((v >> 8) & 0xFF).toByte
        raw(p + 2) = (v & 0xFF).toByte
        p += 3; x += 1
      }
      y += 1
    }
    val defl = new java.util.zip.Deflater(java.util.zip.Deflater.NO_COMPRESSION)
    defl.setInput(raw); defl.finish()
    val idat = new Array[Byte](raw.length + raw.length / 65535 * 5 + 32)
    var n = 0
    while (!defl.finished()) n += defl.deflate(idat, n, idat.length - n)
    defl.end()
    val out = java.nio.ByteBuffer.allocate(8 + 25 + (12 + n) + 12)
    out.putLong(0x89504E470D0A1A0AL) // PNG signature
    val crc = new java.util.zip.CRC32
    def chunk(tag: String, data: Array[Byte], len: Int): Unit = {
      out.putInt(len)
      val t = tag.getBytes(StandardCharsets.US_ASCII)
      out.put(t); out.put(data, 0, len)
      crc.reset(); crc.update(t); crc.update(data, 0, len)
      out.putInt(crc.getValue.toInt)
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(w).putInt(h).put(8.toByte).put(2.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte)
    chunk("IHDR", ihdr.array(), 13)
    chunk("IDAT", idat, n)
    chunk("IEND", Array.emptyByteArray, 0)
    out.array()
  }

  /** PNG-encode a BufferedImage (resize path): bulk-read the pixels, then
    * [[encodePngRgb]].
    */
  private def writePng(img: java.awt.image.BufferedImage): Array[Byte] =
    encodePngRgb(img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth),
      img.getWidth, img.getHeight)

  /** Deterministic synthetic assets derived from doc ids (no external data):
    * kind rotates image/audio/video; image payloads are real PNGs, audio
    * payloads real PCM WAVs, video payloads GMJ1 containers of real
    * length-prefixed PNG frames — stable across runs, machines and
    * partitionings.
    */
  def synthesize(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    // Dedup.widen: a single-split documents scan would otherwise synthesize
    // (and force every downstream decode of) all assets in ONE task; only
    // the 8-byte ids shuffle. Payloads are a pure function of the id —
    // partitioning-invariant (spec-asserted).
    Dedup.widen(documents.select(col("doc_id").cast("long")))
      .as[Long].mapPartitions(_.map { id =>
      (id % 3) match {
        case 0 =>
          val w = 16 + (id % 4).toInt * 8
          val h = 12 + (id % 3).toInt * 8
          Asset(id, "image", synthesizeImage(id, w, h), w, h, 0, "png")
        case 1 =>
          val n = 400 + (Dedup.splitmix64(id) & 0x3FFL).toInt // samples
          Asset(id, "audio", synthesizeWav(id, n), 0, 0,
            n * 1000 / SampleRate, "wav")
        case _ =>
          val nFrames = 4 + (Dedup.splitmix64(id) & 0x7L).toInt
          Asset(id, "video", synthesizeVideo(id, nFrames), FrameW, FrameH,
            2000 + (id % 30).toInt * 1000, "gmj")
      }
    }).toDF()
  }

  /** Deterministic RGB PNG: pixel (x, y) colored by splitmix64(id, x, y). */
  def synthesizeImage(id: Long, w: Int, h: Int): Array[Byte] =
    pngOf(id * 1000003L, w, h)

  /** PNG whose pixel (x, y) is splitmix64(seedBase + y*131 + x) & 0xFFFFFF.
    * Pixels are synthesized straight into the encoder's int array — no
    * BufferedImage, no per-pixel setRGB color-model round trip.
    */
  private def pngOf(seedBase: Long, w: Int, h: Int): Array[Byte] = {
    val pix = new Array[Int](w * h)
    var y = 0; var i = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        pix(i) = (Dedup.splitmix64(seedBase + y.toLong * 131L + x) & 0xFFFFFF).toInt
        i += 1; x += 1
      }
      y += 1
    }
    encodePngRgb(pix, w, h)
  }

  /** MJPEG-style container of REAL PNG frames: `GMJ1` magic, then per frame
    * a 4-byte big-endian length + the PNG bytes. Frame f's pixel (x, y) is
    * splitmix64(id*7919 + f*100003 + y*131 + x) — the generator contract the
    * m01/m02 oracles re-derive in SQL.
    */
  def synthesizeVideo(id: Long, nFrames: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write('G'); bos.write('M'); bos.write('J'); bos.write('1')
    var f = 0
    while (f < nFrames) {
      val png = pngOf(id * 7919L + f.toLong * 100003L, FrameW, FrameH)
      bos.write((png.length >> 24) & 0xFF); bos.write((png.length >> 16) & 0xFF)
      bos.write((png.length >> 8) & 0xFF); bos.write(png.length & 0xFF)
      bos.write(png, 0, png.length)
      f += 1
    }
    bos.toByteArray
  }

  /** Split a GMJ1 container into its frame payloads. None when the bytes
    * are not a well-formed container (truncated lengths, bad magic).
    */
  def decodeVideoFrames(payload: Array[Byte]): Option[Vector[Array[Byte]]] = {
    if (payload.length < 4 || payload(0) != 'G' || payload(1) != 'M' ||
        payload(2) != 'J' || payload(3) != '1') return None
    val frames = Vector.newBuilder[Array[Byte]]
    var off = 4
    while (off < payload.length) {
      if (off + 4 > payload.length) return None
      val len = ((payload(off) & 0xFF) << 24) | ((payload(off + 1) & 0xFF) << 16) |
        ((payload(off + 2) & 0xFF) << 8) | (payload(off + 3) & 0xFF)
      if (len < 0 || off + 4 + len > payload.length) return None
      frames += java.util.Arrays.copyOfRange(payload, off + 4, off + 4 + len)
      off += 4 + len
    }
    Some(frames.result())
  }

  /** Evenly-spaced frame indices (floor(total*k/n)), the real sampling
    * shape: a 2h video at n=4 decodes 4 frames, never the whole stream.
    */
  def sampleFrameIndices(total: Int, n: Int): Seq[Int] =
    if (total <= 0 || n <= 0) Nil
    else (0 until math.min(n, total)).map(k => (total.toLong * k / math.min(n, total)).toInt)

  /** Deterministic mono 16-bit PCM WAV at [[SampleRate]]. */
  def synthesizeWav(id: Long, samples: Int): Array[Byte] = {
    val dataLen = samples * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes); out.putInt(36 + dataLen); out.put("WAVE".getBytes)
    out.put("fmt ".getBytes); out.putInt(16)
    out.putShort(1); out.putShort(1) // PCM, mono
    out.putInt(SampleRate); out.putInt(SampleRate * 2)
    out.putShort(2); out.putShort(16) // block align, bits
    out.put("data".getBytes); out.putInt(dataLen)
    var i = 0
    while (i < samples) {
      out.putShort((Dedup.splitmix64(id * 999983L + i) & 0xFFFFL).toShort)
      i += 1
    }
    out.array()
  }

  /** Decoded raw-count result: dimensions + 16 integer histogram bins. */
  final case class Decoded(width: Int, height: Int, hist: Array[Long])

  /** REAL image decode (javax.imageio): 16-bin luminance histogram (raw
    * counts) over the decoded pixels. None when the bytes are not an image.
    */
  def decodeImageCounts(payload: Array[Byte]): Option[Decoded] = {
    try {
      val img = readImage(payload)
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
      else {
        val bins = new Array[Long](16)
        val w = img.getWidth; val h = img.getHeight
        // one bulk getRGB: same per-pixel values as the scalar call, minus
        // the per-call bounds/color-model dispatch overhead
        val pix = img.getRGB(0, 0, w, h, null, 0, w)
        var i = 0
        while (i < pix.length) {
          val rgb = pix(i)
          val lum = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
            (rgb & 0xFF) * 114) / 1000
          bins(lum >> 4) += 1L
          i += 1
        }
        Some(Decoded(w, h, bins))
      }
    } catch { case NonFatal(_) => None }
  }

  /** L1-normalized luminance histogram (feature-vector view). */
  def decodeImage(payload: Array[Byte]): Option[Array[Double]] =
    decodeImageCounts(payload).map(d => normalize(d.hist))

  /** REAL audio decode (javax.sound.sampled): 16-bin histogram (raw counts)
    * over the signed 16-bit sample range. None when not decodable.
    */
  def decodeAudioCounts(payload: Array[Byte]): Option[Decoded] = {
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16) return None
        val bytes = ais.readAllBytes()
        val le = !fmt.isBigEndian
        val n = bytes.length / 2
        if (n == 0) return None
        val bins = new Array[Long](16)
        var i = 0
        while (i < n) {
          val lo = bytes(2 * i) & 0xFF
          val hi = bytes(2 * i + 1) & 0xFF
          val s = (if (le) (hi << 8) | lo else (lo << 8) | hi).toShort.toInt
          bins((s + 32768) >> 12) += 1L
          i += 1
        }
        Some(Decoded(0, 0, bins))
      } finally ais.close()
    } catch { case NonFatal(_) => None }
  }

  def decodeAudio(payload: Array[Byte]): Option[Array[Double]] =
    decodeAudioCounts(payload).map(d => normalize(d.hist))

  /** REAL video features: split the container, sample `nSample` evenly-
    * spaced frame indices, decode each sampled frame through the image
    * path, SUM the per-frame luminance counts. None when the container or
    * any sampled frame fails to decode.
    */
  def decodeVideoCounts(payload: Array[Byte], nSample: Int = 4): Option[(Int, Decoded)] = {
    decodeVideoFrames(payload).flatMap { frames =>
      val idx = sampleFrameIndices(frames.length, nSample)
      if (idx.isEmpty) return None
      val acc = new Array[Long](16)
      var w = 0; var h = 0
      idx.foreach { i =>
        decodeImageCounts(frames(i)) match {
          case Some(d) =>
            w = d.width; h = d.height
            var b = 0
            while (b < 16) { acc(b) += d.hist(b); b += 1 }
          case None => return None
        }
      }
      Some((idx.length, Decoded(w, h, acc)))
    }
  }

  private def normalize(hist: Array[Long]): Array[Double] = {
    var total = 0L
    var b = 0
    while (b < 16) { total += hist(b); b += 1 }
    val t = math.max(total, 1L).toDouble
    val out = new Array[Double](16)
    b = 0
    while (b < 16) { out(b) = hist(b) / t; b += 1 }
    out
  }

  /** FALLBACK for undecodable payloads only: 16-bin byte histogram (raw
    * counts). Every synthesized kind now decodes for real.
    */
  def fakeDecodeCounts(payload: Array[Byte]): Array[Long] = {
    val bins = new Array[Long](16)
    var i = 0
    while (i < payload.length) { bins((payload(i) & 0xFF) >> 4) += 1L; i += 1 }
    bins
  }

  def fakeDecode(payload: Array[Byte]): Array[Double] =
    normalize(fakeDecodeCounts(payload))

  /** Batched feature extraction: one partition = one batch loop, decoder
    * state reusable across rows (the mapInPandas batch shape, JVM-native).
    * ALL three kinds decode for real; `hist` carries raw integer counts
    * (the oracle-checkable form), `features` the normalized view.
    */
  def extractFeatures(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("doc_id"), col("kind"), col("payload")).as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder init happens here (reference analogue:
        // per-process adapter instance, adapter_factory.py:22-35)
        it.map { case (id, kind, payload) =>
          val (framesSampled, decoded) = kind match {
            case "image" => (0, decodeImageCounts(payload))
            case "audio" => (0, decodeAudioCounts(payload))
            case "video" => decodeVideoCounts(payload) match {
              case Some((n, d)) => (n, Some(d))
              case None => (0, None)
            }
            case _ => (0, None)
          }
          val d = decoded.getOrElse(Decoded(0, 0, fakeDecodeCounts(payload)))
          AssetFeatures(id, kind, payload.length, normalize(d.hist), framesSampled,
            d.width, d.height, d.hist)
        }
      }.toDF()
  }

  /** Decode-gated metadata: `n_units` is MEASURED by the decoder (audio:
    * PCM frame count from javax.sound; video: container frame count), never
    * read back from the generator's formulas — the m02 oracle re-derives
    * those formulas in SQL, so a decode regression breaks the match.
    */
  def decodedMeta(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("doc_id"), col("kind"), col("payload"), col("duration_ms"))
      .as[(Long, String, Array[Byte], Int)]
      .mapPartitions(_.map { case (id, kind, payload, durationMs) =>
        val nUnits: Long = kind match {
          case "audio" =>
            try {
              val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
                new java.io.ByteArrayInputStream(payload))
              try ais.getFrameLength finally ais.close()
            } catch { case NonFatal(_) => -1L }
          case "video" => decodeVideoFrames(payload).map(_.length.toLong).getOrElse(-1L)
          case _ => -1L
        }
        (id, kind, durationMs, nUnits)
      })
      .toDF("doc_id", "kind", "duration_ms", "n_units")
  }

  /** Metadata-only resize (clamp to maxW×maxH, keep aspect): the generic
    * path for kinds without a JDK codec.
    */
  def resize(assets: DataFrame, maxW: Int, maxH: Int): DataFrame =
    assets
      .withColumn("scale", least(lit(1.0),
        least(lit(maxW) / greatest(col("width"), lit(1)),
          lit(maxH) / greatest(col("height"), lit(1)))))
      .withColumn("width", (col("width") * col("scale")).cast("int"))
      .withColumn("height", (col("height") * col("scale")).cast("int"))
      .drop("scale")

  /** REAL resize for image payloads: decode → bilinear scale → re-encode
    * PNG; rows whose payload is not a decodable image (or already fits)
    * pass through with metadata-only clamping.
    */
  def resizeImages(assets: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.as[Asset].mapPartitions(_.map { a =>
      if (a.kind != "image") a
      else {
        val decoded =
          try Option(readImage(a.payload))
          catch { case NonFatal(_) => None }
        decoded match {
          case Some(img) if img.getWidth > maxW || img.getHeight > maxH =>
            val scale = math.min(maxW.toDouble / img.getWidth, maxH.toDouble / img.getHeight)
            val nw = math.max(1, (img.getWidth * scale).toInt)
            val nh = math.max(1, (img.getHeight * scale).toInt)
            val outImg = new java.awt.image.BufferedImage(nw, nh,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = outImg.createGraphics()
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, nw, nh, null)
            g.dispose()
            a.copy(payload = writePng(outImg), width = nw, height = nh)
          case Some(img) => a.copy(width = img.getWidth, height = img.getHeight)
          case None => a
        }
      }
    }).toDF()
  }
}
