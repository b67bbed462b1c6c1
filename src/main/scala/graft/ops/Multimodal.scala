package graft.ops

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
  *  - video: STUB — no container/codec in the JDK; `fakeDecode` is a
  *    deterministic byte-statistics transform with the signature a real
  *    decoder would have (swap for a JNI/FFM ffmpeg without touching any
  *    pipeline code). Frame SAMPLING offsets are the real shape.
  *
  * Undecodable payloads degrade to `fakeDecode`, never throw — the batch
  * loop is total.
  */
object Multimodal {

  final case class AssetMeta(kind: String, width: Int, height: Int,
                             duration_ms: Int, format: String)
  final case class Asset(doc_id: Long, kind: String, payload: Array[Byte],
                         width: Int, height: Int, duration_ms: Int, format: String)
  final case class AssetFeatures(doc_id: Long, kind: String, byte_len: Int,
                                 features: Array[Double], frames_sampled: Int)

  val SampleRate = 8000

  /** Deterministic synthetic assets derived from doc ids (no external data):
    * kind rotates image/audio/video; image payloads are real PNGs, audio
    * payloads real PCM WAVs, video payloads a splitmix64 byte stream —
    * stable across runs, machines and partitionings.
    */
  def synthesize(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id").cast("long")).as[Long].mapPartitions(_.map { id =>
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
          val len = 256 + (Dedup.splitmix64(id) & 0x3FFL).toInt
          val payload = new Array[Byte](len)
          var i = 0
          var hsh = Dedup.splitmix64(id * 31 + 7)
          while (i < len) {
            payload(i) = (hsh >>> ((i % 8) * 8)).toByte
            if (i % 8 == 7) hsh = Dedup.splitmix64(hsh)
            i += 1
          }
          Asset(id, "video", payload, 1280, 720, 2000 + (id % 30).toInt * 1000, "mp4")
      }
    }).toDF()
  }

  /** Deterministic RGB PNG: pixel (x, y) colored by splitmix64(id, x, y). */
  def synthesizeImage(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = Dedup.splitmix64(id * 1000003L + y.toLong * 131L + x)
        img.setRGB(x, y, (v & 0xFFFFFF).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

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

  /** REAL image decode (javax.imageio): 16-bin luminance histogram over the
    * decoded pixels, L1-normalized. None when the bytes are not an image.
    */
  def decodeImage(payload: Array[Byte]): Option[Array[Double]] = {
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
      else {
        val bins = new Array[Double](16)
        val w = img.getWidth; val h = img.getHeight
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
              (rgb & 0xFF) * 114) / 1000
            bins(lum >> 4) += 1.0
            x += 1
          }
          y += 1
        }
        val total = w.toDouble * h
        var b = 0
        while (b < 16) { bins(b) /= total; b += 1 }
        Some(bins)
      }
    } catch { case NonFatal(_) => None }
  }

  /** REAL audio decode (javax.sound.sampled): 16-bin histogram over the
    * signed 16-bit sample range, L1-normalized. None when not decodable.
    */
  def decodeAudio(payload: Array[Byte]): Option[Array[Double]] = {
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
        val bins = new Array[Double](16)
        var i = 0
        while (i < n) {
          val lo = bytes(2 * i) & 0xFF
          val hi = bytes(2 * i + 1) & 0xFF
          val s = (if (le) (hi << 8) | lo else (lo << 8) | hi).toShort.toInt
          bins((s + 32768) >> 12) += 1.0
          i += 1
        }
        var b = 0
        while (b < 16) { bins(b) /= n; b += 1 }
        Some(bins)
      } finally ais.close()
    } catch { case NonFatal(_) => None }
  }

  /** STUB decode (video kind + undecodable fallback): 16-bin byte histogram,
    * L1-normalized. A real decoder (FFM-bound ffmpeg) replaces ONLY this.
    */
  def fakeDecode(payload: Array[Byte]): Array[Double] = {
    val bins = new Array[Double](16)
    var i = 0
    while (i < payload.length) { bins((payload(i) & 0xFF) >> 4) += 1.0; i += 1 }
    val total = math.max(payload.length, 1).toDouble
    var b = 0
    while (b < 16) { bins(b) /= total; b += 1 }
    bins
  }

  /** Deterministic frame sampling for video payloads: n evenly-spaced
    * 32-byte windows (a real impl samples decoded frames; offsets shape
    * is identical).
    */
  def sampleFrames(payload: Array[Byte], n: Int): Seq[Array[Byte]] = {
    if (payload.isEmpty || n <= 0) return Nil
    (0 until n).map { k =>
      val off = (payload.length.toLong * k / n).toInt
      java.util.Arrays.copyOfRange(payload, off, math.min(off + 32, payload.length))
    }
  }

  /** Batched feature extraction: one partition = one batch loop, decoder
    * state reusable across rows (the mapInPandas batch shape, JVM-native).
    * Image/audio features come from REAL decoded pixels/samples.
    */
  def extractFeatures(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("doc_id"), col("kind"), col("payload")).as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder init happens here (reference analogue:
        // per-process adapter instance, adapter_factory.py:22-35)
        it.map { case (id, kind, payload) =>
          val frames = if (kind == "video") sampleFrames(payload, 4) else Nil
          val base = kind match {
            case "image" => decodeImage(payload).getOrElse(fakeDecode(payload))
            case "audio" => decodeAudio(payload).getOrElse(fakeDecode(payload))
            case _ if frames.nonEmpty =>
              frames.map(fakeDecode).transpose.map(_.sum / frames.length).toArray
            case _ => fakeDecode(payload)
          }
          AssetFeatures(id, kind, payload.length, base, frames.size)
        }
      }.toDF()
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
          try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(a.payload)))
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
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(outImg, "png", bos)
            a.copy(payload = bos.toByteArray, width = nw, height = nh)
          case Some(img) => a.copy(width = img.getWidth, height = img.getHeight)
          case None => a
        }
      }
    }).toDF()
  }
}
