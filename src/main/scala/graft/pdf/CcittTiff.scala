package graft.pdf

import java.awt.image.{BufferedImage, DataBufferByte}
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO, ImageTypeSpecifier, ImageWriteParam}

/** CCITT Group 4 (ITU-T T.6) and Group 3 (ITU-T T.4) raster codec for
  * `/CCITTFaxDecode` image XObjects — with DCTDecode the other filter real
  * scanned PDFs embed (bilevel fax-class scans; the reference hands these
  * to pdf2image, `ocr_adapters.py:62`).
  *
  * Strategy: no hand-transcribed T.4/T.6 run-length tables. A fax stream
  * is wrapped in a minimal single-strip TIFF container in memory and
  * decoded by the JDK's own TIFF ImageIO plugin (present since Java 9,
  * CCITT RLE/T.4/T.6 codecs included) — the MH/MR/MMR tables come from the
  * JDK, so interop matches a production decoder rather than a
  * self-consistent reimplementation. Encoding (fixtures) runs the same
  * plugin in reverse and extracts the strip bytes back out of the
  * container.
  *
  * Fax shape ↔ TIFF tag mapping (PDF 1.7 §7.4.6 → TIFF 6.0 §11):
  *  - K < 0  (pure 2-D G4)            → Compression 4, no T4Options;
  *  - K = 0  (1-D MH, byte-aligned,
  *            no EOLs)                → Compression 2 ("CCITT RLE");
  *  - K = 0  with EOL codes           → Compression 3, T4Options bit 0
  *            (+ fill bits if aligned)   clear (0 or 4);
  *  - K > 0  (mixed 2-D with EOLs)    → Compression 3, T4Options bit 0
  *                                       set (1 or 5).
  * The one inexpressible shape is K = 0 without EOLs AND without byte
  * alignment (TIFF Compression 2 requires row alignment) — it degrades to
  * no-OCR upstream. Total: every failure returns None, never throws.
  */
object CcittTiff {

  /** Minimal little-endian single-strip TIFF wrapping a raw fax stream.
    * `t4Options` (TIFF tag 292) is written only when ≥ 0 — required for
    * Compression 3 to tell 1-D (bit 0 clear) from 2-D (bit 0 set) and
    * whether EOLs carry fill bits (bit 2).
    */
  def wrapTiff(fax: Array[Byte], w: Int, h: Int, compression: Int = 4,
               t4Options: Int = -1): Array[Byte] = {
    val bos = new ByteArrayOutputStream(fax.length + 160)
    def le16(v: Int): Unit = { bos.write(v & 0xFF); bos.write((v >> 8) & 0xFF) }
    def le32(v: Int): Unit = { le16(v & 0xFFFF); le16((v >>> 16) & 0xFFFF) }
    val nTags = if (t4Options >= 0) 10 else 9
    val stripOff = 8 + 2 + nTags * 12 + 4
    bos.write('I'); bos.write('I'); le16(42); le32(8)
    le16(nTags)
    // ids ascending; SHORT(3) packs left-justified in the LE value field,
    // so le32 writes both SHORT and LONG(4) values correctly
    def tag(id: Int, typ: Int, value: Int): Unit = { le16(id); le16(typ); le32(1); le32(value) }
    tag(256, 4, w)            // ImageWidth
    tag(257, 4, h)            // ImageLength
    tag(258, 3, 1)            // BitsPerSample
    tag(259, 3, compression)  // 2 = CCITT RLE, 3 = T.4, 4 = T.6
    tag(262, 3, 0)            // Photometric = WhiteIsZero (the CCITT norm)
    tag(273, 4, stripOff)     // StripOffsets
    tag(277, 3, 1)            // SamplesPerPixel
    tag(278, 4, h)            // RowsPerStrip (single strip)
    tag(279, 4, fax.length)   // StripByteCounts
    if (t4Options >= 0) tag(292, 4, t4Options) // T4Options (id stays ascending)
    le32(0)                   // no next IFD
    bos.write(fax, 0, fax.length)
    bos.toByteArray
  }

  /** G4 stream → luminance (the pre-G3 entry point, kept for callers and
    * fixtures that are G4-specific).
    */
  def decodeG4Gray(g4: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
    decodeCcittGray(g4, w, h, compression = 4, t4Options = -1)

  /** Per-thread TIFF decode scratch: one cached reader plus reusable
    * destination images keyed by (type, w, h) — the same shape as the JPEG
    * path's JpegScratch (PdfExtractor). `ImageIO.read` re-scans the plugin
    * registry AND spools the stream through a disk-backed cache file on
    * every call, and without a destination the decoder allocates a fresh
    * packed raster per page — the ImageIO-internal strip allocation named
    * as the G3/G4 route's residual churn in BENCH/ATTRIBUTION_r5.md.
    */
  private final class TiffScratch {
    val reader: javax.imageio.ImageReader = {
      val it = ImageIO.getImageReadersByFormatName("tiff")
      if (it.hasNext) it.next() else null
    }
    val dests = scala.collection.mutable.HashMap
      .empty[(Int, Int, Int), BufferedImage]
  }
  private val tiffScratch: ThreadLocal[TiffScratch] =
    ThreadLocal.withInitial(() => new TiffScratch)

  /** Fax stream → 8-bit luminance (white 0xFF / black 0x00), or None on any
    * decode failure or dimension mismatch. The codec works in white/black
    * RUNS, so the result is true luminance independent of the PDF
    * `/BlackIs1` packed-bit convention (callers invert for BlackIs1=true).
    */
  def decodeCcittGray(fax: Array[Byte], w: Int, h: Int, compression: Int,
                      t4Options: Int, dest: Array[Byte] = null): Option[Array[Byte]] = {
    try {
      val wrapped = wrapTiff(fax, w, h, compression, t4Options)
      val ts = tiffScratch.get
      val img =
        if (ts.reader == null) ImageIO.read(new ByteArrayInputStream(wrapped))
        else {
          val r = ts.reader
          val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
            new ByteArrayInputStream(wrapped))
          try {
            r.setInput(iis)
            val param = r.getDefaultReadParam
            val types = r.getImageTypes(0)
            val spec = if (types != null && types.hasNext) types.next() else null
            if (spec != null &&
                spec.getBufferedImageType == BufferedImage.TYPE_BYTE_BINARY) {
              if (ts.dests.size > 8) ts.dests.clear() // bound retained rasters
              val d = ts.dests.getOrElseUpdate(
                (spec.getBufferedImageType, w, h), spec.createBufferedImage(w, h))
              // fax decoders FILL BLACK RUNS into an assumed-white canvas
              // rather than writing every bit (G4 happens to overwrite
              // fully; RLE and 2-D T.4 do not — measured stale-bit bleed
              // through a reused destination), so restore the fresh-image
              // invariant: zero the packed raster (photometric WhiteIsZero
              // ⇒ all-white), exactly what a new BufferedImage starts as
              java.util.Arrays.fill(
                d.getRaster.getDataBuffer.asInstanceOf[DataBufferByte].getData,
                0.toByte)
              param.setDestination(d)
            }
            try r.read(0, param)
            catch {
              case scala.util.control.NonFatal(_) if param.getDestination != null =>
                // defensive: a destination the decoder rejects — decode
                // fresh (prior behavior) rather than degrade the page
                param.setDestination(null)
                val iis2 = new javax.imageio.stream.MemoryCacheImageInputStream(
                  new ByteArrayInputStream(wrapped))
                try { r.setInput(iis2); r.read(0, param) } finally iis2.close()
            }
          } finally { r.setInput(null); iis.close() }
        }
      if (img == null || img.getWidth != w || img.getHeight != h) return None
      // fast path: unpack the decoder's packed-bit buffer directly (the
      // Graphics2D conversion allocates and runs a ColorModel loop); the
      // index color model tells us which bit value is white
      img.getColorModel match {
        case icm: java.awt.image.IndexColorModel
          if img.getType == BufferedImage.TYPE_BYTE_BINARY && icm.getMapSize >= 2 =>
          val d = img.getRaster.getDataBuffer.asInstanceOf[DataBufferByte].getData
          val white0 = (icm.getRed(0) & 0xFF) >= 128
          unpackBilevel(d, w, h, whiteWhenSet = !white0, dest = dest)
        case _ =>
          val gray = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
          val g = gray.createGraphics()
          g.drawImage(img, 0, 0, null)
          g.dispose()
          Some(gray.getRaster.getDataBuffer.asInstanceOf[DataBufferByte].getData)
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Packed 1-bit rows (MSB-first, byte-aligned per row) → 8-bit luminance.
    * `whiteWhenSet`: a 1 bit is white (0xFF); else a 0 bit is white. The
    * single unpack loop shared by the G4 fast path and the PDF 1-bit /
    * ImageMask raster path — stride/bit-order fixes land in one place.
    */
  def unpackBilevel(packed: Array[Byte], w: Int, h: Int,
                    whiteWhenSet: Boolean,
                    dest: Array[Byte] = null): Option[Array[Byte]] = {
    val stride = (w + 7) / 8
    if (packed.length < stride.toLong * h) return None
    // `dest` (reused scratch) is fully overwritten on [0, w*h)
    val out = if (dest != null && dest.length >= w * h) dest
              else new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val bit = (packed(y * stride + (x >> 3)) >> (7 - (x & 7))) & 1
        out(y * w + x) =
          if ((bit == 1) == whiteWhenSet) 0xFF.toByte else 0x00.toByte
        x += 1
      }
      y += 1
    }
    Some(out)
  }

  def encodeG4(gray: Array[Byte], w: Int, h: Int): Array[Byte] =
    encodeCcitt(gray, w, h, "CCITT T.6")

  /** Fixture encoder, any fax flavor: `compressionType` is the JDK TIFF
    * writer's name ("CCITT T.6" = G4, "CCITT RLE" = G3 1-D byte-aligned
    * MH without EOLs, "CCITT T.4" = G3 with EOLs — 2-D by writer default,
    * `t4Options` ≥ 0 overrides, e.g. 0 for 1-D or 4 for 1-D+fill).
    */
  def encodeCcitt(gray: Array[Byte], w: Int, h: Int, compressionType: String,
                  t4Options: Int = -1): Array[Byte] = {
    val bin = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_BINARY)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val white = (gray(y * w + x) & 0xFF) >= 128
        bin.setRGB(x, y, if (white) 0xFFFFFF else 0)
        x += 1
      }
      y += 1
    }
    val writer = ImageIO.getImageWritersByFormatName("tiff").next()
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionType(compressionType)
    import javax.imageio.plugins.tiff._
    val meta = writer.getDefaultImageMetadata(
      ImageTypeSpecifier.createFromRenderedImage(bin), p)
    val dir = TIFFDirectory.createFromMetadata(meta)
    val base = BaselineTIFFTagSet.getInstance
    dir.addTIFFField(new TIFFField(
      base.getTag(BaselineTIFFTagSet.TAG_ROWS_PER_STRIP),
      TIFFTag.TIFF_LONG, 1, Array[Long](h.toLong)))
    if (t4Options >= 0)
      dir.addTIFFField(new TIFFField(
        base.getTag(BaselineTIFFTagSet.TAG_T4_OPTIONS),
        TIFFTag.TIFF_LONG, 1, Array[Long](t4Options.toLong)))
    val bos = new ByteArrayOutputStream()
    // in-memory output stream: createImageOutputStream defaults to a
    // disk-backed cache file per encode
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new IIOImage(bin, null, dir.getAsMetadata), p)
    writer.dispose()
    ios.flush() // MemoryCacheImageOutputStream does NOT flush on close
    ios.close()
    extractSingleStrip(bos.toByteArray)
  }

  /** Pull the (single) strip back out of a TIFF we just wrote. Reads only
    * our own writer's output; supports both byte orders and SHORT/LONG
    * offset fields. Throws on a multi-strip layout — that is a fixture
    * bug, not an input condition.
    */
  private def extractSingleStrip(tiff: Array[Byte]): Array[Byte] = {
    val le = tiff(0) == 'I'
    def u16(o: Int): Int =
      if (le) (tiff(o) & 0xFF) | ((tiff(o + 1) & 0xFF) << 8)
      else ((tiff(o) & 0xFF) << 8) | (tiff(o + 1) & 0xFF)
    def u32(o: Int): Int =
      if (le) u16(o) | (u16(o + 2) << 16) else (u16(o) << 16) | u16(o + 2)
    val ifd = u32(4)
    val n = u16(ifd)
    var off = -1L
    var len = -1L
    var i = 0
    while (i < n) {
      val e = ifd + 2 + i * 12
      val id = u16(e)
      val t = u16(e + 2)
      val count = u32(e + 4)
      require(id != 273 && id != 279 || count == 1,
        s"multi-strip TIFF (tag $id count $count)")
      val value = if (t == 3) u16(e + 8) else u32(e + 8)
      if (id == 273) off = value.toLong
      if (id == 279) len = value.toLong
      i += 1
    }
    require(off >= 0 && len >= 0, "strip tags missing")
    java.util.Arrays.copyOfRange(tiff, off.toInt, (off + len).toInt)
  }
}
