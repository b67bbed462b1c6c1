package graft.tools

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream
import graft.pdf.CcittTiff

/** One-off diagnostic for the TIFF destination-reuse path. */
object TiffProbe {
  def main(args: Array[String]): Unit = {
    val w = 13; val h = 9
    val rnd = new java.util.Random(7)
    val gray = Array.fill[Byte](w * h)(if (rnd.nextBoolean()) 0xFF.toByte else 0x00)
    for ((name, t4) <- Seq(("CCITT T.6", -1), ("CCITT RLE", -1), ("CCITT T.4", 0), ("CCITT T.4", 1))) {
      val fax = CcittTiff.encodeCcitt(gray, w, h, name, t4)
      val comp = name match {
        case "CCITT T.6" => 4
        case "CCITT RLE" => 2
        case _ => 3
      }
      val wrapped = CcittTiff.wrapTiff(fax, w, h, comp, if (comp == 3) (if (t4 > 0) 1 else 0) else -1)
      val it = javax.imageio.ImageIO.getImageReadersByFormatName("tiff")
      val r = it.next()
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(new ByteArrayInputStream(wrapped))
      r.setInput(iis)
      val types = r.getImageTypes(0)
      val spec = if (types != null && types.hasNext) types.next() else null
      println(s"$name t4=$t4 comp=$comp specType=${if (spec == null) "null" else spec.getBufferedImageType}")
      val param = r.getDefaultReadParam
      if (spec != null && spec.getBufferedImageType == BufferedImage.TYPE_BYTE_BINARY)
        param.setDestination(spec.createBufferedImage(w, h))
      val img = try { Right(r.read(0, param)) } catch { case e: Throwable => Left(e.toString) }
      println(s"  withDest: $img")
      img.foreach { im =>
        val back = CcittTiff.unpackBilevel(
          im.getRaster.getDataBuffer.asInstanceOf[java.awt.image.DataBufferByte].getData,
          w, h, whiteWhenSet = {
            val icm = im.getColorModel.asInstanceOf[java.awt.image.IndexColorModel]
            (icm.getRed(0) & 0xFF) < 128
          })
        println(s"  match=${back.exists(_.sameElements(gray))}")
      }
      r.setInput(null); iis.close()
      // fresh decode without destination for comparison
      val img2 = javax.imageio.ImageIO.read(new ByteArrayInputStream(wrapped))
      println(s"  freshDecode null=${img2 == null}" +
        (if (img2 != null) s" type=${img2.getType}" else ""))
    }
  }
}
