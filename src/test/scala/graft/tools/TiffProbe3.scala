package graft.tools

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream
import graft.pdf.CcittTiff

/** One reader reused across fax shapes: setInput(null) vs reset() hygiene,
  * with and without a destination image.
  */
object TiffProbe3 {
  def main(args: Array[String]): Unit = {
    val w = 13; val h = 9
    val rnd = new java.util.Random(7)
    val gray = Array.fill[Byte](w * h)(if (rnd.nextBoolean()) 0xFF.toByte else 0x00)
    val shapes = Seq(
      ("CCITT T.6", -1, 4, -1), ("CCITT RLE", -1, 2, -1),
      ("CCITT T.4", 0, 3, 0), ("CCITT T.4", 1, 3, 1),
      ("CCITT T.4", 4, 3, 4), ("CCITT T.4", 5, 3, 5))
    for (mode <- Seq("setInputNull", "reset", "resetNoDest")) {
      val r = javax.imageio.ImageIO.getImageReadersByFormatName("tiff").next()
      val dests = scala.collection.mutable.HashMap.empty[(Int, Int, Int), BufferedImage]
      for ((name, t4enc, comp, t4dec) <- shapes) {
        val fax = CcittTiff.encodeCcitt(gray, w, h, name, t4enc)
        val wrapped = CcittTiff.wrapTiff(fax, w, h, comp, t4dec)
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new ByteArrayInputStream(wrapped))
        r.setInput(iis)
        val param = r.getDefaultReadParam
        val types = r.getImageTypes(0)
        val spec = if (types != null && types.hasNext) types.next() else null
        if (mode != "resetNoDest" && spec != null &&
            spec.getBufferedImageType == BufferedImage.TYPE_BYTE_BINARY)
          param.setDestination(dests.getOrElseUpdate(
            (spec.getBufferedImageType, w, h), spec.createBufferedImage(w, h)))
        val img = try Some(r.read(0, param)) catch { case e: Throwable => println(s"  EX $e"); None }
        val ok = img.exists { im =>
          val icm = im.getColorModel.asInstanceOf[java.awt.image.IndexColorModel]
          CcittTiff.unpackBilevel(
            im.getRaster.getDataBuffer.asInstanceOf[java.awt.image.DataBufferByte].getData,
            w, h, whiteWhenSet = (icm.getRed(0) & 0xFF) < 128).exists(_.sameElements(gray))
        }
        println(s"$mode $name t4enc=$t4enc comp=$comp match=$ok")
        if (mode == "setInputNull") r.setInput(null) else r.reset()
        iis.close()
      }
    }
  }
}
