package graft.tools

import graft.pdf.CcittTiff

/** Sequential decodes through the cached reader, as OcrSpec drives them. */
object TiffProbe2 {
  def main(args: Array[String]): Unit = {
    val w = 13; val h = 9
    val rnd = new java.util.Random(7)
    val gray = Array.fill[Byte](w * h)(if (rnd.nextBoolean()) 0xFF.toByte else 0x00)
    val shapes = Seq(
      ("CCITT T.6", -1, 4, -1),
      ("CCITT RLE", -1, 2, -1),
      ("CCITT T.4", 0, 3, 0),
      ("CCITT T.4", 1, 3, 1),
      ("CCITT T.4", 4, 3, 4),
      ("CCITT T.4", 5, 3, 5))
    for (round <- 1 to 2; (name, t4enc, comp, t4dec) <- shapes) {
      val fax = CcittTiff.encodeCcitt(gray, w, h, name, t4enc)
      val back = CcittTiff.decodeCcittGray(fax, w, h, comp, t4dec)
      println(s"round=$round $name t4enc=$t4enc comp=$comp " +
        s"decoded=${back.isDefined} match=${back.exists(_.sameElements(gray))} faxLen=${fax.length}")
    }
  }
}
