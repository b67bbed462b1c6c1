package graft.tools

import java.nio.file.{Files, Paths}
import graft.pdf.MiniPdf

/** Test-scope helper: dump fixture payloads to a directory for manual
  * driving of the ExtractPage CLI (`sbt "Test/runMain graft.tools.WriteFixtures /tmp/out"`).
  */
object WriteFixtures {
  def main(args: Array[String]): Unit = {
    val dir = Paths.get(graft.io.PathGuard.checkWritable(
      if (args.nonEmpty) args(0) else "/tmp/graft-fixtures"))
    Files.createDirectories(dir)
    val pdf = MiniPdf.build(Seq(
      MiniPdf.streamFor(Seq(("Page one body line", 72, 700), ("second line", 72, 680))),
      MiniPdf.streamFor(Seq(("Page two text", 72, 700)))), flate = true)
    Files.write(dir.resolve("two-page-flate.pdf"), pdf)
    val scanned = MiniPdf.build(Seq("q 612 0 0 792 0 0 cm /Im0 Do Q"), withFont = false)
    Files.write(dir.resolve("scanned.pdf"), scanned)
    val ocrBmp = graft.ocr.GlyphRender.render(
      Seq("ESCANEADO 123", "SEGUNDA LINEA"), skew0 = 0.025, noiseSeed = 3L, noisePerGap = 2)
    Files.write(dir.resolve("scanned-ocr.pdf"),
      MiniPdf.buildScanned(ocrBmp.gray, ocrBmp.w, ocrBmp.h))
    val bad = "%PDF-1.7\ngarbage".getBytes("ISO-8859-1") ++ Array.fill[Byte](1200)('x')
    Files.write(dir.resolve("broken.pdf"), bad)
    val type0 = MiniPdf.buildType0(
      Seq(("000100020003", 72, 700)),
      """1 begincodespacerange
        |<0000> <FFFF>
        |endcodespacerange
        |3 beginbfchar
        |<0001> <0048006F><0002> <006C0061>
        |<0003> <0020006D0075006E0064006F>
        |endbfchar""".stripMargin)
    Files.write(dir.resolve("type0-tounicode.pdf"), type0)
    val grid = MiniPdf.build(Seq(
      MiniPdf.streamFor(Seq(("Informe de ventas", 72, 720))) + "\n" +
      MiniPdf.gridStream(Seq(
        Seq("producto", "cantidad", "precio"),
        Seq("tinta", "2", "9.50"),
        Seq("pluma", "10", "1.20")), Seq(72, 220, 360), topY = 700)))
    Files.write(dir.resolve("grid-table.pdf"), grid)
    val objstm = MiniPdf.buildObjStm(
      "BT /F1 12 Tf 72 700 Td (Cuerpo dentro de un object stream comprimido) Tj ET")
    Files.write(dir.resolve("objstm.pdf"), objstm)
    // standard-security-handler fixtures: RC4 and AES empty-user-password
    // documents decrypt; the locked one must refuse typed
    val encPages = Seq(
      MiniPdf.streamFor(Seq(("Documento cifrado RC4", 72, 700))),
      MiniPdf.streamFor(Seq(("segunda pagina cifrada", 72, 700))))
    Files.write(dir.resolve("encrypted-rc4.pdf"),
      MiniPdf.buildEncrypted(encPages, "rc4-128", flate = true))
    Files.write(dir.resolve("encrypted-aes.pdf"),
      MiniPdf.buildEncrypted(encPages, "aesv2", flate = true))
    Files.write(dir.resolve("encrypted-locked.pdf"),
      MiniPdf.buildEncrypted(encPages, "aesv3", userPw = "secret"))
    println(s"wrote fixtures to $dir")
  }
}
