package graft.tools

import java.nio.file.{Files, Paths}
import graft.pdf.MiniPdf

/** Test-scope helper: dump fixture payloads to a directory for manual
  * driving of the ExtractPage CLI (`sbt "Test/runMain graft.tools.WriteFixtures /tmp/out"`).
  */
object WriteFixtures {
  def main(args: Array[String]): Unit = {
    val dir = Paths.get(if (args.nonEmpty) args(0) else "/tmp/graft-fixtures")
    Files.createDirectories(dir)
    val pdf = MiniPdf.build(Seq(
      MiniPdf.streamFor(Seq(("Page one body line", 72, 700), ("second line", 72, 680))),
      MiniPdf.streamFor(Seq(("Page two text", 72, 700)))), flate = true)
    Files.write(dir.resolve("two-page-flate.pdf"), pdf)
    val scanned = MiniPdf.build(Seq("q 612 0 0 792 0 0 cm /Im0 Do Q"), withFont = false)
    Files.write(dir.resolve("scanned.pdf"), scanned)
    val bad = "%PDF-1.7\ngarbage".getBytes("ISO-8859-1") ++ Array.fill[Byte](1200)('x')
    Files.write(dir.resolve("broken.pdf"), bad)
    println(s"wrote fixtures to $dir")
  }
}
