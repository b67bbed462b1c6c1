package graft.tools

import graft.pdf.MiniPdf

/** Micro-benchmark for the encrypted-extraction overhead: ms/doc by
  * security-handler variant vs the plaintext build. Guides (and then
  * verifies) the key-derivation memo — run before/after a kernel change:
  *   sbt -batch "Test/runMain graft.tools.CryptBench"
  */
object CryptBench {
  private val Content = Seq("BT /F1 12 Tf 72 720 Td (Hello crypt bench) Tj ET")

  private def time(label: String, pdf: Array[Byte], n: Int = 2000): Unit = {
    (1 to 200).foreach(_ => graft.pdf.PdfExtractor.extract(pdf))
    val t0 = System.nanoTime()
    (1 to n).foreach(_ => graft.pdf.PdfExtractor.extract(pdf))
    println(f"$label%-10s ${(System.nanoTime() - t0) / 1e6 / n}%.4f ms/doc")
  }

  def main(args: Array[String]): Unit = {
    time("plain", MiniPdf.build(Content))
    time("rc4-128", MiniPdf.buildEncrypted(Content, "rc4-128"))
    time("aesv2", MiniPdf.buildEncrypted(Content, "aesv2"))
    time("aesv3", MiniPdf.buildEncrypted(Content, "aesv3"))
    time("locked", MiniPdf.buildEncrypted(Content, "aesv3", userPw = "pw-x"))
  }
}
