package graft.tools
import graft.io.SyntheticPages
object Micro {
  def main(args: Array[String]): Unit = {
    // build 2000 payloads locally (no Spark)
    val docs = (0L until 2000L).map { i =>
      SyntheticPages.pageFor(i, ("word" + i + " the quick brown fox jumps over lazy dog ") * 12, "en")
    }
    val htmls = docs.filter(d => !graft.pipeline.Kernel.isPdf(d.payload)).map(_.payload).toArray
    val pdfs = docs.filter(d => graft.pipeline.Kernel.isPdf(d.payload)).map(_.payload).toArray
    val tmx = java.lang.management.ManagementFactory.getThreadMXBean
      .asInstanceOf[com.sun.management.ThreadMXBean]
    val tid = Thread.currentThread.getId
    def bench(tag: String, n: Int)(f: => Unit): Unit = {
      (1 to 3).foreach(_ => f) // warm
      val reps = 5
      var alloc = 0L
      val times = (1 to reps).map { _ =>
        val a0 = tmx.getThreadAllocatedBytes(tid)
        val t0 = System.nanoTime(); f
        val dt = (System.nanoTime() - t0) / 1e6
        alloc = tmx.getThreadAllocatedBytes(tid) - a0
        dt
      }
      println(f"$tag%-22s min=${times.min}%8.1f ms  (${times.min * 1000 / n}%6.1f us/doc, ${alloc / n / 1024.0}%6.1f KB/doc alloc)")
    }
    val scanned = docs.zipWithIndex.collect {
      case (d, i) if SyntheticPages.isScannedDoc(i.toLong) => d.payload }.toArray
    val native = docs.zipWithIndex.collect {
      case (d, i) if graft.pipeline.Kernel.isPdf(d.payload) &&
        !SyntheticPages.isScannedDoc(i.toLong) => d.payload }.toArray
    bench("kernel-html", htmls.length) { htmls.foreach(graft.pipeline.Kernel.extractOne) }
    bench("kernel-pdf", pdfs.length) { pdfs.foreach(graft.pipeline.Kernel.extractOne) }
    bench("kernel-pdf-native", native.length) { native.foreach(graft.pipeline.Kernel.extractOne) }
    bench("kernel-pdf-scanned", scanned.length) { scanned.foreach(graft.pipeline.Kernel.extractOne) }
    bench("charset-only", htmls.length) { htmls.foreach(graft.text.Charsets.decode) }
    val decoded = htmls.map(b => graft.text.Charsets.decode(b)._2)
    bench("tokenize-only", htmls.length) { decoded.foreach(graft.html.Tokenizer.tokenize) }
    val toks = decoded.map(graft.html.Tokenizer.tokenize)
    bench("dom-only", htmls.length) { toks.foreach(graft.html.DomBuilder.build) }
    val doms = toks.map(graft.html.DomBuilder.build)
    bench("blocks-only", htmls.length) { doms.foreach(graft.html.Blocks.segment) }
    val (tab, noTab) = doms.partition(d => graft.html.Blocks.segment(d).tables.nonEmpty)
    bench("blocks-table", tab.length) { tab.foreach(graft.html.Blocks.segment) }
    bench("blocks-notable", noTab.length) { noTab.foreach(graft.html.Blocks.segment) }
  }
}
