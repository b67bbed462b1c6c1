package graft.tools

import graft.io.SyntheticPages

/** One-off allocation decomposition for Blocks.segment (dev aid, not a spec). */
object AllocProbe {
  def main(args: Array[String]): Unit = {
    val doc = SyntheticPages.pageFor(1L,
      ("word1 the quick brown fox jumps over lazy dog ") * 12, "en")
    val (_, text) = graft.text.Charsets.decode(doc.payload)
    val toks = graft.html.Tokenizer.tokenize(text)
    val dom = graft.html.DomBuilder.build(toks)
    val seg = graft.html.Blocks.segment(dom)
    println(s"toks=${toks.length} blocks=${seg.blocks.length} " +
      s"pieces~textNodes tables=${seg.tables.length} " +
      s"normChars=${seg.blocks.map(_.text.length).sum} srcChars=${text.length}")
    val tmx = java.lang.management.ManagementFactory.getThreadMXBean
      .asInstanceOf[com.sun.management.ThreadMXBean]
    val tid = Thread.currentThread.getId
    def probe(tag: String)(f: => Any): Unit = {
      (1 to 2000).foreach(_ => f)
      val n = 4000
      val a0 = tmx.getThreadAllocatedBytes(tid)
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => f)
      val dt = (System.nanoTime() - t0) / 1e3 / n
      val da = (tmx.getThreadAllocatedBytes(tid) - a0).toDouble / n
      println(f"$tag%-18s ${dt}%7.2f us  ${da / 1024}%7.2f KB")
    }
    probe("segment")(graft.html.Blocks.segment(dom))
    probe("stream-segment")(graft.html.StreamSegmenter.segment(text))
    probe("tokenize")(graft.html.Tokenizer.tokenize(text))
    probe("dom")(graft.html.DomBuilder.build(toks))
    probe("decode")(graft.text.Charsets.decode(doc.payload))
    // native-PDF stage split: plain vs flate vs Type0-composite vs table page
    Seq(9L -> "pdf-plain", 19L -> "pdf-flate?", 29L -> "pdf-type0",
        59L -> "pdf-type0b", 49L -> "pdf-other").foreach { case (id, tag) =>
      val d = SyntheticPages.pageFor(id,
        ("word the quick brown fox jumps over lazy dog " * 12), "en")
      if (graft.pipeline.Kernel.isPdf(d.payload)) {
        probe(s"$tag-kernel")(graft.pipeline.Kernel.extractOne(d.payload))
        probe(s"$tag-objs")(graft.pdf.PdfObjects.parseAll(d.payload))
        probe(s"$tag-full")(graft.pdf.PdfExtractor.extract(d.payload))
        // stage split inside extract: content decode, fonts, tokenize+run
        val objs = graft.pdf.PdfObjects.parseAll(d.payload)
        val pages = graft.pdf.PdfExtractor.findPages(objs)
        val contents = pages.map(p =>
          graft.pdf.PdfExtractor.contentBytes(p, objs).getOrElse(Array.empty[Byte]))
        val fonts = pages.map(p => graft.pdf.FontDecode.fontsFor(p, objs))
        probe(s"$tag-content")(pages.map(p =>
          graft.pdf.PdfExtractor.contentBytes(p, objs)))
        probe(s"$tag-fonts")(pages.map(p => graft.pdf.FontDecode.fontsFor(p, objs)))
        probe(s"$tag-csrun")(contents.zip(fonts).map { case (c, f) =>
          graft.pdf.ContentStream.run(c, f) })
        val opsPerPage = contents.zip(fonts).map { case (c, f) =>
          graft.pdf.ContentStream.run(c, f) }
        probe(s"$tag-layout")(opsPerPage.map(o =>
          graft.pdf.SpanLayout.layoutPage(0, o.spans, 0)))
        probe(s"$tag-tables")(opsPerPage.map { o =>
          val ruled = graft.pdf.RuleGrid.detect(o.rules, o.spans)
          graft.pdf.TableGrid.detect(o.spans)
          ruled.length
        })
      }
    }
  }
}
