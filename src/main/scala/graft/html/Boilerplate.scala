package graft.html

import graft.text.Charsets
import Blocks._

/** Boilerplate classification + the HTML main-content extraction facade
  * (SURVEY.md E10/E11/E12; Boilerpipe WSDM'10 / jusText 2011 style block
  * classification, per BASELINE.json north_star).
  *
  * Frozen rule set (deterministic, integer math — SURVEY §7.5.2):
  *   R1 drop blocks inside `nav|header|footer|aside` containers;
  *   R2 drop blocks whose normalized text is empty;
  *   R3 drop blocks with link density > 1/3 (i.e. `3*linkChars > textChars`
  *      over non-whitespace chars — jusText's max_link_density spirit,
  *      `bp-link-density` fixture: an 80%-anchor paragraph drops, 5% keeps).
  *
  * Main text = kept block texts joined with `"\n\n"` — the reference's page
  * assembly contract (ocr_adapters.py:73; domain/models/document.py:16-21).
  *
  * Confidence (E12 — the reference's is a stub pinned at 0.0,
  * ocr/tesseract_adapter.py:23,56-58; we implement it for real): 100 × kept
  * non-ws chars / total non-ws chars, 0.0 when the page has no text at all.
  */
object Boilerplate {

  final case class Span(page: Int, off: Int, len: Int)

  final case class HtmlExtract(
    text: String,
    charset: String,
    spans: Vector[Span],
    tables: Vector[TableData],
    confidence: Double,
    blocksTotal: Int,
    blocksKept: Int,
    title: String)

  def keep(b: Block): Boolean =
    !b.inBoiler && b.text.nonEmpty && 3L * b.linkChars <= b.textChars

  /** Full HTML path: bytes → charset detect → tokenize → DOM repair →
    * segment → classify → assemble. Total function (never throws).
    */
  def extract(htmlBytes: Array[Byte]): HtmlExtract = {
    val (charset, decoded) = Charsets.decode(htmlBytes)
    extractDecoded(decoded, charset)
  }

  def extractDecoded(decoded: String, charset: String): HtmlExtract = {
    // fused streaming pass: no token buffer, no DOM materialization —
    // output identical to the tree pipeline (StreamSegmenterSpec pins it)
    val seg = StreamSegmenter.segment(decoded)
    val kept = seg.blocks.filter(keep)
    val text = kept.iterator.map(_.text).mkString("\n\n")
    val spans = kept.map(b => Span(0, b.startOff, math.max(b.endOff - b.startOff, 0)))
    val totalChars = seg.blocks.iterator.map(_.textChars.toLong).sum
    val keptChars = kept.iterator.map(_.textChars.toLong).sum
    val conf = if (totalChars == 0L) 0.0 else 100.0 * keptChars / totalChars
    HtmlExtract(text, charset, spans, seg.tables, conf, seg.blocks.size, kept.size,
      seg.title)
  }

  /** `<title>` text (document metadata — S5 analogue for the HTML path). */
  def titleOf(root: DomBuilder.Elem): String = {
    def find(e: DomBuilder.Elem): Option[String] = {
      e.children.iterator.flatMap {
        case t: DomBuilder.Elem if t.name == "title" =>
          val sb = new java.lang.StringBuilder
          t.children.foreach {
            case x: DomBuilder.Text => sb.append(x.src, x.off, x.end)
            case _ =>
          }
          Some(Blocks.collapse(graft.text.Entities.decode(sb.toString)))
        case t: DomBuilder.Elem => find(t)
        case _ => None
      }.take(1).toSeq.headOption
    }
    find(root).getOrElse("")
  }
}
