package graft.render

import graft.model.{ExtractedDoc, TableRow}

/** Markdown renderer (SURVEY K3; markdown_generator.py:13-171), as a pure
  * function of the row plus a job-supplied clock literal — the reference
  * embeds `datetime.now()` in the header (markdown_generator.py:55), which
  * breaks byte-identity; here the timestamp is an explicit argument and the
  * renderer output is excluded from the golden text gate (SURVEY §2.7 K3).
  *
  * Title heuristic preserved from the reference (markdown_generator.py:93-96):
  * an all-caps line shorter than 100 chars renders as an `### ` heading.
  */
object Markdown {

  def render(d: ExtractedDoc, generatedAt: String): String = {
    val sb = new StringBuilder
    sb.append(s"# ${d.url}\n\n")
    sb.append(s"- **Documento**: ${d.doc_id}\n")
    sb.append(s"- **Tipo**: ${d.doc_type}\n")
    sb.append(s"- **Páginas**: ${d.page_count}\n")
    sb.append(f"- **Confianza**: ${d.confidence}%.2f%%\n")
    sb.append(s"- **Estado**: ${d.status}\n")
    sb.append(s"- **Generado**: $generatedAt\n\n")

    d.text.split("\n\n", -1).foreach { block =>
      if (block.nonEmpty) {
        val t = block.trim
        if (isTitleLike(t)) sb.append(s"### $t\n\n")
        else sb.append(s"$t\n\n")
      }
    }
    d.tables.zipWithIndex.foreach { case (t, i) =>
      sb.append(s"#### Tabla ${i + 1}\n\n")
      sb.append(renderTable(t))
      sb.append('\n')
    }
    sb.append(s"---\n*engine=spark-graft charset=${d.charset}*\n")
    sb.toString
  }

  /** markdown_generator.py:93-96: upper-case short line → heading. */
  def isTitleLike(line: String): Boolean =
    line.nonEmpty && line.length < 100 && !line.contains('\n') &&
      line.exists(_.isLetter) && line == line.toUpperCase(java.util.Locale.ROOT)

  /** Pipe-table rendering (markdown_generator.py:119-130). */
  def renderTable(t: TableRow): String = {
    if (t.data.isEmpty) return ""
    val width = t.data.map(_.size).max
    def row(cells: Seq[String]): String =
      (cells ++ Seq.fill(width - cells.size)(""))
        .map(c => c.replace("|", "\\|")).mkString("| ", " | ", " |")
    val sb = new StringBuilder
    sb.append(row(t.data.head)).append('\n')
    sb.append(Seq.fill(width)("---").mkString("| ", " | ", " |")).append('\n')
    t.data.tail.foreach(r => sb.append(row(r)).append('\n'))
    sb.toString
  }
}
