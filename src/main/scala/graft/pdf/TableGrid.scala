package graft.pdf

import graft.model.TableRow
import ContentStream.RawSpan

/** PDF table detection from span geometry (SURVEY.md E9 — the part the
  * reference itself never shipped: its `SimpleTableAdapter.extract_tables`
  * returns `[]`, table_simple.py:16-29, while its README documents the
  * intended pdfplumber text-strategy with snap_tolerance 3, README.md:368-379).
  *
  * Frozen spec (deterministic, geometry-only):
  *  - rows = the same y-line clustering the text layout uses
  *    ([[SpanLayout.lineGroups]] — one clustering, two consumers);
  *  - a line is *tabular* when it holds ≥2 distinct column positions, where
  *    a column position is the span x quantized to the snap tolerance
  *    (`round(x / 3.0)`, pdfplumber's snap_tolerance);
  *  - a table region = a maximal run of ≥2 consecutive tabular lines in
  *    which each line shares ≥2 column positions with the previous one
  *    (prose with incidental multi-span lines rarely re-aligns twice);
  *  - cells: region columns = sorted union of the member lines' column
  *    positions; cell (row, col) = texts of that line's spans at that
  *    column, joined with a single space in (x, stream-order);
  *  - confidence = non-empty cells / (rows × cols), matching the optional
  *    per-table `confidence` the reference's Markdown renderer consumes
  *    (markdown_generator.py:112-134).
  *
  * Main text is NOT altered: like pdfplumber, `extract_text` and
  * `extract_tables` are independent views of the same page.
  */
object TableGrid {

  /** pdfplumber snap_tolerance (reference README.md:368-379). */
  val SnapTol = 3.0

  def detect(raw: Vector[RawSpan]): Vector[TableRow] = {
    if (raw.isEmpty) return Vector.empty
    val lines = SpanLayout.lineGroups(raw)
    val qcols: Vector[Vector[Int]] =
      lines.map(_.map { case (s, _) => qcol(s.x) }.distinct.sorted)

    val out = Vector.newBuilder[TableRow]
    var i = 0
    while (i < lines.length) {
      if (qcols(i).length >= 2) {
        var j = i + 1
        while (j < lines.length && qcols(j).length >= 2 &&
               shared(qcols(j - 1), qcols(j)) >= 2) j += 1
        if (j - i >= 2) out += buildTable(lines.slice(i, j), qcols.slice(i, j))
        i = math.max(j, i + 1)
      } else i += 1
    }
    out.result()
  }

  @inline private def qcol(x: Double): Int = math.round(x / SnapTol).toInt

  private def shared(a: Vector[Int], b: Vector[Int]): Int = {
    // both sorted distinct; merge-count intersection
    var i = 0; var j = 0; var c = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { c += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    c
  }

  private def buildTable(lines: Vector[Vector[(RawSpan, Int)]],
                         qcolsPerLine: Vector[Vector[Int]]): TableRow = {
    val cols: Array[Int] = qcolsPerLine.flatten.distinct.sorted.toArray
    var nonEmpty = 0
    val data: Vector[Vector[String]] = lines.map { members =>
      val cells = Array.fill(cols.length)("")
      SpanLayout.sortByXStable(members).foreach { oi =>
        val s = members(oi)._1
        val c = java.util.Arrays.binarySearch(cols, qcol(s.x))
        cells(c) = if (cells(c).isEmpty) s.text else cells(c) + " " + s.text
      }
      cells.foreach(c => if (c.nonEmpty) nonEmpty += 1)
      cells.toVector
    }
    val conf = nonEmpty.toDouble / (lines.length * cols.length)
    TableRow(data, conf)
  }
}
