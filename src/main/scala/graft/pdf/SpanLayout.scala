package graft.pdf

import graft.model.SpanRow
import ContentStream.RawSpan

/** Reading-order reconstruction (SURVEY.md E8; FIXTURES.md §3.3
  * `pdf-out-of-order`): spans may be emitted in any stream order; output
  * order is restored by y-line clustering (descending y = top of page first)
  * then x within a line.
  *
  * Line clustering (frozen spec): distinct y values are sorted descending;
  * consecutive ys merge into one line when their gap ≤ half the median
  * positive gap (the robust-statistic shape the reference uses for deskew —
  * median of Hough angles, ocr_adapters.py:244 — reapplied to layout).
  * With fewer than two distinct ys, everything is one line.
  *
  * Within a line, spans sort by x (stream order preserved for equal x) and
  * join with a single space when x advances, directly when x repeats
  * (consecutive shows at an identical position are one logical run).
  * Lines join with "\n"; pages join with "\n\n" (assembly contract E3).
  */
object SpanLayout {

  final case class PageText(text: String, spans: Vector[SpanRow])

  /** Cluster raw spans into lines, top-of-page first; members keep their
    * stream index. Shared with [[TableGrid]] so text layout and table
    * detection see identical row structure (one frozen clustering spec).
    */
  private[pdf] def lineGroups(raw: Vector[RawSpan]): Vector[Vector[(RawSpan, Int)]] = {
    if (raw.isEmpty) return Vector.empty

    val ys = raw.map(_.y).distinct.sorted(Ordering.Double.TotalOrdering.reverse)
    val tol = {
      val gaps = ys.sliding(2).collect { case Vector(a, b) => a - b }.filter(_ > 0).toVector.sorted
      if (gaps.isEmpty) 0.0 else gaps(gaps.length / 2) / 2.0
    }
    // group ys into lines
    val lineOfY = scala.collection.mutable.Map.empty[Double, Int]
    var line = 0
    var prev = Double.NaN
    ys.foreach { y =>
      if (!prev.isNaN && (prev - y) > tol) line += 1
      lineOfY(y) = line
      prev = y
    }

    raw.zipWithIndex
      .groupBy { case (s, _) => lineOfY(s.y) }
      .toVector.sortBy(_._1)
      .map(_._2)
  }

  def layoutPage(pageIdx: Int, raw: Vector[RawSpan], charBase: Int): PageText = {
    if (raw.isEmpty) return PageText("", Vector.empty)

    val byLine = lineGroups(raw)

    val sb = new java.lang.StringBuilder
    val spans = Vector.newBuilder[SpanRow]
    var off = charBase
    byLine.zipWithIndex.foreach { case (members, li) =>
      if (li > 0) { sb.append('\n'); off += 1 }
      // stable sort by x keeps stream order for identical positions
      val sorted = members.sortBy { case (s, i) => (s.x, i) }
      var lastX = Double.NaN
      sorted.foreach { case (s, _) =>
        if (!lastX.isNaN && s.x != lastX) { sb.append(' '); off += 1 }
        spans += SpanRow(pageIdx, off, s.text.length)
        sb.append(s.text)
        off += s.text.length
        lastX = s.x
      }
    }
    PageText(sb.toString, spans.result())
  }
}
