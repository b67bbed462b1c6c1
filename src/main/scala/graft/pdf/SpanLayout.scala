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

    // primitive-array implementation (this runs 2-3× per page: text layout,
    // table detection, rule-grid assignment — no boxed Double maps, no
    // per-window sliding Vectors). Ordering semantics are Double.compare
    // (total order, the same the boxed TotalOrdering version used).
    val ysAll = new Array[Double](raw.length)
    var i = 0
    while (i < raw.length) { ysAll(i) = raw(i).y; i += 1 }
    java.util.Arrays.sort(ysAll) // ascending, total order
    // distinct in place (Double.compare equality: NaNs collapse, ±0 stay apart)
    var nys = 0
    i = 0
    while (i < ysAll.length) {
      if (nys == 0 || java.lang.Double.compare(ysAll(nys - 1), ysAll(i)) != 0) {
        ysAll(nys) = ysAll(i); nys += 1
      }
      i += 1
    }
    val ysAsc = if (nys == ysAll.length) ysAll else java.util.Arrays.copyOf(ysAll, nys)

    // median positive gap over the descending-distinct sequence = same gaps
    // ascending reversed; collect positive gaps and sort
    val gaps = new Array[Double](math.max(1, nys - 1))
    var ng = 0
    i = 1
    while (i < nys) {
      val g = ysAsc(i) - ysAsc(i - 1)
      if (g > 0) { gaps(ng) = g; ng += 1 }
      i += 1
    }
    val tol =
      if (ng == 0) 0.0
      else { java.util.Arrays.sort(gaps, 0, ng); gaps(ng / 2) / 2.0 }

    // line ids over descending ys: walking ysAsc from the top down
    val lineIdAsc = new Array[Int](nys)
    var line = 0
    i = nys - 1
    lineIdAsc(i) = 0
    while (i > 0) {
      if (ysAsc(i) - ysAsc(i - 1) > tol) line += 1
      lineIdAsc(i - 1) = line
      i -= 1
    }
    val nLines = line + 1

    // bucket spans by line id, preserving stream order within a line
    val counts = new Array[Int](nLines)
    val lineOf = new Array[Int](raw.length)
    i = 0
    while (i < raw.length) {
      var idx = java.util.Arrays.binarySearch(ysAsc, 0, nys, raw(i).y)
      if (idx < 0) idx = math.min(nys - 1, math.max(0, -idx - 1)) // NaN ties
      lineOf(i) = lineIdAsc(idx)
      counts(lineOf(i)) += 1
      i += 1
    }
    val builders = Array.tabulate(nLines) { li =>
      val b = Vector.newBuilder[(RawSpan, Int)]
      b.sizeHint(counts(li))
      b
    }
    i = 0
    while (i < raw.length) {
      builders(lineOf(i)) += ((raw(i), i))
      i += 1
    }
    Vector.tabulate(nLines)(li => builders(li).result())
  }

  /** Stable insertion-sort permutation of `members` by span x: stability
    * plus stream-ordered input == the boxed sortBy-on-(x, streamIdx) this
    * replaced; Double.compare keeps its total-order (NaN last, −0.0 < 0.0)
    * semantics. One implementation — text layout and table-cell assembly
    * must never order the same line differently.
    */
  private[pdf] def sortByXStable(members: Vector[(RawSpan, Int)]): Array[Int] = {
    val order = new Array[Int](members.length)
    var i = 0
    while (i < members.length) { order(i) = i; i += 1 }
    i = 1
    while (i < members.length) {
      val v = order(i)
      val vx = members(v)._1.x
      var j = i - 1
      while (j >= 0 && java.lang.Double.compare(members(order(j))._1.x, vx) > 0) {
        order(j + 1) = order(j); j -= 1
      }
      order(j + 1) = v
      i += 1
    }
    order
  }

  def layoutPage(pageIdx: Int, raw: Vector[RawSpan], charBase: Int): PageText = {
    if (raw.isEmpty) return PageText("", Vector.empty)

    val byLine = lineGroups(raw)

    val sb = new java.lang.StringBuilder
    val spans = Vector.newBuilder[SpanRow]
    var off = charBase
    var li = 0
    while (li < byLine.length) {
      val members = byLine(li)
      if (li > 0) { sb.append('\n'); off += 1 }
      val order = sortByXStable(members)
      var lastX = Double.NaN
      var i = 0
      while (i < order.length) {
        val s = members(order(i))._1
        if (!lastX.isNaN && s.x != lastX) { sb.append(' '); off += 1 }
        spans += SpanRow(pageIdx, off, s.text.length)
        sb.append(s.text)
        off += s.text.length
        lastX = s.x
        i += 1
      }
      li += 1
    }
    PageText(sb.toString, spans.result())
  }
}
