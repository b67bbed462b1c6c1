package graft.pdf

import graft.model.TableRow
import ContentStream.{RawSpan, Rule}

/** PDF table extraction from DRAWN rules (SURVEY.md E9, the reference's
  * intended pdfplumber "lines" strategy — README.md:368-379 documents
  * snap_tolerance 3; its shipped adapter returned `[]`,
  * table_simple.py:16-29). Complements [[TableGrid]]'s span-alignment
  * strategy: grids whose structure is carried by ruled lines with RAGGED
  * text (cells that never x-align across rows) are invisible to span
  * quantization but exact here.
  *
  * Frozen spec (deterministic, geometry-only), pdfplumber-style
  * intersection analysis:
  *  - a horizontal and a vertical rule INTERSECT when they cross within
  *    the snap tolerance; rules connect into components through shared
  *    intersections — a stray footer separator or text underline crosses
  *    nothing and drops out instead of vetoing the page's real grid;
  *  - each component with ≥2 horizontal and ≥2 vertical boundary clusters
  *    (positions clustered at snap tolerance 3, cluster = mean) and ≥2
  *    cells is a table (a plain 1×1 border box is not);
  *  - cell (row, col) = spans whose (x, y) fall strictly inside the cell
  *    bounds, joined with single spaces in (x, stream-order); spans are
  *    bucketed in ONE pass (binary placement), not per-cell rescans;
  *  - rows ordered top→bottom (descending y), columns left→right; multiple
  *    disjoint grids on one page yield multiple tables, ordered by
  *    (top y desc, left x asc);
  *  - confidence = non-empty cells / (rows × cols), same contract as
  *    [[TableGrid]] (markdown_generator.py:112-134 consumes it).
  *
  * Main text is NOT altered (pdfplumber semantics): `extract_text` and
  * `extract_tables` stay independent views of the page.
  */
object RuleGrid {

  /** pdfplumber snap_tolerance (reference README.md:368-379). */
  val SnapTol = 3.0

  /** Detected tables + bounding boxes (x0, yBottom, x1, yTop), so the
    * caller can exclude in-grid spans from span-alignment detection
    * (one table, one detection).
    */
  def detect(rules: Vector[Rule],
             spans: Vector[RawSpan]): Vector[(TableRow, (Double, Double, Double, Double))] = {
    if (rules.length < 4) return Vector.empty
    // (position, extent lo, extent hi); degenerate zero-length marks from
    // stale path state are dropped
    val horiz = rules.filter(r => r.isHorizontal && math.abs(r.x1 - r.x0) > 1.0)
      .map(r => ((r.y0 + r.y1) / 2, math.min(r.x0, r.x1), math.max(r.x0, r.x1)))
    val vert = rules.filter(r => !r.isHorizontal && math.abs(r.y1 - r.y0) > 1.0)
      .map(r => ((r.x0 + r.x1) / 2, math.min(r.y0, r.y1), math.max(r.y0, r.y1)))
    if (horiz.length < 2 || vert.length < 2) return Vector.empty

    // union-find over h-rules (ids 0..H) ∪ v-rules (ids H..H+V) connected
    // by crossings within the snap tolerance
    val hN = horiz.length
    val parent = Array.tabulate(hN + vert.length)(identity)
    def find(a: Int): Int = { var x = a; while (parent(x) != x) { parent(x) = parent(parent(x)); x = parent(x) }; x }
    def union(a: Int, b: Int): Unit = { val ra = find(a); val rb = find(b); if (ra != rb) parent(ra) = rb }
    var i = 0
    while (i < hN) {
      val (hy, hx0, hx1) = horiz(i)
      var j = 0
      while (j < vert.length) {
        val (vx, vy0, vy1) = vert(j)
        if (vx >= hx0 - SnapTol && vx <= hx1 + SnapTol &&
            hy >= vy0 - SnapTol && hy <= vy1 + SnapTol) union(i, hN + j)
        j += 1
      }
      i += 1
    }

    val byComponent = (horiz.indices.map(i => (find(i), Left(horiz(i)))) ++
      vert.indices.map(j => (find(hN + j), Right(vert(j)))))
      .groupBy(_._1).values

    byComponent.flatMap { members =>
      val hs = members.collect { case (_, Left(h)) => h }.toVector
      val vs = members.collect { case (_, Right(v)) => v }.toVector
      buildTable(hs, vs, spans)
    }.toVector.sortBy { case (_, (x0, _, _, yTop)) => (-yTop, x0) }
  }

  private def buildTable(hs: Vector[(Double, Double, Double)],
                         vs: Vector[(Double, Double, Double)],
                         spans: Vector[RawSpan]): Option[(TableRow, (Double, Double, Double, Double))] = {
    if (hs.length < 2 || vs.length < 2) return None
    val ys = cluster(hs.map(_._1)).sorted(Ordering[Double].reverse) // top first
    val xs = cluster(vs.map(_._1)).sorted
    val rows = ys.length - 1
    val cols = xs.length - 1
    if (rows < 1 || cols < 1 || rows * cols < 2) return None

    // one-pass span bucketing: place each span into its (row, col) cell
    val cells = Array.fill(rows, cols)(Vector.newBuilder[(RawSpan, Int)])
    spans.zipWithIndex.foreach { case (s, idx) =>
      val c = interval(xs, s.x)
      if (c >= 0) {
        val r = intervalDesc(ys, s.y)
        if (r >= 0) cells(r)(c) += ((s, idx))
      }
    }
    var nonEmpty = 0
    val data: Vector[Vector[String]] = (0 until rows).toVector.map { r =>
      (0 until cols).toVector.map { c =>
        val cell = cells(r)(c).result()
          .sortBy { case (s, idx) => (s.x, idx) }
          .map(_._1.text).mkString(" ")
        if (cell.nonEmpty) nonEmpty += 1
        cell
      }
    }
    if (nonEmpty == 0) return None // ruled but empty frame: not a table
    val conf = nonEmpty.toDouble / (rows * cols)
    Some((TableRow(data, conf), (xs.head, ys.last, xs.last, ys.head)))
  }

  /** Index i with xs(i) <= v < xs(i+1) over ascending bounds, -1 outside. */
  private def interval(xs: Vector[Double], v: Double): Int = {
    if (v < xs.head || v >= xs.last) return -1
    var lo = 0; var hi = xs.length - 2
    while (lo < hi) {
      val mid = (lo + hi + 1) / 2
      if (xs(mid) <= v) lo = mid else hi = mid - 1
    }
    lo
  }

  /** Index j with ys(j) > v > ys(j+1) over DESCENDING bounds, -1 outside
    * (strict: a baseline exactly on a rule belongs to no cell).
    */
  private def intervalDesc(ys: Vector[Double], v: Double): Int = {
    if (v >= ys.head || v <= ys.last) return -1
    var lo = 0; var hi = ys.length - 2
    while (lo < hi) {
      val mid = (lo + hi + 1) / 2
      if (ys(mid) > v) lo = mid else hi = mid - 1
    }
    if (v > ys(lo + 1)) lo else -1 // exactly ON an interior rule: no cell
  }

  /** Single-linkage 1-D clustering within SnapTol; cluster = mean. */
  private def cluster(items: Vector[Double]): Vector[Double] = {
    if (items.isEmpty) return Vector.empty
    val sorted = items.sorted
    val out = Vector.newBuilder[Double]
    var sum = sorted.head; var n = 1; var last = sorted.head
    sorted.tail.foreach { p =>
      if (p - last <= SnapTol) { sum += p; n += 1; last = p }
      else { out += sum / n; sum = p; n = 1; last = p }
    }
    out += sum / n
    out.result()
  }
}
