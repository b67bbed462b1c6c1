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
  * Frozen spec (deterministic, geometry-only):
  *  - horizontal rules cluster by y, vertical rules by x, within the snap
  *    tolerance (3.0, pdfplumber's snap_tolerance); cluster position = mean;
  *  - a grid needs ≥2 horizontal and ≥2 vertical boundary clusters, ≥2
  *    cells total (a plain 1×1 border box is not a table), and every rule
  *    cluster must span ≥70% of the opposite axis' extent (stray underlines
  *    or margin lines never combine into a phantom grid);
  *  - cell (row, col) = spans whose (x, y) fall strictly inside the cell
  *    bounds, joined with single spaces in (x, stream-order);
  *  - rows ordered top→bottom (descending y), columns left→right;
  *  - confidence = non-empty cells / (rows × cols), same contract as
  *    [[TableGrid]] (markdown_generator.py:112-134 consumes it).
  *
  * Main text is NOT altered (pdfplumber semantics): `extract_text` and
  * `extract_tables` stay independent views of the page.
  */
object RuleGrid {

  /** pdfplumber snap_tolerance (reference README.md:368-379). */
  val SnapTol = 3.0
  /** Each boundary rule must cover this share of the opposite extent. */
  val MinSpanShare = 0.7

  /** Detected table + its bounding box (x0, yBottom, x1, yTop), so the
    * caller can exclude in-grid spans from span-alignment detection
    * (one table, one detection).
    */
  def detect(rules: Vector[Rule],
             spans: Vector[RawSpan]): Option[(TableRow, (Double, Double, Double, Double))] = {
    if (rules.length < 4) return None
    val horiz = rules.filter(_.isHorizontal)
      .map(r => ((r.y0 + r.y1) / 2, math.min(r.x0, r.x1), math.max(r.x0, r.x1)))
    val vert = rules.filterNot(_.isHorizontal)
      .map(r => ((r.x0 + r.x1) / 2, math.min(r.y0, r.y1), math.max(r.y0, r.y1)))
    if (horiz.length < 2 || vert.length < 2) return None

    val yClusters = cluster(horiz) // (pos, lo, hi) per cluster
    val xClusters = cluster(vert)
    if (yClusters.length < 2 || xClusters.length < 2) return None

    val xs = xClusters.map(_._1).sorted
    val ys = yClusters.map(_._1).sorted(Ordering[Double].reverse) // top first
    val rows = ys.length - 1
    val cols = xs.length - 1
    if (rows * cols < 2) return None

    // extent sanity: every horizontal boundary spans most of the x-range
    // and every vertical boundary most of the y-range
    val xSpan = xs.last - xs.head
    val ySpan = ys.head - ys.last
    if (xSpan <= 0 || ySpan <= 0) return None
    val hOk = yClusters.forall { case (_, lo, hi) =>
      math.min(hi, xs.last) - math.max(lo, xs.head) >= MinSpanShare * xSpan
    }
    val vOk = xClusters.forall { case (_, lo, hi) =>
      math.min(hi, ys.head) - math.max(lo, ys.last) >= MinSpanShare * ySpan
    }
    if (!hOk || !vOk) return None

    var nonEmpty = 0
    val data: Vector[Vector[String]] = (0 until rows).toVector.map { j =>
      val yTop = ys(j); val yBot = ys(j + 1)
      (0 until cols).toVector.map { i =>
        val x0 = xs(i); val x1 = xs(i + 1)
        val members = spans.zipWithIndex.filter { case (s, _) =>
          s.x >= x0 && s.x < x1 && s.y > yBot && s.y < yTop
        }
        val cell = members.sortBy { case (s, idx) => (s.x, idx) }
          .map(_._1.text).mkString(" ")
        if (cell.nonEmpty) nonEmpty += 1
        cell
      }
    }
    if (nonEmpty == 0) return None // ruled but empty frame: not a table
    val conf = nonEmpty.toDouble / (rows * cols)
    Some((TableRow(data, conf), (xs.head, ys.last, xs.last, ys.head)))
  }

  /** Single-linkage 1-D clustering within SnapTol; returns
    * (mean position, extent lo, extent hi) per cluster.
    */
  private def cluster(items: Vector[(Double, Double, Double)]): Vector[(Double, Double, Double)] = {
    if (items.isEmpty) return Vector.empty
    val sorted = items.sortBy(_._1)
    val out = Vector.newBuilder[(Double, Double, Double)]
    var posSum = sorted.head._1; var n = 1
    var last = sorted.head._1
    var lo = sorted.head._2; var hi = sorted.head._3
    sorted.tail.foreach { case (p, l, h) =>
      if (p - last <= SnapTol) {
        posSum += p; n += 1; last = p
        lo = math.min(lo, l); hi = math.max(hi, h)
      } else {
        out += ((posSum / n, lo, hi))
        posSum = p; n = 1; last = p; lo = l; hi = h
      }
    }
    out += ((posSum / n, lo, hi))
    out.result()
  }
}
