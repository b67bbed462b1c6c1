package graft.pdf

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import ContentStream.{RawSpan, ONum}

/** Differential properties for the allocation-optimized hot paths: each
  * primitive-array rewrite is checked against a straight transliteration
  * of the boxed implementation it replaced, over adversarial inputs
  * (shared y values, ±0.0, NaN, degenerate numbers). A disagreement here
  * means the optimization changed semantics.
  */
object LayoutProps extends Properties("graft.pdf.layout") {

  // ---- reference implementations: the pre-optimization boxed code ----

  private def refLineGroups(raw: Vector[RawSpan]): Vector[Vector[(RawSpan, Int)]] = {
    if (raw.isEmpty) return Vector.empty
    val ys = raw.map(_.y).distinct.sorted(Ordering.Double.TotalOrdering.reverse)
    val tol = {
      val gaps = ys.sliding(2).collect { case Vector(a, b) => a - b }.filter(_ > 0).toVector.sorted
      if (gaps.isEmpty) 0.0 else gaps(gaps.length / 2) / 2.0
    }
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

  private def refLayoutPage(pageIdx: Int, raw: Vector[RawSpan],
                            charBase: Int): SpanLayout.PageText = {
    if (raw.isEmpty) return SpanLayout.PageText("", Vector.empty)
    val byLine = refLineGroups(raw)
    val sb = new java.lang.StringBuilder
    val spans = Vector.newBuilder[graft.model.SpanRow]
    var off = charBase
    byLine.zipWithIndex.foreach { case (members, li) =>
      if (li > 0) { sb.append('\n'); off += 1 }
      val sorted = members.sortBy { case (s, i) => (s.x, i) }
      var lastX = Double.NaN
      sorted.foreach { case (s, _) =>
        if (!lastX.isNaN && s.x != lastX) { sb.append(' '); off += 1 }
        spans += graft.model.SpanRow(pageIdx, off, s.text.length)
        sb.append(s.text)
        off += s.text.length
        lastX = s.x
      }
    }
    SpanLayout.PageText(sb.toString, spans.result())
  }

  // coordinates drawn from a small pool so lines share y values and
  // columns share x values, plus the pathological specials
  private val coordGen: Gen[Double] = Gen.frequency(
    6 -> Gen.oneOf(0.0, 72.0, 72.5, 100.0, 687.3, 700.0, 712.0, 720.0),
    3 -> Gen.chooseNum(-1000.0, 1000.0),
    1 -> Gen.oneOf(-0.0, Double.NaN, 1e-9, -1e-9))

  private val spansGen: Gen[Vector[RawSpan]] = Gen.listOf(
    for {
      t <- Gen.alphaNumStr.map(_.take(6))
      x <- coordGen
      y <- coordGen
    } yield RawSpan(t, x, y)).map(_.toVector)

  // the boxed original CRASHED on a NaN y (mutable-Map Double keys look up
  // NaN via primitive ==, which never matches) — the primitive rewrite is
  // total there, so the contract is: agree wherever the original answered,
  // stay total where it threw
  property("lineGroups matches the boxed reference wherever it answered") =
    forAll(spansGen) { raw =>
      val nw = SpanLayout.lineGroups(raw) // must never throw
      try nw == refLineGroups(raw)
      catch { case _: NoSuchElementException => raw.exists(_.y.isNaN) }
    }

  property("layoutPage matches the boxed reference wherever it answered") =
    forAll(spansGen) { raw =>
      val nw = SpanLayout.layoutPage(3, raw, 17) // must never throw
      try nw == refLayoutPage(3, raw, 17)
      catch { case _: NoSuchElementException => raw.exists(_.y.isNaN) }
    }

  // ---- TableGrid cell assembly vs the boxed original ----

  private def refDetect(raw: Vector[RawSpan]): Vector[graft.model.TableRow] = {
    if (raw.isEmpty) return Vector.empty
    val lines = refLineGroups(raw)
    def qcol(x: Double): Int = math.round(x / TableGrid.SnapTol).toInt
    val qcols: Vector[Vector[Int]] =
      lines.map(_.map { case (s, _) => qcol(s.x) }.distinct.sorted)
    def shared(a: Vector[Int], b: Vector[Int]): Int = {
      var i = 0; var j = 0; var c = 0
      while (i < a.length && j < b.length) {
        if (a(i) == b(j)) { c += 1; i += 1; j += 1 }
        else if (a(i) < b(j)) i += 1
        else j += 1
      }
      c
    }
    def build(ls: Vector[Vector[(RawSpan, Int)]],
              qs: Vector[Vector[Int]]): graft.model.TableRow = {
      val cols: Vector[Int] = qs.flatten.distinct.sorted
      val colIdx: Map[Int, Int] = cols.zipWithIndex.toMap
      var nonEmpty = 0
      val data: Vector[Vector[String]] = ls.map { members =>
        val cells = Array.fill(cols.length)("")
        members.sortBy { case (s, idx) => (s.x, idx) }.foreach { case (s, _) =>
          val c = colIdx(qcol(s.x))
          cells(c) = if (cells(c).isEmpty) s.text else cells(c) + " " + s.text
        }
        cells.foreach(c => if (c.nonEmpty) nonEmpty += 1)
        cells.toVector
      }
      graft.model.TableRow(data, nonEmpty.toDouble / (ls.length * cols.length))
    }
    val out = Vector.newBuilder[graft.model.TableRow]
    var i = 0
    while (i < lines.length) {
      if (qcols(i).length >= 2) {
        var j = i + 1
        while (j < lines.length && qcols(j).length >= 2 &&
               shared(qcols(j - 1), qcols(j)) >= 2) j += 1
        if (j - i >= 2) out += build(lines.slice(i, j), qcols.slice(i, j))
        i = math.max(j, i + 1)
      } else i += 1
    }
    out.result()
  }

  // finite coordinates only: NaN x quantizes via math.round identically in
  // both, but the boxed reference crashes on NaN y (covered above)
  private val finiteSpansGen: Gen[Vector[RawSpan]] =
    spansGen.map(_.filterNot(s => s.x.isNaN || s.y.isNaN))

  property("TableGrid.detect matches the boxed reference implementation") =
    forAll(finiteSpansGen) { raw =>
      TableGrid.detect(raw) == refDetect(raw)
    }

  // ---- number lexing: exact mant/10^k path vs String.toDouble ----

  private val numStrGen: Gen[String] = Gen.frequency(
    4 -> (for { // realistic PDF decimals
      sign <- Gen.oneOf("", "-", "+")
      ip <- Gen.chooseNum(0L, 999999L)
      fp <- Gen.oneOf(Gen.const(""), Gen.chooseNum(0, 999999).map("." + _))
    } yield s"$sign$ip$fp"),
    2 -> Gen.nonEmptyListOf(Gen.oneOf("0123456789.+-": Seq[Char]))
      .map(_.mkString.take(25)), // adversarial soup incl. multi-dot/sign
    1 -> Gen.chooseNum(1L, Long.MaxValue).map(_.toString), // > 15 digits
    1 -> Gen.oneOf(".", "-", "+", "-.", "5.", ".5", "00.50", "000000000000000001"))

  property("content-stream number lexing == toDouble semantics") =
    forAll(numStrGen.suchThat(s => s.nonEmpty &&
        ("+-.0123456789".indexOf(s.charAt(0)) >= 0))) { s =>
      val lx = new ContentStream.Lexer(
        s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      val expected = try s.toDouble catch { case _: NumberFormatException => 0.0 }
      lx.next() match {
        case ONum(v) => java.lang.Double.compare(v, expected) == 0 // bit-exact, ±0 included
        case _ => false
      }
    }
}
