package graft.html

import scala.collection.mutable.ArrayBuffer
import graft.text.Entities
import DomBuilder._

/** Block segmentation over the repaired DOM (SURVEY.md E10, third stage).
  *
  * Blocks break ONLY at block-level tags (`bp-nested-blocks`: inline tags
  * such as `<b>/<span>/<a>` never split a block). Each block carries the
  * densitometric features the classifier needs (Boilerpipe, Kohlschütter et
  * al. WSDM 2010; jusText, Pomikálek 2011): text length, link-text length,
  * word count, and whether any ancestor is a boilerplate container
  * (`nav|header|footer|aside`).
  *
  * Normalization contract (frozen, FIXTURES.md §3.1): decode entities →
  * collapse runs of `[ \t\r\n]` to a single space within a block → trim →
  * (classifier drops empty blocks) → join kept blocks with `"\n\n"`.
  * `&nbsp;` decodes to a plain space (frozen spec choice — keeps training
  * text free of invisible U+00A0).
  */
object Blocks {

  final case class Block(
    text: String,        // normalized
    startOff: Int,       // char offset of first contributing text in decoded source
    endOff: Int,         // exclusive end offset of last contributing text
    textChars: Int,      // non-whitespace chars (normalized)
    linkChars: Int,      // non-whitespace chars under an <a> ancestor
    words: Int,
    tag: String,         // nearest block-level ancestor tag
    inBoiler: Boolean)   // any ancestor in {nav, header, footer, aside}

  final case class TableData(data: Vector[Vector[String]], confidence: Double)

  final case class Segmented(blocks: Vector[Block], tables: Vector[TableData])

  private val BoilerContainers = Set("nav", "header", "footer", "aside")

  /** Per-thread reusable storage for the text runs of the block being built
    * and the normalization char buffer. A run is a slice [a, b) of `srcs(i)`
    * (`real` bit off for synthetic runs like `<br>`'s space, which carry no
    * source offset). Flat parallel arrays instead of a per-run case class:
    * segment() is the per-document hot path, and at 100 TB the allocation
    * rate — not CPU — is what stops wide executors scaling.
    */
  private[html] final class Scratch {
    var buf = new Array[Char](8192)
    var srcs = new Array[String](64)
    var offA = new Array[Int](64)
    var offB = new Array[Int](64)
    var flags = new Array[Byte](64) // bit0 link, bit1 real
    var n = 0
    def add(src: String, a: Int, b: Int, link: Boolean, real: Boolean): Unit = {
      if (n == srcs.length) {
        srcs = java.util.Arrays.copyOf(srcs, n * 2)
        offA = java.util.Arrays.copyOf(offA, n * 2)
        offB = java.util.Arrays.copyOf(offB, n * 2)
        flags = java.util.Arrays.copyOf(flags, n * 2)
      }
      srcs(n) = src; offA(n) = a; offB(n) = b
      flags(n) = ((if (link) 1 else 0) | (if (real) 2 else 0)).toByte
      n += 1
    }
    def clear(): Unit = {
      java.util.Arrays.fill(srcs.asInstanceOf[Array[AnyRef]], 0, n, null) // no doc-lifetime pins
      n = 0
      // shrink outlier growth back to a modest cap: one multi-MB document
      // must pay a reallocation, not pin ~2× its size per executor thread
      // for the JVM lifetime (32 task threads × MBs = tens of MB resident)
      if (buf.length > BufShrinkCap) buf = new Array[Char](BufShrinkCap)
      if (srcs.length > RunsShrinkCap) {
        srcs = new Array[String](RunsShrinkCap)
        offA = new Array[Int](RunsShrinkCap)
        offB = new Array[Int](RunsShrinkCap)
        flags = new Array[Byte](RunsShrinkCap)
      }
    }
  }
  /** Scratch retention caps: 128K chars (256 KB) covers every normal page's
    * largest block; 4096 runs covers any sane block's text-piece count.
    */
  private[html] val BufShrinkCap = 128 * 1024
  private[html] val RunsShrinkCap = 4096
  private[html] val scratch = new ThreadLocal[Scratch] {
    override def initialValue(): Scratch = new Scratch
  }

  def segment(root: Elem): Segmented = {
    val blocks = new ArrayBuffer[Block]
    val tables = new ArrayBuffer[TableData]
    val pieces = scratch.get()
    pieces.clear()
    var curTag = "body"
    var boilerDepth = 0
    var linkDepth = 0

    def flush(): Unit = {
      if (pieces.n > 0) {
        blocks += assemble(pieces, curTag, boilerDepth > 0)
        pieces.clear()
      }
    }

    def walk(e: Elem): Unit = {
      val kids = e.children
      var ki = 0
      while (ki < kids.length) {
        kids(ki) match {
          case t: Text =>
            pieces.add(t.src, t.off, t.end, linkDepth > 0, real = true)
          case el: Elem if Skipped.contains(el.name) => // no text contribution
          case el: Elem if el.name == "table" =>
            flush()
            tables += extractTable(el)
          case el: Elem if el.name == "br" =>
            pieces.add(" ", 0, 1, linkDepth > 0, real = false)
          case el: Elem =>
            val isBlock = BlockLevel.contains(el.name)
            val isBoiler = BoilerContainers.contains(el.name)
            val isLink = el.name == "a"
            if (isBlock) flush()
            if (isBoiler) boilerDepth += 1
            if (isLink) linkDepth += 1
            val prevTag = curTag
            if (isBlock) curTag = el.name
            walk(el)
            if (isBlock) { flush(); curTag = prevTag }
            if (isLink) linkDepth -= 1
            if (isBoiler) boilerDepth -= 1
        }
        ki += 1
      }
    }

    walk(root)
    flush()
    Segmented(blocks.toVector, tables.toVector)
  }

  /** Normalize the accumulated pieces into a Block — one fused pass:
    * entity-decode per piece, collapse `[ \t\r\n]+`→" ", and count
    * non-whitespace/link chars in the same loop (this is the hottest
    * code in the HTML kernel; the fused form halves its time vs the
    * decode-then-count-then-collapse original with identical output).
    * The normalized text is built in the per-thread scratch buffer and
    * copied out ONCE as the final String; the whole body is flat while
    * loops over the scratch arrays — no closures, so no captured-var
    * boxing per call (measured at ~450 B/block before this shape).
    */
  private[html] def assemble(pieces: Scratch, tag: String, inBoiler: Boolean): Block = {
    var linkChars = 0
    var textChars = 0
    val np = pieces.n
    // upper bound on the collapsed length (entity replacements are never
    // longer than their source form)
    var cap = 0
    var pi = 0
    while (pi < np) { cap += pieces.offB(pi) - pieces.offA(pi); pi += 1 }
    var buf = pieces.buf
    if (buf.length < cap) {
      // overflow-safe doubling: highestOneBit(cap)*2 wraps negative for
      // cap >= 2^30; clamp to the max array size instead of crashing
      val want = math.min(math.max(cap.toLong * 2, 8192L), (Int.MaxValue - 8).toLong).toInt
      buf = new Array[Char](math.max(want, cap))
      pieces.buf = buf
    }
    var len = 0
    var startOff = -1
    var endOff = -1
    var pendingSpace = false
    var started = false
    pi = 0
    while (pi < np) {
      // scan the source slice in place (no substring, no decoded copy) —
      // entity decode fuses into the same whitespace-collapse loop; entities
      // never span text tokens, so the slice bound caps the `;` search
      val src = pieces.srcs(pi)
      val a = pieces.offA(pi)
      val b = pieces.offB(pi)
      val link = (pieces.flags(pi) & 1) != 0
      val real = (pieces.flags(pi) & 2) != 0
      var i = a
      while (i < b) {
        val c0 = src.charAt(i)
        var rep: String = null
        var next = i + 1
        if (c0 == '&') {
          val r = Entities.refAt(src, i, b)
          if (r != null) { rep = r._1; next = r._2 }
        }
        // emit either the single char or every char of the replacement,
        // same collapse/count logic in both arms
        var j = 0
        val m = if (rep == null) 1 else rep.length
        while (j < m) {
          val c = if (rep == null) c0 else rep.charAt(j)
          if (isWs(c)) pendingSpace = true
          else {
            if (pendingSpace && started) { buf(len) = ' '; len += 1 }
            buf(len) = c; len += 1
            pendingSpace = false
            started = true
            textChars += 1
            if (link) linkChars += 1
          }
          j += 1
        }
        i = next
      }
      if (real) {
        if (startOff < 0) startOff = a
        endOff = b
      }
      pi += 1
    }
    val norm = new String(buf, 0, len)
    val words = if (norm.isEmpty) 0 else {
      var w = 1; var i = 0
      while (i < norm.length) { if (norm.charAt(i) == ' ') w += 1; i += 1 }
      w
    }
    Block(norm, math.max(startOff, 0), math.max(endOff, 0), textChars, linkChars,
      words, tag, inBoiler)
  }

  /** Collapse `[ \t\r\n]+` → single space, then trim (frozen contract). */
  def collapse(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var pendingSpace = false
    var started = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == ' ' || c == '\t' || c == '\r' || c == '\n') pendingSpace = true
      else {
        if (pendingSpace && started) sb.append(' ')
        sb.append(c)
        pendingSpace = false
        started = true
      }
      i += 1
    }
    sb.toString
  }

  /** Row-major cell extraction for a `<table>` subtree (`bp-table-content`).
    * Nested tables flatten into the containing cell's text. Confidence =
    * fraction of non-empty cells (deterministic; the reference's extractor is
    * a stub returning [] — table_simple.py:16-29 — so the contract here is
    * ours to define).
    */
  def extractTable(table: Elem): TableData = {
    val rows = new ArrayBuffer[Vector[String]]
    def findRows(e: Elem): Unit = e.children.foreach {
      case el: Elem if el.name == "tr" =>
        val cells = new ArrayBuffer[String]
        def findCells(r: Elem): Unit = r.children.foreach {
          case c: Elem if c.name == "td" || c.name == "th" =>
            cells += collapse(Entities.decode(subtreeRaw(c)))
          case c: Elem => findCells(c)
          case _ =>
        }
        findCells(el)
        if (cells.nonEmpty) rows += cells.toVector
      case el: Elem => findRows(el)
      case _ =>
    }
    findRows(table)
    val total = rows.map(_.size).sum
    val nonEmpty = rows.map(_.count(_.nonEmpty)).sum
    val conf = if (total == 0) 0.0 else nonEmpty.toDouble / total
    TableData(rows.toVector, conf)
  }

  private def subtreeRaw(e: Elem): String = {
    val sb = new java.lang.StringBuilder
    def go(x: Elem): Unit = x.children.foreach {
      case t: Text => sb.append(t.src, t.off, t.end)
      case el: Elem if Skipped.contains(el.name) =>
      case el: Elem =>
        if (BlockLevel.contains(el.name) || el.name == "br") sb.append(' ')
        go(el)
    }
    go(e)
    sb.toString
  }

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\r' || c == '\n'
}
