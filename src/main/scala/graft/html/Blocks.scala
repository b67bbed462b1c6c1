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

  /** One text run inside the current block. */
  private final case class Piece(raw: String, off: Int, link: Boolean)

  def segment(root: Elem): Segmented = {
    val blocks = new ArrayBuffer[Block]
    val tables = new ArrayBuffer[TableData]
    val pieces = new ArrayBuffer[Piece]
    var curTag = "body"
    var boilerDepth = 0
    var linkDepth = 0

    def flush(): Unit = {
      if (pieces.nonEmpty) {
        blocks += assemble(pieces, curTag, boilerDepth > 0)
        pieces.clear()
      }
    }

    def walk(e: Elem): Unit = {
      e.children.foreach {
        case t: Text =>
          pieces += Piece(t.raw, t.off, linkDepth > 0)
        case el: Elem if Skipped.contains(el.name) => // no text contribution
        case el: Elem if el.name == "table" =>
          flush()
          tables += extractTable(el)
        case el: Elem if el.name == "br" =>
          pieces += Piece(" ", -1, linkDepth > 0)
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
    */
  private def assemble(pieces: ArrayBuffer[Piece], tag: String, inBoiler: Boolean): Block = {
    var linkChars = 0
    var textChars = 0
    val sb = new java.lang.StringBuilder
    var startOff = -1
    var endOff = -1
    var pendingSpace = false
    var started = false
    pieces.foreach { p =>
      // raw concatenation is fine: entities never span text tokens
      val dec = Entities.decode(p.raw)
      var i = 0
      while (i < dec.length) {
        val c = dec.charAt(i)
        if (isWs(c)) pendingSpace = true
        else {
          if (pendingSpace && started) sb.append(' ')
          sb.append(c)
          pendingSpace = false
          started = true
          textChars += 1
          if (p.link) linkChars += 1
        }
        i += 1
      }
      if (p.off >= 0) {
        if (startOff < 0) startOff = p.off
        endOff = p.off + p.raw.length
      }
    }
    val norm = sb.toString
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
      case t: Text => sb.append(t.raw)
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
