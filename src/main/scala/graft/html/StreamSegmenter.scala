package graft.html

import scala.collection.mutable.ArrayBuffer
import DomBuilder.{Elem, Text, Node, Void, BlockLevel, Skipped}
import Blocks.{Block, TableData}

/** Single-pass HTML segmentation: tokenizer events → blocks/tables/title
  * directly, with NO materialized token buffer and NO DOM tree (SURVEY.md
  * E10, fused form). Produces output IDENTICAL to
  * `Blocks.segment(DomBuilder.build(Tokenizer.tokenize(s, keepAttrs =
  * false)))` plus `Boilerplate.titleOf` — the tree pipeline stays as the
  * differential-test reference (`StreamSegmenterSpec` pins equality on
  * fixtures and mutated-HTML properties).
  *
  * Why: the tree path allocates ~17 KB/doc in token + DOM structures for a
  * ~1 KB page; at 100 TB the allocation rate — not CPU — is what stops wide
  * executors scaling (BENCH/BASELINE.md). The stream form keeps only a
  * name/flag stack (flat arrays) and the per-thread piece scratch.
  *
  * Equivalence argument, by construction:
  *  - the element stack performs exactly [[DomBuilder.build]]'s repair
  *    (implied closes, close-up-to, ignore stray `</p>`, void/self-closing
  *    never pushed, close-all at EOF) — push order equals the finished
  *    tree's pre-order;
  *  - [[Blocks.segment]]'s walk effects are keyed to tree positions the walk
  *    actually enters: an element inside a skipped subtree or a table
  *    subtree has NO block/boiler/link effect. Here that is the
  *    `FSuppressed` bit, decided at push time from the enclosing state, and
  *    pop effects mirror the walk's returns (flush + curTag restore);
  *  - `<table>` subtrees are mirrored into a real `Elem` tree (tables are
  *    rare) and handed to the same [[Blocks.extractTable]] when the table
  *    entry pops;
  *  - the first `<title>` in push order is the first in pre-order, so title
  *    capture matches `titleOf`'s first-match semantics (including the
  *    empty string for a childless first title).
  */
object StreamSegmenter {

  final case class Result(blocks: Vector[Block], tables: Vector[TableData],
                          title: String)

  def segment(decoded: String): Result = {
    val seg = new Seg
    Tokenizer.stream(decoded, seg)
    seg.finish()
  }

  private val FBlock = 1
  private val FBoiler = 2
  private val FLink = 4
  private val FSkip = 8
  private val FTable = 16
  private val FSuppressed = 32

  private val SibLi = Set("li");          private val StopLi = Set("ul", "ol")
  private val SibDt = Set("dt", "dd");    private val StopDt = Set("dl")
  private val SibTr = Set("tr", "td", "th"); private val StopTr = Set("table")
  private val SibTd = Set("td", "th");    private val StopTd = Set("tr", "table")
  private val SibOpt = Set("option");     private val StopOpt = Set("select")

  private final class Seg extends Tokenizer.Sink {
    private val blocks = new ArrayBuffer[Block]
    private val tables = new ArrayBuffer[TableData]
    private val pieces = Blocks.scratch.get()
    pieces.clear()
    private var curTag = "body"
    private var boilerDepth = 0
    private var linkDepth = 0
    private var skipDepth = 0

    // element stack; the tree's "#root" is implicit below index 0
    private var names = new Array[String](32)
    private var eflags = new Array[Int](32)
    private var prevTags = new Array[String](32)
    private var depth = 0

    // <table> subtree mirror (rare): built only while capturing
    private var capturing = false
    private var captureRootIdx = -1
    private var captureRoot: Elem = null
    private val captureStack = new ArrayBuffer[Elem]

    // first-<title> capture: -1 pending, >=0 open entry index, -2 done
    private var titleIdx = -1
    private var titleSb: java.lang.StringBuilder = null
    private var title: String = null

    private def flush(): Unit =
      if (pieces.n > 0) {
        blocks += Blocks.assemble(pieces, curTag, boilerDepth > 0)
        pieces.clear()
      }

    private def hasOpen(name: String): Boolean = {
      var i = depth - 1
      while (i >= 0) { if (names(i) == name) return true; i -= 1 }
      false
    }
    private def lastIndexOf(name: String): Int = {
      var i = depth - 1
      while (i >= 0) { if (names(i) == name) return i; i -= 1 }
      -1
    }

    private def capturePush(name: String, pushed: Boolean): Unit = {
      val el = Elem(name, Nil, new ArrayBuffer[Node])
      captureStack(captureStack.length - 1).children += el
      if (pushed) captureStack += el
    }

    private def popOne(): Unit = {
      depth -= 1
      val f = eflags(depth)
      if (capturing) {
        if (depth > captureRootIdx) {
          if (captureStack.length > 1) captureStack.remove(captureStack.length - 1)
        } else { // the capture root itself pops → the subtree is complete
          tables += Blocks.extractTable(captureRoot)
          capturing = false
          captureRoot = null
          captureRootIdx = -1
          captureStack.clear()
        }
      }
      if ((f & FSkip) != 0) skipDepth -= 1
      if ((f & FSuppressed) == 0) {
        // the walk's return order: flush the block FIRST (its pieces carry
        // the still-active boiler/link context), then drop the depths
        if ((f & FBlock) != 0) { flush(); curTag = prevTags(depth) }
        if ((f & FLink) != 0) linkDepth -= 1
        if ((f & FBoiler) != 0) boilerDepth -= 1
      }
      if (depth == titleIdx) {
        title = Blocks.collapse(graft.text.Entities.decode(titleSb.toString))
        titleSb = null
        titleIdx = -2
      }
      names(depth) = null
      prevTags(depth) = null
    }

    private def closeSiblings(sib: Set[String], stopAt: Set[String]): Unit = {
      var idx = depth - 1
      while (idx >= 0 && !stopAt.contains(names(idx))) {
        if (sib.contains(names(idx))) {
          while (depth > idx) popOne()
          return
        }
        idx -= 1
      }
    }

    private def impliedCloses(incoming: String): Unit = {
      if (BlockLevel.contains(incoming) && hasOpen("p")) {
        val pIdx = lastIndexOf("p")
        if (pIdx >= 0) while (depth > pIdx) popOne()
      }
      incoming match {
        case "li" => closeSiblings(SibLi, StopLi)
        case "dt" | "dd" => closeSiblings(SibDt, StopDt)
        case "tr" => closeSiblings(SibTr, StopTr)
        case "td" | "th" => closeSiblings(SibTd, StopTd)
        case "option" => closeSiblings(SibOpt, StopOpt)
        case _ =>
      }
    }

    override def onStart(name: String, selfClosing: Boolean, pos: Int, end: Int): Unit = {
      impliedCloses(name)
      val pushed = !selfClosing && !Void.contains(name)
      if (!pushed) {
        // a leaf element in the tree (void or self-closing)
        if (capturing) capturePush(name, pushed = false)
        else if (skipDepth == 0) {
          // branch order mirrors the walk: Skipped, table, br, generic
          if (Skipped.contains(name)) ()
          else if (name == "table") {
            flush()
            tables += Blocks.extractTable(Elem(name, Nil, new ArrayBuffer[Node]))
          } else if (name == "br")
            pieces.add(" ", 0, 1, linkDepth > 0, real = false)
          else if (BlockLevel.contains(name))
            flush() // e.g. <hr>: block boundary with no content
        }
        if (name == "title" && titleIdx == -1) { title = ""; titleIdx = -2 }
        return
      }
      var f = 0
      if (Skipped.contains(name)) f |= FSkip
      if (name == "table") f |= FTable
      if (BlockLevel.contains(name)) f |= FBlock
      if (BoilerContainersOf(name)) f |= FBoiler
      if (name == "a") f |= FLink
      if (capturing) {
        capturePush(name, pushed = true)
        f |= FSuppressed
      } else if (skipDepth > 0) {
        f |= FSuppressed
      } else if ((f & FSkip) != 0) {
        // the walk's Skipped branch applies no block/boiler/link effect
        f |= FSuppressed
      } else if ((f & FTable) != 0) {
        // the walk's table branch: flush, then the subtree feeds ONLY
        // extractTable (no curTag change, no pieces)
        flush()
        captureRoot = Elem(name, Nil, new ArrayBuffer[Node])
        captureStack += captureRoot
        captureRootIdx = depth
        capturing = true
        f |= FSuppressed
      } else {
        if (depth == prevTags.length) grow()
        if ((f & FBlock) != 0) { flush(); prevTags(depth) = curTag; curTag = name }
        if ((f & FBoiler) != 0) boilerDepth += 1
        if ((f & FLink) != 0) linkDepth += 1
      }
      if ((f & FSkip) != 0) skipDepth += 1
      if (name == "title" && titleIdx == -1) {
        titleIdx = depth
        titleSb = new java.lang.StringBuilder
      }
      if (depth == names.length) grow()
      names(depth) = name
      eflags(depth) = f
      depth += 1
    }

    private def grow(): Unit = {
      val cap = names.length * 2
      names = java.util.Arrays.copyOf(names, cap)
      eflags = java.util.Arrays.copyOf(eflags, cap)
      prevTags = java.util.Arrays.copyOf(prevTags, cap)
    }

    override def onEnd(name: String, pos: Int, end: Int): Unit = {
      if (name == "p" && !hasOpen("p")) return // WHATWG: implies <p></p>; no text
      val idx = lastIndexOf(name)
      if (idx < 0) return // stray end tag, ignored
      while (depth > idx) popOne()
    }

    override def onText(src: String, a: Int, b: Int): Unit = {
      if (titleIdx >= 0 && depth == titleIdx + 1) titleSb.append(src, a, b)
      if (capturing) captureStack(captureStack.length - 1).children += Text(src, a, b)
      else if (skipDepth == 0) pieces.add(src, a, b, linkDepth > 0, real = true)
    }

    def finish(): Result = {
      while (depth > 0) popOne()
      flush()
      Result(blocks.toVector, tables.toVector, if (title == null) "" else title)
    }
  }

  @inline private def BoilerContainersOf(name: String): Boolean =
    name == "nav" || name == "header" || name == "footer" || name == "aside"
}
