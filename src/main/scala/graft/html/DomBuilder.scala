package graft.html

import scala.collection.mutable.ArrayBuffer
import Tokenizer._

/** Tag-stack DOM builder with implied-end-tag repair (SURVEY.md E10, second
  * stage; `bp-implied-tags` fixture: tag-soup must yield the same blocks as the
  * well-formed equivalent).
  *
  * HTML5-lite repair rules:
  *   - void elements never take children;
  *   - `<p>` closes an open `p`; `li` closes `li`; `dt|dd` close `dt|dd`;
  *     `tr` closes `tr|td|th`; `td|th` close `td|th`; `option` closes `option`;
  *     opening any block-level element closes an open `p`;
  *   - an end tag pops up to its nearest matching open element, or is ignored
  *     if none is open (stray `</div>`);
  *   - unclosed elements are closed at EOF.
  */
object DomBuilder {

  sealed trait Node
  final case class Elem(name: String, attrs: List[(String, String)],
                        children: ArrayBuffer[Node]) extends Node
  /** Raw text as a SLICE of the decoded source ([off, end); entities not
    * decoded) — no per-node copy; downstream scans the slice in place.
    */
  final case class Text(src: String, off: Int, end: Int) extends Node {
    def raw: String = src.substring(off, end)
  }

  val Void: Set[String] = Set("area", "base", "br", "col", "embed", "hr", "img",
    "input", "link", "meta", "param", "source", "track", "wbr")

  /** Block-level elements: opening one closes an open `<p>`, and these are the
    * block boundaries used downstream (Blocks.scala).
    */
  val BlockLevel: Set[String] = Set(
    "address", "article", "aside", "blockquote", "canvas", "dd", "div", "dl",
    "dt", "fieldset", "figcaption", "figure", "footer", "form", "h1", "h2",
    "h3", "h4", "h5", "h6", "header", "hr", "li", "main", "nav", "noscript",
    "ol", "p", "pre", "section", "table", "tbody", "td", "tfoot", "th",
    "thead", "tr", "ul")

  /** Tags skipped entirely — no text contribution (script/style raw text,
    * head metadata, embedded non-content).
    */
  val Skipped: Set[String] = Set("script", "style", "head", "noscript",
    "template", "iframe", "svg", "object", "select", "datalist", "xmp", "title")

  def build(toks: collection.Seq[Tok]): Elem = {
    val root = Elem("#root", Nil, new ArrayBuffer[Node])
    val stack = new ArrayBuffer[Elem]
    stack += root

    @inline def top: Elem = stack(stack.length - 1)
    // allocation-free open-element probe (stack.map(_.name).contains built a
    // Seq per start tag — per-tag garbage in the hottest loop)
    def hasOpen(name: String): Boolean = {
      var i = stack.length - 1
      while (i > 0) { if (stack(i).name == name) return true; i -= 1 }
      false
    }

    def closeOne(): Unit = if (stack.length > 1) stack.remove(stack.length - 1)

    def closeUpTo(name: String): Boolean = {
      val idx = stack.lastIndexWhere(_.name == name)
      if (idx <= 0) false
      else { while (stack.length > idx) closeOne(); true }
    }

    def impliedCloses(incoming: String): Unit = {
      // p: any block-level opener closes it
      if (BlockLevel.contains(incoming) && hasOpen("p")) {
        // only close if p is above the nearest table cell/structural boundary
        val pIdx = stack.lastIndexWhere(_.name == "p")
        if (pIdx > 0) while (stack.length > pIdx) closeOne()
      }
      def closeSiblings(names: Set[String], stopAt: Set[String]): Unit = {
        var idx = stack.length - 1
        while (idx > 0 && !stopAt.contains(stack(idx).name)) {
          if (names.contains(stack(idx).name)) {
            while (stack.length > idx) closeOne()
            return
          }
          idx -= 1
        }
      }
      incoming match {
        case "li" => closeSiblings(Set("li"), Set("ul", "ol"))
        case "dt" | "dd" => closeSiblings(Set("dt", "dd"), Set("dl"))
        case "tr" => closeSiblings(Set("tr", "td", "th"), Set("table"))
        case "td" | "th" => closeSiblings(Set("td", "th"), Set("tr", "table"))
        case "option" => closeSiblings(Set("option"), Set("select"))
        case _ =>
      }
    }

    toks.foreach {
      case TStart(name, attrs, selfClosing, _, _) =>
        impliedCloses(name)
        val el = Elem(name, attrs, new ArrayBuffer[Node])
        top.children += el
        if (!selfClosing && !Void.contains(name)) stack += el
      case TEnd(name, _, _) =>
        if (name == "p" && !hasOpen("p")) {
          // WHATWG: </p> with no open p implies <p></p>; irrelevant to text — skip
        } else closeUpTo(name)
      case TText(src, off, end) =>
        top.children += Text(src, off, end)
      case _ => // comments/doctype dropped
    }
    root
  }

  def parse(html: String): Elem = build(Tokenizer.tokenize(html))
}
