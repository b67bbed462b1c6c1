package graft.render

import org.scalatest.funsuite.AnyFunSuite
import graft.model.{ExtractedDoc, TableRow}

class RenderSpec extends AnyFunSuite {

  private val doc = ExtractedDoc(
    url = "https://h1.example.com/p/1", doc_id = "abc", doc_type = "html",
    text = "TITULO CORTO\n\nFirst paragraph here.\n\nSecond one.",
    spans = Nil, tables = Seq(TableRow(Seq(Seq("a", "b"), Seq("1", "2")), 1.0)),
    confidence = 91.5, page_count = 1, charset = "UTF-8", status = "processed",
    error = null, text_len = 47, word_count = 8, metadata = Map("title" -> "t"))

  test("markdown render is a pure function of row + pinned clock") {
    val a = Markdown.render(doc, "2024-01-01T00:00:00Z")
    val b = Markdown.render(doc, "2024-01-01T00:00:00Z")
    assert(a == b)
    assert(a.contains("# https://h1.example.com/p/1"))
    assert(a.contains("- **Confianza**: 91.50%"))
    assert(a.contains("- **Generado**: 2024-01-01T00:00:00Z"))
  }

  test("title heuristic: short all-caps line becomes heading (markdown_generator.py:93-96)") {
    val md = Markdown.render(doc, "t")
    assert(md.contains("### TITULO CORTO"))
    assert(md.contains("First paragraph here.\n\n"))
    assert(!md.contains("### First"))
  }

  test("pipe table render with ragged rows and pipe escaping") {
    val t = TableRow(Seq(Seq("h1", "h|2"), Seq("only")), 0.5)
    val md = Markdown.renderTable(t)
    assert(md ==
      "| h1 | h\\|2 |\n| --- | --- |\n| only |  |\n")
  }
}
