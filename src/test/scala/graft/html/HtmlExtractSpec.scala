package graft.html

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets

/** Boilerplate-removal fixtures (FIXTURES.md §3.1). */
class HtmlExtractSpec extends AnyFunSuite {

  private def extract(html: String): Boilerplate.HtmlExtract =
    Boilerplate.extract(html.getBytes(StandardCharsets.UTF_8))

  test("bp-minimal") {
    val r = extract("<html><body><p>Hello world.</p></body></html>")
    assert(r.text == "Hello world.")
    assert(r.confidence == 100.0)
  }

  test("bp-nav-strip: nav/header/footer and link lists dropped") {
    val html =
      """<html><body>
        |<header><h1><a href="/">Site name</a></h1></header>
        |<nav><ul><li><a href="/a">Home</a></li><li><a href="/b">About</a></li></ul></nav>
        |<p>First real paragraph of the article body text.</p>
        |<p>Second paragraph with more real content here.</p>
        |<footer><a href="/contact">Contact</a> · <a href="/legal">Legal</a></footer>
        |</body></html>""".stripMargin
    val r = extract(html)
    assert(r.text ==
      "First real paragraph of the article body text.\n\nSecond paragraph with more real content here.")
  }

  test("bp-link-density: 80% anchor text dropped, 5% kept") {
    val html =
      """<body>
        |<p><a href="/x">Click here for all of our related articles and more</a> now</p>
        |<p>This long sentence is mostly plain prose with one <a href="/y">tiny</a> link in it.</p>
        |</body>""".stripMargin
    val r = extract(html)
    assert(r.text ==
      "This long sentence is mostly plain prose with one tiny link in it.")
  }

  test("bp-script-style: raw-text states skipped entirely") {
    val html =
      """<body><script>var x = "<p>not content</p>";</script>
        |<style>p { color: red }</style>
        |<!-- a comment <p>also not content</p> -->
        |<p>Real content.</p></body>""".stripMargin
    val r = extract(html)
    assert(r.text == "Real content.")
  }

  test("bp-implied-tags: tag soup equals well-formed equivalent") {
    val soup = "<body><p>One<p>Two<ul><li>alpha beta<li>gamma delta</ul></div></body>"
    val clean = "<body><p>One</p><p>Two</p><ul><li>alpha beta</li><li>gamma delta</li></ul></body>"
    assert(extract(soup).text == extract(clean).text)
    assert(extract(soup).text == "One\n\nTwo\n\nalpha beta\n\ngamma delta")
  }

  test("bp-table-content: cells captured row-major into tables") {
    val html =
      """<body><p>Intro text.</p>
        |<table><tr><th>h1</th><th>h2</th></tr><tr><td>a</td><td>b</td></tr></table>
        |<p>Outro text.</p></body>""".stripMargin
    val r = extract(html)
    assert(r.text == "Intro text.\n\nOutro text.")
    assert(r.tables.size == 1)
    assert(r.tables.head.data == Vector(Vector("h1", "h2"), Vector("a", "b")))
    assert(r.tables.head.confidence == 1.0)
  }

  test("bp-nested-blocks: inline tags do not split blocks") {
    val html = "<body><div><div><p>A <b>bold</b> and <span>span\nny</span> text.</p></div></div></body>"
    val r = extract(html)
    assert(r.text == "A bold and span ny text.")
  }

  test("bp-empty: head-only page") {
    val r = extract("<html><head><title>t</title></head><body></body></html>")
    assert(r.text == "")
    assert(r.confidence == 0.0)
  }

  test("bp-whitespace: entities decoded, runs collapsed, blocks trimmed") {
    val html = "<body><p>  a\t\tb\n\nc&nbsp;d &amp; e&#33;&#x21;  </p></body>"
    val r = extract(html)
    assert(r.text == "a b c d & e!!")
  }

  test("spans point into the decoded source") {
    val html = "<body><p>Hello</p></body>"
    val r = extract(html)
    assert(r.spans.size == 1)
    val s = r.spans.head
    assert(html.substring(s.off, s.off + s.len) == "Hello")
  }

  test("html <title> captured as metadata, not content") {
    val r = extract("<html><head><title>Page &amp; Title</title></head>" +
      "<body><p>Body text.</p></body></html>")
    assert(r.title == "Page & Title")
    assert(r.text == "Body text.")
  }

  test("property: extraction is total + deterministic on mutated html") {
    val rnd = new scala.util.Random(7)
    val base = "<html><body><nav><a href=x>n</a></nav><p>Content here today.</p></body></html>"
    (1 to 300).foreach { _ =>
      val chars = base.toCharArray
      // random mutations: truncate, splice, flip chars
      val mutated = rnd.nextInt(3) match {
        case 0 => new String(chars, 0, rnd.nextInt(chars.length))
        case 1 =>
          val i = rnd.nextInt(chars.length); chars(i) = "<>&\"'/x".charAt(rnd.nextInt(7)); new String(chars)
        case _ => new String(chars) + new String(chars, 0, rnd.nextInt(chars.length))
      }
      val a = Boilerplate.extract(mutated.getBytes(StandardCharsets.UTF_8))
      val b = Boilerplate.extract(mutated.getBytes(StandardCharsets.UTF_8))
      assert(a == b)
    }
  }
}
