package graft.html

import org.scalatest.funsuite.AnyFunSuite

/** Differential gate for the fused streaming segmenter: for ANY input, its
  * (blocks, tables, title) must equal the tree pipeline's
  * `Blocks.segment(DomBuilder.build(tokenize(s, keepAttrs=false)))` +
  * `Boilerplate.titleOf`. The tree path is the reference implementation.
  */
class StreamSegmenterSpec extends AnyFunSuite {

  private def tree(s: String): (Vector[Blocks.Block], Vector[Blocks.TableData], String) = {
    val dom = DomBuilder.build(Tokenizer.tokenize(s, keepAttrs = false))
    val seg = Blocks.segment(dom)
    (seg.blocks, seg.tables, Boilerplate.titleOf(dom))
  }

  private def check(s: String): Unit = {
    val r = StreamSegmenter.segment(s)
    val (b, t, ti) = tree(s)
    assert(r.blocks == b, s"blocks diverge on: $s")
    assert(r.tables == t, s"tables diverge on: $s")
    assert(r.title == ti, s"title diverges on: $s")
  }

  test("fixture shapes match the tree pipeline") {
    Seq(
      "<html><head><title>T &amp; U</title></head><body><p>Body text.</p></body></html>",
      "<body><nav><a href=x>n</a></nav><p>Content here today.</p></body>",
      "<div>a<p>para one<p>para two</div>trailing",
      "<ul><li>one<li>two<li>three</ul>",
      "<table><tr><th>k</th><th>v</th></tr><tr><td>a</td><td>1</td></tr></table>",
      "<div>pre<table><tr><td>cell</td></tr></table>post</div>",
      "<table><tr><td><table><tr><td>inner</td></tr></table></td></tr></table>",
      "<p>a<br>b<br/>c</p>",
      "<p>x</p><hr><p>y</p>",
      "<header><div><a href='/'>Site</a></div></header><main><h1>H</h1><p>B</p></main>",
      "<noscript><p>hidden</p></noscript><p>shown</p>",
      "<svg><title>svg title</title><rect/></svg><p>after</p>",
      "<head><title>first</title></head><body><title>second</title><p>t</p></body>",
      "<title/>then<title>late</title>",
      "<table/>after-empty-table",
      "<p>open a <a href=x>link text</a> close</p>",
      "<aside><p>boiler</p></aside><p>main</p>",
      "<div><noscript><div>deep</div></noscript>out</div>",
      "<table><tr><td>c1<noscript>skip</noscript>c2</td></tr></table>",
      "<p>before<table><tr><td>t</td></tr></table>middle<table><tr><td>u</td></tr></table>after</p>",
      "<div>a</div inside junk>b",
      "<p>ent &lt;tag&gt; &amp; &nbsp;done</p>",
      "<textarea>raw <b>not-a-tag</b> text</textarea><p>after</p>",
      "<script>var x = '<p>nope</p>';</script><p>real</p>",
      "<dl><dt>t1<dd>d1<dt>t2<dd>d2</dl>",
      "<select><option>one<option>two</select><p>after</p>",
      "<tr><td>stray row outside table</td></tr>",
      "</p>stray close<p>then text",
      "<div><p>unclosed everywhere",
      "<DIV><P>Upper Case</P></DIV>",
      "",
      "plain text only",
      "<p>&#65;&#x42;C</p>",
    ).foreach(check)
  }

  test("property: stream == tree on random tag soup") {
    val rnd = new scala.util.Random(42)
    val tags = Array("div", "p", "span", "a", "li", "ul", "table", "tr", "td",
      "nav", "header", "footer", "aside", "noscript", "title", "script",
      "br", "hr", "b", "h1", "svg", "textarea", "select", "option", "dt", "dd")
    val words = Array("alpha", "beta &amp;", "gamma", " ", "x&nbsp;y", "1.2")
    (1 to 2000).foreach { _ =>
      val sb = new StringBuilder
      val n = 3 + rnd.nextInt(25)
      (1 to n).foreach { _ =>
        rnd.nextInt(5) match {
          case 0 => sb.append('<').append(tags(rnd.nextInt(tags.length))).append('>')
          case 1 => sb.append("</").append(tags(rnd.nextInt(tags.length))).append('>')
          case 2 => sb.append(words(rnd.nextInt(words.length)))
          case 3 => sb.append('<').append(tags(rnd.nextInt(tags.length))).append("/>")
          case _ => sb.append('<').append(tags(rnd.nextInt(tags.length)))
            .append(" x=\"").append(words(rnd.nextInt(words.length))).append("\">")
        }
      }
      check(sb.toString)
    }
  }

  test("property: stream == tree on mutated realistic pages") {
    val rnd = new scala.util.Random(7)
    val base = graft.io.SyntheticPages.pageFor(3L,
      ("w1 the quick brown fox jumps over the lazy dog ") * 12, "en")
    val html = new String(base.payload, java.nio.charset.StandardCharsets.UTF_8)
    (1 to 500).foreach { _ =>
      val chars = html.toCharArray
      val mutated = rnd.nextInt(3) match {
        case 0 => new String(chars, 0, rnd.nextInt(chars.length))
        case 1 =>
          val i = rnd.nextInt(chars.length)
          chars(i) = "<>&\"'/x".charAt(rnd.nextInt(7)); new String(chars)
        case _ => new String(chars) + new String(chars, 0, rnd.nextInt(chars.length))
      }
      check(mutated)
    }
  }

  test("property: Tokenizer.stream emits exactly tokenize(keepAttrs=false)") {
    val rnd = new scala.util.Random(11)
    val frags = Array("<div>", "</div>", "<a x='1' y>", "text &amp; more", "<br/>",
      "<!-- c -->", "<!DOCTYPE html>", "<script>s<t</script>", "<p", "</3", "<3",
      "<title>t</title>", "< div>", "</ div>", "<b/>", "x=\"unterm")
    (1 to 1000).foreach { _ =>
      val s = (1 to 1 + rnd.nextInt(12)).map(_ => frags(rnd.nextInt(frags.length))).mkString
      val events = new StringBuilder
      Tokenizer.stream(s, new Tokenizer.Sink {
        def onStart(name: String, selfClosing: Boolean, pos: Int, end: Int): Unit =
          events.append(s"S:$name:$selfClosing:$pos:$end;")
        def onEnd(name: String, pos: Int, end: Int): Unit =
          events.append(s"E:$name:$pos:$end;")
        def onText(src: String, a: Int, b: Int): Unit =
          events.append(s"T:$a:$b;")
      })
      val expected = Tokenizer.tokenize(s, keepAttrs = false).collect {
        case Tokenizer.TStart(n, _, sc, p, e) => s"S:$n:$sc:$p:$e;"
        case Tokenizer.TEnd(n, p, e) => s"E:$n:$p:$e;"
        case Tokenizer.TText(_, a, b) => s"T:$a:$b;"
      }.mkString
      assert(events.toString == expected, s"token streams diverge on: $s")
    }
  }

  test("synthetic corpus pages match exactly") {
    (0L until 200L).foreach { id =>
      val spec = graft.io.SyntheticPages.pageFor(id,
        s"word$id sample text for documents and extraction " * 8,
        Seq("en", "es", "de", "fr", "zh")((id % 5).toInt))
      if (!graft.pipeline.Kernel.isPdf(spec.payload)) {
        val (_, decoded) = graft.text.Charsets.decode(spec.payload)
        check(decoded)
      }
    }
  }
}
