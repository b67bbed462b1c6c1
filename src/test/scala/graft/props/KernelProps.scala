package graft.props

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import java.nio.charset.StandardCharsets

/** ScalaCheck properties (SURVEY §5): totality, determinism, idempotence,
  * and algebraic invariants of the pure kernels over arbitrary inputs.
  */
object KernelProps extends Properties("graft.kernel") {

  private val bytesGen: Gen[Array[Byte]] =
    Gen.containerOf[Array, Byte](Gen.chooseNum(Byte.MinValue, Byte.MaxValue))

  private val htmlishGen: Gen[String] = {
    val frag = Gen.oneOf(
      Gen.alphaNumStr.map(s => s"<p>$s</p>"),
      Gen.alphaNumStr.map(s => s"<div>$s"),
      Gen.alphaNumStr.map(s => s"</$s>"),
      Gen.const("<nav><a href=x>l</a></nav>"),
      Gen.const("<script>var x='<p>';</script>"),
      Gen.alphaNumStr.map(s => s"&$s;"),
      Gen.const("<table><tr><td>c</td></tr></table>"),
      Gen.alphaNumStr)
    Gen.listOf(frag).map(_.mkString)
  }

  property("charset decode is total and deterministic") = forAll(bytesGen) { b =>
    graft.text.Charsets.decode(b) == graft.text.Charsets.decode(b)
  }

  property("kernel is total over arbitrary bytes") = forAll(bytesGen) { b =>
    val r = graft.pipeline.Kernel.extractOne(b)
    r.status == "processed" || r.status == "error"
  }

  property("html extraction deterministic over tag-soup") = forAll(htmlishGen) { h =>
    val b = h.getBytes(StandardCharsets.UTF_8)
    graft.html.Boilerplate.extract(b) == graft.html.Boilerplate.extract(b)
  }

  property("extracted text never contains boilerplate separators run-on") =
    forAll(htmlishGen) { h =>
      val t = graft.html.Boilerplate.extract(h.getBytes(StandardCharsets.UTF_8)).text
      !t.contains("\n\n\n") && !t.startsWith("\n") && !t.endsWith("\n")
    }

  property("collapse is idempotent") = forAll { s: String =>
    val once = graft.html.Blocks.collapse(s)
    graft.html.Blocks.collapse(once) == once
  }

  property("page assembly is associative w.r.t. concatenation (E3 contract)") =
    forAll(Gen.listOf(Gen.alphaNumStr)) { pages =>
      val joined = pages.mkString("\n\n")
      (pages match {
        case a :: rest if rest.nonEmpty =>
          a + "\n\n" + rest.mkString("\n\n") == joined
        case _ => true
      }): Prop
    }

  property("minhash signature length fixed; est jaccard of identical doc = 1") =
    forAll(Gen.alphaNumStr.suchThat(_.nonEmpty)) { s =>
      val p = graft.ops.Dedup.MinHashParams()
      val sig = graft.ops.Dedup.minhashSignature(s, p)
      sig.length == p.numHashes &&
        sig.sameElements(graft.ops.Dedup.minhashSignature(s, p))
    }

  property("jaccard is symmetric and bounded") =
    forAll(Gen.listOf(Gen.posNum[Long]), Gen.listOf(Gen.posNum[Long])) { (a, b) =>
      val j1 = graft.ops.Dedup.jaccard(a.toSet, b.toSet)
      val j2 = graft.ops.Dedup.jaccard(b.toSet, a.toSet)
      j1 == j2 && j1 >= 0.0 && j1 <= 1.0
    }

  property("pdf extractor total over truncations of a valid pdf") = {
    val base = graft.pdf.MiniPdf.build(
      Seq(graft.pdf.MiniPdf.streamFor(Seq(("stable text", 72, 700)))), flate = true)
    forAll(Gen.chooseNum(0, base.length)) { cut =>
      val r = graft.pipeline.Kernel.extractOne(base.take(cut))
      r.status == "processed" || r.status == "error"
    }
  }

  property("sha256 doc id matches across invocations and thread instances") =
    forAll(Gen.alphaNumStr) { s =>
      val d1 = java.security.MessageDigest.getInstance("SHA-256")
      val d2 = java.security.MessageDigest.getInstance("SHA-256")
      graft.pipeline.Extract.sha256Hex(s, d1) == graft.pipeline.Extract.sha256Hex(s, d2)
    }
}
