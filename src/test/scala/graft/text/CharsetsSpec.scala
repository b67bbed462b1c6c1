package graft.text

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets

/** Encoding-detection fixtures (FIXTURES.md §3.2). */
class CharsetsSpec extends AnyFunSuite {

  test("enc-utf8-bom: UTF-8 BOM + café") {
    val bytes = Array(0xEF, 0xBB, 0xBF).map(_.toByte) ++ "café".getBytes(StandardCharsets.UTF_8)
    val (cs, text) = Charsets.decode(bytes)
    assert(cs == "UTF-8")
    assert(text == "café")
  }

  test("enc-utf16le-bom") {
    val bytes = Array(0xFF, 0xFE).map(_.toByte) ++ "hola".getBytes(StandardCharsets.UTF_16LE)
    val (cs, text) = Charsets.decode(bytes)
    assert(cs == "UTF-16LE")
    assert(text == "hola")
  }

  test("enc-meta-anchored: charset= outside a <meta> tag never hijacks detection") {
    // script text, a comment, and visible text all carry charset= decoys;
    // payload is valid UTF-8 so detection must land on UTF-8
    val html = "<html><head><script>var charset=\"utf-16be\";</script>" +
      "<!-- charset=shift_jis --></head><body>set charset=koi8-r here</body></html>"
    val (cs, _) = Charsets.decode(html.getBytes(StandardCharsets.UTF_8))
    assert(cs == "UTF-8")
  }

  test("enc-meta-anchored: charset in the SECOND meta tag is still found") {
    val html = "<html><head><meta name=\"viewport\" content=\"width=device-width\">" +
      "<meta http-equiv=\"content-type\" content=\"text/html; charset=windows-1252\"></head>"
    val cs = Charsets.metaCharset(html.getBytes(StandardCharsets.ISO_8859_1))
    assert(cs.map(_.name).contains("windows-1252"))
  }

  test("enc-meta-anchored: charset= after the meta tag's close is ignored") {
    val html = "<html><head><meta name=\"a\" content=\"b\"><p>charset=koi8-r</p></head>"
    assert(Charsets.metaCharset(html.getBytes(StandardCharsets.ISO_8859_1)).isEmpty)
  }

  test("enc-meta-charset: windows-1252 with curly quote byte 0x93") {
    val head = "<html><head><meta charset=\"windows-1252\"></head><body>"
    val bytes = head.getBytes(StandardCharsets.ISO_8859_1) ++
      Array(0x93.toByte) ++ "q".getBytes(StandardCharsets.ISO_8859_1)
    val (cs, text) = Charsets.decode(bytes)
    assert(cs == "windows-1252")
    assert(text.contains("“q")) // 0x93 in cp1252 = left double quotation mark
  }

  test("enc-meta-http-equiv: ISO-8859-1") {
    val html = "<meta http-equiv=\"Content-Type\" content=\"text/html; charset=ISO-8859-1\">x"
    val (cs, _) = Charsets.decode(html.getBytes(StandardCharsets.ISO_8859_1))
    assert(cs == "ISO-8859-1")
  }

  test("enc-valid-utf8-no-decl: mañana detected by validation") {
    val (cs, text) = Charsets.decode("mañana".getBytes(StandardCharsets.UTF_8))
    assert(cs == "UTF-8")
    assert(text == "mañana")
  }

  test("enc-invalid-utf8-fallback: windows-1252, no replacement chars") {
    val bytes = Array[Byte]('a', 0xE9.toByte, 'b') // é in latin-1, invalid UTF-8
    val (cs, text) = Charsets.decode(bytes)
    assert(cs == "windows-1252")
    assert(text == "aéb")
    assert(!text.contains('�'))
  }

  test("enc-decl-beyond-1024: declaration past sniff window ignored") {
    val pad = "<!-- " + ("x" * 1100) + " -->"
    val html = pad + "<meta charset=\"ISO-8859-1\">hi"
    val (cs, _) = Charsets.decode(html.getBytes(StandardCharsets.US_ASCII))
    assert(cs == "UTF-8") // pure-ASCII payload validates as UTF-8
  }

  test("utf8 validator rejects overlongs and surrogates") {
    assert(!Charsets.isValidUtf8(Array(0xC0, 0xAF).map(_.toByte)))       // overlong '/'
    assert(!Charsets.isValidUtf8(Array(0xED, 0xA0, 0x80).map(_.toByte))) // surrogate
    assert(Charsets.isValidUtf8(Array(0xF0, 0x9F, 0x98, 0x80).map(_.toByte))) // emoji
  }

  test("property: decode is total and deterministic over arbitrary bytes") {
    val rnd = new scala.util.Random(42)
    (1 to 300).foreach { _ =>
      val bytes = Array.fill(rnd.nextInt(512))(rnd.nextInt(256).toByte)
      val a = Charsets.decode(bytes)
      val b = Charsets.decode(bytes)
      assert(a == b)
    }
  }
}
