package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextStatsSpec extends AnyFunSuite {

  private val spark = graft.TestSpark.spark
  import spark.implicits._

  private def one(text: String, c: org.apache.spark.sql.Column): Any =
    Seq(text).toDF("t").select(c.as("v")).head().get(0)

  test("tokenCountWs matches len(text.split()) semantics") {
    assert(one("a b  c", TextStats.tokenCountWs(col("t"))) == 3)
    assert(one("  padded  ", TextStats.tokenCountWs(col("t"))) == 1)
    assert(one("", TextStats.tokenCountWs(col("t"))) == 0)
    assert(one("   ", TextStats.tokenCountWs(col("t"))) == 0)
  }

  test("tokenCountBpe: letter runs, digit runs, single punct") {
    assert(one("hello world", TextStats.tokenCountBpe(col("t"))) == 2)
    assert(one("ab12cd", TextStats.tokenCountBpe(col("t"))) == 3)
    assert(one("a, b!", TextStats.tokenCountBpe(col("t"))) == 4)
  }

  test("char-class counters") {
    assert(one("Ab 1!", TextStats.upperCount(col("t"))) == 1)
    assert(one("Ab 1!", TextStats.digitCount(col("t"))) == 1)
    assert(one("Ab 1!", TextStats.punctCount(col("t"))) == 1)
    assert(one("a\tb\nc", TextStats.spaceCount(col("t"))) == 2)
  }

  test("quality score: prose scores high, garbage scores low") {
    val prose = ("The committee approved the proposal after a long discussion about " +
      "the merits of each option and the costs involved for every department " +
      "over the coming fiscal year with careful attention to detail ") * 3
    val garbage = "@@@@ #### $$$$ 1234 5678 !!!! %%%% ^^^^ &&&& 9999 0000 ****"
    val pq = one(prose, TextStats.qualityScore(col("t"))).asInstanceOf[Double]
    val gq = one(garbage, TextStats.qualityScore(col("t"))).asInstanceOf[Double]
    assert(pq > 80.0, s"prose=$pq")
    assert(gq < 40.0, s"garbage=$gq")
    assert(pq <= 100.0 && gq >= 0.0)
  }

  test("langId on natural sentences of each language") {
    val samples = Seq(
      ("en", "The quick brown fox jumps over the lazy dog and it was not the only one for that day"),
      ("es", "El perro salta sobre la valla y los niños juegan en el parque con una pelota para su amigo"),
      ("de", "Der Hund springt über den Zaun und die Kinder spielen nicht mit dem Ball von der Schule"),
      ("fr", "Le chien saute par dessus la barrière et les enfants jouent dans le parc avec une balle pour le chat"),
      ("zh", "今天天气很好我们一起去公园散步吧这是一个测试文档"))
    val got = samples.toDF("expected", "t")
      .select(col("expected"), TextStats.langId(col("t")).as("pred"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    got.foreach { case (exp, pred) => assert(exp == pred, s"expected=$exp pred=$pred") }
  }

  test("langId: no signal → und") {
    assert(one("zzz qqq xxx", TextStats.langId(col("t"))) == "und")
  }

  test("fingerprint64 invariant to whitespace runs and case") {
    val a = one("Hello  World", TextStats.fingerprint64(col("t")))
    val b = one("hello world", TextStats.fingerprint64(col("t")))
    val c = one("hello there", TextStats.fingerprint64(col("t")))
    assert(a == b)
    assert(a != c)
  }
}
