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

  test("PII counts: email, phone, IPv4") {
    val t = "write bob.smith+x@mail.example.org or call +1-555-0142 from 10.2.0.1"
    assert(one(t, TextStats.emailCount(col("t"))) == 1)
    assert(one(t, TextStats.phoneCount(col("t"))) == 1)
    assert(one(t, TextStats.ipCount(col("t"))) == 1)
    assert(one("no pii here", TextStats.emailCount(col("t"))) == 0)
  }

  test("scrubPii redacts all three and placeholders never re-match") {
    val t = "a@b.co and 1.2.3.4 and +12-3456-7890 end"
    val s = one(t, TextStats.scrubPii(col("t"))).toString
    assert(s == "<EMAIL> and <IP> and <PHONE> end")
    // idempotent: a second scrub changes nothing
    val s2 = one(s, TextStats.scrubPii(col("t"))).toString
    assert(s2 == s)
  }

  test("scrubPii: version-like dotted numbers inside words are not IPs") {
    // \b is satisfied at letter/digit boundary? 'v' is a word char, so
    // "v1.2.3.4" has no boundary before '1' — stays unredacted
    assert(one("v1.2.3.4", TextStats.scrubPii(col("t"))).toString == "v1.2.3.4")
  }

  test("wordNgrams and dupNgramRatio") {
    assert(one("a b a b c", TextStats.wordNgrams(col("t"), 2))
      .asInstanceOf[scala.collection.Seq[String]].toSeq == Seq("a b", "b a", "a b", "b c"))
    assert(one("a b a b c", TextStats.dupNgramRatio(col("t"), 2)) == 0.25)
    // below n words -> no n-grams -> ratio 0
    assert(one("one two", TextStats.dupNgramRatio(col("t"), 3)) == 0.0)
    assert(one("", TextStats.dupNgramRatio(col("t"), 2)) == 0.0)
    // pure repetition: "x x x x" bigrams are all "x x" -> 1 - 1/3
    val r = one("x x x x", TextStats.dupNgramRatio(col("t"), 2)).asInstanceOf[Double]
    assert(math.abs(r - (1.0 - 1.0 / 3.0)) < 1e-12)
  }

  test("stratified sample: deterministic, rate-respecting, partition-stable") {
    val df = (0L until 2000L).map(i => (i, Seq("en", "es", "zh")((i % 3).toInt)))
      .toDF("doc_id", "lang")
    val kept = Sampling.stratifiedSample(df, "doc_id", "lang")
    val again = Sampling.stratifiedSample(df.repartition(7), "doc_id", "lang")
    assert(kept.collect().toSet == again.collect().toSet) // partitioning-invariant
    val byLang = kept.groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // ~667 docs per lang; rates 50/80/30 percent with splitmix64 uniformity
    assert(byLang("en") > 250 && byLang("en") < 420)
    assert(byLang("es") > 450 && byLang("es") < 620)
    assert(byLang("zh") > 130 && byLang("zh") < 270)
    // unknown stratum falls to the 5% default
    val other = Sampling.stratifiedSample(
      (0L until 1000L).map((_, "xx")).toDF("doc_id", "lang"), "doc_id", "lang")
    val n = other.count()
    assert(n > 15 && n < 110, s"default-rate kept $n of 1000")
  }
}
