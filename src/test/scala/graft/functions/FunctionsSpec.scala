package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQL surface of the extraction kernel + text ops (SURVEY §2.8 v2). */
class FunctionsSpec extends AnyFunSuite {

  private val spark = graft.TestSpark.spark
  import spark.implicits._

  GraftFunctions.register(spark)

  test("graft_extract in SQL: same result as the kernel path") {
    val html = "<html><head><title>T</title></head><body><nav><a href=x>menu</a></nav>" +
      "<p>Real content paragraph.</p></body></html>"
    Seq(("u1", html.getBytes("UTF-8"))).toDF("url", "html")
      .createOrReplaceTempView("pages_v")
    val row = spark.sql(
      """SELECT e.text, e.doc_type, e.status, e.charset, e.title
        |FROM (SELECT graft_extract(html) AS e FROM pages_v)""".stripMargin).head()
    assert(row.getString(0) == "Real content paragraph.")
    assert(row.getString(1) == "html")
    assert(row.getString(2) == "processed")
    assert(row.getString(3) == "UTF-8")
    assert(row.getString(4) == "T")
  }

  test("graft_nfc / graft_strip_accents: codegen'd normalization expressions") {
    // NFC recomposition: e + U+0301 → é; already-NFC strings unchanged;
    // accent folding: é→e ñ→n ü→u Å→A; ß/ø (no decomposition) untouched;
    // NULL propagates
    Seq(("a", "re\u0301sume\u0301"), ("b", "résumé"), ("c", "ß ø plain"),
      ("d", null)).toDF("id", "t").createOrReplaceTempView("norm_v")
    val rows = spark.sql(
      "SELECT id, graft_nfc(t) AS n, graft_strip_accents(t) AS f FROM norm_v ORDER BY id")
      .collect()
    assert(rows(0).getString(1) == "résumé" && rows(0).getString(2) == "resume")
    assert(rows(1).getString(1) == "résumé" && rows(1).getString(2) == "resume")
    assert(rows(2).getString(1) == "ß ø plain" && rows(2).getString(2) == "ß ø plain")
    assert(rows(3).isNullAt(1) && rows(3).isNullAt(2))
    // astral plane survives round-trip (UTF8String ↔ String surrogates)
    val astral = spark.sql("SELECT graft_nfc('\uD835\uDC9C b')").head().getString(0)
    assert(astral == "\uD835\uDC9C b")
    // Column API matches SQL; both stay inside whole-stage codegen
    val viaCol = Seq("Ångström").toDF("t")
      .select(GraftFunctions.stripAccents(col("t"))).head().getString(0)
    assert(viaCol == "Angstrom")
    // a LocalRelation collapses to interpreted driver-side eval, so drive
    // the GENERATED code through a Range scan: values prove doGenCode
    // compiles and runs, the plan proves the expressions stay inside
    // whole-stage codegen
    val gen = spark.range(2).selectExpr(
      "graft_nfc(concat('re\u0301sume\u0301 ', string(id))) AS n",
      "graft_strip_accents(concat('r\u00e9sum\u00e9 ', string(id))) AS f")
    val genRows = gen.orderBy("n").collect()
    assert(genRows(0).getString(0) == "r\u00e9sum\u00e9 0" &&
      genRows(0).getString(1) == "resume 0")
    assert(genRows(1).getString(0) == "r\u00e9sum\u00e9 1")
    // codegen spans print as "*(n) Operator" in the condensed plan string
    val plan = gen.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"not codegen'd:\n$plan")
  }

  test("graft_extract routes PDF payloads too") {
    val pdf = graft.pdf.MiniPdf.singlePage(Seq(("Desde SQL", 72, 700)))
    Seq(("u2", pdf)).toDF("url", "html").createOrReplaceTempView("pages_pdf_v")
    val row = spark.sql(
      "SELECT graft_extract(html).text, graft_extract(html).doc_type FROM pages_pdf_v").head()
    assert(row.getString(0) == "Desde SQL")
    assert(row.getString(1) == "mixed")
  }

  test("graft_extract rejects non-binary input at analysis time") {
    Seq(("u3", "not binary")).toDF("url", "html").createOrReplaceTempView("pages_bad_v")
    val e = intercept[Exception] {
      spark.sql("SELECT graft_extract(url) FROM pages_bad_v").collect()
    }
    assert(e.getMessage.toLowerCase.contains("binary") ||
      e.getMessage.contains("DATATYPE_MISMATCH"))
  }

  test("column-tree functions work in SQL and stay consistent with the Column API") {
    val df = Seq((1L, "El perro salta sobre la valla y los niños juegan con el balón en el parque")).toDF("id", "text")
    df.createOrReplaceTempView("docs_v")
    val viaSql = spark.sql(
      "SELECT graft_langid(text) AS l, graft_tokens_ws(text) AS t, graft_quality(text) AS q, graft_fingerprint(text) AS f FROM docs_v").head()
    val viaCol = df.select(
      graft.ops.TextStats.langId(col("text")),
      graft.ops.TextStats.tokenCountWs(col("text")),
      graft.ops.TextStats.qualityScore(col("text")),
      graft.ops.TextStats.fingerprint64(col("text"))).head()
    assert(viaSql.getString(0) == viaCol.getString(0))
    assert(viaSql.getInt(1) == viaCol.getInt(1))
    assert(viaSql.getDouble(2) == viaCol.getDouble(2))
    assert(viaSql.getLong(3) == viaCol.getLong(3))
    assert(viaSql.getString(0) == "es")
  }

  test("graft_cosine over array columns in SQL") {
    val v = spark.sql("SELECT graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c").head().getDouble(0)
    assert(math.abs(v - 1.0) < 1e-12)
    val o = spark.sql("SELECT graft_cosine(array(1.0D, 0.0D), array(0.0D, 1.0D)) AS c").head().getDouble(0)
    assert(math.abs(o) < 1e-12)
  }

  test("GraftExtensions injects all functions into a SparkSessionExtensions registry") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val reg = org.apache.spark.sql.graftbridge.Bridge.applyInjectedFunctions(
      ext, new org.apache.spark.sql.catalyst.analysis.SimpleFunctionRegistry)
    val names = reg.listFunction().map(_.funcName).toSet
    assert(names.contains("graft_extract"))
    assert(names.contains("graft_langid"))
    assert(names.contains("graft_cosine"))
    // the injected builder constructs the real expression
    val expr = reg.lookupFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_extract"),
      Seq(org.apache.spark.sql.catalyst.expressions.Literal(Array[Byte](1, 2, 3))))
    assert(expr.isInstanceOf[GraftFunctions.GraftExtract])
  }

  test("graft_extract exposes tables: explode PDF grid cells in SQL (E9)") {
    val grid = graft.pdf.MiniPdf.build(Seq(graft.pdf.MiniPdf.gridStream(Seq(
      Seq("h1", "h2"), Seq("a", "b"), Seq("c", "d")), Seq(72, 200))))
    Seq(("u4", grid)).toDF("url", "html").createOrReplaceTempView("pages_grid_v")
    val rows = spark.sql(
      """SELECT t.confidence, r AS cells
        |FROM (SELECT explode(graft_extract(html).tables) AS t FROM pages_grid_v)
        |LATERAL VIEW explode(t.data) AS r""".stripMargin).collect()
    assert(rows.length == 3)
    assert(rows.map(_.getSeq[String](1)).toSeq ==
      Seq(Seq("h1", "h2"), Seq("a", "b"), Seq("c", "d")))
    assert(rows.forall(_.getDouble(0) == 1.0))
  }
}
