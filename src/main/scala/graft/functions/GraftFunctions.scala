package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.SparkSessionExtensions

/** SQL exposure of the extraction kernel and text ops (SURVEY §2.8, the
  * "v2 custom Expression" step of the OCRPort mapping).
  *
  * `graft_extract(html)` is a native Catalyst `UnaryExpression` over BINARY
  * returning the full extraction struct. It uses `CodegenFallback` by
  * design: the kernel is a large JVM parser, not arithmetic — inlining it
  * into generated Java would blow the 64 KB method limit for zero gain; the
  * fallback keeps the surrounding operators codegen'd while the kernel runs
  * as one virtual call per row (same cost as the mapPartitions path).
  *
  * The scalar text ops (`graft_langid`, `graft_quality`, ...) are NOT custom
  * expressions: they re-register the composed-builtin Column trees from
  * `ops.TextStats`, so in SQL they stay fully whole-stage-codegen'd.
  *
  * Two registration paths:
  *  - `GraftFunctions.register(spark)` — imperative, post-hoc;
  *  - `class GraftExtensions` via `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
object GraftFunctions {

  val extractSchema: StructType = StructType(Seq(
    StructField("doc_type", StringType),
    StructField("text", StringType),
    StructField("confidence", DoubleType),
    StructField("page_count", IntegerType),
    StructField("charset", StringType),
    StructField("status", StringType),
    StructField("error", StringType),
    StructField("title", StringType),
    StructField("tables", ArrayType(StructType(Seq(
      StructField("data", ArrayType(ArrayType(StringType))),
      StructField("confidence", DoubleType)))))))

  case class GraftExtract(child: Expression)
      extends UnaryExpression with CodegenFallback {

    override def dataType: DataType = extractSchema
    override def nullable: Boolean = true
    override def prettyName: String = "graft_extract"

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == BinaryType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_extract expects BINARY, got ${child.dataType.catalogString}")

    override protected def nullSafeEval(input: Any): Any = {
      val r = graft.pipeline.Kernel.extractOne(input.asInstanceOf[Array[Byte]])
      InternalRow(
        UTF8String.fromString(r.docType),
        UTF8String.fromString(r.text),
        r.confidence,
        r.pageCount,
        UTF8String.fromString(r.charset),
        UTF8String.fromString(r.status),
        if (r.error == null) null else UTF8String.fromString(r.error),
        UTF8String.fromString(r.metadata.getOrElse("title", "")),
        new GenericArrayData(r.tables.map { t =>
          InternalRow(
            new GenericArrayData(t.data.map(row =>
              new GenericArrayData(row.map(UTF8String.fromString).toArray[Any])).toArray[Any]),
            t.confidence)
        }.toArray[Any]))
    }

    override protected def withNewChildInternal(newChild: Expression): GraftExtract =
      copy(child = newChild)
  }

  /** Unicode NFC normalization as a native codegen'd expression: Spark has
    * no builtin normalizer, and the op sits on the curation hot path
    * (normalize-before-fingerprint). `defineCodeGen` keeps it inside
    * whole-stage codegen as one static call per row.
    */
  case class NfcNormalize(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "graft_nfc"
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_nfc expects STRING, got ${child.dataType.catalogString}")
    override protected def nullSafeEval(input: Any): Any =
      TextNorm.nfc(input.asInstanceOf[UTF8String])
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
      defineCodeGen(ctx, ev, c => s"graft.functions.TextNorm.nfc($c)")
    override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
      copy(child = newChild)
  }

  /** Accent folding (NFD + combining-mark removal), DuckDB `strip_accents`
    * semantics — codegen'd like [[NfcNormalize]].
    */
  case class StripAccents(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "graft_strip_accents"
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_strip_accents expects STRING, got ${child.dataType.catalogString}")
    override protected def nullSafeEval(input: Any): Any =
      TextNorm.stripAccents(input.asInstanceOf[UTF8String])
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
      defineCodeGen(ctx, ev, c => s"graft.functions.TextNorm.stripAccents($c)")
    override protected def withNewChildInternal(newChild: Expression): StripAccents =
      copy(child = newChild)
  }

  /** Column-API handles for the normalization expressions. */
  def nfcNormalize(col: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(NfcNormalize(Bridge.expression(col)))
  }
  def stripAccents(col: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(StripAccents(Bridge.expression(col)))
  }

  /** Column-tree builders re-exposed to SQL (stay codegen'd). */
  private def columnFns: Seq[(String, Seq[Expression] => Expression)] = {
    import graft.ops.TextStats
    import org.apache.spark.sql.graftbridge.Bridge.{column => c, expression => x}
    Seq(
      "graft_langid" -> ((es: Seq[Expression]) => x(TextStats.langId(c(es.head)))),
      "graft_quality" -> ((es: Seq[Expression]) => x(TextStats.qualityScore(c(es.head)))),
      "graft_tokens_ws" -> ((es: Seq[Expression]) => x(TextStats.tokenCountWs(c(es.head)))),
      "graft_tokens_bpe" -> ((es: Seq[Expression]) => x(TextStats.tokenCountBpe(c(es.head)))),
      "graft_fingerprint" -> ((es: Seq[Expression]) => x(TextStats.fingerprint64(c(es.head)))),
      "graft_cosine" -> ((es: Seq[Expression]) =>
        x(graft.ops.Similarity.cosine(c(es(0)), c(es(1))))))
  }

  private[functions] def injectables: Seq[(String, Seq[Expression] => Expression)] =
    Seq[(String, Seq[Expression] => Expression)](
      "graft_extract" -> ((es: Seq[Expression]) => GraftExtract(es.head)),
      "graft_nfc" -> ((es: Seq[Expression]) => NfcNormalize(es.head)),
      "graft_strip_accents" -> ((es: Seq[Expression]) => StripAccents(es.head))
    ) ++ columnFns

  def register(spark: SparkSession): Unit =
    injectables.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.GraftFunctions", name),
        builder)
    }

  /** Column-API handle for the native expression. */
  def graftExtract(col: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(GraftExtract(Bridge.expression(col)))
  }
}

/** `--conf spark.sql.extensions=graft.functions.GraftExtensions` */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.injectables.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.GraftFunctions", name), builder))
    }
}
