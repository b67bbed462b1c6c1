package graft.pipeline

import graft.html.Boilerplate
import graft.model.{SpanRow, TableRow}

/** The per-row extraction kernel — pure JVM, shared by the Spark
  * `mapPartitions` stage, the one-shot CLI and the unit tests. Routing is the
  * reference's magic-byte rule (`file_utils.py:69-74`): payloads starting
  * `%PDF-` take the PDF span path (E8), everything else the HTML path (E10).
  * The reference's PDF validity floor (size ≥ 1024 bytes, file_utils.py:64-66)
  * becomes a per-row error status, never an exception: the kernel is total.
  */
object Kernel {

  final case class Result(
    docType: String,
    text: String,
    spans: Vector[SpanRow],
    tables: Vector[TableRow],
    confidence: Double,
    pageCount: Int,
    charset: String,
    status: String,
    error: String,
    metadata: Map[String, String])

  val PdfMagic: Array[Byte] = "%PDF-".getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  def isPdf(bytes: Array[Byte]): Boolean =
    bytes.length >= 5 &&
      bytes(0) == PdfMagic(0) && bytes(1) == PdfMagic(1) && bytes(2) == PdfMagic(2) &&
      bytes(3) == PdfMagic(3) && bytes(4) == PdfMagic(4)

  val MinPdfBytes = 1024 // file_utils.py:64-66

  /** Total per-row extraction. Never throws. */
  def extractOne(bytes: Array[Byte]): Result = {
    if (bytes == null || bytes.isEmpty)
      return Result("unknown", "", Vector.empty, Vector.empty, 0.0, 0, "", "error",
        "empty_payload", Map.empty)
    if (isPdf(bytes)) {
      if (bytes.length < MinPdfBytes)
        Result("pdf", "", Vector.empty, Vector.empty, 0.0, 0, "", "error",
          "pdf_too_small", Map.empty)
      else extractPdf(bytes)
    } else extractHtml(bytes)
  }

  private def extractHtml(bytes: Array[Byte]): Result = {
    try {
      val r = Boilerplate.extract(bytes)
      Result(
        docType = "html",
        text = r.text,
        spans = r.spans.map(s => SpanRow(s.page, s.off, s.len)),
        tables = r.tables.map(t => TableRow(t.data, t.confidence)),
        confidence = r.confidence,
        pageCount = 1,
        charset = r.charset,
        status = "processed",
        error = null,
        metadata = if (r.title.isEmpty) Map.empty else Map("title" -> r.title))
    } catch { // belt-and-braces: the extractor is total by design, but a kernel must never kill a task.
      // NonFatal only — swallowing OOM/Interrupted would turn a dying executor
      // into silently-wrong status=error rows.
      case scala.util.control.NonFatal(e) =>
        Result("html", "", Vector.empty, Vector.empty, 0.0, 0, "", "error",
          s"html_extract_failed: ${e.getClass.getSimpleName}", Map.empty)
    }
  }

  private def extractPdf(bytes: Array[Byte]): Result = {
    try {
      val doc = graft.pdf.PdfExtractor.extract(bytes)
      doc match {
        case Right(d) =>
          Result(d.docType, d.text, d.spans, d.tables, d.confidence,
            d.pageCount, "pdf", "processed", null, d.metadata)
        case Left(err) =>
          Result("pdf", "", Vector.empty, Vector.empty, 0.0, 0, "pdf", "error", err, Map.empty)
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        Result("pdf", "", Vector.empty, Vector.empty, 0.0, 0, "pdf", "error",
          s"pdf_parse_failed: ${e.getClass.getSimpleName}", Map.empty)
    }
  }
}
