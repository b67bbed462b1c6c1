package graft.model

/** Row types of the pipeline (SURVEY.md §1; FIXTURES.md §1-2).
  *
  * `Page` mirrors BASELINE.json's input_hint exactly:
  * `(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING)`;
  * `text` is the golden expected output for verification, never an input to
  * extraction.
  *
  * `ExtractedDoc` is the output row (FIXTURES.md §2): the three divergent
  * `Document` variants of the reference (domain/models/document.py:8-25,
  * domain/models.py:9-29, domain/entities/document.py:10-85) folded into one
  * deterministic schema — `doc_id = sha2(url,256)` replaces uuid4
  * (entities/document.py:42), timestamps are job-supplied, never `now()`.
  */
final case class Page(
  url: String,
  warc_ts: java.sql.Timestamp,
  html: Array[Byte],
  text: String,
  lang: String)

final case class SpanRow(page: Int, off: Int, len: Int)

final case class TableRow(data: Seq[Seq[String]], confidence: Double)

final case class ExtractedDoc(
  url: String,
  doc_id: String,
  doc_type: String,     // html | native_text | scanned | mixed | table_heavy | image_heavy
  text: String,         // blocks/pages joined "\n\n" — the byte-identical gate
  spans: Seq[SpanRow],
  tables: Seq[TableRow],
  confidence: Double,   // 0..100 (thresholds 60/80, constants/__init__.py:12,15-16)
  page_count: Int,
  charset: String,
  status: String,       // processed | error (models/common.py:13-20 lifecycle)
  error: String,        // null unless status = error
  text_len: Int,
  word_count: Int,
  metadata: Map[String, String])

/** Per-partition lineage/manifest row (SURVEY.md §7.2 step 8). */
final case class ManifestRow(
  partition_id: Int,
  input_fingerprint: String,
  rows_in: Long,
  rows_out: Long,
  bytes_in: Long,
  wall_ms: Long,
  job_run_id: String)

/** Immutable pipeline configuration — the rebuild of SystemConfig
  * (system_config.py:37-78): quality profiles survive as named presets.
  */
final case class PipelineConf(
  profile: String = "balanced",          // fast | balanced | high (system_config.py:18-34)
  confidenceThreshold: Double = 60.0,    // constants/__init__.py:12
  highQualityThreshold: Double = 80.0,   // constants/__init__.py:15-16
  minPdfBytes: Int = 1024,               // file_utils.py:64-66
  shufflePartitions: Int = 32,
  saltBuckets: Int = 8)

object Thresholds {
  val MediumQuality = 60.0
  val HighQuality = 80.0
}

/** Quality-profile presets (C3/SystemConfig profiles, system_config.py:18-34).
  * DPI survives only as lineage metadata — there is no rasterization in the
  * Spark path (SURVEY E1) — but thresholds and salting really change the job.
  */
object Profiles {
  val Fast = PipelineConf(profile = "fast", confidenceThreshold = 50.0,
    saltBuckets = 4)
  val Balanced = PipelineConf(profile = "balanced", confidenceThreshold = 60.0)
  val High = PipelineConf(profile = "high", confidenceThreshold = 80.0,
    saltBuckets = 16)

  def forName(name: String): PipelineConf = name match {
    case "fast" => Fast
    case "high" => High
    case _ => Balanced
  }

  /** C3 per-doc-type optimal-config lookup (pdf_analyzer.py:124-176) —
    * the reference's engine/dpi/flags table, kept as lineage metadata so
    * downstream consumers can reproduce its routing decisions.
    */
  def optimalFor(docType: String): Map[String, String] = docType match {
    case "scanned" => Map("engine" -> "layout", "dpi" -> "300", "strategy" -> "full_preprocessing")
    case "native_text" => Map("engine" -> "basic", "dpi" -> "150", "strategy" -> "fast_native")
    case "table_heavy" => Map("engine" -> "layout", "dpi" -> "250", "strategy" -> "table_focused")
    case "image_heavy" => Map("engine" -> "layout", "dpi" -> "300", "strategy" -> "image_focused")
    case "html" => Map("engine" -> "boilerplate", "dpi" -> "0", "strategy" -> "block_classify")
    case _ => Map("engine" -> "layout", "dpi" -> "300", "strategy" -> "balanced")
  }
}
