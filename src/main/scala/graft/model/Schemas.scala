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
