package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.io.SyntheticPages
import graft.pipeline.Extract
import graft.model.PipelineConf

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries run against the driver's parquet tables in `dir`
  * (TESTDATA.md: TPC-H-ish + events + documents + embeddings). The
  * extraction queries (x*) derive the synthetic pages table from
  * `documents.parquet` deterministically (SyntheticPages) — no external
  * data — and have no SQL oracle (extraction is not SQL-expressible;
  * the golden gate x02 IS the oracle). The q* queries each carry a DuckDB
  * oracle in `oracleSql` with identical column names/aliases.
  */
object SparkEntry {

  /** Flagship: full extraction pipeline on sf0.001-derived pages. */
  def entry(spark: SparkSession): DataFrame = {
    val pages = SyntheticPages.fromDocuments(spark, "/root/testdata/sf0.001")
    Extract.run(pages, PipelineConf(shufflePartitions = 8)).toDF()
      .select("url", "doc_id", "doc_type", "status", "charset", "confidence",
        "page_count", "text_len", "word_count")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- extraction pipeline (SURVEY §2.2/2.3; golden gate) ----
    "x01_extract" -> ((s, dir) => {
      val pages = SyntheticPages.fromDocuments(s, dir)
      Extract.run(pages).toDF()
        .select("url", "doc_id", "doc_type", "status", "charset", "confidence",
          "page_count", "text_len", "word_count")
        .orderBy("url")
    }),
    "x02_golden_check" -> ((s, dir) => {
      val pages = SyntheticPages.fromDocuments(s, dir)
      val extracted = Extract.run(pages).toDF()
      val joined = extracted.select(col("url"), col("status"), col("text").as("actual"))
        .join(pages.select(col("url"), col("text").as("expected")), Seq("url"))
      joined.agg(
        count(lit(1)).as("total"),
        sum(when(col("status") === "processed", 1L).otherwise(0L)).as("processed"),
        sum(when(col("actual") <=> col("expected"), 1L).otherwise(0L)).as("matched"),
        sum(when(not(col("actual") <=> col("expected")), 1L).otherwise(0L)).as("mismatched"))
    }),
    "x03_type_counts" -> ((s, dir) => {
      val pages = SyntheticPages.fromDocuments(s, dir)
      Extract.run(pages).toDF()
        .groupBy("doc_type", "status")
        .agg(count(lit(1)).as("cnt"), round(avg("confidence"), 2).as("avg_conf"))
        .orderBy("doc_type", "status")
    }),

    "x04_batch_summary" -> ((s, dir) => {
      val pages = SyntheticPages.fromDocuments(s, dir)
      graft.render.Summary.batchSummary(Extract.run(pages).toDF())
    }),
    "x05_storage_stats" -> ((s, dir) => {
      val pages = SyntheticPages.fromDocuments(s, dir)
      graft.render.Summary.storageStats(Extract.run(pages).toDF())
        .orderBy("doc_type")
    }),

    // ---- catalog / aggregation operators with DuckDB oracles ----
    // A1/A2 rollup (true mean replaces the reference's pairwise mean,
    // processing_metrics.py:25-28)
    "q01_pricing_rollup" -> ((s, dir) => {
      lineitem(s, dir).groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"),
          round(sum("l_quantity"), 2).as("sum_qty"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,4)")).cast("double").as("revenue"))
    }),
    // L1 sort+limit catalog listing (routers/documents.py:399-405)
    "q02_events_topn" -> ((s, dir) => {
      events(s, dir).orderBy(col("ts").desc, col("event_id").desc)
        .limit(20).select("event_id", "event_type", "value")
    }),
    // L2 status filter + count (routers/files.py:110-112)
    "q03_click_users" -> ((s, dir) => {
      events(s, dir).where(col("event_type") === "click")
        .groupBy("user_id").agg(count(lit(1)).as("cnt"))
    }),
    // A3/A5 word/char counters (use_cases.py:196; entities/document.py:64-75)
    "q04_doc_stats" -> ((s, dir) => {
      documents(s, dir).select(col("doc_id"), col("n_chars"),
        length(col("text")).as("text_len"),
        when(length(trim(col("text"))) === 0, 0)
          .otherwise(size(split(trim(col("text")), "\\s+"))).as("word_count"))
    }),
    // exact dedup by content hash (training-data op; MD5 gate precedent
    // tests/validation_test.py:11-17)
    "q05_dedup_exact" -> ((s, dir) => {
      documents(s, dir).groupBy(md5(col("text").cast("binary")).as("h"))
        .agg(count(lit(1)).as("cnt"))
    }),
    // K1 latest-wins window (SURVEY §2.5)
    "q06_latest_event" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
      events(s, dir).withColumn("rn", row_number().over(w))
        .where(col("rn") === 1).select("user_id", "event_id")
    }),
    // A4-style storage stats per group
    "q07_lang_stats" -> ((s, dir) => {
      documents(s, dir).groupBy("lang")
        .agg(count(lit(1)).as("cnt"), sum("n_chars").as("total_chars"))
    }),
    // the golden-verification join shape (broadcast dim)
    "q08_priority_revenue" -> ((s, dir) => {
      lineitem(s, dir).join(broadcast(orders(s, dir)),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("cnt"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,4)")).cast("double").as("revenue"))
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        | round(sum(l_quantity), 2) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_events_topn" ->
      "SELECT event_id, event_type, value FROM events ORDER BY ts DESC, event_id DESC LIMIT 20",
    "q03_click_users" ->
      "SELECT user_id, count(*) AS cnt FROM events WHERE event_type = 'click' GROUP BY user_id",
    "q04_doc_stats" ->
      """SELECT doc_id, n_chars, length(text) AS text_len,
        | CASE WHEN length(trim(text)) = 0 THEN 0
        |      ELSE length(regexp_split_to_array(trim(text), '\s+')) END AS word_count
        |FROM documents""".stripMargin,
    "q05_dedup_exact" ->
      "SELECT md5(text) AS h, count(*) AS cnt FROM documents GROUP BY 1",
    "q06_latest_event" ->
      """SELECT user_id, event_id FROM (
        |  SELECT user_id, event_id,
        |         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) t WHERE rn = 1""".stripMargin,
    "q07_lang_stats" ->
      "SELECT lang, count(*) AS cnt, sum(n_chars) AS total_chars FROM documents GROUP BY lang",
    "q08_priority_revenue" ->
      """SELECT o_orderpriority, count(*) AS cnt,
        | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,
  )

  private def lineitem(s: SparkSession, dir: String) = s.read.parquet(s"$dir/lineitem.parquet")
  private def orders(s: SparkSession, dir: String) = s.read.parquet(s"$dir/orders.parquet")
  private def events(s: SparkSession, dir: String) = s.read.parquet(s"$dir/events.parquet")
  private def documents(s: SparkSession, dir: String) = s.read.parquet(s"$dir/documents.parquet")
}
