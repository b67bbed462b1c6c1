package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.io.SyntheticPages

/** Incremental extraction: AvailableNow drains only unseen files; restart
  * picks up exactly the new ones (streaming-checkpoint exactly-once).
  */
class StreamingSpec extends AnyFunSuite {

  private val spark = graft.TestSpark.spark

  test("availableNow drains new files only, exactly once, byte-identical") {
    val base = Files.createTempDirectory("stream").toString
    val inDir = s"$base/in"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"

    val pages = SyntheticPages.fromDocuments(spark, "/root/testdata/sf0.001").cache()
    val batch1 = pages.where(col("url").endsWith("0")) // subset
    val batch2 = pages.where(col("url").endsWith("1"))
    val n1 = batch1.count(); val n2 = batch2.count()
    assert(n1 > 0 && n2 > 0)

    batch1.write.parquet(inDir)
    val afterFirst = IncrementalExtract.drainOnce(spark, inDir, outDir, ckpt)
    assert(afterFirst == n1)

    // second drain with no new input: nothing double-processed
    val afterNoop = IncrementalExtract.drainOnce(spark, inDir, outDir, ckpt)
    assert(afterNoop == n1)

    // new files arrive; only they are processed
    batch2.write.mode("append").parquet(inDir)
    val afterSecond = IncrementalExtract.drainOnce(spark, inDir, outDir, ckpt)
    assert(afterSecond == n1 + n2)

    // byte-identical to golden for every streamed row
    val out = spark.read.parquet(outDir).select(col("url"), col("text").as("actual"))
    val golden = pages.select(col("url"), col("text").as("expected"))
    val mismatches = out.join(golden, "url")
      .where(not(col("actual") <=> col("expected"))).count()
    assert(mismatches == 0)
    pages.unpersist()
  }

  test("streaming dedup: re-crawled payloads within the watermark drop, first sight passes") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    implicit val sqlCtx = spark.sqlContext

    val t0 = 1704067200000L
    def page(i: Int, body: String, offMin: Long) =
      graft.model.Page(s"https://h$i.example.com/p/$i",
        new Timestamp(t0 + offMin * 60000),
        body.getBytes("UTF-8"), "", "en")

    val mem = MemoryStream[graft.model.Page]
    val q = CrawlStats.dedupStream(mem.toDF())
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      // batch 1: two distinct payloads + one exact duplicate (same bytes,
      // different url) — duplicate drops within the batch
      mem.addData(page(1, "alpha body", 0), page(2, "beta body", 1),
        page(3, "alpha body", 2))
      q.processAllAvailable()
      assert(spark.table("dedup").count() == 2)
      // batch 2: a re-crawl of payload alpha 30 min later (inside the 2h
      // horizon) drops; a genuinely new payload passes
      mem.addData(page(4, "alpha body", 30), page(5, "gamma body", 31))
      q.processAllAvailable()
      val urls = spark.table("dedup").select("url").as[String].collect().sorted
      assert(urls.length == 3, urls.mkString(","))
      assert(urls.exists(_.contains("h1.")) && urls.exists(_.contains("h2.")) &&
        urls.exists(_.contains("h5.")))
    } finally q.stop()
  }

  test("watermarked 1h windows finalize exactly once in append mode") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    implicit val sqlCtx = spark.sqlContext

    val t0 = 1704067200000L // 2024-01-01T00:00Z
    def page(host: String, offMin: Long) =
      graft.model.Page(s"https://$host/p/$offMin", new Timestamp(t0 + offMin * 60000),
        Array[Byte](60), "", "en")

    val mem = MemoryStream[graft.model.Page]
    val out = CrawlStats.hostWindowCounts(mem.toDF())
      .writeStream.format("memory").queryName("winc").outputMode("append").start()
    try {
      // 3 pages for a.com + 1 for b.com inside hour 0
      mem.addData(page("a.com", 1), page("a.com", 20), page("a.com", 59), page("b.com", 5))
      out.processAllAvailable()
      // nothing finalized yet (watermark still inside hour 0)
      assert(spark.table("winc").count() == 0)
      // an event 4h later pushes the watermark (2h lateness) past hour 0
      mem.addData(page("a.com", 240))
      out.processAllAvailable()
      val rows = spark.table("winc")
        .select(col("host"), col("pages"), col("window.start"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(rows == Set(("a.com", 3L), ("b.com", 1L)), s"got $rows")
      // replays of old data beyond the watermark never re-emit the window
      mem.addData(page("a.com", 2))
      out.processAllAvailable()
      assert(spark.table("winc").where(col("pages") === 3).count() == 1)
    } finally out.stop()
  }

  test("flatMapGroupsWithState sessions close after the event-time gap") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    implicit val sqlCtx = spark.sqlContext

    val t0 = 1704067200000L
    def page(host: String, offMin: Long) =
      graft.model.Page(s"https://$host/p/$offMin", new Timestamp(t0 + offMin * 60000),
        Array[Byte](60), "", "en")

    val mem = MemoryStream[graft.model.Page]
    val out = CrawlStats.hostSessions(mem.toDF(), gapMinutes = 30, lateness = "10 minutes")
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    try {
      mem.addData(page("a.com", 0), page("a.com", 10), page("a.com", 25))
      out.processAllAvailable()
      assert(spark.table("sess").count() == 0) // session still open
      // OTHER-host traffic advances the event-time watermark past
      // a.com's last-visit + gap → a.com's session times out and closes
      // (a visit from a.com itself would have JOINED the session instead)
      mem.addData(page("w.com", 180))
      out.processAllAvailable()
      mem.addData(page("w.com", 400))
      out.processAllAvailable()
      val sessions = spark.table("sess").as[CrawlStats.HostSession]
        .collect().sortBy(_.start.getTime)
      assert(sessions.nonEmpty, "no session closed")
      val first = sessions.head
      assert(first.host == "a.com" && first.pages == 3 &&
        first.start.getTime == t0 && first.end.getTime == t0 + 25 * 60000,
        s"got $first")
    } finally out.stop()
  }
}
