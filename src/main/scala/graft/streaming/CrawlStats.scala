package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.pipeline.Salting

/** Streaming crawl telemetry over the pages stream (SURVEY §1.2 continuous
  * tail): event-time windowed aggregation with a watermark, plus custom
  * keyed state via `flatMapGroupsWithState` — the two Structured Streaming
  * shapes the batch operators don't exercise.
  *
  * Both key by host because that is the operational unit of a crawl
  * (politeness budgets, per-host failure spikes, session gaps between
  * crawler visits).
  */
object CrawlStats {

  /** Per-host page/byte rate in 1-hour event-time windows; rows finalize
    * once the watermark (default 2h of allowed lateness on `warc_ts`)
    * passes the window end — append mode emits each window exactly once.
    * State is bounded by (hosts × open windows); the watermark is what
    * makes this viable on an unbounded crawl.
    */
  def hostWindowCounts(pages: DataFrame, lateness: String = "2 hours",
                       windowLen: String = "1 hour"): DataFrame =
    pages
      .withWatermark("warc_ts", lateness)
      .groupBy(window(col("warc_ts"), windowLen),
        Salting.hostCol(col("url")).as("host"))
      .agg(count(lit(1)).as("pages"), sum(length(col("html"))).as("bytes"))

  /** Streaming exact dedup of a crawl tail: first sight of a payload hash
    * passes, re-crawls and mirror copies within the watermark horizon drop.
    * `dropDuplicatesWithinWatermark` is the production shape — its state
    * store evicts a hash once the watermark passes its last occurrence, so
    * state is bounded by (distinct payloads per horizon), not by crawl
    * lifetime (a plain streaming dropDuplicates would grow forever). The
    * batch analogue is d01/q05's hash groupBy; the cross-horizon analogue
    * is the incremental MinHash dedup (d07).
    */
  def dedupStream(pages: DataFrame, lateness: String = "2 hours"): DataFrame =
    pages
      .withColumn("content_hash", sha2(col("html"), 256))
      .withWatermark("warc_ts", lateness)
      .dropDuplicatesWithinWatermark("content_hash")
      .drop("content_hash")

  final case class HostVisit(host: String, ts: Timestamp)
  final case class HostState(startMs: Long, lastMs: Long, pages: Long)
  final case class HostSession(host: String, start: Timestamp, end: Timestamp,
                               pages: Long)

  /** Gap-closed per-host crawl sessions: a session ends after `gapMinutes`
    * of event-time silence (EventTimeTimeout — fires when the WATERMARK
    * passes last-seen + gap, so late data within the watermark still joins
    * its session). Emits one row per closed session; open sessions live in
    * the state store, bounded by active-host cardinality.
    */
  def hostSessions(pages: DataFrame, gapMinutes: Int = 30,
                   lateness: String = "1 hour"): Dataset[HostSession] = {
    val spark = pages.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60000L

    def update(host: String, rows: Iterator[HostVisit],
               state: GroupState[HostState]): Iterator[HostSession] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator.single(HostSession(host, new Timestamp(s.startMs),
          new Timestamp(s.lastMs), s.pages))
      } else {
        val ts = rows.map(_.ts.getTime).toVector
        val prev = state.getOption.getOrElse(
          HostState(ts.min, ts.min, 0L))
        val next = HostState(math.min(prev.startMs, ts.min),
          math.max(prev.lastMs, ts.max), prev.pages + ts.length)
        state.update(next)
        state.setTimeoutTimestamp(next.lastMs + gapMs)
        Iterator.empty
      }
    }

    pages
      .select(Salting.hostCol(col("url")).as("host"), col("warc_ts").as("ts"))
      .withWatermark("ts", lateness)
      .as[HostVisit]
      .groupByKey(_.host)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(update)
  }
}
