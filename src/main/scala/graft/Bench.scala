package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Driver-run benchmark: every SparkEntry query timed once, plus the
  * headline extraction-throughput measurement (docs/sec, MB/sec) on a
  * replica-amplified pages corpus. Prints ONE JSON line.
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 4),
  * SPARK_GRAFT_REPLICAS (default scales with cpus: 2×cpus, floor 8 —
  * enough work per core that the headline measures the kernel, not
  * job-scheduling overhead; ScalingBench methodology, BENCH/BASELINE.md).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val replicas = sys.env.get("SPARK_GRAFT_REPLICAS").map(_.toInt)
      .getOrElse(math.max(8, 2 * cpus.toInt))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // headline: end-to-end extraction throughput (BASELINE.json metric).
    // Both pipeline paths are timed so round-over-round regressions are
    // attributable: `narrow` = kernel on pre-partitioned input (no shuffle),
    // `salted` = full Extract.run (heavy-host detection + salted repartition).
    val pages = io.SyntheticPages.fromDocuments(spark, sfDir, replicas).cache()
    val docs = pages.count() // materialize cache: payload generation not timed
    val bytes = pages.agg(sum(length(col("html")))).collect()(0).getLong(0)
    // untimed JIT warm-up of the kernel (BENCH/BASELINE.md methodology)
    pipeline.Extract.runNarrow(pages.limit(2000)).toDF().count()
    // min-of-3 for BOTH headline measurements: the driver harness loads the
    // box (load-avg swings 1.7→10 observed), and a single-shot reading under
    // that regime is noise — r03's official narrow figure was ~95× off the
    // reproducible number. Minimum wall time is the least-contended estimate
    // (same discipline as ScalingBench).
    def minOf3(run: () => Long): (Double, Long) = {
      var rows = 0L
      val secs = (1 to 3).map { _ =>
        val t = System.nanoTime()
        rows = run()
        (System.nanoTime() - t) / 1e9
      }
      (secs.min, rows)
    }
    val (narrowSec, narrowRows) =
      minOf3(() => pipeline.Extract.runNarrow(pages).toDF().count())
    val (extractSec, outRows) = minOf3(() => pipeline.Extract
      .run(pages, model.PipelineConf(shufflePartitions = cpus.toInt * 2))
      .toDF().count())
    val docsPerSec = docs / extractSec
    val mbPerSec = bytes / 1048576.0 / extractSec
    pages.unpersist()

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // per-query timing: one rep for sub-0.5 s queries (scheduling floor
      // dominates, a second rep buys no signal), min-of-2 above it — the
      // ambient-load regime that made r4's t05/s04/m01 round-over-round
      // deltas uninterpretable (VERDICT r4 directive 2). The cache clear
      // between reps keeps rep 2 measuring the same cold-scratch work as
      // rep 1 (dedup queries persist() shingle scratch internally).
      def rep(): Double = {
        val t = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch { case scala.util.control.NonFatal(_) => false }
        val sec = (System.nanoTime() - t) / 1e9
        spark.catalog.clearCache()
        // a failed rep must never win the min — its time-to-failure would
        // read as a speedup; +Inf keeps the other rep, and a query with no
        // successful rep reports -1 (visibly broken, not fast)
        if (ok) sec else Double.PositiveInfinity
      }
      val first = rep()
      val best = if (first > 0.5) math.min(first, rep()) else first
      name -> (if (best.isInfinite) -1.0 else best)
    }
    // Locale.ROOT: a comma-decimal default locale would emit malformed JSON
    def f3(d: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val total = f3(results.map(_._2).sum + extractSec + narrowSec)
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir",""" +
      s""""extract_docs":$docs,"extract_mb":${f3(bytes / 1048576.0)},""" +
      s""""extract_sec":${f3(extractSec)},"docs_per_sec":${f3(docsPerSec)},""" +
      s""""mb_per_sec":${f3(mbPerSec)},""" +
      s""""narrow_sec":${f3(narrowSec)},"narrow_docs_per_sec":${f3(docs / narrowSec)},""" +
      s""""narrow_mb_per_sec":${f3(bytes / 1048576.0 / narrowSec)},""" +
      s""""narrow_rows_out":$narrowRows,"cpus":$cpus,"replicas":$replicas,""" +
      s""""golden_rows_out":$outRows}""")
    spark.stop()
  }
}
