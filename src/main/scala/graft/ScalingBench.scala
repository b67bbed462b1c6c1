package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** North-rule scaling evidence (BASELINE.md §C): the identical extraction
  * job on identical input at N and 4N local cores; reports throughput at
  * both and `efficiency = throughput_4N / (4 × throughput_N)` (gate ≥ 0.8),
  * written to BENCH/BASELINE.md.
  *
  * Two variants are measured:
  *  - **pre-partitioned** (headline): input already hash-bucketed by url —
  *    the 100 TB design (the Iceberg pages table is bucket-partitioned at
  *    ingest, SURVEY §7.6), so extraction is a narrow, shuffle-free stage;
  *  - **runtime-shuffle**: unpartitioned input salt-shuffled per run. In
  *    local mode every "executor" shares one memory bus, so shuffle
  *    bandwidth is a constant regardless of core count — a sandbox
  *    artifact called out in the report (on a real cluster shuffle
  *    bandwidth scales with node count).
  *
  * Measurement discipline (VERDICT r3 directive 6, now tool-enforced, not
  * prose): each size runs in a FRESH JVM (`once` mode), takes `Reps` timed
  * replicates after untimed JIT warm-up, and emits EVERY replicate plus the
  * start/end 1-min system load average in its JSON line. `report` mode then
  * renders the full replicate table and computes the gate from the per-size
  * minima of that single measurement window — no hand-edited numbers.
  *
  * Usage:
  *   runMain graft.ScalingBench once <cores> <sfDir> <replicas> <outJson>
  *   runMain graft.ScalingBench report <jsonN> <json4N> [sfDir]
  *   runMain graft.ScalingBench [N] [sfDir] [replicas]   (both sizes, one JVM)
  */
object ScalingBench {

  /** Timed replicates per size (min is the reported figure: the box runs
    * other workloads — load avg swings 1.7→10 observed — so minimum wall
    * time is the least-contended estimate).
    */
  val Reps = 7

  final case class Run(cores: Int, docs: Long, mb: Double,
                       narrowRaw: Seq[Double], shuffleRaw: Seq[Double],
                       loadStart: Double, loadEnd: Double,
                       heapGb: Double = -1.0, slice: String = "all") {
    def narrowSec: Double = narrowRaw.min
    def shuffleSec: Double = shuffleRaw.min
  }

  private def loadAvg: Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage

  // Locale.ROOT: a comma-decimal default locale would emit malformed JSON
  // that report-mode's parser silently truncates at the comma
  private def f(d: Double) =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
  private def seq(xs: Seq[Double]) = xs.map(f).mkString("[", ",", "]")

  private def toJson(r: Run): String =
    s"""{"cores":${r.cores},"docs":${r.docs},"mb":${f(r.mb)},""" +
      s""""narrow_raw":${seq(r.narrowRaw)},"shuffle_raw":${seq(r.shuffleRaw)},""" +
      s""""narrow_sec":${f(r.narrowSec)},"shuffle_sec":${f(r.shuffleSec)},""" +
      s""""load_start":${f(r.loadStart)},"load_end":${f(r.loadEnd)},""" +
      s""""heap_gb":${f(r.heapGb)},"slice":"${r.slice}"}"""

  def main(args: Array[String]): Unit = {
    // "once" mode: one cluster size in a FRESH JVM (heap/JIT isolation),
    // full replicate evidence appended as one JSON line
    if (args.length > 0 && args(0) == "once") {
      // once <cores> <sfDir> <replicas> <outJson> [slice]
      val slice = if (args.length > 5) args(5) else "all"
      // validate + create the output path BEFORE the multi-minute run: a
      // bad path must fail in milliseconds, not after the evidence exists
      // only in a dying JVM
      val out = Paths.get(io.PathGuard.checkWritable(args(4)))
      Option(out.getParent).foreach(Files.createDirectories(_))
      val r = runOnce(args(1).toInt, args(2), args(3).toInt, slice)
      val line = toJson(r)
      println(line)
      Files.writeString(out, line)
      return
    }
    if (args.length > 0 && args(0) == "report") {
      // report [--out <path>] [--note <text>] <jsonN> <json4N> [...] [sfDir]
      var rest = args.drop(1)
      var outPath = "BENCH/BASELINE.md" // the official report; attribution
                                        // side-reports pass --out
      val oi = rest.indexOf("--out")
      if (oi >= 0) {
        require(oi + 1 < rest.length, "--out needs a path argument")
        outPath = rest(oi + 1); rest = rest.patch(oi, Nil, 2)
      }
      // --note: verbatim text appended as a Notes section — passed on the
      // command line so the report stays fully tool-written and the note's
      // provenance is the invocation itself (e.g. a pointer to the raw
      // attribution JSONs of the same batch)
      var note = ""
      val ni = rest.indexOf("--note")
      if (ni >= 0) {
        require(ni + 1 < rest.length, "--note needs a text argument")
        note = rest(ni + 1); rest = rest.patch(ni, Nil, 2)
      }
      val (files, sfDir) =
        if (rest.length % 2 == 1) (rest.dropRight(1), rest.last)
        else (rest, "/root/testdata/sf0.1")
      require(files.length >= 2,
        "usage: report [--out <path>] <jsonN> <json4N> [...] [sfDir] — " +
          "needs at least one (N, 4N) JSON pair (an odd trailing arg is the sfDir)")
      val runs = files.map(parse)
      emit(runs.grouped(2).map { case Array(a, b) => (a, b) }.toSeq,
        sfDir, freshJvms = true, outPath = outPath, note = note)
      return
    }
    val n = if (args.length > 0) args(0).toInt else 8
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val replicas = if (args.length > 2) args(2).toInt else 64
    val rN = runOnce(n, sfDir, replicas)
    val r4 = runOnce(4 * n, sfDir, replicas)
    emit(Seq((rN, r4)), sfDir, freshJvms = false)
  }

  /** One session at `cores`: measure narrow and shuffle variants. */
  private def runOnce(cores: Int, sfDir: String, replicas: Int,
                      slice: String = "all"): Run = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"scaling-$cores")
      .config("spark.sql.shuffle.partitions", cores * 2)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      // generator output is already hash-distributed — this cache stands in
      // for the bucket-partitioned Iceberg table. Partition count is FIXED
      // across cluster sizes (as a table's bucketing would be) so the only
      // variable is core count; 128 buckets = 8+ waves even at 4N, which
      // averages out per-partition cost differences (PDF docs cost more
      // than HTML ones).
      val pages = io.SyntheticPages
        .fromDocuments(spark, sfDir, replicas, partitions = 128, slice = slice)
        .cache()
      val docs = pages.count() // generation + cache fill, untimed
      val bytes = pages.agg(sum(length(col("html")))).collect()(0).getLong(0)
      val heavy = pipeline.Salting.detectHeavyHosts(pages) // corpus statistic, untimed

      def time(conf: model.PipelineConf): Double = {
        val t0 = System.nanoTime()
        pipeline.Extract.runWithHosts(pages, conf, heavy).toDF().count()
        (System.nanoTime() - t0) / 1e9
      }
      val narrowConf = model.PipelineConf(shufflePartitions = 0)
      val shuffleConf = model.PipelineConf(shufflePartitions = cores * 2)
      // JIT warm-up, untimed (the kernel path is identical in both variants)
      time(narrowConf); time(narrowConf)
      val loadStart = loadAvg
      val narrowRaw = Seq.fill(Reps)(time(narrowConf))
      val shuffleRaw = Seq.fill(Reps)(time(shuffleConf))
      val loadEnd = loadAvg
      System.err.println(s"[scaling] cores=$cores narrow=${seq(narrowRaw)} " +
        s"shuffle=${seq(shuffleRaw)} load=$loadStart->$loadEnd")
      pages.unpersist()
      Run(cores, docs, bytes / 1048576.0, narrowRaw, shuffleRaw, loadStart, loadEnd,
        Runtime.getRuntime.maxMemory / 1073741824.0, slice)
    } finally spark.stop()
  }

  /** Parse a `once` JSON line back into a Run (numbers and number arrays). */
  def parse(path: String): Run = {
    val txt = new String(Files.readAllBytes(Paths.get(path)), "UTF-8")
    val scalars = "\"(\\w+)\":(-?[0-9.]+)".r.findAllMatchIn(txt)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
    val arrays = "\"(\\w+)\":\\[([0-9.,]*)\\]".r.findAllMatchIn(txt)
      .map(m => m.group(1) ->
        m.group(2).split(',').filter(_.nonEmpty).map(_.toDouble).toSeq).toMap
    val strings = "\"(\\w+)\":\"([^\"]*)\"".r.findAllMatchIn(txt)
      .map(m => m.group(1) -> m.group(2)).toMap
    Run(scalars("cores").toInt, scalars("docs").toLong, scalars("mb"),
      arrays.getOrElse("narrow_raw", Seq(scalars("narrow_sec"))),
      arrays.getOrElse("shuffle_raw", Seq(scalars("shuffle_sec"))),
      scalars.getOrElse("load_start", -1.0), scalars.getOrElse("load_end", -1.0),
      scalars.getOrElse("heap_gb", -1.0), strings.getOrElse("slice", "all"))
  }

  /** Render BENCH/BASELINE.md from the measured (N, 4N) pairs — the ONLY
    * writer of the report, so every number in it comes from tool output.
    * Each pair is one back-to-back measurement window; the gate is computed
    * within its window only.
    */
  def emit(pairs: Seq[(Run, Run)], sfDir: String, freshJvms: Boolean,
           outPath: String = "BENCH/BASELINE.md", note: String = ""): Unit = {
    pairs.foreach { case (a, b) =>
      require(b.cores == 4 * a.cores, s"need 4x cores, got ${a.cores} vs ${b.cores}")
      require(a.docs == b.docs, s"inputs differ: ${a.docs} vs ${b.docs}")
      require(a.slice == b.slice, s"corpus slices differ: ${a.slice} vs ${b.slice}")
    }
    val h = pairs.head._1
    def loads(r: Run) =
      if (r.loadStart < 0) "n/a" else s"${f(r.loadStart)}→${f(r.loadEnd)}"
    def heap(r: Run) = if (r.heapGb < 0) "n/a" else f(r.heapGb)
    def reps(xs: Seq[Double]) = xs.map(f).mkString(" ")
    val slices = pairs.map(_._1.slice).distinct
    val sliceNote =
      if (slices == Seq("all")) ""
      else s"\nCorpus slice(s) under measurement: ${slices.mkString(", ")} " +
        "(route-restricted corpus for scaling attribution; see per-window rows).\n"
    val repRows = pairs.zipWithIndex.flatMap { case ((a, b), i) =>
      Seq(a, b).flatMap(r => Seq(
        s"| ${i + 1} | ${r.cores} | ${r.docs} | ${heap(r)} | ${r.slice}/narrow | ${loads(r)} | ${reps(r.narrowRaw)} | ${f(r.narrowSec)} |",
        s"| ${i + 1} | ${r.cores} | ${r.docs} | ${heap(r)} | ${r.slice}/shuffle | ${loads(r)} | ${reps(r.shuffleRaw)} | ${f(r.shuffleSec)} |"))
    }.mkString("\n")
    val gates = pairs.map { case (a, b) =>
      val thrN = a.docs / a.narrowSec; val thr4 = b.docs / b.narrowSec
      val eff = thr4 / (4.0 * thrN)
      val effS = (b.docs / b.shuffleSec) / (4.0 * (a.docs / a.shuffleSec))
      (a, b, thrN, thr4, eff, effS)
    }
    val headline = gates.map { case (a, b, thrN, thr4, eff, _) =>
      s"| ${a.cores} | ${f(a.narrowSec)} | ${f(thrN)} | ${f(a.mb / a.narrowSec)} |\n" +
        s"| ${b.cores} | ${f(b.narrowSec)} | ${f(thr4)} | ${f(b.mb / b.narrowSec)} |\n" +
        s"|  | **efficiency ${b.cores}/(4x${a.cores}) = ${f(eff)}** | gate >= 0.8 -> ${if (eff >= 0.8) "PASS" else "FAIL"} | |"
    }.mkString("\n")
    val shuffleRows = gates.map { case (a, b, _, _, _, effS) =>
      s"| ${a.cores} | ${f(a.shuffleSec)} | ${f(a.docs / a.shuffleSec)} |\n" +
        s"| ${b.cores} | ${f(b.shuffleSec)} | ${f(b.docs / b.shuffleSec)} |\n" +
        s"|  | shuffle efficiency = ${f(effS)} | |"
    }.mkString("\n")
    val anyOver = gates.exists(_._5 > 1.05)
    val report =
      s"""# BENCH — measured scaling evidence (sandbox N vs 4N cores)
         |
         |North-rule criterion: throughput scaling efficiency >= 0.8 from N to 4N
         |executors (BASELINE.json). No multi-node cluster exists in this sandbox;
         |per driver instruction the same job runs at two local parallelism
         |levels${if (freshJvms) ", each size in a FRESH JVM," else ""} on identical
         |input. Each (N, 4N) pair below is one back-to-back measurement window;
         |its gate is computed within that window only.
         |
         |Job: SyntheticPages.fromDocuments($sfDir, replicas) -> Extract (typed
         |mapPartitions kernel: charset detect -> HTML tokenizer/boilerplate or
         |PDF span parse / pixel OCR -> confidence) -> count.
         |Input: ${h.docs} pages, ${f(h.mb)} MiB HTML+PDF payload in window 1
         |(per-window page counts in the replicate table — the corpus replica
         |factor may vary by window; each pair compares identical input), cached,
         |fixed 128 input partitions at every size (a table's bucketing does not
         |change with cluster size). JIT warm-up paid untimed in every JVM.
         |JVM sizing mirrors a real executor: heap and GC threads scale with
         |the simulated core count (2 GiB + ParallelGCThreads per core via
         |SPARK_DRIVER_MEM / GRAFT_JAVA_OPTS) — a fixed heap would starve the
         |wide size with young-GC pauses a real 4N cluster never sees (its
         |memory grows 4x with the executors). Actual per-JVM heap is
         |recorded in the replicate table.
         |%SLICENOTE%
         |## Replicates (every timed run, seconds; min = least-contended estimate
         |under ambient box load — this report is tool-generated, nothing elided)
         |
         || window | cores | docs | heap GiB | variant | load avg start→end | replicates (s) | min |
         ||---|---|---|---|---|---|---|---|
         |%REPROWS%
         |
         |## Headline: pre-partitioned input (the 100 TB design)
         |
         |At production scale the pages table is bucket-partitioned by hash(url)
         |at ingest (Iceberg bucket transform; SURVEY 7.6), so extraction is a
         |narrow, shuffle-free stage - partitioning cost is paid once at write
         |time, not once per job.
         |
         || cores | wall (s) | docs/sec | MB/sec |
         ||---|---|---|---|
         |%HEADLINE%
         |${if (anyOver) "Note: >1.0 efficiency reflects local-mode measurement noise (GC/JIT variance across JVMs); the honest claim is \"no sublinear penalty observed\"." else ""}
         |Load-average caveat: the box carries ambient load from other
         |workloads (visible in the replicate table); at the larger sizes the
         |1-min load also counts the run's own threads. Min-of-$Reps per cell
         |is the contention control.
         |
         |## Runtime salted shuffle variant (unpartitioned input)
         |
         || cores | wall (s) | docs/sec |
         ||---|---|---|
         |%SHUFFLEROWS%
         |
         |Local-mode caveat: all "executors" share one memory bus and one disk,
         |so shuffle bandwidth does not grow with core count in this sandbox; on
         |a real N->4N cluster the shuffle hardware (disks, NICs) grows 4x with
         |the executors. The production plan avoids the per-job shuffle entirely
         |via ingest-time bucketing (headline above).
         |
         |Hardware: ${Runtime.getRuntime.availableProcessors}-thread box.
         |${if (note.nonEmpty) s"\n## Notes\n\n$note\n" else ""}""".stripMargin
        .replace("%SLICENOTE%", sliceNote)
        .replace("%REPROWS%", repRows)
        .replace("%HEADLINE%", headline)
        .replace("%SHUFFLEROWS%", shuffleRows)
    io.PathGuard.checkWritable(outPath)
    Option(Paths.get(outPath).getParent).foreach(Files.createDirectories(_))
    Files.writeString(Paths.get(outPath), report)
    val g = gates.map { case (a, b, _, _, eff, effS) =>
      s"""{"n":${a.cores},"n4":${b.cores},"efficiency":${f(eff)},"shuffle_efficiency":${f(effS)}}"""
    }.mkString("[", ",", "]")
    println(s"""{"docs":${h.docs},"mb":${f(h.mb)},"pairs":$g}""")
  }
}
