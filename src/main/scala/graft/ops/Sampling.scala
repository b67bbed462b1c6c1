package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling — the "domain mixing" knob of a
  * training-data pipeline (downsample over-crawled languages/sources to a
  * target mixture before training).
  *
  * The keep decision is a pure function of the ROW (`splitmix64(id) mod 100
  * < rate(stratum)`), NOT of `rand()`: the sample is identical across runs,
  * cluster sizes, partitionings and retries (rand()-based sampling is none
  * of those — a recomputed partition after executor loss would resample),
  * can be re-derived by an external SQL oracle, and needs no shuffle — the
  * filter runs inside the scan stage. The reference has no sampling stage;
  * this is the scale-path operator a 100 TB corpus needs before training.
  */
object Sampling {

  /** Per-language keep rates in percent; languages absent from the map get
    * [[DefaultRatePct]]. The en/zh/es/de/fr values mirror a typical
    * over-crawl correction (downsample en hardest).
    */
  val RatesPct: Map[String, Int] =
    Map("en" -> 50, "es" -> 80, "de" -> 80, "fr" -> 80, "zh" -> 30)
  val DefaultRatePct = 5

  /** Rows of `df` kept by the deterministic stratified sample; output is
    * `(id, stratum)` of the kept rows. Narrow (filter-only) — scales with
    * input partitions at any corpus size.
    */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(stratumCol).as("stratum"))
      .as[(Long, String)]
      .filter { case (id, stratum) =>
        val rate = RatesPct.getOrElse(if (stratum == null) "" else stratum, DefaultRatePct)
        java.lang.Long.remainderUnsigned(Dedup.splitmix64(id), 100L) < rate
      }
      .toDF("id", "stratum")
  }
}
