package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the n-gram overlap check every serious
  * training corpus runs against its evaluation sets (GPT-3 appendix C /
  * PaLM §7 style: a training document is contaminated when it shares at
  * least one word n-gram with any benchmark document; n = 8 here).
  *
  * 100 TB shape: evaluation sets are tiny next to the corpus, so the eval
  * n-gram set is broadcast and the probe is a map-side hash join against
  * each training document's DISTINCT n-grams — one explode, no shuffle of
  * the corpus side beyond the final per-doc count aggregation.
  */
object Decontam {

  /** `train(docId, gramsCol: array<string>)` probed against
    * `evalGrams(g: string)` (distinct): one row per training document —
    * `(doc_id, overlap_cnt, contaminated)`. `overlap_cnt` counts the
    * DISTINCT shared n-grams (the input grams are deduped here, so a
    * repeated boilerplate n-gram in one document counts once).
    */
  def overlap(train: DataFrame, gramsCol: String, evalGrams: DataFrame): DataFrame = {
    val probes = train
      .select(col("doc_id"), explode(array_distinct(col(gramsCol))).as("g"))
    val hits = probes
      .join(broadcast(evalGrams.select(col("g")).distinct()), "g")
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("overlap_cnt"))
    train.select("doc_id")
      .join(hits, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("overlap_cnt"), lit(0)).as("overlap_cnt"),
        (coalesce(col("overlap_cnt"), lit(0)) > 0).as("contaminated"))
  }
}
