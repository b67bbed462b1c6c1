package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level paragraph deduplication — the C4 curation step (Raffel et
  * al. 2020, JMLR 21(140) §2.2 discard repeated spans, kept-first policy) at
  * paragraph granularity: a paragraph occurring in many documents (site
  * boilerplate, legal footers, licence blocks) survives only in its first
  * occurrence, ordered by `(doc_id, position)`.
  *
  * 100 TB shape: one explode, then the winner per paragraph is a
  * partial-aggregatable `min(struct(doc_id, pos))` — NOT a window over the
  * paragraph key: a universal boilerplate paragraph would funnel its entire
  * corpus-wide occurrence list through one window partition, while the
  * hash-aggregate combines map-side and the join back fans each occurrence
  * row to exactly one winner row (AQE skew split handles hot paragraphs).
  * Re-assembly is one groupBy(doc) with an array_sort — shuffle bounded by
  * surviving-paragraph cardinality. No driver-side state.
  */
object ParaDedup {

  /** Deterministic `size`-word chunking of a whitespace-separated text —
    * the paragraph deriver for corpora whose documents carry no explicit
    * paragraph breaks (empty chunks are dropped by [[dedupParagraphs]]).
    */
  def chunkWords(text: Column, size: Int): Column = {
    val words = split(text, " +")
    // Column `/` is double division; floor() recovers the integral chunk
    // count ((len-1) is never negative: a regex split yields >= 1 element)
    val nChunks = floor((org.apache.spark.sql.functions.size(words) - 1) / lit(size)).cast("int")
    transform(
      sequence(lit(0), nChunks),
      i => concat_ws(" ", slice(words, i * size + 1, lit(size))))
  }

  /** `df(docIdCol: long, parasCol: array<string>)` → one row per document:
    * `(doc_id, n_paras, n_kept, clean_text)` where `clean_text` re-joins the
    * surviving paragraphs with `"\n\n"` in original order. Empty paragraphs
    * are ignored. Documents with no non-empty paragraphs produce no row
    * (nothing to curate).
    */
  def dedupParagraphs(df: DataFrame, docIdCol: String, parasCol: String): DataFrame = {
    val exploded = df
      .select(col(docIdCol).cast("long").as("doc_id"), posexplode(col(parasCol)).as(Seq("pos", "para")))
      .where(col("para") =!= "")
    val winners = exploded
      .groupBy("para")
      .agg(min(struct(col("doc_id"), col("pos"))).as("w"))
    exploded.join(winners, "para")
      .withColumn("kept",
        col("doc_id") === col("w.doc_id") && col("pos") === col("w.pos"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).cast("int").as("n_paras"),
        sum(when(col("kept"), 1).otherwise(0)).cast("int").as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(when(col("kept"), struct(col("pos"), col("para"))))),
            s => s.getField("para")),
          "\n\n").as("clean_text"))
  }
}
