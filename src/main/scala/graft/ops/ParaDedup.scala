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
    *
    * The winner rollup `min(struct(doc_id, pos)) per para` IS the kept set —
    * one row per distinct paragraph, already carrying the surviving
    * occurrence's (doc, pos). So the per-doc result regroups the WINNER rows
    * by `w.doc_id` directly; `n_paras` comes from a narrow per-doc
    * `size(filter(...))` on the source array. The former shape joined the
    * winner back to every exploded occurrence, which re-shuffles the entire
    * paragraph text a second time at OCCURRENCE cardinality (the corpus's
    * fattest intermediate) only to re-derive what the winner row already
    * says — at 100 TB that join is the dominant shuffle, here it was 8
    * Exchanges vs 4.
    */
  def dedupParagraphs(df: DataFrame, docIdCol: String, parasCol: String): DataFrame = {
    val exploded = df
      .select(col(docIdCol).cast("long").as("doc_id"), posexplode(col(parasCol)).as(Seq("pos", "para")))
      .where(col("para") =!= "")
    val kept = exploded
      .groupBy("para")
      .agg(min(struct(col("doc_id"), col("pos"))).as("w"))
      .groupBy(col("w.doc_id").as("doc_id"))
      .agg(
        count(lit(1)).cast("int").as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("w.pos").as("pos"), col("para").as("para")))),
            s => s.getField("para")),
          "\n\n").as("clean_text"))
    // narrow per-doc occurrence count: same value the exploded groupBy
    // counted, no explode/shuffle needed. Docs whose every paragraph lost
    // (no winner row) keep their row via the left join: n_kept 0, "" text.
    df.select(col(docIdCol).cast("long").as("doc_id"),
        size(filter(col(parasCol), p => p =!= "")).cast("int").as("n_paras"))
      .where(col("n_paras") > 0)
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_paras"),
        coalesce(col("n_kept"), lit(0)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }
}
