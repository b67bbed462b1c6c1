package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: token counting,
  * quality scoring, language ID, content fingerprinting. All are composed
  * Catalyst builtins (whole-stage-codegen'd column expressions — no UDFs,
  * no Python), so they inline into scans and survive column pruning.
  *
  * The reference's closest analogues: word_count = `len(text.split())`
  * (use_cases.py:196), quality flags vs thresholds 60/80
  * (constants/__init__.py:12,15-16), language as routed config
  * (routers/system.py:22-33).
  */
object TextStats {

  /** Whitespace token count — `len(text.split())` semantics. */
  def tokenCountWs(text: Column): Column =
    when(length(trim(text)) === 0, 0)
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish token count: letter runs, digit runs, and single punctuation
    * marks each count as one token (a cheap stand-in for a real tokenizer's
    * pre-tokenization pass; same regex class runs in DuckDB for the oracle).
    */
  val BpeTokenRe = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeTokenRe), lit(0)))

  /** Character-class counts (integer, exactly reproducible in any engine). */
  def charLen(text: Column): Column = length(text)
  def spaceCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[ \\t\\r\\n]", ""))
  def digitCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[0-9]", ""))
  def upperCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[A-Z]", ""))
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[!-/:-@\\[-`{-~]", ""))

  /** Quality score 0..100 (Boilerpipe-era heuristics): long-enough text,
    * sane punctuation/digit/caps ratios, real words. Deterministic double —
    * same literal formula on integer counts.
    */
  def qualityScore(text: Column): Column = {
    val len = charLen(text).cast("double")
    val words = tokenCountWs(text).cast("double")
    val punct = punctCount(text).cast("double")
    val digit = digitCount(text).cast("double")
    val upper = upperCount(text).cast("double")
    val lenScore = least(len / lit(500.0), lit(1.0)) * 30.0
    val wordScore = least(words / lit(80.0), lit(1.0)) * 30.0
    val punctPenalty = least(punct / greatest(len, lit(1.0)) * lit(100.0), lit(20.0))
    val digitPenalty = least(digit / greatest(len, lit(1.0)) * lit(50.0), lit(10.0))
    val upperPenalty = least(upper / greatest(len, lit(1.0)) * lit(50.0), lit(10.0))
    greatest(lit(0.0),
      lenScore + wordScore + lit(40.0) - punctPenalty - digitPenalty - upperPenalty)
  }

  /** 64-bit content fingerprint over whitespace-normalized lowercase text
    * (rolling-hash family member; exact-dup and drift detection).
    */
  def fingerprint64(text: Column): Column =
    xxhash64(regexp_replace(lower(text), "\\s+", " "))

  // --- language ID (n-gram/stopword heuristic; SURVEY routing C5 analogue) ---

  private val stop: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for",
      "with", "are", "this", "have", "not"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "del", "las", "por", "un",
      "una", "con", "para", "es", "su"),
    "de" -> Seq("der", "die", "und", "das", "nicht", "von", "sie", "ist", "des",
      "sich", "mit", "dem", "dass", "er", "ein"),
    "fr" -> Seq("le", "la", "les", "des", "est", "et", "une", "dans", "qui",
      "que", "pour", "sur", "pas", "au", "avec"))

  /** Fraction of CJK chars — decisive for zh. */
  def cjkRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[\\x{4e00}-\\x{9fff}]", "")))
      .cast("double") / greatest(length(text), lit(1)).cast("double")

  /** Predicted language ∈ {en, es, de, fr, zh, und}: CJK ratio first, else
    * argmax of stopword hits (unique-token intersection), `und` on zero hits.
    */
  def langId(text: Column): Column = {
    val toks = split(lower(text), "[^\\p{L}]+")
    val hits = stop.map { case (lang, words) =>
      lang -> size(array_intersect(toks, typedLit(words)))
    }
    val maxHits = greatest(hits.values.toSeq: _*)
    // deterministic tie-break: alphabetical language order wins
    val ordered = hits.toSeq.sortBy(_._1)
    val byStopwords = ordered.foldRight(lit("und"): Column) { case ((lang, h), acc) =>
      when(h === maxHits && maxHits > 0, lit(lang)).otherwise(acc)
    }
    when(cjkRatio(text) > 0.05, lit("zh")).otherwise(byStopwords)
  }

  // --- PII scrubbing (training-data redaction pass) ----------------------

  /** Regexes shared verbatim with the DuckDB oracle (Java/RE2-common
    * subset: no lookaround, no backrefs, ASCII `\b`).
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\+\\d[\\d-]{7,14}\\d"

  def emailCount(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailRe), lit(0)))
  def phoneCount(text: Column): Column =
    size(regexp_extract_all(text, lit(PhoneRe), lit(0)))
  def ipCount(text: Column): Column =
    size(regexp_extract_all(text, lit(Ipv4Re), lit(0)))

  /** Redact emails → `<EMAIL>`, then phones → `<PHONE>`, then IPv4s →
    * `<IP>`. Order matters only in that the placeholders contain no
    * digits/@, so later passes cannot re-match earlier redactions. A pure
    * codegen'd regexp_replace chain — inlines into the scan, no shuffle.
    */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      Ipv4Re, "<IP>")

  // --- intra-document repetition (Gopher-style dup n-gram fraction) ------

  /** Word n-grams of the document (empty below n words); tokenization
    * identical to the shingle pass (`[^\p{L}\p{N}]+` split, lowercased).
    */
  def wordNgrams(text: Column, n: Int): Column = {
    val words = filter(split(lower(text), "[^\\p{L}\\p{N}]+"), w => length(w) > 0)
    when(size(words) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(words) - (n - 1)),
        i => concat_ws(" ", slice(words, i, lit(n)))))
  }

  /** Fraction of n-gram occurrences repeating an earlier one:
    * `1 - distinct/total` (0 for docs with no n-grams). The intra-doc
    * analogue of corpus dedup — high values flag boilerplate loops and
    * generator glitches before training (Gopher repetition filters).
    */
  def dupNgramRatio(text: Column, n: Int): Column = {
    val g = wordNgrams(text, n)
    when(size(g) === 0, lit(0.0))
      .otherwise(lit(1.0) -
        size(array_distinct(g)).cast("double") / size(g).cast("double"))
  }

  /** One call = the full per-document text-analysis projection. */
  def analyze(df: org.apache.spark.sql.DataFrame, textCol: String): org.apache.spark.sql.DataFrame = {
    val t = col(textCol)
    df.withColumn("token_count_ws", tokenCountWs(t))
      .withColumn("token_count_bpe", tokenCountBpe(t))
      .withColumn("quality_score", qualityScore(t))
      .withColumn("lang_pred", langId(t))
      .withColumn("fingerprint", fingerprint64(t))
  }
}
