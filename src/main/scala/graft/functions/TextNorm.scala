package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization kernels for the [[GraftFunctions]] expressions.
  *
  * Static-forwarder object so generated Java can call
  * `graft.functions.TextNorm.nfc(...)` directly from whole-stage codegen —
  * the expressions stay codegen'd (unlike `graft_extract`'s deliberate
  * CodegenFallback) because these are per-row scalar string ops on the
  * text-curation hot path.
  *
  * A 100 TB training-data pipeline normalizes to NFC before hashing or
  * deduplicating (the same word with precomposed vs combining accents
  * would otherwise fingerprint differently), and folds accents for
  * fuzzy/locale-insensitive matching; the reference's Python stack gets
  * both from `unicodedata.normalize` for free.
  */
object TextNorm {

  private val Marks = java.util.regex.Pattern.compile("\\p{M}+")

  /** Canonical composition (NFC). Already-NFC strings round-trip
    * unchanged; `Normalizer.isNormalized` short-circuits the common case
    * without allocating.
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Accent folding: canonical decomposition, then every combining mark
    * removed (DuckDB `strip_accents` / ICU transliterator semantics for
    * Latin: é→e, ñ→n, ü→u; characters without a canonical decomposition —
    * ß, ø — pass through unchanged).
    */
  def stripAccents(s: UTF8String): UTF8String = {
    val str = s.toString
    val nfd = java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFD)
    val folded = Marks.matcher(nfd).replaceAll("")
    if (folded == str) s else UTF8String.fromString(folded)
  }
}
