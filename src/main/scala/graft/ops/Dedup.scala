package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines.
  *
  * Scale shape (the part that must survive 100 TB):
  *  - signatures are computed in one narrow mapPartitions pass (no shuffle,
  *    no per-row allocation churn beyond the token array);
  *  - candidate generation is ONE shuffle: explode b band keys per doc and
  *    hash-aggregate on (band, key) — never an O(n²) cross join;
  *  - bucket blow-up is clamped (`maxBucketSize`): a degenerate bucket
  *    (empty docs, boilerplate-identical rows) would otherwise emit |B|²
  *    pairs; clamped buckets are dropped and counted, not silently kept;
  *  - pair verification joins signatures back by id — two broadcast-size
  *    lookups at candidate cardinality, not corpus cardinality.
  */
object Dedup {

  /** Scale-adaptive parallelism floor for HEAVY narrow per-row kernel
    * passes. documents.parquet is ONE scan split at small/medium SF, so
    * without this an opaque mapPartitions kernel runs on a single core
    * while the rest of the box idles — measured 1 partition feeding them
    * at sf0.1/local[32]. An under-partitioned input is repartitioned up to
    * the session's default parallelism; an input already at scale
    * (thousands of scan splits at 100 TB) passes through untouched, so
    * this never shrinks real parallelism and never adds a shuffle where
    * the layout is already wide. Applied ONLY where the per-row kernel
    * outweighs one small exchange (tokenize/shingle, multimodal
    * synthesize+decode); the cheap kernels (simhash, RHP signatures, IVF
    * assignment) A/B-measured slower widened and stay single-pass.
    */
  private[ops] def widen(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }

  // --- exact -----------------------------------------------------------

  /** Exact duplicate groups by content hash (hash-groupBy; one shuffle). */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(sha2(col(textCol).cast("binary"), 256).as("content_hash"))
      .agg(count(lit(1)).as("cnt"), sort_array(collect_list(col(idCol))).as("ids"))
      .where(col("cnt") > 1)

  // --- MinHash + LSH ----------------------------------------------------

  final case class MinHashParams(
    shingleSize: Int = 3,     // word shingles
    numHashes: Int = 64,
    bands: Int = 16) {        // rows per band = numHashes / bands
    require(numHashes % bands == 0, "bands must divide numHashes")
    def rowsPerBand: Int = numHashes / bands
  }

  /** 64-hash MinHash signature of a token-shingled document. Affine family
    * `h_i = a_i * h + b_i` over one 64-bit base hash per shingle (standard
    * one-hash trick); deterministic seeds.
    */
  def minhashSignature(text: String, p: MinHashParams): Array[Long] = {
    val sig = Array.fill(p.numHashes)(Long.MaxValue)
    val toks = tokenize(text)
    if (toks.length < p.shingleSize) {
      // short doc: single shingle = whole text
      mixInto(sig, fnv64(toks.mkString(" ")), p)
    } else {
      var i = 0
      while (i + p.shingleSize <= toks.length) {
        // allocation-free fnv64 over the space-joined shingle (see
        // shingleArray: FNV is a left-to-right char fold)
        var h = 0xCBF29CE484222325L
        var j = 0
        while (j < p.shingleSize) {
          if (j > 0) { h ^= ' '; h *= 0x100000001B3L }
          val t = toks(i + j)
          var k = 0
          while (k < t.length) { h ^= t.charAt(k); h *= 0x100000001B3L; k += 1 }
          j += 1
        }
        mixInto(sig, h, p)
        i += 1
      }
    }
    sig
  }

  private def mixInto(sig: Array[Long], h: Long, p: MinHashParams): Unit = {
    var k = 0
    while (k < p.numHashes) {
      val v = h * SeedA(k) + SeedB(k)
      if (v < sig(k)) sig(k) = v
      k += 1
    }
  }

  // deterministic odd multipliers / offsets (splitmix64 of the index)
  private val SeedA: Array[Long] = Array.tabulate(256)(i => splitmix64(i * 2 + 1) | 1L)
  private val SeedB: Array[Long] = Array.tabulate(256)(i => splitmix64(i * 2 + 2))

  /** The first `n` affine seeds, for oracles that re-derive the signature
    * outside the JVM (SparkEntry's DuckDB MinHash oracle embeds these as
    * literals generated from THIS array — they can never drift).
    */
  def seeds(n: Int): (Array[Long], Array[Long]) = (SeedA.take(n), SeedB.take(n))

  def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  def fnv64(s: String): Long = {
    var h = 0xCBF29CE484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001B3L; i += 1 }
    h
  }

  // precompiled: String.split(regex) recompiles the Pattern on every call
  // for multi-char regexes — pure per-document overhead in the tokenize
  // pass every dedup stage funnels through
  private val TokenSplit = java.util.regex.Pattern.compile("[^\\p{L}\\p{N}]+")

  private def tokenize(text: String): Array[String] =
    TokenSplit.split(text.toLowerCase(java.util.Locale.ROOT)).filter(_.nonEmpty)

  /** id → signature, one narrow pass. */
  def signatures(df: DataFrame, idCol: String, textCol: String,
                 p: MinHashParams = MinHashParams()): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    widen(df.select(col(idCol).cast("long").as("id"), col(textCol).as("text")))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        (id, minhashSignature(if (text == null) "" else text, p))
      })
      .toDF("id", "sig")
  }

  /** id → signature derived from a MATERIALIZED shingle set ([[shingleSets]])
    * instead of re-tokenizing the text. Bit-identical to [[signatures]] when
    * the set's n equals `p.shingleSize`: the minimum of an affine hash over
    * shingle OCCURRENCES equals the minimum over the DISTINCT shingle hashes
    * (duplicates never change a min), which is exactly what the d02 oracle
    * re-derives (it applies list_distinct before hashing).
    */
  def signaturesFromSets(shingles: DataFrame,
                         p: MinHashParams = MinHashParams()): DataFrame = {
    val spark = shingles.sparkSession
    import spark.implicits._
    shingles.select(col("id"), col("sh")).as[(Long, Array[Long])]
      .mapPartitions(_.map { case (id, sh) =>
        val sig = Array.fill(p.numHashes)(Long.MaxValue)
        var i = 0
        while (i < sh.length) { mixInto(sig, sh(i), p); i += 1 }
        (id, sig)
      })
      .toDF("id", "sig")
  }

  /** Banding-only candidate pairs (id_a < id_b, distinct): one shuffle of
    * b band keys per doc, hash-aggregate on (band, key), bucket clamp —
    * the candidate generator shared by the est-verifying
    * [[minhashCandidates]] and the fused [[jaccardVerify]] path.
    */
  def bandedPairs(sigs: DataFrame, p: MinHashParams = MinHashParams(),
                  maxBucketSize: Int = 64): DataFrame = {
    val spark = sigs.sparkSession
    import spark.implicits._
    val r = p.rowsPerBand
    val banded = sigs.as[(Long, Array[Long])].flatMap { case (id, sig) =>
      (0 until p.bands).iterator.map { b =>
        var h = 0xCBF29CE484222325L
        var i = b * r
        while (i < (b + 1) * r) { h ^= sig(i); h *= 0x100000001B3L; i += 1 }
        (b, h, id)
      }
    }.toDF("band", "bkey", "id")

    banded.groupBy("band", "bkey")
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .where(size(col("ids")) > 1 && size(col("ids")) <= maxBucketSize)
      .select(explode(pairCombos(col("ids"))).as("pair"))
      .select(col("pair._1").as("id_a"), col("pair._2").as("id_b"))
      .distinct()
  }

  /** LSH candidate pairs + estimated Jaccard (fraction of equal minhashes).
    * `minEstJaccard` filters the verified estimate, not the banding.
    */
  def minhashCandidates(sigs: DataFrame, p: MinHashParams = MinHashParams(),
                        minEstJaccard: Double = 0.5,
                        maxBucketSize: Int = 64): DataFrame = {
    val pairs = bandedPairs(sigs, p, maxBucketSize)
    // verify: join signatures back (candidate-cardinality joins)
    val sa = sigs.toDF("id_a", "sig_a")
    val sb = sigs.toDF("id_b", "sig_b")
    pairs.join(sa, "id_a").join(sb, "id_b")
      .select(col("id_a"), col("id_b"),
        estJaccard(col("sig_a"), col("sig_b"), p.numHashes).as("est_jaccard"))
      .where(col("est_jaccard") >= minEstJaccard)
  }

  /** INCREMENTAL dedup: candidates between a NEW document set and an
    * EXISTING corpus (the production shape — dedupe each crawl increment
    * against the corpus without recomputing all-pairs). Same one-shuffle
    * banding as [[minhashCandidates]], but buckets join across the two
    * sets only: new×new and old×old pairs are never emitted. At 100 TB the
    * old side's signatures are computed once and persisted; each increment
    * pays only its own banding + the bucket join.
    *
    * Returns (new_id, old_id, est_jaccard).
    */
  def minhashCandidatesAcross(newSigs: DataFrame, oldSigs: DataFrame,
                              p: MinHashParams = MinHashParams(),
                              minEstJaccard: Double = 0.5,
                              maxBucketSize: Int = 64): DataFrame = {
    val pairs = acrossBandedPairs(newSigs, oldSigs, p, maxBucketSize)
    val sa = newSigs.toDF("new_id", "sig_a")
    val sb = oldSigs.toDF("old_id", "sig_b")
    pairs.join(sa, "new_id").join(sb, "old_id")
      .select(col("new_id"), col("old_id"),
        estJaccard(col("sig_a"), col("sig_b"), p.numHashes).as("est_jaccard"))
      .where(col("est_jaccard") >= minEstJaccard)
  }

  /** Cross-set banding-only candidates (new_id, old_id) — the generator
    * inside [[minhashCandidatesAcross]], exposed so the fused
    * [[jaccardVerify]] path can est-filter and exact-verify in one pass.
    */
  def acrossBandedPairs(newSigs: DataFrame, oldSigs: DataFrame,
                        p: MinHashParams = MinHashParams(),
                        maxBucketSize: Int = 64): DataFrame = {
    val spark = newSigs.sparkSession
    import spark.implicits._
    val r = p.rowsPerBand
    def banded(sigs: DataFrame, side: Int) =
      sigs.as[(Long, Array[Long])].flatMap { case (id, sig) =>
        (0 until p.bands).iterator.map { b =>
          var h = 0xCBF29CE484222325L
          var i = b * r
          while (i < (b + 1) * r) { h ^= sig(i); h *= 0x100000001B3L; i += 1 }
          (b, h, id, side)
        }
      }.toDF("band", "bkey", "id", "side")

    banded(newSigs, 0).unionAll(banded(oldSigs, 1))
      .groupBy("band", "bkey")
      .agg(sort_array(collect_list(when(col("side") === 0, col("id")))).as("new_ids"),
        sort_array(collect_list(when(col("side") === 1, col("id")))).as("old_ids"))
      .where(size(col("new_ids")) > 0 && size(col("old_ids")) > 0 &&
        size(col("new_ids")) + size(col("old_ids")) <= maxBucketSize)
      .select(explode(col("new_ids")).as("new_id"), col("old_ids"))
      .select(col("new_id"), explode(col("old_ids")).as("old_id"))
      .distinct()
  }

  /** fraction of equal signature slots — unbiased Jaccard estimator. */
  def estJaccard(sigA: org.apache.spark.sql.Column, sigB: org.apache.spark.sql.Column,
                 n: Int): org.apache.spark.sql.Column =
    aggregate(zip_with(sigA, sigB, (x, y) => when(x === y, 1L).otherwise(0L)),
      lit(0L), (acc, v) => acc + v).cast("double") / lit(n.toDouble)

  /** all ordered pairs (a<b) of a sorted id array, as a column expression. */
  private def pairCombos(ids: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    flatten(transform(ids, (a, i) =>
      transform(slice(ids, i + 2, size(ids)), b => struct(a.as("_1"), b.as("_2")))))

  // --- SimHash -----------------------------------------------------------

  /** 64-bit SimHash over token hashes (Charikar 2002). */
  def simhash64(text: String): Long = {
    val toks = tokenize(text)
    val acc = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h = fnv64(toks(i))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def simhashes(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // deliberately NOT widened (cf. widen): simhash is one 64-bit fold per
    // token — the extra exchange cost more than the single-task pass
    // (A/B: d03 0.66 -> 0.76 s widened)
    df.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, t) => (id, simhash64(if (t == null) "" else t)) })
      .toDF("id", "simhash")
  }

  /** Near-dup pairs with hamming distance ≤ maxHamming (≤ 3 by default).
    * Pigeonhole banding: 4 × 16-bit chunks — any pair within distance 3
    * agrees on ≥1 chunk, so one hash-aggregate shuffle finds all candidates.
    */
  def simhashCandidates(hashes: DataFrame, maxHamming: Int = 3,
                        maxBucketSize: Int = 256): DataFrame = {
    val spark = hashes.sparkSession
    import spark.implicits._
    val banded = hashes.as[(Long, Long)].flatMap { case (id, h) =>
      (0 until 4).iterator.map(c => (c, (h >>> (c * 16)) & 0xFFFFL, id, h))
    }.toDF("chunk", "ckey", "id", "h")

    banded.groupBy("chunk", "ckey")
      .agg(sort_array(collect_list(struct(col("id"), col("h")))).as("members"))
      .where(size(col("members")) > 1 && size(col("members")) <= maxBucketSize)
      .select(explode(pairStructCombos(col("members"))).as("p"))
      .select(col("p._1.id").as("id_a"), col("p._1.h").as("h_a"),
        col("p._2.id").as("id_b"), col("p._2.h").as("h_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("h_a").bitwiseXOR(col("h_b"))))
      .where(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  private def pairStructCombos(ms: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    flatten(transform(ms, (a, i) =>
      transform(slice(ms, i + 2, size(ms)), b => struct(a.as("_1"), b.as("_2")))))

  // --- exact n-gram Jaccard (verification of LSH candidates) -------------

  /** Sorted DISTINCT FNV-64 word-n-gram hashes of one document, as a
    * primitive array — the materialized form every pair-stage kernel
    * intersects against. Never empty (a doc shorter than n shingles as its
    * whole text, so even "" yields one hash).
    */
  def shingleArray(text: String, n: Int): Array[Long] = {
    val toks = tokenize(if (text == null) "" else text)
    val raw =
      if (toks.length < n) Array(fnv64(toks.mkString(" ")))
      else {
        val out = new Array[Long](toks.length - n + 1)
        var i = 0
        while (i + n <= toks.length) {
          // fnv64 of the space-joined shingle, folded straight over the
          // token chars — bit-identical to hashing the built string (FNV is
          // a left-to-right char fold), without the per-shingle
          // StringBuilder + String allocation
          var h = 0xCBF29CE484222325L
          var j = 0
          while (j < n) {
            if (j > 0) { h ^= ' '; h *= 0x100000001B3L }
            val t = toks(i + j)
            var k = 0
            while (k < t.length) { h ^= t.charAt(k); h *= 0x100000001B3L; k += 1 }
            j += 1
          }
          out(i) = h
          i += 1
        }
        out
      }
    java.util.Arrays.sort(raw)
    var w = 0; var r = 0
    while (r < raw.length) {
      if (w == 0 || raw(r) != raw(w - 1)) { raw(w) = raw(r); w += 1 }
      r += 1
    }
    if (w == raw.length) raw else java.util.Arrays.copyOf(raw, w)
  }

  /** id → sorted distinct shingle hashes, ONE narrow tokenize pass over the
    * corpus. Every dedup query materializes this once (persist it) and all
    * downstream stages — MinHash signatures, the sampled-shingle inverted
    * index, exact pair verification — derive from it, instead of
    * re-tokenizing the raw text per use (and, worse, per candidate PAIR: a
    * doc in k pairs previously paid k tokenizations; on a dup-heavy corpus
    * the candidate/doc ratio multiplies that).
    */
  def shingleSets(df: DataFrame, idCol: String, textCol: String,
                  n: Int = 3): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    widen(df.select(col(idCol).cast("long").as("id"), col(textCol).as("text")))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, t) => (id, shingleArray(t, n)) })
      .toDF("id", "sh")
  }

  /** id → (sorted distinct shingle hashes, minhash signature) in ONE
    * widened tokenize pass — the COMBINED scratch for pipelines that need
    * both (candidate banding reads `sig`, exact verification reads `sh`).
    * One persisted frame and one cache materialization instead of the
    * former shingleSets + signaturesFromSets pair; values bit-identical to
    * that composition (the signature mixes over the same distinct shingle
    * hashes — duplicates never change a min).
    */
  def shingleSigSets(df: DataFrame, idCol: String, textCol: String,
                     n: Int = 3, p: MinHashParams = MinHashParams()): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    widen(df.select(col(idCol).cast("long").as("id"), col(textCol).as("text")))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, t) =>
        val sh = shingleArray(t, n)
        val sig = Array.fill(p.numHashes)(Long.MaxValue)
        var i = 0
        while (i < sh.length) { mixInto(sig, sh(i), p); i += 1 }
        (id, sh, sig)
      })
      .toDF("id", "sh", "sig")
  }

  /** Candidate pairs est-filtered AND exact-verified in one pair pass
    * against the combined `(id, sh, sig)` scratch ([[shingleSigSets]]):
    * returns `(id_a, id_b, jaccard)` for pairs whose slot-equality estimate
    * clears `minEstJaccard`. Bit-identical to the former two-stage
    * `minhashCandidates(...).select(ids)` → `ngramJaccardSets(...)`
    * composition — same estimator arithmetic (equal-slot count / numHashes
    * in double), same sorted-array intersection — but each scratch side is
    * joined ONCE instead of once for signatures and once for shingles
    * (two broadcast builds and a pair-cardinality pass saved per query).
    */
  def jaccardVerify(pairs: DataFrame, scratch: DataFrame,
                    p: MinHashParams = MinHashParams(),
                    minEstJaccard: Double = 0.5): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val sa = scratch.select(col("id").as("id_a"), col("sh").as("sh_a"), col("sig").as("sig_a"))
    val sb = scratch.select(col("id").as("id_b"), col("sh").as("sh_b"), col("sig").as("sig_b"))
    pairs.select("id_a", "id_b").join(sa, "id_a").join(sb, "id_b")
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"),
        col("sig_a"), col("sig_b"))
      .as[(Long, Long, Array[Long], Array[Long], Array[Long], Array[Long])]
      .mapPartitions(_.flatMap { case (a, b, shA, shB, sigA, sigB) =>
        var eq = 0
        var k = 0
        while (k < p.numHashes) { if (sigA(k) == sigB(k)) eq += 1; k += 1 }
        if (eq.toDouble / p.numHashes >= minEstJaccard) {
          val inter = intersectSize(shA, shB)
          Some((a, b, inter.toDouble / (shA.length + shB.length - inter)))
        } else None
      })
      .toDF("id_a", "id_b", "jaccard")
  }

  /** The containment pipeline's candidate + verify stage, fused against
    * the combined `(id, sh, sig)` scratch: banding candidates ∪
    * sampled-shingle candidates, the minhash-estimate filter applied ONLY
    * to pairs whose sole origin is banding (a sampled-index pair reaches
    * exact verification regardless — that is the small-in-large class the
    * estimate would wrongly drop), exact containment both directions in
    * the same pair pass. Produces exactly the pair set of
    * `minhashCandidates(est ≥ τ) ∪ sampledShingleCandidates` followed by
    * `ngramContainmentSets` — same estimator arithmetic, same sorted-array
    * intersection — with each scratch side joined once instead of twice.
    */
  def containmentVerified(scratch: DataFrame,
                          p: MinHashParams = MinHashParams(),
                          minEstJaccard: Double = 0.5,
                          sampleMod: Int = 8,
                          maxBucketSize: Int = 64): DataFrame = {
    val spark = scratch.sparkSession
    import spark.implicits._
    val cand = bandedPairs(scratch.select("id", "sig"), p, maxBucketSize)
      .withColumn("sampled", lit(false))
      .unionAll(sampledShingleCandidatesFromSets(scratch.select("id", "sh"),
          sampleMod, maxBucketSize, distinctPairs = false)
        .withColumn("sampled", lit(true)))
      .groupBy("id_a", "id_b").agg(max(col("sampled")).as("sampled"))
    val sa = scratch.select(col("id").as("id_a"), col("sh").as("sh_a"), col("sig").as("sig_a"))
    val sb = scratch.select(col("id").as("id_b"), col("sh").as("sh_b"), col("sig").as("sig_b"))
    cand.join(sa, "id_a").join(sb, "id_b")
      .select(col("id_a"), col("id_b"), col("sampled"), col("sh_a"), col("sh_b"),
        col("sig_a"), col("sig_b"))
      .as[(Long, Long, Boolean, Array[Long], Array[Long], Array[Long], Array[Long])]
      .mapPartitions(_.flatMap { case (a, b, sampled, shA, shB, sigA, sigB) =>
        val pass = sampled || {
          var eq = 0
          var k = 0
          while (k < p.numHashes) { if (sigA(k) == sigB(k)) eq += 1; k += 1 }
          eq.toDouble / p.numHashes >= minEstJaccard
        }
        if (pass) {
          val inter = intersectSize(shA, shB)
          Some((a, b,
            if (shA.isEmpty) 0.0 else inter.toDouble / shA.length,
            if (shB.isEmpty) 0.0 else inter.toDouble / shB.length))
        } else None
      })
      .toDF("id_a", "id_b", "cont_a_in_b", "cont_b_in_a")
  }

  /** |a ∩ b| of two sorted distinct arrays — two-pointer, zero allocation. */
  def intersectSize(a: Array[Long], b: Array[Long]): Int = {
    var i = 0; var j = 0; var n = 0
    while (i < a.length && j < b.length) {
      if (a(i) < b(j)) i += 1
      else if (a(i) > b(j)) j += 1
      else { n += 1; i += 1; j += 1 }
    }
    n
  }

  /** Exact Jaccard for candidate pairs against MATERIALIZED shingle sets
    * (`(id, sh)` from [[shingleSets]]): two joins at pair cardinality, then
    * a sorted-array intersection per pair — no text recompute anywhere.
    */
  def ngramJaccardSets(pairs: DataFrame, shingles: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val sa = shingles.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val sb = shingles.select(col("id").as("id_b"), col("sh").as("sh_b"))
    pairs.join(sa, "id_a").join(sb, "id_b")
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .as[(Long, Long, Array[Long], Array[Long])]
      .mapPartitions(_.map { case (a, b, s1, s2) =>
        val inter = intersectSize(s1, s2)
        (a, b, inter.toDouble / (s1.length + s2.length - inter))
      })
      .toDF("id_a", "id_b", "jaccard")
  }

  /** Exact Jaccard joined back to raw texts (compat path; the shingle sets
    * are built inline — prefer [[shingleSets]] + [[ngramJaccardSets]] when
    * several stages share them).
    */
  def ngramJaccard(pairs: DataFrame, docs: DataFrame, idCol: String, textCol: String,
                   n: Int = 3): DataFrame =
    ngramJaccardSets(pairs, shingleSets(docs, idCol, textCol, n))

  def shingleSet(text: String, n: Int): Set[Long] =
    shingleArray(text, n).toSet

  def jaccard(a: Set[Long], b: Set[Long]): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    val inter = a.intersect(b).size
    inter.toDouble / (a.size + b.size - inter)
  }

  /** Candidate pairs for CONTAINMENT-style matching: documents sharing at
    * least one SAMPLED shingle. Sampling (`hash % sampleMod == 0`) is a
    * pure function of the shingle, so every sampled shingle of a contained
    * document is sampled in its container too — recall for A⊆B is
    * 1-(1-1/mod)^|sh(A)| regardless of |sh(B)|, where symmetric MinHash
    * banding (recall ~ J^rows per band) structurally misses small-in-large
    * pairs whose Jaccard is tiny. One inverted-index shuffle at
    * sampled-shingle cardinality; degenerate buckets (boilerplate shingles
    * shared by everything) are clamped and dropped, not silently kept.
    */
  def sampledShingleCandidates(docs: DataFrame, idCol: String, textCol: String,
                               n: Int = 3, sampleMod: Int = 8,
                               maxBucketSize: Int = 64): DataFrame =
    sampledShingleCandidatesFromSets(shingleSets(docs, idCol, textCol, n),
      sampleMod, maxBucketSize)

  /** Same inverted index, derived from MATERIALIZED shingle sets — the
    * postings come from the one tokenize pass every other stage shares.
    *
    * `distinctPairs = false` skips the final per-source dedup exchange for
    * callers that union these candidates with another source and distinct
    * the UNION anyway (the d06 shape) — same result set, one less shuffle.
    */
  def sampledShingleCandidatesFromSets(shingles: DataFrame, sampleMod: Int = 8,
                                       maxBucketSize: Int = 64,
                                       distinctPairs: Boolean = true): DataFrame = {
    val spark = shingles.sparkSession
    import spark.implicits._
    val posted = shingles.select(col("id"), col("sh")).as[(Long, Array[Long])]
      .flatMap { case (id, sh) =>
        sh.iterator
          .filter(h => java.lang.Long.remainderUnsigned(h, sampleMod) == 0L)
          .map(h => (h, id))
      }
      .toDF("h", "id")
    posted.groupBy("h")
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .where(size(col("ids")) > 1 && size(col("ids")) <= maxBucketSize)
      .select(explode(pairCombos(col("ids"))).as("pair"))
      .select(col("pair._1").as("id_a"), col("pair._2").as("id_b"))
      .where(col("id_a") =!= col("id_b")) // a doc posts each shingle once, but be explicit
      .transform(d => if (distinctPairs) d.distinct() else d)
  }

  /** ASYMMETRIC near-dup: containment(A⊆B) = |sh(A) ∩ sh(B)| / |sh(A)|.
    * Catches a document embedded inside a larger one — the quote/mirror/
    * boilerplate-wrapper case that symmetric Jaccard dilutes below any
    * threshold. Same pair-cardinality join shape as [[ngramJaccard]];
    * returns both directions per pair.
    */
  def ngramContainment(pairs: DataFrame, docs: DataFrame, idCol: String,
                       textCol: String, n: Int = 3): DataFrame =
    ngramContainmentSets(pairs, shingleSets(docs, idCol, textCol, n))

  /** Containment against MATERIALIZED shingle sets — sorted-array
    * intersection per pair, no per-pair text recompute.
    */
  def ngramContainmentSets(pairs: DataFrame, shingles: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val sa = shingles.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val sb = shingles.select(col("id").as("id_b"), col("sh").as("sh_b"))
    pairs.join(sa, "id_a").join(sb, "id_b")
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .as[(Long, Long, Array[Long], Array[Long])]
      .mapPartitions(_.map { case (a, b, s1, s2) =>
        val inter = intersectSize(s1, s2)
        (a, b,
          if (s1.isEmpty) 0.0 else inter.toDouble / s1.length,
          if (s2.isEmpty) 0.0 else inter.toDouble / s2.length)
      })
      .toDF("id_a", "id_b", "cont_a_in_b", "cont_b_in_a")
  }

  // --- cluster assignment ------------------------------------------------

  /** Duplicate-cluster assignment: connected components over verified
    * candidate pairs, so each near-dup group gets one canonical id (the
    * minimum member id) and a pipeline can `keep only id == cluster`.
    *
    * Algorithm: iterative min-label propagation. Every node starts labeled
    * with itself; each round takes the min of its own and its neighbors'
    * labels; fixpoint in O(component diameter) rounds. Near-dup components
    * are small and dense (every member pairs with most others), so
    * diameters are tiny; `maxIter` is a safety bound, not a tuning knob.
    *
    * Scale shape: each round is one shuffle (edge⋈label groupBy) at EDGE
    * cardinality — pairs, not corpus. Lineage is truncated every round
    * (`localCheckpoint`), otherwise the iterated plan grows exponentially
    * and the driver, not the data, becomes the bottleneck. The convergence
    * check rides the same action that materializes the checkpoint.
    *
    * Durability caveat: `localCheckpoint` stores blocks on executors, so an
    * executor LOSS mid-computation fails the JOB (no lineage to recompute
    * from) — the job is then re-run from its (deterministic) inputs. That is
    * the right trade for an iterative batch stage: reliable `checkpoint` to
    * DFS would pay a distributed write per round to survive a failure mode
    * whose recovery (re-run) costs the same as the handful of rounds it
    * protects. Callers needing exactly-once downstream should gate on job
    * success (the Checkpoint manifest pattern), not on partial cluster state.
    *
    * Returns (id, cluster) for every id that appears in `pairs`; singleton
    * docs never enter a pair, so callers union them back with
    * cluster = id if a total assignment is needed.
    */
  def clusters(pairs: DataFrame, maxIter: Int = 12): DataFrame = {
    val spark = pairs.sparkSession
    // Identical per-round label math to the textbook propagate loop, with
    // the fixed overhead stripped:
    //  - no edge distinct / node-set distinct / separate labels init — the
    //    symmetric union already surfaces every node as a `src`, duplicate
    //    edges cannot change a min, and round 1 against identity labels
    //    needs no join at all (each node's first label IS min(src, dst));
    //  - later rounds synthesize the self contribution by unioning the
    //    labels frame into the joined edge stream, so one join + one
    //    groupBy per round delivers both the neighbor minimum and the
    //    node's own (old) label — no second join back to labels, no
    //    persisted self-loop edge set.
    val edges = pairs.select(col("id_a").cast("long").as("src"), col("id_b").cast("long").as("dst"))
      .unionAll(pairs.select(col("id_b").cast("long").as("src"), col("id_a").cast("long").as("dst")))
      .persist()
    var labels = edges.groupBy(col("src").as("id"))
      .agg(least(min(col("dst")), min(col("src"))).as("label"))
      .localCheckpoint() // truncate lineage; also materializes for the count
    var changed = labels.where(col("label") < col("id")).count()
    var iter = 1
    while (changed > 0 && iter < maxIter) {
      val next = edges
        .join(labels.withColumnRenamed("id", "dst"), "dst")
        .select(col("src"), col("label"), lit(false).as("self"))
        .unionAll(labels.select(col("id").as("src"), col("label"), lit(true).as("self")))
        .groupBy(col("src").as("id"))
        .agg(min("label").as("label"),
          min(when(col("self"), col("label"))).as("old"))
        .localCheckpoint()
      changed = next.where(col("label") < col("old")).count()
      labels = next.select("id", "label")
      iter += 1
    }
    if (changed > 0)
      // truncation is the SAFE direction (a chain longer than maxIter hops
      // splits into several clusters = under-dedup, never over-merge), but
      // it must not be silent: d05's exact-transitive-closure oracle would
      // otherwise disagree with no hint why
      System.err.println(
        s"[graft] Dedup.clusters: label propagation NOT converged after " +
          s"$maxIter iterations ($changed labels still shrinking); " +
          s"components with diameter > $maxIter are split — raise maxIter")
    edges.unpersist()
    labels.withColumnRenamed("label", "cluster")
  }
}
