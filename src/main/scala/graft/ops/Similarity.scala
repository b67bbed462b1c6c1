package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`ARRAY<FLOAT>`).
  *
  * Baseline: brute-force cosine top-k as pure Catalyst higher-order
  * expressions (`zip_with` dot product + `aggregate` fold — codegen-friendly,
  * no UDF). Scale path: IVF — deterministic coarse centroids, one-pass
  * assignment, probe only the query's nearest `nprobe` lists (reads
  * `nprobe/C` of the corpus instead of all of it; at 100 TB the lists are
  * the partition key, so a probe is a partition-pruned scan, not a shuffle).
  *
  * Embedding near-dup (training-data dedup by semantics): cosine ≥ τ via
  * random-hyperplane LSH (deterministic seeds) then exact verification at
  * candidate cardinality.
  */
object Similarity {

  /** dot(a, b) in double precision (float arrays upcast element-wise). */
  def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))

  /** Zero-norm guard: a zero (padding/failed) embedding must rank LAST,
    * not first — unguarded 0/0 is NaN, which Spark orders above every
    * double, so one all-zero vector would top every top-k and pass
    * `cos >= tau` gates. Defined as 0.0 (orthogonal); the DuckDB oracles
    * carry the same coalesce/nullif guard. NULL embeddings stay NULL
    * (sorted last under ORDER BY cos DESC) — the guard must not fabricate
    * a 0.0 score for a missing vector.
    */
  def cosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    coalesce(dot(a, b) / nullif(norm(a) * norm(b), lit(0.0)),
      when(a.isNotNull && b.isNotNull, lit(0.0)))

  // --- int8 symmetric quantization (vector-store memory scale path) -------
  // q_i = round(x_i * 127 / max|x|); reconstruct x̂_i = q_i * max|x| / 127.
  // 4× memory cut per vector at 100 TB ANN scale; all math in double on
  // purpose — the DuckDB oracle re-derives it with the same double ops.

  /** max|x| of the embedding (the symmetric quantization scale), double. */
  def quantScale(a: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    aggregate(a, lit(0.0), (acc, x) => greatest(acc, abs(x.cast("double"))))

  /** Sum of the int8 codes (quantized mass; exercises the quantizer). */
  def quantCodeSum(a: org.apache.spark.sql.Column,
                   scale: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(scale === 0.0, lit(0L)).otherwise(
      aggregate(a, lit(0L),
        (acc, x) => acc + round(x.cast("double") * 127.0 / scale).cast("long")))

  /** Max reconstruction error max|x - q*scale/127| of the quantized vector. */
  def quantMaxErr(a: org.apache.spark.sql.Column,
                  scale: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(scale === 0.0, lit(0.0)).otherwise(
      aggregate(a, lit(0.0), (acc, x) => {
        val xd = x.cast("double")
        greatest(acc, abs(xd - round(xd * 127.0 / scale) * scale / 127.0))
      }))

  /** Brute-force cosine top-k against one query vector (the oracle baseline).
    * One scan, one narrow projection, a k-row sort — no shuffle of vectors.
    */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String,
                     query: Array[Double], k: Int): DataFrame = {
    val q = typedLit(query)
    emb.select(col(idCol), cosine(col(vecCol), q).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  // --- IVF ---------------------------------------------------------------

  final case class IvfIndex(centroids: Array[(Int, Array[Double])], assigned: DataFrame)

  /** Deterministic coarse quantizer: centroids are a uniform hash-ordered
    * sample — `ORDER BY xxhash64(id), id LIMIT C` compiles to
    * TakeOrderedAndProject (per-partition top-C, driver merge): ONE pass,
    * no `count()` prepass, no dense-id assumption (works with sha2-derived
    * ids). Only the C centroid vectors ever reach the driver. Assignment is
    * one mapPartitions pass with the centroid matrix on the closure
    * (broadcast-sized: C × dim doubles). k-means would give tighter lists;
    * determinism and zero iterations matter more here — centroid quality
    * only affects recall, which is gated in SimilaritySpec.
    */
  def buildIvf(emb: DataFrame, idCol: String, vecCol: String, numLists: Int): IvfIndex = {
    val spark = emb.sparkSession
    import spark.implicits._
    // deliberately NOT widened (cf. Dedup.widen): the assignment kernel is
    // numLists dot products per row — cheap enough that the extra exchange
    // costs more than the single-task pass at small SF (A/B-measured)
    val typed = emb.select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("vec"))
      .as[(Long, Array[Double])]

    val centroids = typed
      .orderBy(xxhash64(col("id")), col("id"))
      .limit(numLists)
      .collect()
      .sortBy(_._1).zipWithIndex
      .map { case ((_, v), ci) => (ci, normalize(v)) }

    val assigned = typed.mapPartitions { it =>
      it.map { case (id, v) =>
        (id, v, nearestCentroid(normalize(v), centroids))
      }
    }.toDF("id", "vec", "list_id")
    IvfIndex(centroids, assigned)
  }

  /** Persist the index with `list_id` as the PHYSICAL partition key: a
    * subsequent probe over the loaded index is a partition-pruned scan
    * reading `nprobe/C` of the corpus — no shuffle, no full scan. This is
    * the 100 TB layout; the in-memory `IvfIndex` from [[buildIvf]] is the
    * build-side intermediate.
    */
  def writeIvf(index: IvfIndex, path: String): Unit = {
    graft.io.PathGuard.checkWritable(path)
    val spark = index.assigned.sparkSession
    import spark.implicits._
    // cluster rows by list BEFORE the partitioned write: without it every
    // input partition opens a writer per list it touches (P×C small files +
    // their commit/rename round trips — at sf0.1/local[32] several hundred
    // files for 16 lists); repartition(list_id) makes it one file per list,
    // the layout a 100 TB probe wants anyway (guide §6 output sizing /
    // Iceberg hash distribution-mode analogue)
    index.assigned.repartition(col("list_id"))
      .write.mode("overwrite").partitionBy("list_id")
      .parquet(s"$path/assigned")
    index.centroids.toSeq.toDF("list_id", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
  }

  def loadIvf(spark: SparkSession, path: String): IvfIndex = {
    import spark.implicits._
    val centroids = spark.read.parquet(s"$path/centroids")
      .as[(Int, Array[Double])].collect().sortBy(_._1)
    IvfIndex(centroids,
      spark.read.parquet(s"$path/assigned").select("id", "vec", "list_id"))
  }

  /** Probe `nprobe` nearest lists; exact cosine inside them. Returns top-k. */
  def ivfTopK(index: IvfIndex, query: Array[Double], k: Int, nprobe: Int): DataFrame = {
    val qn = normalize(query)
    val probeLists = index.centroids
      .map { case (ci, c) => (ci, dotLocal(qn, c)) }
      .sortBy { case (ci, d) => (-d, ci) }
      .take(nprobe).map(_._1).toSeq
    val q = typedLit(query)
    index.assigned
      .where(col("list_id").isin(probeLists: _*))
      .select(col("id"), cosine(col("vec"), q).as("cos"))
      .orderBy(col("cos").desc, col("id"))
      .limit(k)
  }

  // --- random-hyperplane LSH for cosine near-dup --------------------------

  /** Sign-bit signature under `bits` deterministic pseudo-random hyperplanes.
    * Hyperplane components derive from splitmix64(bit, dim) — no stored
    * model, identical on every executor.
    */
  def rhpSignature(v: Array[Double], bits: Int): Long = {
    var sig = 0L
    var b = 0
    while (b < bits) {
      var s = 0.0
      var i = 0
      while (i < v.length) {
        // deterministic N(0,1)-ish component via two uniform hashes
        val h = Dedup.splitmix64(b.toLong * 131071L + i)
        val u = (h >>> 11).toDouble / (1L << 53).toDouble // [0,1)
        s += v(i) * (u - 0.5)
        i += 1
      }
      if (s > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** Pairs with cosine ≥ minCosine: 16-bit-chunk LSH candidates → exact
    * verification (same pigeonhole shape as Dedup.simhashCandidates).
    */
  def cosineNearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
                         minCosine: Double = 0.9, maxBucketSize: Int = 256): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    // deliberately NOT widened (cf. Dedup.widen): the 64-plane signature is
    // ~64·dim flops per row — the extra exchange cost more than it saved
    // (A/B: s04 0.67 -> 0.86 s widened)
    val sigs = emb.select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])]
      .mapPartitions(_.map { case (id, v) => (id, v, rhpSignature(normalize(v), 64)) })
      .toDF("id", "vec", "sig")

    val banded = sigs.select(col("id"), col("sig"), explode(sequence(lit(0), lit(3))).as("chunk"))
      .withColumn("ckey", expr("(sig >> (chunk * 16)) & 65535"))

    val pairs = banded.groupBy("chunk", "ckey")
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .where(size(col("ids")) > 1 && size(col("ids")) <= maxBucketSize)
      .select(explode(flatten(transform(col("ids"), (a, i) =>
        transform(slice(col("ids"), i + 2, size(col("ids"))),
          b => struct(a.as("_1"), b.as("_2")))))).as("p"))
      .select(col("p._1").as("id_a"), col("p._2").as("id_b"))
      .distinct()

    val va = sigs.select(col("id").as("id_a"), col("vec").as("vec_a"))
    val vb = sigs.select(col("id").as("id_b"), col("vec").as("vec_b"))
    pairs.join(va, "id_a").join(vb, "id_b")
      .select(col("id_a"), col("id_b"), cosine(col("vec_a"), col("vec_b")).as("cos"))
      .where(col("cos") >= minCosine)
  }

  // --- local math ---------------------------------------------------------

  def normalize(v: Array[Double]): Array[Double] = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    val n = math.sqrt(s)
    if (n == 0.0) v else v.map(_ / n)
  }

  def dotLocal(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  def nearestCentroid(vNorm: Array[Double], centroids: Array[(Int, Array[Double])]): Int = {
    var best = -1; var bestDot = Double.NegativeInfinity
    var i = 0
    while (i < centroids.length) {
      val d = dotLocal(vNorm, centroids(i)._2)
      if (d > bestDot) { bestDot = d; best = centroids(i)._1 }
      i += 1
    }
    best
  }
}
