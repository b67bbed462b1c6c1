package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {

  private val spark = graft.TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(42)
  private val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
    "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron", "pi",
    "rho", "sigma", "tau", "upsilon")

  private def randomDoc(words: Int): String =
    Vector.fill(words)(vocab(rnd.nextInt(vocab.size))).mkString(" ")

  /** mutate a fraction of words → a near-duplicate */
  private def mutate(doc: String, fraction: Double): String = {
    val w = doc.split(" ")
    val n = math.max(1, (w.length * fraction).toInt)
    val idx = rnd.shuffle(w.indices.toList).take(n)
    idx.foreach(i => w(i) = vocab(rnd.nextInt(vocab.size)))
    w.mkString(" ")
  }

  test("exactGroups finds exact duplicates only") {
    val docs = Seq(
      (1L, "identical content here"), (2L, "identical content here"),
      (3L, "different content")).toDF("doc_id", "text")
    val g = Dedup.exactGroups(docs, "doc_id", "text").collect()
    assert(g.length == 1)
    assert(g(0).getAs[scala.collection.Seq[Long]]("ids").toSeq == Seq(1L, 2L))
  }

  test("minhash estimate tracks exact jaccard within 0.15") {
    (1 to 8).foreach { _ =>
      val a = randomDoc(120)
      val b = mutate(a, 0.15)
      val p = Dedup.MinHashParams()
      val sa = Dedup.minhashSignature(a, p)
      val sb = Dedup.minhashSignature(b, p)
      val est = sa.zip(sb).count { case (x, y) => x == y }.toDouble / p.numHashes
      val exact = Dedup.jaccard(Dedup.shingleSet(a, 3), Dedup.shingleSet(b, 3))
      assert(math.abs(est - exact) < 0.15, s"est=$est exact=$exact")
    }
  }

  test("minhash LSH finds near-duplicate pairs, skips unrelated docs") {
    val base = randomDoc(150)
    val near = mutate(base, 0.05)
    val docs = ((1L, base) +: (2L, near) +:
      (3L to 40L).map(i => (i, randomDoc(150)))).toDF("doc_id", "text")
    val sigs = Dedup.signatures(docs, "doc_id", "text")
    val pairs = Dedup.minhashCandidates(sigs, minEstJaccard = 0.5).collect()
    val found = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found.contains((1L, 2L)), s"pairs=${found.mkString(",")}")
    // unrelated random docs of 150 words don't reach est 0.5
    assert(found.forall { case (a, b) => (a, b) == ((1L, 2L)) })
  }

  test("ngramJaccard verifies LSH candidates with exact similarity") {
    val base = randomDoc(150)
    val near = mutate(base, 0.05)
    val docs = Seq((1L, base), (2L, near), (3L, randomDoc(150))).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val ver = Dedup.ngramJaccard(pairs, docs, "doc_id", "text").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(ver((1L, 2L)) > 0.6)
    assert(ver((1L, 3L)) < 0.2)
  }

  test("minhashCandidatesAcross: finds cross-set pairs only, never within-set") {
    val a = randomDoc(150)
    val b = randomDoc(150)
    // new set: a + near-dup of b; old set: b + near-dup of a + noise
    val newDocs = Seq((10L, a), (11L, mutate(b, 0.05))).toDF("doc_id", "text")
    val oldDocs = Seq((20L, b), (21L, mutate(a, 0.05)), (22L, randomDoc(150)))
      .toDF("doc_id", "text")
    val cand = Dedup.minhashCandidatesAcross(
        Dedup.signatures(newDocs, "doc_id", "text"),
        Dedup.signatures(oldDocs, "doc_id", "text"), minEstJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand.contains((10L, 21L)), s"missed a≈a': $cand")
    assert(cand.contains((11L, 20L)), s"missed b'≈b: $cand")
    // every pair is (new, old) — ids never pair within one side
    assert(cand.forall { case (n, o) => n < 20 && o >= 20 }, s"within-set pair: $cand")
  }

  test("sampledShingleCandidates surfaces small-in-large pairs MinHash misses") {
    val small = randomDoc(40)
    val big = small + " " + randomDoc(400) // jaccard ~ 0.09: invisible to banding
    val docs = Seq((1L, small), (2L, big), (3L, randomDoc(40))).toDF("doc_id", "text")
    val cand = Dedup.sampledShingleCandidates(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand.contains((1L, 2L)), s"contained pair missed: $cand")
    // end-to-end: the containment operator confirms it at 1.0
    val c = Dedup.ngramContainment(
        Dedup.sampledShingleCandidates(docs, "doc_id", "text"),
        docs, "doc_id", "text")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(c((1L, 2L)) == 1.0)
  }

  test("ngramContainment: doc-inside-doc scores 1.0 where jaccard dilutes") {
    val small = randomDoc(40)
    val big = small + " " + randomDoc(200) // small is a prefix of big
    val docs = Seq((1L, small), (2L, big), (3L, randomDoc(40))).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val c = Dedup.ngramContainment(pairs, docs, "doc_id", "text").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getDouble(2), r.getDouble(3)))).toMap
    val (aInB, bInA) = c((1L, 2L))
    assert(aInB == 1.0, s"prefix containment must be exact 1.0, got $aInB")
    assert(bInA < 0.5) // asymmetry: big is NOT inside small
    // symmetric jaccard would have missed this pair at any usual threshold
    val j = Dedup.ngramJaccard(pairs, docs, "doc_id", "text").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(j((1L, 2L)) < 0.5)
  }

  test("simhash: identical texts → distance 0; small edit → small distance") {
    val a = randomDoc(200)
    assert(Dedup.simhash64(a) == Dedup.simhash64(a))
    val b = mutate(a, 0.03)
    val d = java.lang.Long.bitCount(Dedup.simhash64(a) ^ Dedup.simhash64(b))
    assert(d <= 12, s"hamming=$d")
    val c = randomDoc(200)
    val far = java.lang.Long.bitCount(Dedup.simhash64(a) ^ Dedup.simhash64(c))
    assert(far > d)
  }

  test("simhash LSH candidates find near-identical docs") {
    val base = randomDoc(300)
    val near = mutate(base, 0.01)
    val docs = ((1L, base) +: (2L, near) +:
      (3L to 30L).map(i => (i, randomDoc(300)))).toDF("doc_id", "text")
    val hashes = Dedup.simhashes(docs, "doc_id", "text")
    val pairs = Dedup.simhashCandidates(hashes, maxHamming = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"pairs=$pairs")
  }

  test("shingleArray: sorted, distinct, same set as shingleSet") {
    val docs = Seq(randomDoc(120), "a a a a a", "", "one two", randomDoc(5))
    docs.foreach { d =>
      val arr = Dedup.shingleArray(d, 3)
      assert(arr.nonEmpty)
      assert(arr.toSeq == arr.toSeq.sorted)
      assert(arr.length == arr.toSet.size)
      assert(arr.toSet == Dedup.shingleSet(d, 3))
    }
  }

  test("signaturesFromSets is bit-identical to signatures") {
    val docs = ((1L to 30L).map(i => (i, randomDoc(80))) :+ (31L, "") :+ (32L, "one two"))
      .toDF("doc_id", "text")
    val viaText = Dedup.signatures(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toVector)).sortBy(_._1)
    val viaSets = Dedup.signaturesFromSets(Dedup.shingleSets(docs, "doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toVector)).sortBy(_._1)
    assert(viaText.sameElements(viaSets))
  }

  test("intersectSize matches Set.intersect on random sorted arrays") {
    (1 to 20).foreach { _ =>
      val a = Vector.fill(rnd.nextInt(50))(rnd.nextInt(40).toLong).distinct.sorted.toArray
      val b = Vector.fill(rnd.nextInt(50))(rnd.nextInt(40).toLong).distinct.sorted.toArray
      assert(Dedup.intersectSize(a, b) == a.toSet.intersect(b.toSet).size)
    }
  }

  test("set-based jaccard/containment match the inline-tokenize path") {
    val base = randomDoc(100)
    val docs = Seq((1L, base), (2L, mutate(base, 0.1)), (3L, base + " " + randomDoc(300)),
      (4L, randomDoc(100))).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L)).toDF("id_a", "id_b")
    val sh = Dedup.shingleSets(docs, "doc_id", "text")
    val j1 = Dedup.ngramJaccard(pairs, docs, "doc_id", "text")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val j2 = Dedup.ngramJaccardSets(pairs, sh)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(j1 == j2)
    val c1 = Dedup.ngramContainment(pairs, docs, "doc_id", "text")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getDouble(2), r.getDouble(3)))).toMap
    val c2 = Dedup.ngramContainmentSets(pairs, sh)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getDouble(2), r.getDouble(3)))).toMap
    assert(c1 == c2)
    val s1 = Dedup.sampledShingleCandidates(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val s2 = Dedup.sampledShingleCandidatesFromSets(sh)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(s1 == s2)
  }

  test("signatures are deterministic across partitionings") {
    val docs = (1L to 50L).map(i => (i, randomDoc(60))).toDF("doc_id", "text")
    val s1 = Dedup.signatures(docs.repartition(1), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).sortBy(_._1)
    val s8 = Dedup.signatures(docs.repartition(8), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).sortBy(_._1)
    assert(s1.sameElements(s8))
  }

  test("fused jaccardVerify == minhashCandidates -> ngramJaccardSets, bit-exact") {
    // differential gate for the round-6 fusion: the combined (sh, sig)
    // scratch + single pair pass must reproduce the two-stage composition
    // exactly — same candidate set, same estimate filter, same Jaccard
    val base = randomDoc(80)
    val docs = (0L until 40L).map { i =>
      (i, if (i % 4 == 0) mutate(base, 0.05 + (i % 7) * 0.02) else randomDoc(60 + (i % 5).toInt * 10))
    }.toDF("doc_id", "text")
    val sc = Dedup.shingleSigSets(docs, "doc_id", "text").persist()
    val sh = Dedup.shingleSets(docs, "doc_id", "text").persist()
    val sigs = Dedup.signaturesFromSets(sh).persist()
    try {
      for (minEst <- Seq(0.1, 0.3, 0.5)) {
        val fused = Dedup.jaccardVerify(
            Dedup.bandedPairs(sc.select("id", "sig")), sc, minEstJaccard = minEst)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        val legacy = Dedup.ngramJaccardSets(
            Dedup.minhashCandidates(sigs, minEstJaccard = minEst).select("id_a", "id_b"), sh)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        assert(fused == legacy, s"minEst=$minEst fused=$fused legacy=$legacy")
      }
    } finally { sc.unpersist(); sh.unpersist(); sigs.unpersist() }
  }

  test("fused containmentVerified == candidates-union -> ngramContainmentSets") {
    // the d06 shape: est filter gates only banding-origin pairs; a
    // sampled-index pair reaches exact verification regardless
    val container = randomDoc(200)
    val contained = container.split(" ").slice(20, 60).mkString(" ")
    val docs = ((0L until 30L).map(i => (i, randomDoc(50 + (i % 7).toInt * 9))) ++
      Seq((100L, container), (101L, contained))).toDF("doc_id", "text")
    val sc = Dedup.shingleSigSets(docs, "doc_id", "text").persist()
    val sh = Dedup.shingleSets(docs, "doc_id", "text").persist()
    val sigs = Dedup.signaturesFromSets(sh).persist()
    try {
      val fused = Dedup.containmentVerified(sc, minEstJaccard = 0.3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
      val legacyCand = Dedup.minhashCandidates(sigs, minEstJaccard = 0.3)
        .select("id_a", "id_b")
        .unionAll(Dedup.sampledShingleCandidatesFromSets(sh))
        .distinct()
      val legacy = Dedup.ngramContainmentSets(legacyCand, sh)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
      assert(fused == legacy)
      // the planted small-in-large pair must be present with high containment
      assert(fused.exists { case (a, b, cab, cba) =>
        Set(a, b) == Set(100L, 101L) && math.max(cab, cba) >= 0.9
      }, s"planted containment pair missing: $fused")
    } finally { sc.unpersist(); sh.unpersist(); sigs.unpersist() }
  }

  test("shingleSigSets == shingleSets + signaturesFromSets, per id") {
    val docs = (0L until 25L).map(i => (i, randomDoc(30 + (i % 6).toInt * 12)))
      .toDF("doc_id", "text")
    val combined = Dedup.shingleSigSets(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getSeq[Long](1), r.getSeq[Long](2))).toMap
    val sh = Dedup.shingleSets(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val sigs = Dedup.signaturesFromSets(Dedup.shingleSets(docs, "doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(combined.keySet == sh.keySet)
    combined.foreach { case (id, (s, g)) =>
      assert(s == sh(id), s"shingles diverge for $id")
      assert(g == sigs(id), s"signature diverges for $id")
    }
  }

  test("clusters: min-label propagation crosses multi-hop chains") {
    // chain 1-2, 2-3, 3-4 plus isolated pair 10-11: labels must propagate
    // beyond one hop (1 reaches 4 in 3 hops)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("id_a", "id_b")
    val got = Dedup.clusters(pairs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("clusters: end-to-end with minhash candidates on planted groups") {
    val base = randomDoc(60)
    val other = randomDoc(60)
    val docs = Seq(
      (1L, base), (2L, mutate(base, 0.05)), (3L, mutate(base, 0.08)),
      (10L, other), (11L, other),
      (20L, randomDoc(60))).toDF("doc_id", "text")
    val sigs = Dedup.signatures(docs, "doc_id", "text")
    val pairs = Dedup.minhashCandidates(sigs, minEstJaccard = 0.5).select("id_a", "id_b")
    val cl = Dedup.clusters(pairs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cl.getOrElse(2L, -1L) == 1L && cl.getOrElse(3L, -1L) == 1L)
    assert(cl.getOrElse(11L, -1L) == 10L)
    assert(!cl.contains(20L)) // singleton never enters a pair
    // canonical-keep filter: one survivor per cluster
    val survivors = Set(1L, 10L, 20L)
    val kept = docs.select("doc_id").as[Long].collect().toSet
      .filter(id => cl.getOrElse(id, id) == id)
    assert(kept == survivors)
  }
}
