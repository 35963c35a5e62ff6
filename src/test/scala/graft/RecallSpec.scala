package graft

import graft.core.Tables
import graft.dedup.Dedup
import graft.functions.VectorFunctions
import graft.similarity.Ann
import org.apache.spark.sql.functions._

/** Recall gates for the LSH/IVF approximate paths (q51/q52/q54), which
  * have no SQL oracle by nature: each is measured against its exact
  * twin (brute-force top-k / exhaustive cosine pairs) on the sf0.001
  * driver corpus (500 x 64-dim near-random unit vectors — a HARD corpus
  * for LSH, so these bounds are conservative floors, not typical
  * performance). Bounds are documented in README.md; the approximate
  * results are also asserted to be SUBSETS of the exact scores
  * (precision 1.0 — every emitted pair carries an exact-verified score).
  */
class RecallSpec extends SparkSuite {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val e = Tables.load(spark, sfDir, "embeddings")

  private def pairSet(df: org.apache.spark.sql.DataFrame, a: String, b: String) =
    df.select(col(a).cast("long"), col(b).cast("long")).as[(Long, Long)].collect().toSet

  test("q51 LSH ANN recall vs q50 brute force >= 0.60 on the test corpus") {
    val queries = e.where(col("vec_id") < 10)
    val exact = pairSet(Ann.bruteForceTopK(queries, e, "vec_id", "embedding", 5),
      "query_id", "neighbor_id")
    // q51's configuration: 64-bit signature, 16 x 4-bit bands
    val lsh = pairSet(Ann.lshTopK(queries, e, "vec_id", "embedding", 5,
      bits = 64, bandBits = 4), "query_id", "neighbor_id")
    val recall = (exact & lsh).size.toDouble / exact.size
    info(f"q51 LSH recall@5 = $recall%.3f (${(exact & lsh).size}/${exact.size})")
    assert(recall >= 0.60, f"LSH recall regressed: $recall%.3f")
  }

  test("q54 IVF ANN recall vs q50 brute force >= 0.60 on the test corpus") {
    val queries = e.where(col("vec_id") < 10)
    val exact = pairSet(Ann.bruteForceTopK(queries, e, "vec_id", "embedding", 5),
      "query_id", "neighbor_id")
    val ivf = pairSet(Ann.ivfTopK(queries, e, "vec_id", "embedding", 5,
      nCells = 16, nProbe = 4, iters = 2), "query_id", "neighbor_id")
    val recall = (exact & ivf).size.toDouble / exact.size
    info(f"q54 IVF recall@5 (nProbe 4/16) = $recall%.3f (${(exact & ivf).size}/${exact.size})")
    assert(recall >= 0.60, f"IVF recall regressed: $recall%.3f")
  }

  test("q52 embedding near-dup: planted-duplicate recall >= 0.70, precision 1.0") {
    // The raw corpus contains NO true near-duplicates (max cosine ~0.48),
    // so the honest recall contract is against PLANTED duplicates: for
    // the 20 lowest ids, add a lightly perturbed copy (cosine ~0.99) and
    // require the LSH path to recover those pairs at threshold 0.9 —
    // where its exhaustive exact twin finds exactly the planted pairs.
    val base = e.select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    val planted = base.where(col("vec_id") < 20)
      .select((col("vec_id") + 10000L).as("vec_id"),
        zip_with(col("embedding"),
          transform(sequence(lit(0), size(col("embedding")) - 1),
            i => sin((col("vec_id") * 31 + i).cast("double")) * lit(0.05f)),
          (x, d) => (x + d).cast("float")).as("embedding"))
    val corpus = base.unionByName(planted)

    val a = corpus.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = corpus.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    val exact = pairSet(
      a.crossJoin(b).where(col("id_a") < col("id_b"))
        .withColumn("cosine", round(VectorFunctions.cosineSim(col("va"), col("vb")), 6))
        .where(col("cosine") >= 0.9),
      "id_a", "id_b")
    assert(exact.size >= 20, s"planting failed: only ${exact.size} exact pairs >= 0.9")
    val lsh = pairSet(Dedup.embeddingNearDups(corpus, "embedding", "vec_id", threshold = 0.9),
      "id_a", "id_b")
    val recall = (exact & lsh).size.toDouble / exact.size
    info(f"q52 planted near-dup recall = $recall%.3f (${(exact & lsh).size}/${exact.size})")
    assert(recall >= 0.70, f"near-dup recall regressed: $recall%.3f")
    // exact-verify step means every emitted pair is a true pair
    assert((lsh -- exact).isEmpty, s"false positives: ${(lsh -- exact).take(5)}")
  }

  test("q147 lloydCluster separates planted blobs and keeps empty-cluster ids stable") {
    // two far-apart blobs, seeds 0..3 drawn alternately from both:
    // seeds 0 and 2 are IDENTICAL (every even point is exactly 0), so
    // the id tiebreak sends the whole even blob to cluster 0 and
    // cluster 2 empties — it must drop out WITHOUT renumbering the
    // survivors; the odd blob has within-blob variance and may keep
    // both of its seeds, but never mixes with the even blob
    val rows = (0 until 40).map { i =>
      val v = if (i % 2 == 0) 0.0f else 100.0f + (i % 5) * 0.01f
      (i.toLong, Array.fill(4)(v))
    }
    val df = rows.toDF("vec_id", "embedding")
    val got = Ann.lloydCluster(df, "vec_id", "embedding", k = 4, iters = 3)
      .select(col("vec_id").cast("long"), col("cluster").cast("int"))
      .as[(Long, Int)].collect().toMap
    val evenClusters = got.filter(_._1 % 2 == 0).values.toSet
    val oddClusters = got.filter(_._1 % 2 == 1).values.toSet
    assert(evenClusters === Set(0), s"tie must break to the lowest id: $evenClusters")
    assert(oddClusters.subsetOf(Set(1, 3)), s"odd blob leaked: $oddClusters")
    // the emptied duplicate seed is GONE and ids were not reindexed
    assert(!got.values.toSet.contains(2), "empty cluster should drop out")
  }

  test("q148 semanticDedup keeps one representative per tight blob, never pairs zero vectors") {
    // two orthogonal tight blobs (within-blob cosine ~1, cross-blob ~0)
    // plus a zero vector: with tau=0.9 every blob member except the
    // one closest to its centroid is a semantic dup; the zero vector
    // must be flagged kept (n2 > 0 guard), not crash the cosine
    val rows =
      (0 until 8 by 2).map(i => (i.toLong, Array(1.0f, 0.01f * i, 0.0f, 0.0f))) ++
      (1 until 8 by 2).map(i => (i.toLong, Array(0.0f, 0.0f, 1.0f, 0.01f * i))) ++
      Seq((8L, Array(0.0f, 0.0f, 0.0f, 0.0f)))
    val df = rows.toDF("vec_id", "embedding")
    val got = Dedup.semanticDedup(df, "embedding", "vec_id",
        k = 2, iters = 2, tauMicros = 900000L)
      .select(col("vec_id").cast("long"), col("cluster").cast("int"), col("is_dup"))
      .as[(Long, Int, Boolean)].collect()
    assert(got.length === 9)
    val even = got.filter(r => r._1 % 2 == 0 && r._1 < 8)
    val odd = got.filter(r => r._1 % 2 == 1)
    assert(even.map(_._2).toSet.size === 1 && odd.map(_._2).toSet.size === 1,
      s"blobs must not split: $even / $odd")
    assert(even.map(_._2).toSet != odd.map(_._2).toSet, "blobs must not merge")
    // exactly one survivor per blob — the rest are semantic dups
    assert(even.count(!_._3) === 1, s"even blob survivors: ${even.mkString(",")}")
    assert(odd.count(!_._3) === 1, s"odd blob survivors: ${odd.mkString(",")}")
    // the zero vector is kept: cosine to it is undefined, never >= tau
    assert(got.find(_._1 == 8L).exists(!_._3), "zero vector must be kept")
  }

  test("q162/q164 IVFADC recall vs exact L2; rerank never below plain ADC") {
    val queries = e.where(col("vec_id") < 10)
    val qd = queries.select(col("vec_id").as("query_id"),
      transform(col("embedding"), x => x.cast("double")).as("qv"))
    val cd = e.select(col("vec_id").as("neighbor_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val exact = pairSet(
      cd.crossJoin(broadcast(qd))
        .where(col("query_id") =!= col("neighbor_id"))
        .withColumn("d", VectorFunctions.squaredL2Micros(col("qv"), col("v")))
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("query_id")
            .orderBy(col("d").asc, col("neighbor_id").asc)))
        .where(col("rk") <= 5),
      "query_id", "neighbor_id")
    val adc = pairSet(Ann.ivfPqSearchTopK(queries, e, "vec_id", "embedding",
      kc = 8, m = 8, k = 16, iters = 2, nprobe = 4, topK = 5),
      "query_id", "neighbor_id")
    val rr = pairSet(Ann.ivfPqSearchRerank(queries, e, "vec_id", "embedding",
      kc = 8, m = 8, k = 16, iters = 2, nprobe = 4, shortlist = 25, topK = 5),
      "query_id", "neighbor_id")
    val recallAdc = (exact & adc).size.toDouble / exact.size
    val recallRr = (exact & rr).size.toDouble / exact.size
    info(f"q162 ADC recall@5 (nprobe 4/8, m=8 k=16) = $recallAdc%.3f")
    info(f"q164 rerank recall@5 (shortlist 25)      = $recallRr%.3f")
    // On this near-random corpus pairwise distances CONCENTRATE, so
    // code-level ADC ordering is nearly indifferent among the closest
    // neighbors — ADC@5 alone measures 0.26 here. That is the expected
    // regime (ADC is the SHORTLIST stage, which is why q164 exists):
    // the 25-deep shortlist + exact rerank recovers 0.66. Floors are
    // the measured values (the whole pipeline is deterministic).
    assert(recallAdc >= 0.25, f"ADC shortlist recall regressed: $recallAdc%.3f")
    assert(recallRr >= 0.60, f"rerank recall regressed: $recallRr%.3f")
    // re-ranking a superset of the ADC top-k by exact distance can
    // only keep or improve recall against the exact ranking
    assert(recallRr >= recallAdc,
      f"rerank ($recallRr%.3f) below plain ADC ($recallAdc%.3f)")
  }

  test("q189 RRF: consensus wins, both-lists beats one-list, hand-checked scores") {
    def ranks(rows: (Long, Long, Int)*) =
      rows.toSeq.toDF("query_id", "neighbor_id", "rank")
    val sysA = ranks((1L, 100L, 1), (1L, 101L, 2), (1L, 102L, 3))
    val sysB = ranks((1L, 100L, 1), (1L, 103L, 2), (1L, 101L, 3))
    val got = graft.similarity.Fusion.rrf(Seq(sysA, sysB), k0 = 60, topK = 4)
      .orderBy("rank")
      .select("neighbor_id", "rrf").as[(Long, Double)].collect()
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    def c(r: Int) = r6(1.0 / (60.0 + r))
    // 100: rank 1 in both; 101: 2+3; 103/102: single-list
    assert(got.map(_._1).toSeq === Seq(100L, 101L, 103L, 102L))
    assert(got(0)._2 === r6(c(1) + c(1)))
    assert(got(1)._2 === r6(c(2) + c(3)))
    assert(got(2)._2 === r6(c(2)) && got(3)._2 === r6(c(3)))
  }

  test("q185 hammingTopK: planted near-copies at rank 1; random-corpus floor") {
    // planted: the sign pattern of a copy is identical -> hamming 0
    val rnd = new scala.util.Random(43)
    val base = (0L until 30L).map(i =>
      (i, Seq.fill(64)(rnd.nextGaussian().toFloat)))
    val copies = (0L until 10L).map(i => (100L + i, base(i.toInt)._2))
    val all = (base ++ copies).toDF("vec_id", "embedding")
    val got = Ann.hammingTopK(all.where(col("vec_id") < 10), all,
        "vec_id", "embedding", topK = 1)
      .select("query_id", "neighbor_id", "hamming")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    for (i <- 0L until 10L)
      assert(got(i) === ((100L + i, 0)), s"query $i: ${got(i)}")

    // worst-case corpus floor: near-random unit vectors carry little
    // sign signal — 1 bit/dim is the coarsest tier and this bound is
    // deliberately conservative (measured 0.16; random chance ~0.01)
    val queries = e.where(col("vec_id") < 10)
    val exact = pairSet(Ann.bruteForceTopK(queries, e, "vec_id", "embedding", 5),
      "query_id", "neighbor_id")
    val ham = pairSet(Ann.hammingTopK(queries, e, "vec_id", "embedding", 5),
      "query_id", "neighbor_id")
    val recall = exact.intersect(ham).size.toDouble / exact.size
    assert(recall >= 0.10, f"hamming recall floor broken: $recall%.3f")
  }

  test("q182 hardestTriplets recovers planted positives/negatives with signed margins") {
    // anchor 0 at origin-ish: same-label near-copy id 10 (pos), a
    // different-label vector id 20 slightly farther (neg) -> margin > 0.
    // anchor 1: the DIFFERENT-label vector is nearer than any same-label
    // one -> inverted (negative) margin, the mislabeled-or-hard signal.
    def v(x: Float*) = x.toSeq
    val rows = Seq(
      (0L, 0, v(0f, 0f, 0f, 0f)),
      (10L, 0, v(0.1f, 0f, 0f, 0f)), // pos for 0: d^2 = 0.01
      (20L, 1, v(0.3f, 0f, 0f, 0f)), // neg for 0: d^2 = 0.09
      (1L, 2, v(5f, 5f, 5f, 5f)),
      (11L, 2, v(7f, 5f, 5f, 5f)),   // same-label but far: d^2 = 4
      (21L, 3, v(5.1f, 5f, 5f, 5f))) // diff-label near: d^2 = 0.01
      .toDF("vec_id", "label", "embedding")
    val got = Ann.hardestTriplets(rows.where(col("vec_id") < 2), rows,
        "vec_id", "embedding", "label")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(5))).toMap
    assert(got(0L)._1 === 10L && got(0L)._2 === 20L)
    assert(got(0L)._3 > 0L, s"margin should be positive: ${got(0L)}")
    assert(got(1L)._1 === 11L && got(1L)._2 === 21L)
    assert(got(1L)._3 < 0L, s"margin should invert: ${got(1L)}")
  }

  test("q181 adcEval: perfect scores when vectors coincide with codebooks") {
    // 64-dim vectors drawn from exactly 4 prototypes per subspace, so
    // 2-iteration PQ training recovers the prototypes exactly and the
    // ADC distance EQUALS the exact distance -> recall 1, rr 1
    val protos = (0 until 4).map(c => Seq.fill(64)((c + 1).toFloat))
    val docs = (0L until 20L).map(i => (i, protos((i % 4).toInt)))
      .toDF("vec_id", "embedding")
    val out = Ann.adcEval(docs.where(col("vec_id") < 4), docs,
        "vec_id", "embedding", m = 4, k = 4, iters = 2, topK = 3)
      .collect()
    assert(out.length === 4)
    out.foreach { r =>
      assert(r.getAs[Double]("recall") === 1.0, r.toString)
      assert(r.getAs[Double]("rr") === 1.0, r.toString)
    }
  }

  test("q181 adcEval bounds and rr/hit consistency on the driver corpus") {
    val rows = Ann.adcEval(e.where(col("vec_id") < 5), e,
        "vec_id", "embedding", m = 4, k = 4, iters = 2, topK = 5)
      .collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      val (nh, rec, rr) = (r.getAs[Long]("n_hits"),
        r.getAs[Double]("recall"), r.getAs[Double]("rr"))
      assert(nh >= 0 && nh <= 5)
      assert(rec === math.floor(nh / 5.0 * 1e6 + 0.5) / 1e6)
      assert(rr >= 0.0 && rr <= 1.0)
      // rr > 0 requires the true NN among the hits
      if (rr > 0.0) assert(nh >= 1)
    }
  }

  test("ivfPqCosineTopK (q203's searcher) recall vs brute force on the test corpus") {
    // the bounded-probe cosine searcher at q203's exact settings
    // (kc=4, nprobe=2, m=4, shortlist=8): ADC picks the shortlist
    // from the probed half of the cells, the exact cosine re-ranks.
    // Near-random 64-dim vectors are the hard regime (distances
    // concentrate), so the bound is a conservative floor; the planted
    // near-copy regime is gated separately in BitextSpec.
    val queries = e.where(col("vec_id") < 10)
    val exact = pairSet(Ann.bruteForceTopK(queries, e, "vec_id", "embedding", 5),
      "query_id", "neighbor_id")
    val approx = pairSet(Ann.ivfPqCosineTopK(queries, e, "vec_id", "embedding",
      kc = 4, m = 4, k = 4, iters = 2, nprobe = 2, shortlist = 8, topK = 5),
      "query_id", "neighbor_id")
    val recall = (exact & approx).size.toDouble / exact.size
    info(f"ivfPqCosineTopK recall@5 = $recall%.3f (${(exact & approx).size}/${exact.size})")
    // measured 0.18 — the q162 shortlist regime (cosines of random
    // unit vectors concentrate, so an 8-deep ADC shortlist of a
    // half-probed index misses most of an essentially arbitrary
    // exact top-5; planted near-copies rank first regardless, which
    // is BitextSpec's ≥80% gate)
    assert(recall >= 0.10, f"bounded-probe cosine recall regressed: $recall%.3f")
  }

  test("ivfPqCosineTopK recall sweep: monotone in shortlist; nprobe needs shortlist to grow with it") {
    // the operating guidance for picking nprobe/shortlist at scale
    // (README's bounds table documents the measured curve): train the
    // quantizers ONCE (the q203 cached-state serving tier), sweep the
    // two knobs. Monotonicity in `shortlist` is a THEOREM — a deeper
    // ADC shortlist is a superset, and an exact-top-5 member survives
    // any exact-cosine re-rank that includes it — so it is asserted
    // strictly pairwise. `nprobe` at a FIXED shortlist is measurably
    // NOT monotone on this corpus (nprobe 1→2 at shortlist 25 reads
    // 0.46→0.44): newly probed cells contribute ADC-close but
    // cosine-wrong candidates that displace true neighbors from the
    // fixed-depth shortlist. That is the real tuning lesson — the
    // shortlist is the recall bottleneck and the knobs must grow
    // TOGETHER — so the sweep pins (a) shortlist monotonicity exactly,
    // (b) nprobe drift at fixed shortlist within one displaced query
    // hit (0.04 = 2 of the 50 exact pairs), and (c) the measured
    // curve's corners.
    val queries = e.where(col("vec_id") < 10)
    val exact = pairSet(Ann.bruteForceTopK(queries, e, "vec_id", "embedding", 5),
      "query_id", "neighbor_id")
    val state = Ann.ivfPqTrainState(e, "vec_id", "embedding",
      kc = 4, m = 4, k = 4, iters = 2)
    val shortlists = Seq(8, 25, 64)
    val nprobes = Seq(1, 2, 4)
    val recall = (for (sl <- shortlists; np <- nprobes) yield {
      val approx = pairSet(Ann.ivfPqCosineTopKWithState(state, queries, e,
        "vec_id", "embedding", nprobe = np, shortlist = sl, topK = 5),
        "query_id", "neighbor_id")
      (sl, np) -> (exact & approx).size.toDouble / exact.size
    }).toMap
    for (np <- nprobes)
      info(f"nprobe=$np: " + shortlists.map(sl =>
        f"sl=$sl%2d -> ${recall((sl, np))}%.2f").mkString("  "))
    for (np <- nprobes; (a, b) <- shortlists.zip(shortlists.tail))
      assert(recall((a, np)) <= recall((b, np)),
        s"recall fell when shortlist grew $a -> $b at nprobe=$np")
    for (sl <- shortlists; (a, b) <- nprobes.zip(nprobes.tail))
      assert(recall((sl, b)) >= recall((sl, a)) - 0.04,
        s"nprobe $a -> $b at shortlist=$sl lost more than one displaced hit")
    // growing BOTH knobs never loses recall (the actual tuning path),
    // and the deepest corner clears a 3x multiple of the q203 floor
    assert(recall((64, 4)) >= recall((8, 1)))
    assert(recall((64, 4)) >= 0.30)
  }
}
