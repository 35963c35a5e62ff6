package graft

import graft.pipelines.PretrainRelease
import org.apache.spark.sql.functions._

/** Pretraining-release composition (q232): gate-chain semantics on a
  * hand-computed fixture, the copyCap loud-fail, and the persisted
  * two-pass plan shape (gates cached once; only the corpus text plans
  * twice). */
class PretrainReleaseSpec extends SparkSuite {
  import spark.implicits._

  /** 30-token doc body of doc-SPECIFIC tokens — no 5-gram is shared
    * between different heads, so contamination only fires where the
    * fixture plants it. */
  private def body(head: String): String =
    (1 to 30).map(i => s"$head$i").mkString(" ")

  test("releaseDocs applies floor, min-id dedup, 5-gram decontam, and unit-weight copies") {
    // clean set by construction: 4 docs per lang × 2 langs, so the
    // α-temperature weight is exactly √n·2²⁰/⌊√n·2²⁰+0.5⌋ = 1.0 for
    // n=4 (2²¹ is integral) — exactly one copy per doc, no Bernoulli
    val benchText = body("benchhead")
    val docs = Seq(
      (10L, body("a1"), "aa"), (11L, body("a2"), "aa"),
      (12L, body("a3"), "aa"), (13L, body("a4"), "aa"),
      (20L, body("b1"), "bb"), (21L, body("b2"), "bb"),
      (22L, body("b3"), "bb"), (23L, body("b4"), "bb"),
      // duplicate of a1 (differs only in case/whitespace): loses min-id
      (30L, "  " + body("a1").toUpperCase + " ", "aa"),
      // shares 30 consecutive tokens with the bench doc: contaminated
      (31L, benchText, "bb"),
      // under the 30-token floor: quality-rejected
      (32L, "too short", "aa")).toDF("doc_id", "text", "lang")
    val bench = Seq((99L, benchText)).toDF("doc_id", "text")

    val rel = PretrainRelease.releaseDocs(docs, bench,
        minTokens = 30, alphaQuarters = 2, ngram = 5)
      .select("release_id").as[Long].collect().sorted
    assert(rel.toSeq === Seq(10L, 11L, 12L, 13L, 20L, 21L, 22L, 23L)
      .map(_ * 16))
  }

  test("a copy count past copyCap fails the release loudly, never wraps the encoding") {
    // lang 'aa' is 1 doc among 9 → weight ≈ 2.35 → ≥2 copies; with
    // copyCap=1 the checked encoding must raise, not wrap
    val docs = ((1 to 8).map(i => (i.toLong + 10L, body(s"b$i"), "bb")) :+
      (1L, body("rare"), "aa")).toDF("doc_id", "text", "lang")
    val bench = Seq((99L, body("z"))).toDF("doc_id", "text")
    val e = intercept[Exception] {
      // collect(), not count(): count prunes the projection and with
      // it the checked expression — the real consumer (pack) always
      // evaluates release_id
      PretrainRelease.releaseDocs(docs, bench, minTokens = 30,
        alphaQuarters = 2, ngram = 5, copyCap = 1).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("copyCap"),
      s"expected a copyCap raise, got: ${e.getMessage}")
  }

  test("the persisted release pack plans the gates ONCE and the corpus text twice") {
    // replicate releaseShards' persisted scope up to (not including)
    // the write. Since the offsets stage localCheckpoints its
    // (doc_id, cost) pass (round 21), the costs leg is MATERIALIZED at
    // construction — one eager text scan through the cached copy list —
    // and the packed plan keeps exactly one cache ref + one text scan
    // (the ids pass) plus the checkpointed costs as a LogicalRDD:
    // still gates-once / text-twice, with the costs text scan paid
    // once eagerly instead of once per downstream costs consumer
    // (the lazy form re-ran it for maxId, the bucket totals AND the
    // offsets window)
    val d = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val docs = d.where(col("doc_id") % 97 =!= 0)
    val bench = d.where(col("doc_id") % 97 === 0).select("doc_id", "text")
    val copies = PretrainRelease.admittedCopies(docs, bench,
        minTokens = 30, alphaQuarters = 2, ngram = 5)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      copies.count()
      val rel = copies
        .join(docs.select(col("doc_id"), col("text").as("__text")), "doc_id")
        .select((col("doc_id") * 16 + col("copy_no") - 1).as("release_id"),
          col("__text").as("text"))
      val packed = graft.io.TokenShards.packChunks(rel, "release_id", "text",
        vocab = 4096, seqLen = 64, seqsPerShard = 16, nBuckets = 8)
      val lp = packed.queryExecution.optimizedPlan
      val cacheRefs = lp.collect {
        case r if r.getClass.getSimpleName == "InMemoryRelation" => r
      }.size
      val uncachedScans = lp.collect {
        case r if r.getClass.getSimpleName == "LogicalRelation" => r
      }.size
      val checkpointed = lp.collect {
        case r if r.getClass.getSimpleName == "LogicalRDD" => r
      }.size
      assert(cacheRefs === 1,
        s"expected the copy list cached and referenced by the ids pass, got $cacheRefs")
      assert(uncachedScans === 1,
        s"expected only the ids pass's text scan uncached, got $uncachedScans")
      assert(checkpointed === 1,
        s"expected the offsets costs pass checkpointed as one LogicalRDD, got $checkpointed")
    } finally { copies.unpersist(false); () }
  }

  test("releaseDeltaShards appends new files after the shipped drop, re-gating both") {
    val dir = java.nio.file.Files.createTempDirectory("pretrain-delta").toString
    // corpus: 4+4 per lang (unit weights, one copy each); batch: one
    // genuinely new doc, one exact re-delivery of a released doc (must
    // be dropped by the released-fingerprint anti-join), one
    // contaminated doc, one short doc
    val benchText = body("benchhead")
    val corpus = Seq(
      (10L, body("a1"), "aa"), (11L, body("a2"), "aa"),
      (12L, body("a3"), "aa"), (13L, body("a4"), "aa"),
      (20L, body("b1"), "bb"), (21L, body("b2"), "bb"),
      (22L, body("b3"), "bb"), (23L, body("b4"), "bb"))
      .toDF("doc_id", "text", "lang")
    val batch = Seq(
      (50L, body("new1"), "aa"),
      (51L, body("a1"), "aa"),    // re-delivery of released content
      (52L, benchText, "bb"),     // contaminated
      (53L, "too short", "aa"))   // quality-rejected
      .toDF("doc_id", "text", "lang")
    val bench = Seq((99L, benchText)).toDF("doc_id", "text")

    val stats = graft.pipelines.PretrainRelease.releaseDeltaShards(
      corpus, batch, bench, s"$dir/drop0", s"$dir/drop1",
      minTokens = 30, alphaQuarters = 2, vocab = 4096, seqLen = 8,
      seqsPerShard = 2, ngram = 5, nBuckets = 3)
      .as[(Int, Long, Long, Long, Long)].collect().sortBy(s => (s._1, s._2))

    // drop 0: 8 docs × 31 tokens = 248 → 31 full seqs → 16 shards;
    // drop 1 admits ONLY doc 50 (31 tokens → 3 full seqs → 2 shards)
    val a = stats.filter(_._1 == 0); val b = stats.filter(_._1 == 1)
    assert(a.map(_._2).toSeq === (0L until 16L))
    assert(a.map(_._3).sum === 248L)
    assert(b.map(_._2).toSeq === Seq(16L, 17L)) // ids continue after drop 0
    assert(b.map(_._3).sum === 24L)             // 3 full seqs of 8
    // on disk: drop 1's files are named by the GLOBAL shard id and
    // drop 0's files are untouched
    val filesB = new java.io.File(s"$dir/drop1").listFiles()
      .filter(_.getName.endsWith(".bin")).map(_.getName).sorted
    assert(filesB.toSeq === Seq("shard-00016.bin", "shard-00017.bin"))
    assert(new java.io.File(s"$dir/drop0").listFiles()
      .count(_.getName.endsWith(".bin")) === 16)
  }

  test("pack output is invariant to nBuckets and input partitioning (byte determinism)") {
    // the export's determinism claim: the SAME corpus must produce the
    // SAME bytes whatever the offsets bucketing or the physical layout
    // of the input — only then is a re-export comparable and a 1000-
    // executor run reproducible
    import graft.io.TokenShards
    val df = Seq(
      (1L, body("p1")), (2L, body("p2")), (3L, body("p3")),
      (4L, body("p4")), (5L, body("p5"))).toDF("doc_id", "text")
    def streamOf(src: org.apache.spark.sql.DataFrame, nBuckets: Int) =
      TokenShards.pack(src, "doc_id", "text", vocab = 4096, seqLen = 8,
          seqsPerShard = 2, nBuckets = nBuckets)
        .orderBy("gpos").as[(Long, Long, Long, Int)].collect().toSeq
    val base = streamOf(df, 3)
    assert(streamOf(df, 1) === base)
    assert(streamOf(df, 7) === base)
    assert(streamOf(df.repartition(5), 3) === base)
  }

  test("releaseEpochOrder positions are a permutation per epoch (q236)") {
    val d = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val docs = d.where(col("doc_id") % 97 =!= 0)
    val bench = d.where(col("doc_id") % 97 === 0).select("doc_id", "text")
    val order = graft.pipelines.PretrainRelease.releaseEpochOrder(
      docs, bench, minTokens = 30, alphaQuarters = 2, seqLen = 64,
      epochs = 2, ngram = 5, nPartitions = 4)
      .as[(Int, Long, String, Long)].collect()
    val byEpoch = order.groupBy(_._1)
    assert(byEpoch.keySet === Set(0, 1))
    val n = byEpoch(0).length.toLong
    byEpoch.values.foreach { rows =>
      assert(rows.map(_._4).sorted.toSeq === (0L until n))      // a permutation
      assert(rows.map(_._2).sorted.toSeq === (0L until n))      // over all seqs
      // positions follow the md5 key order exactly
      assert(rows.sortBy(_._3).map(_._4).toSeq === (0L until n))
    }
    // epochs genuinely differ
    assert(byEpoch(0).sortBy(_._2).map(_._4).toSeq !==
      byEpoch(1).sortBy(_._2).map(_._4).toSeq)
  }

  test("releaseShards round trip agrees with a releaseDocs-driven local reference") {
    val dir = java.nio.file.Files.createTempDirectory("pretrain-rel").toString
    val d = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val docs = d.where(col("doc_id") % 97 =!= 0)
    val bench = d.where(col("doc_id") % 97 === 0).select("doc_id", "text")
    val stats = PretrainRelease.releaseShards(docs, bench, s"$dir/shards",
      minTokens = 30, alphaQuarters = 2, vocab = 4096, seqLen = 64,
      seqsPerShard = 16, ngram = 5, nBuckets = 8)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(stats.nonEmpty)
    // reference: token counts from the release stream itself
    val rel = PretrainRelease.releaseDocs(docs, bench, minTokens = 30,
        alphaQuarters = 2, ngram = 5)
      .orderBy("release_id").as[(Long, String)].collect()
    val stream = rel.flatMap { case (_, text) =>
      (if (text.trim.isEmpty) Array.empty[String]
       else text.trim.split("\\s+")).map { tok =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val dg = md.digest(tok.getBytes("UTF-8"))
        ((((dg(0) & 0xFFL) << 24) | ((dg(1) & 0xFFL) << 16) |
          ((dg(2) & 0xFFL) << 8) | (dg(3) & 0xFFL)) % 4096).toInt
      } :+ 4096
    }
    val want = stream.take(stream.length / 64 * 64)
    assert(stats.map(_._2).sum === want.length.toLong)
    stats.foreach { case (sh, n, sum, _) =>
      val slice = want.slice(sh.toInt * 1024, sh.toInt * 1024 + n.toInt)
      assert(sum === slice.map(_.toLong).sum, s"shard $sh token sum")
    }
  }
}
