package graft

import graft.curation.Curate
import org.apache.spark.sql.functions._

class CurateSpec extends SparkSuite {
  import spark.implicits._

  /** Reference md5-prefix arithmetic, computed independently of Spark. */
  private def md5Bucket(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16)
  }

  test("contamination finds train docs sharing an n-gram with the benchmark") {
    val train = Seq(
      (1L, "x a b c y"),   // shares "a b c"
      (2L, "p q r s"),     // clean
      (3L, "a b c d e")    // shares "a b c", "b c d", "c d e"? bench has 2 shingles
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "a b c d")).toDF("doc_id", "text")
    val got = Curate.contamination(train, bench, n = 3)
      .as[(Long, Long)].collect().toMap
    // bench 3-grams: {"a b c", "b c d"}; doc1 shares 1, doc3 shares 2
    assert(got === Map(1L -> 1L, 3L -> 2L))
  }

  test("contamination short-doc edge: whole text is the single shingle") {
    val train = Seq((1L, "a b"), (2L, "a")).toDF("doc_id", "text")
    val bench = Seq((9L, "a b")).toDF("doc_id", "text")
    val got = Curate.contamination(train, bench, n = 3)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L)) // "a b" matches; "a" does not
  }

  test("hashSplit matches independent md5 arithmetic and is stable") {
    val df = (0L until 200L).toDF("doc_id")
    val got = Curate.hashSplit(df).select("doc_id", "bucket", "split")
      .as[(Long, Long, String)].collect()
    got.foreach { case (id, bucket, split) =>
      val expected = md5Bucket(id.toString) % 100
      assert(bucket === expected, s"doc $id")
      val expSplit =
        if (bucket < 80) "train" else if (bucket < 90) "val" else "test"
      assert(split === expSplit, s"doc $id bucket $bucket")
    }
    // all three splits are populated on 200 ids
    assert(got.map(_._3).toSet === Set("train", "val", "test"))
  }

  test("mixtureCopies: integer weights copy exactly, zero weight drops") {
    val df = Seq((1L, "en"), (2L, "de"), (3L, "xx"))
      .toDF("doc_id", "lang")
    val got = Curate.mixtureCopies(df,
        weights = Map("en" -> 2.0, "de" -> 1.0, "xx" -> 0.0))
      .as[(Long, String, Int)].collect().toSet
    assert(got === Set((1L, "en", 1), (1L, "en", 2), (2L, "de", 1)))
  }

  test("mixtureCopies: fractional weight realized by the documented hash rule") {
    val df = (0L until 50L).map(i => (i, "en")).toDF("doc_id", "lang")
    val got = Curate.mixtureCopies(df, weights = Map("en" -> 1.5))
      .groupBy("doc_id").agg(max("copy_no").as("n"))
      .as[(Long, Int)].collect().toMap
    (0L until 50L).foreach { id =>
      val frac = md5Bucket(s"$id:mix").toDouble / 4294967296.0
      val expected = 1 + (if (frac < 0.5) 1 else 0)
      assert(got(id) === expected, s"doc $id frac $frac")
    }
  }

  test("temperatureCopies flattens the mixture toward the tail groups") {
    // 80/16/4 head/mid/tail split; α = 0.5 must raise the tail share
    // toward sqrt-proportional and keep E[output] = N
    val docs = (0 until 80).map(i => (i.toLong, "head")) ++
      (80 until 96).map(i => (i.toLong, "mid")) ++
      (96 until 100).map(i => (i.toLong, "tail"))
    val df = docs.toDF("doc_id", "lang")
    val out = Curate.temperatureCopies(df, alphaQuarters = 2)
      .groupBy("lang").agg(count(lit(1)).as("c"), first("weight").as("w"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // target shares: sqrt(80):sqrt(16):sqrt(4) = 8.944:4:2 → tail
    // q=2/14.944=13.4% of 100 ≈ 13 copies from 4 docs (w≈3.35)
    assert(out("tail")._2 > 3.0 && out("tail")._2 < 3.7)
    assert(out("head")._2 < 1.0)
    assert(out("tail")._1 >= 10) // realized tail copies ≈ 13
    val total = out.values.map(_._1).sum
    assert(total >= 85 && total <= 115, s"expected ~100 copies, got $total")
  }

  test("chunkTokens: exact boundaries, overlap, and tail behavior") {
    // chunkSize 8, overlap 4, stride 4
    def chunks(text: String) =
      Curate.chunkTokens(Seq((1L, text)).toDF("doc_id", "text"),
          "text", "doc_id", chunkSize = 8, overlap = 4)
        .orderBy("chunk_idx")
        .collect().map(r => (r.getInt(1), r.getLong(2), r.getString(3))).toSeq
    val t10 = (1 to 10).map(i => s"w$i").mkString(" ")
    // n=10: last_idx = ceil(2/4) = 1 -> chunks [1-8], [5-10]; the
    // tail is short (6) but NOT a pure suffix of its predecessor
    assert(chunks(t10) === Seq(
      (0, 8L, (1 to 8).map(i => s"w$i").mkString(" ")),
      (1, 6L, (5 to 10).map(i => s"w$i").mkString(" "))))
    // n <= chunkSize -> exactly one chunk
    assert(chunks("a b c") === Seq((0, 3L, "a b c")))
    // n = chunkSize + 1 -> second chunk starts at stride, not a suffix
    val t9 = (1 to 9).map(i => s"w$i").mkString(" ")
    assert(chunks(t9).map(_._1) === Seq(0, 1))
    assert(chunks(t9)(1)._3 === (5 to 9).map(i => s"w$i").mkString(" "))
    // empty text -> no chunks
    assert(Curate.chunkTokens(Seq((1L, "  ")).toDF("doc_id", "text"),
      "text", "doc_id", 8, 4).count() === 0)
    // overlap 0 -> disjoint cover
    val disjoint = Curate.chunkTokens(Seq((1L, t10)).toDF("doc_id", "text"),
        "text", "doc_id", chunkSize = 4, overlap = 0)
      .orderBy("chunk_idx").collect().map(_.getString(3)).toSeq
    assert(disjoint === Seq("w1 w2 w3 w4", "w5 w6 w7 w8", "w9 w10"))
  }

  test("chunkTokens matches a local sliding-window reference on random docs") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genDoc = Gen.chooseNum(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c")))
    val genParams = for {
      cs <- Gen.chooseNum(2, 10)
      ov <- Gen.chooseNum(0, cs - 1)
      docs <- Gen.listOfN(4, genDoc)
    } yield (cs, ov, docs)
    val prop = Prop.forAll(genParams) { case (cs, ov, docs) =>
      val df = docs.zipWithIndex
        .map { case (ts, i) => (i.toLong, ts.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = Curate.chunkTokens(df, "text", "doc_id", cs, ov)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1)) -> ((r.getLong(2), r.getString(3))))
        .toMap
      val stride = cs - ov
      val expect = docs.zipWithIndex.flatMap { case (ts, i) =>
        if (ts.isEmpty) Nil
        else {
          val last = math.max(0L,
            math.floor((ts.length - cs + stride - 1).toDouble / stride).toLong)
          (0L to last).map { ci =>
            val chunk = ts.slice((ci * stride).toInt, (ci * stride).toInt + cs)
            (i.toLong, ci.toInt) -> ((chunk.length.toLong, chunk.mkString(" ")))
          }
        }
      }.toMap
      got == expect
    }
    assert(SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop).passed)
  }

  test("temperatureCopies fails loudly on null group values") {
    // a null lang would become a null map-literal key (rejected by
    // Catalyst) or silently drop docs via element_at — must be a
    // clear error instead
    val df = Seq((1L, "a"), (2L, null.asInstanceOf[String]), (3L, "a"))
      .toDF("doc_id", "lang")
    val e = intercept[IllegalArgumentException](
      Curate.temperatureCopies(df, alphaQuarters = 2))
    assert(e.getMessage.contains("null lang"))
  }

  test("temperatureCopies: quarter-power chains and realized counts are exact") {
    val df = ((0 until 9).map(i => (i.toLong, "a")) ++
      Seq((9L, "b"))).toDF("doc_id", "lang")
    // α = 3/4: a-group a9 = sqrt(9)*sqrt(sqrt(9)) = 3*sqrt(3)
    val a9 = math.sqrt(9.0) * math.sqrt(math.sqrt(9.0))
    val a1 = 1.0
    val s = math.floor(a9 * 1048576.0 + 0.5).toLong +
      math.floor(a1 * 1048576.0 + 0.5).toLong
    def w(n: Long, a: Double): Double =
      (10.0 * a * 1048576.0) / (n.toDouble * s.toDouble)
    val rows = Curate.temperatureCopies(df, alphaQuarters = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getInt(3)))
    val byDoc = rows.groupBy(_._1)
    // per-doc realized copies must equal the documented hash rule
    (0L to 9L).foreach { id =>
      val (n, a) = if (id < 9) (9L, a9) else (1L, a1)
      val wi = w(n, a)
      val frac = md5Bucket(s"$id:mix").toDouble / 4294967296.0
      val expect = wi.toInt + (if (frac < wi - math.floor(wi)) 1 else 0)
      assert(byDoc.get(id).map(_.length).getOrElse(0) === expect,
        s"doc $id: expected $expect copies of w=$wi")
      if (expect > 0)
        assert(byDoc(id).head._3 ===
          BigDecimal(wi).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("shuffled: partition-order concatenation is the global md5-key order") {
    val df = (0L until 500L).toDF("doc_id")
    val parts = Curate.shuffled(df, seed = 7L, nPartitions = 6)
      .select("shuffle_key").as[String]
      .rdd.glom().collect() // rows per partition, in partition order
    val concatenated = parts.flatten
    assert(concatenated.toSeq === concatenated.sorted.toSeq)
    assert(parts.count(_.nonEmpty) > 1, "expected a multi-partition range")
    // a different seed is a genuinely different permutation
    val otherOrder = Curate.shuffled(df, seed = 8L, nPartitions = 6)
      .select("doc_id").as[Long].rdd.glom().collect().flatten
    val thisOrder = Curate.shuffled(df, seed = 7L, nPartitions = 6)
      .select("doc_id").as[Long].rdd.glom().collect().flatten
    assert(thisOrder.toSeq !== otherOrder.toSeq)
  }

  test("epochPositions equal the global rank of the hash key, bit-stable") {
    val df = (0L until 500L).toDF("doc_id")
    val got = Curate.epochPositions(df, seed = 42L, nPartitions = 6)
      .select("doc_id", "shuffle_key", "pos")
      .as[(Long, String, Long)].collect()
    assert(got.length === 500)
    // pos is exactly the 0-based rank in shuffle_key order
    val expected = got.sortBy(_._2).zipWithIndex
      .map { case ((id, _, _), i) => id -> i.toLong }.toMap
    got.foreach { case (id, _, pos) => assert(pos === expected(id), s"doc $id") }
    // re-running yields the identical assignment (deterministic lineage)
    val again = Curate.epochPositions(df, seed = 42L, nPartitions = 6)
      .select("doc_id", "pos").as[(Long, Long)].collect().toMap
    got.foreach { case (id, _, pos) => assert(again(id) === pos) }
  }

  test("epochPositions are a 0..n-1 permutation, invariant to nPartitions") {
    // Regression: offsets keyed on spark_partition_id() after a range
    // exchange collided at larger scale (sampled boundaries differ
    // between the count job and the main job). The deterministic key
    // bucket must make pos a pure function of (data, seed) only.
    val df = (0L until 1000L).toDF("doc_id")
    val base = Curate.epochPositions(df, seed = 42L, nPartitions = 3)
      .select("doc_id", "pos").as[(Long, Long)].collect()
    assert(base.map(_._2).sorted.toSeq === (0L until 1000L).toSeq)
    val other = Curate.epochPositions(df, seed = 42L, nPartitions = 11)
      .select("doc_id", "pos").as[(Long, Long)].collect().toMap
    base.foreach { case (id, pos) => assert(other(id) === pos, s"doc $id") }
  }

  test("packBudget bins equal the driver-computed greedy packing") {
    val df = (0L until 300L).map(i => (i, 10L + i % 7)).toDF("doc_id", "n_chars")
    val got = Curate.packBudget(df, costCol = "n_chars", budget = 100L,
        seed = 9L, nPartitions = 5)
      .select("doc_id", "shuffle_key", "bin")
      .as[(Long, String, Long)].collect()
    val costs = (0L until 300L).map(i => i -> (10L + i % 7)).toMap
    var cum = 0L
    val expected = got.sortBy(_._2).map { case (id, _, _) =>
      val bin = cum / 100L; cum += costs(id); id -> bin
    }.toMap
    got.foreach { case (id, _, bin) => assert(bin === expected(id), s"doc $id") }
    // invariant to the bucket count, like epochPositions
    val other = Curate.packBudget(df, costCol = "n_chars", budget = 100L,
        seed = 9L, nPartitions = 13)
      .select("doc_id", "bin").as[(Long, Long)].collect().toMap
    got.foreach { case (id, _, bin) => assert(other(id) === bin) }
  }

  test("domainQuota keeps the k best per domain, id tiebreak, rank dense-free") {
    val docs = Seq(
      (1L, "s1", "the of and to in is it a b c d e f g h i j k l m"),
      (2L, "s1", "the of and to in is it a b c d e f g h i j k l m"), // same text as 1
      (3L, "s1", "zzzz !!!! ???? ####"),
      (4L, "s2", "the a of")
    ).toDF("doc_id", "source", "text")
    val got = Curate.domainQuota(docs, k = 2)
      .select("doc_id", "source", "rk").as[(Long, String, Int)].collect().toSet
    // s1: docs 1,2 tie on quality -> id order; doc 3 (rank 3) excluded
    assert(got === Set((1L, "s1", 1), (2L, "s1", 2), (4L, "s2", 1)))
  }

  test("weightedSample replicates the local E-S reference and skews to weight") {
    val docs = (1L to 200L).map(i => (i, if (i <= 100) 1L else 50L))
      .toDF("doc_id", "w")
    val got = Curate.weightedSample(docs, "doc_id", "w", n = 40, seed = 7L)
      .select("doc_id").as[Long].collect().toSeq
    // local reference: identical hash/snap arithmetic
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val ref = (1L to 200L).map { i =>
      val w = if (i <= 100) 1L else 50L
      val h = java.lang.Long.parseLong(md5Hex(s"$i:es7").take(8), 16)
      val u = (h + 1L).toDouble / 4294967296.0
      (i, r6(r6(math.log(u)) / w.toDouble))
    }.sortBy { case (id, k) => (-k, id) }.take(40).map(_._1)
    assert(got === ref)
    // w=50 items should dominate a 40-of-200 sample
    val heavy = got.count(_ > 100L)
    assert(heavy >= 30, s"weighting not biting: $heavy/40 heavy")
    assert(got.distinct.size === got.size, "sample must be without replacement")
  }

  test("lengthGroupedBatches beats hash-order batching on padding waste") {
    val rnd = new scala.util.Random(31)
    val docs = (1L to 400L).map(i => (i, 1L + rnd.nextInt(96)))
      .toDF("doc_id", "n_tok")
    val grouped = Curate.lengthGroupedBatches(docs, "doc_id", "n_tok",
      bucketWidth = 16, batchSize = 8).collect()
    // invariants: every batch within one bucket's width, full batches
    // of 8 except at most one ragged tail per bucket
    grouped.groupBy(_.getLong(0)).foreach { case (b, rows) =>
      assert(rows.count(_.getLong(2) != 8L) <= 1, s"bucket $b ragged twice")
      rows.foreach { r =>
        assert(r.getLong(3) >= b * 16 && r.getLong(3) < (b + 1) * 16) }
    }
    val groupedWaste = grouped.map(r =>
      r.getLong(2) * r.getLong(3) - r.getLong(4)).sum
    // baseline: batches formed in md5-hash (i.e. arbitrary) id order
    val hashOrder = docs.collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, _) => md5Hex(id.toString) }
      .grouped(8)
      .map(b => 8L.min(b.length.toLong) * b.map(_._2).max - b.map(_._2).sum)
      .sum
    assert(groupedWaste < hashOrder / 4,
      s"grouping should slash padding: $groupedWaste vs $hashOrder")
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("perplexityBuckets: per-lang terciles, head best, sizes within 1") {
    val scored = ((1L to 7L).map(i => (i, "en", i.toDouble)) ++
      (11L to 13L).map(i => (i, "de", (20 - i).toDouble)))
      .toDF("doc_id", "lang", "ppl_proxy")
    val got = Curate.perplexityBuckets(scored, "doc_id", "lang", "ppl_proxy")
      .select("doc_id", "lang", "bucket").as[(Long, String, String)]
      .collect()
    val en = got.filter(_._2 == "en").map(r => r._1 -> r._3).toMap
    // 7 docs -> sizes 3/2/2, lowest ppl = head
    assert((1L to 3L).forall(en(_) == "head"))
    assert((4L to 5L).forall(en(_) == "middle"))
    assert((6L to 7L).forall(en(_) == "tail"))
    val de = got.filter(_._2 == "de").map(r => r._1 -> r._3).toMap
    // de ppl DESCENDS with id -> highest id is head
    assert(de(13L) === "head" && de(12L) === "middle" && de(11L) === "tail")
    // every language bucket differs in size by at most 1
    val sizes = got.groupBy(r => (r._2, r._3)).view.mapValues(_.length).toMap
    for (l <- Seq("en", "de")) {
      val s = Seq("head", "middle", "tail").map(b => sizes.getOrElse((l, b), 0))
      assert(s.max - s.min <= 1, s"$l terciles $s")
    }
  }

  test("spanCorrupt builds invertible denoising pairs (q226)") {
    import spark.implicits._
    // doc 0: block b masked iff b % 7 == 0 -> tokens 0-2 and 21-23
    val words = (0 until 24).map(i => s"w$i")
    val df = Seq((0L, words.mkString(" ")), (3L, "a b c d e"), (7L, ""))
      .toDF("doc_id", "text")
    val got = graft.curation.Curate.spanCorrupt(df, "doc_id", "text")
      .as[(Long, Long, String, String)].collect().sortBy(_._1).toSeq
    assert(got.map(_._1) === Seq(0L, 3L)) // empty doc excluded
    val (_, n0, in0, tg0) = got(0)
    assert(n0 === 6L)
    assert(in0 === ("<extra_id_0> " + (3 to 20).map(i => s"w$i")
      .mkString(" ") + " <extra_id_1>"))
    assert(tg0 === "<extra_id_0> w0 w1 w2 <extra_id_1> w21 w22 w23")
    // doc 3: b0 = (7-3)%7 = 4 -> first masked block is 4 (tokens 12+),
    // doc has 5 tokens (blocks 0,1) -> nothing masked
    val (_, n3, in3, tg3) = got(1)
    assert(n3 === 0L && in3 === "a b c d e" && tg3 === "")
    // INVERSION: splicing each target span back at its sentinel
    // reconstructs the original token stream exactly
    got.foreach { case (_, _, in, tg) =>
      val spans = "<extra_id_\\d+>".r.split(tg).map(_.trim).filter(_.nonEmpty)
      var rebuilt = in
      spans.zipWithIndex.foreach { case (sp, j) =>
        rebuilt = rebuilt.replace(s"<extra_id_$j>", sp)
      }
      val orig = df.where(col("doc_id") === got.find(g => g._3 == in).get._1)
        .select("text").as[String].head()
      assert(rebuilt === orig.trim.split("\\s+").mkString(" "))
    }
  }

  test("preferencePairs picks best/worst with id tiebreaks (q231)") {
    import spark.implicits._
    // group g1: distinct qualities -> clear best/worst; group g2: ALL
    // texts identical -> rounded scores tie, chosen must be the MIN id
    // and rejected the MAX id (margin 0); group g3: singleton -> no pair
    val long = (1 to 60).map(i => s"w$i").mkString(" ") // high quality
    val df = Seq(
      (1L, long, "g1"), (2L, "!!! ??? !!!", "g1"), (3L, "mid size text here", "g1"),
      (10L, "same same same", "g2"), (11L, "same same same", "g2"),
      (12L, "same same same", "g2"),
      (20L, "alone", "g3"))
      .toDF("doc_id", "text", "grp")
    val got = graft.curation.Curate
      .preferencePairs(df, Seq("grp"), "doc_id", "text")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(!got.contains("g3"))
    val (n1, c1, r1, m1) = got("g1")
    assert(n1 === 3L && c1 === 1L && r1 === 2L && m1 > 0L)
    val (n2, c2, r2, m2) = got("g2")
    assert(n2 === 3L && c2 === 10L && r2 === 12L && m2 === 0L)
  }

  test("fimTransform cuts at thirds and reassembles to the original (q228)") {
    import spark.implicits._
    val df = Seq((1L, "a b c"), (2L, "t1 t2 t3 t4 t5 t6 t7"), (3L, "x y"))
      .toDF("doc_id", "text")
    val got = graft.curation.Curate.fimTransform(df, "doc_id", "text")
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(got.map(_._1) === Seq(1L, 2L)) // under-3-token doc excluded
    assert(got(0)._3 === "<fim_prefix> a <fim_suffix> c <fim_middle> b")
    // n=7 -> p1=2, p2=4: prefix t1 t2, middle t3 t4, suffix t5 t6 t7
    assert(got(1)._3 ===
      "<fim_prefix> t1 t2 <fim_suffix> t5 t6 t7 <fim_middle> t3 t4")
    // PSM reassembly: prefix + middle + suffix == original tokens
    got.foreach { case (id, _, fim) =>
      val m = "<fim_prefix> (.*) <fim_suffix> (.*) <fim_middle> (.*)".r
      val m(p, s2, mid) = fim
      val orig = df.where(col("doc_id") === id).select("text").as[String]
        .head().trim.split("\\s+").mkString(" ")
      assert(s"$p $mid $s2" === orig)
    }
  }
}
