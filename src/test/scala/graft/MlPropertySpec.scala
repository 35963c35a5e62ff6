package graft

import graft.dedup.Dedup
import graft.ml.{LinearProbe, Spectral}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based invariants for the round-12 ML/curation operators —
  * the oracle pins ONE instance hash-exactly; these check the
  * distributed implementations against independent local references on
  * randomized corpora (the same stance as [[GeoPropertySpec]] for the
  * geometry layer).
  */
class MlPropertySpec extends SparkSuite {
  import spark.implicits._

  private def passes(prop: Prop, n: Int): Boolean =
    SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop).passed

  private val genCorpus: Gen[Seq[(Long, Int, Array[Float])]] = for {
    n <- Gen.chooseNum(5, 24)
    dim <- Gen.chooseNum(2, 6)
    rows <- Gen.listOfN(n, Gen.listOfN(dim, Gen.chooseNum(-1.0f, 1.0f)))
  } yield rows.zipWithIndex.map { case (v, i) => (i.toLong, i % 2, v.toArray) }

  private def snap(x: Float): Double =
    math.floor(x.toDouble * 1048576.0 + 0.5) / 1048576.0

  test("semanticDedup flags exactly the docs with a better-ranked similar cluster mate") {
    val prop = Prop.forAll(genCorpus) { rows =>
      val df = rows.toDF("vec_id", "label", "embedding")
      val tau = 400000L
      val got = Dedup.semanticDedup(df, "embedding", "vec_id",
          k = 3, iters = 2, tauMicros = tau)
        .select(col("vec_id").cast("long"), col("cluster").cast("int"), col("is_dup"))
        .as[(Long, Int, Boolean)].collect()
      // local reference: same clusters (trusted via the q147 oracle),
      // rank by (snapped-dist recomputation not needed — rank is
      // whatever the engine used), so check the FLAG SEMANTICS
      // directly: a doc is a dup iff SOME cluster mate with
      // strictly-better rank has fixed-point cosine >= tau. Ranks are
      // recovered from the engine's own cluster/dist output ordering.
      val byId = rows.map(r => r._1 -> r._3).toMap
      def sims(a: Long, b: Long): Option[Long] = {
        val (xa, xb) = (byId(a).map(snap), byId(b).map(snap))
        val (sa, sb) = (xa.map(x => math.floor(x * 1048576.0 + 0.5).toLong),
          xb.map(x => math.floor(x * 1048576.0 + 0.5).toLong))
        val dot = sa.zip(sb).map { case (p, q) => p * q }.sum
        val (na, nb) = (sa.map(x => x * x).sum, sb.map(x => x * x).sum)
        if (na == 0 || nb == 0) None
        else Some(math.floor(dot.toDouble /
          (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble)) * 1e6 + 0.5).toLong)
      }
      // engine rank: recompute dist_micros locally is overkill — the
      // within-cluster rank only matters via "some better-ranked mate",
      // and ANY total order gives the same dup SET for a symmetric
      // similarity when the top-ranked doc of each similar group
      // survives. Check the two invariants that hold for every order:
      // (1) a kept doc similar to another kept doc in the same cluster
      //     is impossible;
      // (2) every dup has at least one similar cluster mate.
      val byCluster = got.groupBy(_._2)
      byCluster.values.forall { members =>
        val kept = members.filter(!_._3).map(_._1)
        val dups = members.filter(_._3).map(_._1)
        val keptPairsOk = kept.combinations(2).forall { case Array(a, b) =>
          sims(a, b).forall(_ < 400000L)
        }
        val dupsOk = dups.forall { d =>
          members.exists(m => m._1 != d && sims(m._1, d).exists(_ >= tau))
        }
        keptPairsOk && dupsOk
      }
    }
    assert(passes(prop, 40))
  }

  test("pqCodes equals independent per-subspace lloydCluster runs") {
    // the fused m-codebook trainer (one scan updates every book) must
    // be indistinguishable from training each subspace alone with the
    // single-book Lloyd — different code path, same math; err_micros
    // must be the sum of the per-subspace winning distances
    val genPq: Gen[Seq[(Long, Array[Float])]] = for {
      n <- Gen.chooseNum(4, 20)
      subDim <- Gen.chooseNum(1, 3)
      rows <- Gen.listOfN(n, Gen.listOfN(2 * subDim, Gen.chooseNum(-1.0f, 1.0f)))
    } yield rows.zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) }
    val prop = Prop.forAll(genPq) { rows =>
      val df = rows.toDF("vec_id", "embedding")
      val m = 2
      val sub = rows.head._2.length / m
      val k = math.min(3, rows.length)
      val got = graft.similarity.Ann.pqCodes(df, "vec_id", "embedding",
          m = m, k = k, iters = 2)
        .select(col("vec_id"), col("code_0").cast("int"),
          col("code_1").cast("int"), col("err_micros").cast("long"))
        .as[(Long, Int, Int, Long)].collect().sortBy(_._1).toSeq
      val solo = (0 until m).map { s =>
        val sliced = rows.map { case (id, v) =>
          (id, v.slice(s * sub, (s + 1) * sub)) }.toDF("vec_id", "embedding")
        graft.similarity.Ann.lloydCluster(sliced, "vec_id", "embedding",
            k = k, iters = 2)
          .select(col("vec_id"), col("cluster").cast("int"),
            col("dist_micros").cast("long"))
          .as[(Long, Int, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      }
      got.forall { case (id, c0, c1, err) =>
        solo(0)(id)._1 == c0 && solo(1)(id)._1 == c1 &&
          solo(0)(id)._2 + solo(1)(id)._2 == err
      }
    }
    assert(passes(prop, 20))
  }

  test("ADC search reduces to exact snapped distances when n <= k") {
    // with every vector its own Lloyd cell the reconstruction is the
    // 2^-20-snapped vector itself, so the ADC ranking must equal a
    // local exact ranking computed with the same per-subspace
    // left-fold + floor — the strongest identity the quantizer admits
    // components on a 1/64 grid: the property's reference assumes each
    // corpus point codes to its OWN snapped centroid, but two DISTINCT
    // subvectors closer than ~1e-3 give micro-floored distances that
    // tie at 0, and the engine's deterministic (dm, cid) tie rule may
    // legitimately code a point to its near-twin's centroid (a rare
    // ScalaCheck boundary-bias draw falsified the property this way).
    // Grid spacing 1/64 ⟹ distinct values are ≥ 244 micros apart while
    // the self-distance floors to 0, so "own centroid" is unambiguous;
    // EXACT duplicates remain generable and code consistently (equal
    // centroids, lower cid wins, same snapped value either way).
    val genSmall: Gen[Seq[(Long, Array[Float])]] = for {
      n <- Gen.chooseNum(2, 4)
      subDim <- Gen.chooseNum(1, 3)
      rows <- Gen.listOfN(n,
        Gen.listOfN(2 * subDim, Gen.chooseNum(-64, 64).map(_ / 64.0f)))
    } yield rows.zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) }
    val prop = Prop.forAll(genSmall) { rows =>
      val df = rows.toDF("vec_id", "embedding")
      val m = 2
      val sub = rows.head._2.length / m
      val got = graft.similarity.Ann.pqSearchTopK(
          df.where(col("vec_id") === 0L), df, "vec_id", "embedding",
          m = m, k = 4, iters = 2, topK = rows.length)
        .select(col("neighbor_id").cast("long"), col("adc_micros").cast("long"),
          col("rank").cast("int"))
        .as[(Long, Long, Int)].collect().sortBy(_._3).toSeq
      val q = rows.head._2.map(_.toDouble)
      val exact = rows.tail.map { case (id, x) =>
        val adc = (0 until m).map { s =>
          val d2 = (s * sub until (s + 1) * sub).foldLeft(0.0) { (acc, i) =>
            val diff = q(i) - snap(x(i)); acc + diff * diff
          }
          math.floor(d2 * 1e6 + 0.5).toLong
        }.sum
        (id, adc)
      }.sortBy { case (id, adc) => (adc, id) }
      got.map(r => (r._1, r._2)) == exact
    }
    assert(passes(prop, 20))
  }

  test("linear probe matches a local full-batch reference trajectory") {
    val prop = Prop.forAll(genCorpus) { rows =>
      val df = rows.toDF("vec_id", "label", "embedding")
      val got = LinearProbe.scored(df, "embedding", "vec_id", "label",
          iters = 2, lr = 4.0)
        .select(col("vec_id").cast("long"), col("score_micros").cast("long"))
        .as[(Long, Long)].collect().toMap
      // local reference: identical snapped GD in plain Scala
      val xs = rows.map(r => r._3.map(snap) :+ 1.0)
      val ys = rows.map(_._2 % 2)
      val width = xs.head.length
      var w = Array.fill(width)(0.0)
      for (_ <- 1 to 2) {
        val g = Array.fill(width)(0L)
        xs.zip(ys).foreach { case (x, y) =>
          val z = x.zip(w).foldLeft(0.0)((a, p) => a + p._1 * p._2)
          val r = (0.5 + z / (2.0 * (1.0 + math.abs(z)))) - y
          (0 until width).foreach(d =>
            g(d) += math.floor(r * x(d) * 1048576.0 + 0.5).toLong)
        }
        val n = xs.length.toDouble
        w = Array.tabulate(width)(d => w(d) - 4.0 * (g(d).toDouble / (n * 1048576.0)))
      }
      rows.forall { r =>
        val x = r._3.map(snap) :+ 1.0
        val z = x.zip(w).foldLeft(0.0)((a, p) => a + p._1 * p._2)
        val s = 0.5 + z / (2.0 * (1.0 + math.abs(z)))
        got(r._1) == math.floor(s * 1e6 + 0.5).toLong
      }
    }
    assert(passes(prop, 40))
  }

  test("dominant direction projections match a local power-iteration reference") {
    val prop = Prop.forAll(genCorpus) { rows =>
      val df = rows.toDF("vec_id", "label", "embedding")
      val got = Spectral.dominantProjection(df, "embedding", "vec_id", "label",
          iters = 2)
        .select(col("vec_id").cast("long"), col("proj_micros").cast("long"))
        .as[(Long, Long)].collect().toMap
      val xs = rows.map(_._3.map(snap))
      val width = xs.head.length
      val n = xs.length.toDouble
      val mu = Array.tabulate(width) { d =>
        xs.map(x => math.floor(x(d) * 1048576.0 + 0.5).toLong).sum
          .toDouble / (n * 1048576.0)
      }
      val cs = xs.map(x => Array.tabulate(width)(d => x(d) - mu(d)))
      var v = Array.fill(width)(1.0)
      for (_ <- 1 to 2) {
        val g = Array.fill(width)(0L)
        cs.foreach { c =>
          val dot = c.zip(v).foldLeft(0.0)((a, p) => a + p._1 * p._2)
          (0 until width).foreach(d =>
            g(d) += math.floor(c(d) * dot * 1048576.0 + 0.5).toLong)
        }
        v = Array.tabulate(width)(d => g(d).toDouble / (n * 1048576.0))
      }
      val norm = math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x))
      rows.indices.forall { i =>
        val dot = cs(i).zip(v).foldLeft(0.0)((a, p) => a + p._1 * p._2)
        got(rows(i)._1) == math.floor(dot / norm * 1e6 + 0.5).toLong
      }
    }
    assert(passes(prop, 40))
  }

  test("IVF-PQ with one coarse cell equals PQ search on mean-centered input") {
    // kc = 1 collapses the coarse quantizer to the (snapped-sum) mean,
    // every vector lands in the single list, and the residual PQ must
    // be EXACTLY a direct pqSearchTopK over the pre-centered corpus —
    // a cross-path identity through lloydTrain + VecSub + pqTrain
    val genSmall: Gen[Seq[(Long, Array[Float])]] = for {
      n <- Gen.chooseNum(4, 12)
      subDim <- Gen.chooseNum(1, 3)
      rows <- Gen.listOfN(n, Gen.listOfN(2 * subDim, Gen.chooseNum(-1.0f, 1.0f)))
    } yield rows.zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) }
    val prop = Prop.forAll(genSmall) { rows =>
      val df = rows.toDF("vec_id", "embedding")
      val m = 2
      val got = graft.similarity.Ann.ivfPqSearchTopK(
          df.where(col("vec_id") < 2), df, "vec_id", "embedding",
          kc = 1, m = m, k = 3, iters = 2, nprobe = 1, topK = 4)
        .select(col("query_id").cast("long"), col("neighbor_id").cast("long"),
          col("adc_micros").cast("long"), col("rank").cast("int"))
        .as[(Long, Long, Long, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
      // local single-cell centroid after one update: snapped coordinate
      // sums over the raw cast-to-double input (lloydTrain's recipe)
      val n = rows.length
      val dim = rows.head._2.length
      val c = Array.tabulate(dim) { i =>
        rows.map(r => math.floor(r._2(i).toDouble * 1048576.0 + 0.5).toLong).sum
          .toDouble / (n * 1048576.0)
      }
      val centered = rows.map { case (id, v) =>
        (id, v.map(_.toDouble).zip(c).map { case (a, b) => a - b }) }
      val refDf = centered.toDF("vec_id", "embedding")
      val ref = graft.similarity.Ann.pqSearchTopK(
          refDf.where(col("vec_id") < 2), refDf, "vec_id", "embedding",
          m = m, k = 3, iters = 2, topK = 4)
        .select(col("query_id").cast("long"), col("neighbor_id").cast("long"),
          col("adc_micros").cast("long"), col("rank").cast("int"))
        .as[(Long, Long, Long, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
      got == ref
    }
    assert(passes(prop, 15))
  }

  test("full-probe rerank with a corpus-wide shortlist is the exact L2 ranking") {
    // nprobe = kc scores every vector; shortlist = n keeps them all;
    // the exact pass then MUST reproduce a plain local L2 ranking over
    // the raw cast-to-double vectors (no snapping in the exact stage) —
    // the rerank stage's whole point is recovering exactness that the
    // quantizer gave up
    val genSmall: Gen[Seq[(Long, Array[Float])]] = for {
      n <- Gen.chooseNum(4, 12)
      subDim <- Gen.chooseNum(1, 3)
      rows <- Gen.listOfN(n, Gen.listOfN(2 * subDim, Gen.chooseNum(-1.0f, 1.0f)))
    } yield rows.zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) }
    val prop = Prop.forAll(genSmall) { rows =>
      val df = rows.toDF("vec_id", "embedding")
      val n = rows.length
      val got = graft.similarity.Ann.ivfPqSearchRerank(
          df.where(col("vec_id") === 0L), df, "vec_id", "embedding",
          kc = 2, m = 2, k = 3, iters = 2, nprobe = 2,
          shortlist = n, topK = n)
        .select(col("neighbor_id").cast("long"),
          col("exact_micros").cast("long"), col("rank").cast("int"))
        .as[(Long, Long, Int)].collect().sortBy(_._3).toSeq
      val q = rows.head._2.map(_.toDouble)
      val exact = rows.tail.map { case (id, x) =>
        val d2 = x.indices.foldLeft(0.0) { (acc, i) =>
          val d = q(i) - x(i).toDouble; acc + d * d
        }
        (id, math.floor(d2 * 1e6 + 0.5).toLong)
      }.sortBy { case (id, d2) => (d2, id) }
      got.map(r => (r._1, r._2)) == exact
    }
    assert(passes(prop, 15))
  }

  test("SQ8 stats equal an exact local replication of the affine map") {
    val genSmall: Gen[Seq[(Long, Array[Float])]] = for {
      n <- Gen.chooseNum(2, 16)
      dim <- Gen.chooseNum(1, 6)
      rows <- Gen.listOfN(n, Gen.listOfN(dim, Gen.chooseNum(-2.0f, 2.0f)))
    } yield rows.zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) }
    val prop = Prop.forAll(genSmall) { rows =>
      val df = rows.toDF("vec_id", "embedding")
      val got = graft.similarity.Ann.sq8Stats(df, "vec_id", "embedding")
        .select(col("vec_id").cast("long"), col("code_sum").cast("long"),
          col("err_micros").cast("long"))
        .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      val dim = rows.head._2.length
      val mn = Array.tabulate(dim)(d => rows.map(_._2(d).toDouble).min)
      val mx = Array.tabulate(dim)(d => rows.map(_._2(d).toDouble).max)
      val sc = Array.tabulate(dim)(d => (mx(d) - mn(d)) / 255.0)
      rows.forall { case (id, v) =>
        var cs = 0L
        var e2 = 0.0
        (0 until dim).foreach { d =>
          val x = v(d).toDouble
          val c = if (mx(d) == mn(d)) 0L
            else math.min(255L, math.max(0L,
              math.floor((x - mn(d)) / sc(d) + 0.5).toLong))
          val r = mn(d) + c.toDouble * sc(d)
          cs += c
          val t = x - r
          e2 += t * t
        }
        got(id) == ((cs, math.floor(e2 * 1e6 + 0.5).toLong))
      }
    }
    assert(passes(prop, 30))
  }
}
