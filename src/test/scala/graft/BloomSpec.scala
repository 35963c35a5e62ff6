package graft

import graft.curation.Curate
import graft.functions.{HashFunctions, HashKernels}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** The Bloom-prefilter contract behind q190: the prefilter is one-sided
  * (no false negatives, so exact-verify restores exactness), actually
  * prunes (candidates strictly shrink at a sane mBits), and the
  * operator's output is row-identical to the exact [[Curate
  * .contamination]] it replaces. */
class BloomSpec extends SparkSuite {
  import spark.implicits._

  private def u(s: String) = UTF8String.fromString(s)

  test("kernel: positions and contains agree (an inserted element always probes true)") {
    val words = new Array[Long](1 << 10) // 65536 bits
    val elems = (0 until 500).map(i => s"elem $i payload")
    elems.foreach { e =>
      val pos = HashKernels.bloomPositions(u(e), 4, words.length * 64)
      (0 until pos.numElements()).foreach { j =>
        val p = pos.getInt(j)
        words(p >>> 6) |= 1L << (p & 63)
      }
    }
    elems.foreach(e => assert(HashKernels.bloomContains(u(e), words, 4),
      s"false negative for inserted element '$e'"))
  }

  test("kernel: an empty filter rejects everything; fpp is small at 10 bits/element") {
    val empty = new Array[Long](16)
    assert(!HashKernels.bloomContains(u("anything"), empty, 4))
    // 500 inserted / 8192 bits ≈ 16 bits per element, k=4 → fpp ~1e-3;
    // allow a loose 5% bound on 2000 absent probes
    val words = new Array[Long](128)
    (0 until 500).foreach { i =>
      val pos = HashKernels.bloomPositions(u(s"in $i"), 4, words.length * 64)
      (0 until pos.numElements()).foreach { j =>
        val p = pos.getInt(j); words(p >>> 6) |= 1L << (p & 63)
      }
    }
    val fp = (0 until 2000).count(i =>
      HashKernels.bloomContains(u(s"out $i"), words, 4))
    assert(fp < 100, s"false-positive count $fp of 2000 is implausibly high")
  }

  test("bloomContamination ≡ exact contamination on a randomized corpus") {
    val rnd = new scala.util.Random(1207)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    val docs = (0L until 300L).map { id =>
      (id, Seq.fill(6 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    }.toDF("doc_id", "text")
    val train = docs.where($"doc_id" % 7 =!= 0)
    val bench = docs.where($"doc_id" % 7 === 0)
    val exact = Curate.contamination(train, bench, n = 3)
      .as[(Long, Long)].collect().toMap
    val bloomed = Curate.bloomContamination(train, bench, n = 3,
      mBits = 1 << 14, kHashes = 4).as[(Long, Long)].collect().toMap
    assert(bloomed === exact)
  }

  test("the prefilter prunes: candidate shingles shrink vs the raw train side") {
    val rnd = new scala.util.Random(42)
    val mkText = (salt: String) =>
      Seq.fill(12)(s"$salt${rnd.nextInt(5000)}").mkString(" ")
    val train = (0L until 400L).map(id => (id, mkText("t"))).toDF("doc_id", "text")
    val bench = (0L until 20L).map(id => (id, mkText("b"))).toDF("doc_id", "text")
    def shingled(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), graft.text.Text.tokens(col("text")).as("toks"))
        .select(col("doc_id"),
          explode(graft.text.Text.shingles(col("toks"), 3)).as("shingle"))
    // rebuild the same bit array the operator builds
    val mBits = 1 << 16
    val positions = shingled(bench)
      .select(explode(HashFunctions.bloomPositions(col("shingle"), 4, mBits)).as("p"))
      .distinct().collect().map(_.getInt(0))
    val words = new Array[Long](mBits / 64)
    positions.foreach(p => words(p >>> 6) |= 1L << (p & 63))
    val total = shingled(train).count()
    val candidates = shingled(train).where(
      HashFunctions.bloomMightContain(col("shingle"), words.toIndexedSeq, 4)).count()
    val trueMatches = shingled(train)
      .join(shingled(bench).select("shingle").distinct(), "shingle").count()
    assert(candidates >= trueMatches, "the prefilter must keep every true overlap")
    assert(candidates < total / 2,
      s"prefilter kept $candidates of $total shingles — not pruning " +
        "(disjoint-vocabulary corpus should pass almost nothing)")
  }

  test("expressions survive codegen inside a projection (no interpreted fallback crash)") {
    val words = {
      val w = new Array[Long](64)
      val pos = HashKernels.bloomPositions(u("a b"), 3, 64 * 64)
      (0 until pos.numElements()).foreach { j =>
        val p = pos.getInt(j); w(p >>> 6) |= 1L << (p & 63)
      }
      w.toIndexedSeq
    }
    val got = Seq("a b", "c d").toDF("s")
      .select(col("s"), HashFunctions.bloomMightContain(col("s"), words, 3).as("hit"),
        HashFunctions.bloomPositions(col("s"), 3, 4096).as("pos"))
      .collect()
    assert(got.map(r => (r.getString(0), r.getBoolean(1))).toMap ===
      Map("a b" -> true, "c d" -> false))
    assert(got.forall(_.getSeq[Int](2).length === 3))
  }
}
