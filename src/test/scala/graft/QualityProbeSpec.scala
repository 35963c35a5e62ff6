package graft

import graft.ml.QualityProbe
import org.apache.spark.sql.functions._

/** fastText-style hashed-bigram quality probe (q172). The driver gate
  * pins the 2-step trajectory hash-exact; this spec pins that the SAME
  * machinery LEARNS — run to convergence on a corpus whose label is
  * carried by the bigram distribution, the probe must separate the
  * classes — plus the featurization contract. */
class QualityProbeSpec extends SparkSuite {
  import spark.implicits._

  test("trained to convergence, the probe separates bigram-distinct classes") {
    // class 1 speaks "alpha beta" bigrams, class 0 speaks "gamma delta"
    // — disjoint bigram support, so a linear model over hashed buckets
    // separates them unless the 8-bucket hashing collapses the classes
    // (it does not for these grams)
    val docs = ((0 until 30).map(i =>
      (i.toLong, "alpha beta alpha beta alpha", 1L)) ++
      (30 until 60).map(i =>
        (i.toLong, "gamma delta gamma delta gamma", 0L)))
      .toDF("doc_id", "text", "label")
    val out = QualityProbe.scored(docs, "text", "doc_id", "label",
        k = 8, iters = 60, lr = 4.0)
      .select(col("label"), col("pred")).collect()
    val acc = out.count(r => (r.getLong(0) == 1L) == r.getBoolean(1)).toDouble /
      out.length
    assert(acc === 1.0, s"separable classes not separated: accuracy $acc")
  }

  test("IntCounts kernel matches the interpreted histogram idiom") {
    val df = Seq(
      (1L, Seq(0, 3, 3, 7, 3)),
      (2L, Seq[Int]()),
      (3L, Seq(5, -1, 99, 5))) // out-of-range ids ignored
      .toDF("id", "bmap")
    val got = df.select(col("id"),
        graft.functions.HashFunctions.intCounts(col("bmap"), 8).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(got(1L) === Seq(1, 0, 0, 3, 0, 0, 0, 1))
    assert(got(2L) === Seq(0, 0, 0, 0, 0, 0, 0, 0))
    assert(got(3L) === Seq(0, 0, 0, 0, 0, 2, 0, 0))
    val viaLambda = df.select(col("id"), transform(sequence(lit(0), lit(7)),
        b => size(filter(col("bmap"), x => x === b))).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(got === viaLambda)
  }

  test("q173's Stupid-Backoff semantics on a hand-computed fixture") {
    // train "a b a c": N=4, c1 = {a:2, b:1, c:1},
    // c2 = {"a b":1, "b a":1, "a c":1}; eval "a b x a" (doc_id 0 is
    // the held-out split; 97 % 97 == 0):
    //   first  a      -> ln(2/4)
    //   (a,b)  seen   -> ln(1/2)
    //   (b,x)  unseen bigram, unseen w -> ln(0.4 * (0.4/4))
    //   (x,a)  unseen bigram, seen w   -> ln(0.4 * (2/4))
    // each rounded to 1e-6 before the position-ordered sum
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    // full pinned documents schema (Tables.load fails loudly on drift)
    val docs = Seq(
      (1L, "a b a c", "en", "web", 7L),
      (0L, "a b x a", "en", "web", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val q = SparkEntry.queries("q173_stupid_backoff")
    // the query lambda loads by sf-dir layout: write the fixture there
    val dir = java.nio.file.Files.createTempDirectory("sb").toString
    docs.write.parquet(s"$dir/documents.parquet")
    val out = q(spark, dir).collect()
    assert(out.length === 1)
    val row = out.head
    // eval text gets the deterministic OOV tail " zz0 join": tokens
    // a b x a zz0 join -> first + 5 pairs = 6 positions
    assert(row.getLong(0) === 0L && row.getLong(1) === 6L)
    val terms = Seq(
      r6(math.log(2.0 / 4)),              // first: a
      r6(math.log(1.0 / 2)),              // (a,b) seen
      r6(math.log(0.4 * (0.4 / 4))),      // (b,x) unseen, x unseen
      r6(math.log(0.4 * (2.0 / 4))),      // (x,a) unseen, a seen
      r6(math.log(0.4 * (0.4 / 4))),      // (a,zz0) unseen, zz0 unseen
      r6(math.log(0.4 * (0.4 / 4))))      // (zz0,join) unseen, join unseen
    val lp = terms.foldLeft(0.0)(_ + _)
    assert(row.getDouble(2) === r6(lp))
    assert(row.getDouble(3) === r6(-lp / terms.length))
  }

  test("features are relative bucket frequencies with a stable hash") {
    // one doc, known bigrams: "a b" x2 and "b a" x1 -> two buckets
    // carrying 2/3 and 1/3; score path must be deterministic across
    // repartitionings (bucket = md5 prefix, not a partition function)
    val docs = Seq((1L, "a b a b a", 0L)).toDF("doc_id", "text", "label")
    val s1 = QualityProbe.scored(docs, "text", "doc_id", "label", 8, 2, 4.0)
      .select("score_micros").as[Long].collect().head
    val s2 = QualityProbe.scored(docs.repartition(7), "text", "doc_id", "label",
        8, 2, 4.0)
      .select("score_micros").as[Long].collect().head
    assert(s1 === s2)
    // empty text -> zero feature vector, still scored (bias only)
    val empty = QualityProbe.scored(
      Seq((1L, "", 0L)).toDF("doc_id", "text", "label"),
      "text", "doc_id", "label", 8, 2, 4.0).collect()
    assert(empty.length === 1)
  }
}
