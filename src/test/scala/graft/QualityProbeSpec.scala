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
