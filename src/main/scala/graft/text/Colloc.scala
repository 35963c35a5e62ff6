package graft.text

import graft.core.Materialize.StableOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pointwise-mutual-information collocation extraction — Church &
  * Hanks 1990 ("Word Association Norms, Mutual Information, and
  * Lexicography", CL 16(1)): score adjacent word pairs by
  * PMI(a,b) = ln( p(a,b) / (p(a)·p(b)) ), keep the top-n above a
  * minimum pair count (rare pairs have unstable, inflated PMI — the
  * paper's own caveat).
  *
  * Determinism: all counts are exact integers; the PMI is ONE ln of
  * the exact rational (c_ab·N1·N1)/(N2·c_a·c_b) evaluated in a fixed
  * IEEE multiply order and snapped to 1e-6 (the q92 transcendental
  * recipe) before the (pmi DESC, a, b) ranking.
  *
  * Scale shape: the corpus collapses to the unigram and bigram count
  * tables (map-side-combined groupBys off ONE checkpointed token
  * explode); the grand totals derive from the checkpointed counts
  * (never a corpus re-scan), the unigram side broadcasts into the
  * bigram table twice, and the final rank is a partial top-n. */
object Colloc {

  /** Top-`n` collocations (w1, w2, c_ab, pmi) with pair count ≥
    * `minCount`. */
  def topPmi(docs: DataFrame, textCol: String, n: Int, minCount: Long): DataFrame = {
    require(n >= 1 && minCount >= 1, s"bad n=$n / minCount=$minCount")
    val round6 = (c: org.apache.spark.sql.Column) =>
      floor(c * lit(1e6) + lit(0.5)) / lit(1e6)

    // one explode, checkpointed: unigram table, bigram table, and both
    // grand totals all derive from it (the q178 inverted-index lesson)
    val toks = docs
      .select(explode(Text.tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("c"))
      .stable()
    val bigs = docs
      .select(explode(Text.bigrams(Text.tokens(col(textCol)))).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("c_ab"))
      .stable()
    val n1 = toks.agg(sum("c")).head().getLong(0).toDouble
    val n2 = bigs.agg(sum("c_ab")).head().getLong(0).toDouble

    val ua = toks.select(col("term").as("w1"), col("c").as("c_a"))
    val ub = toks.select(col("term").as("w2"), col("c").as("c_b"))
    bigs
      .where(col("c_ab") >= minCount)
      .select(split(col("bg"), " ").getItem(0).as("w1"),
        split(col("bg"), " ").getItem(1).as("w2"), col("c_ab"))
      .join(broadcast(ua), "w1")
      .join(broadcast(ub), "w2")
      .select(col("w1"), col("w2"), col("c_ab"),
        round6(log(
          (col("c_ab").cast("double") * lit(n1) * lit(n1))
            / (lit(n2) * col("c_a").cast("double") * col("c_b").cast("double"))))
          .as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(n)
  }
}
