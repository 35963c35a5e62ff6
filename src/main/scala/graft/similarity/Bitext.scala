package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Margin-based parallel-sentence (bitext) mining — Artetxe & Schwenk
  * 2019, "Margin-based Parallel Corpus Mining with Multilingual
  * Sentence Embeddings" (ACL), the LASER/CCMatrix recipe: a source/
  * target pair scores not by raw cosine but by the RATIO of its cosine
  * to the average cosine of each side's k-nearest neighborhood, which
  * cancels the hubness bias of the embedding space.
  *
  *   margin(x, y) = cos(x, y) /
  *     ( (Σ_{z∈NN_k(x)} cos(x,z) + Σ_{z∈NN_k(y)} cos(y,z)) / 2k )
  *
  * Mining keeps, per source, the candidate with the best margin when
  * it clears `minMargin` (ratio > 1 ⇒ the pair stands out above both
  * neighborhoods).
  *
  * Scale shape: both directional top-k passes are
  * [[Ann.bruteForceTopK]]'s no-shuffle scored-broadcast plan (the
  * corpus never shuffles; per-partition sorted-truncate then a rank
  * over partitions × k survivors) — at 100 TB either direction swaps
  * in the IVFADC shortlist ([[Ann.ivfPqSearchTopK]], same output
  * contract) unchanged. Everything after runs on shortlist-sized data
  * (≤ (|src|+|tgt|)·k rows): neighborhood sums are map-side-combined
  * groupBys, the margin join is an equi-join on those shortlists
  * (AQE-broadcastable, never corpus-scale).
  *
  * Determinism: cosines ride the house recipe (rounded to 1e-6 before
  * any ranking, ties on id), neighborhood sums are EXACT integer sums
  * of 1e-6 fixed-point cosines, and the margin is one multiply and one
  * divide off those integers, mirrored token-for-token in the oracle.
  */
object Bitext {

  private val round6 = (c: org.apache.spark.sql.Column) =>
    floor(c * lit(1e6) + lit(0.5)) / lit(1e6)

  /** Mined pairs (src_id, tgt_id, cosine, margin): the best-margin
    * target per source with margin ≥ `minMargin`, neighborhoods of
    * size `k` in both directions. */
  def marginMining(src: DataFrame, tgt: DataFrame, idCol: String,
                   vecCol: String, k: Int, minMargin: Double): DataFrame = {
    require(k >= 1, s"need a positive neighborhood size, got $k")
    // cm: the ranked cosine as exact 1e-6 fixed-point (the cosine is
    // already rounded to the 1e-6 grid, so this is lossless)
    val fwd = Ann.bruteForceTopK(src, tgt, idCol, vecCol, k)
      .withColumn("cm", floor(col("cosine") * lit(1e6) + lit(0.5)).cast("long"))
    val bwd = Ann.bruteForceTopK(tgt, src, idCol, vecCol, k)
      .withColumn("cm", floor(col("cosine") * lit(1e6) + lit(0.5)).cast("long"))

    // forward neighborhood sums ride a window over the candidates
    // themselves (same query_id partitioning the rank already
    // established) — a groupBy+join here would re-plan the whole
    // forward scoring pass (measured: 6 scans instead of 4)
    val bSum = bwd.groupBy(col("query_id").as("tgt_id"))
      .agg(sum("cm").as("b_sum"))

    // margin = cos · 2k / (Σ_fwd + Σ_bwd); the 1e6 scale cancels, so
    // the two IEEE ops are multiply-then-divide over exact integers
    fwd.withColumn("f_sum",
        sum("cm").over(Window.partitionBy("query_id")))
      .select(col("query_id").as("src_id"),
        col("neighbor_id").as("tgt_id"), col("cosine"), col("cm"), col("f_sum"))
      .join(bSum, "tgt_id")
      .withColumn("margin", round6(
        (col("cm").cast("double") * lit(2.0 * k))
          / (col("f_sum") + col("b_sum")).cast("double")))
      .withColumn("rk", row_number().over(
        Window.partitionBy("src_id")
          .orderBy(col("margin").desc, col("tgt_id").asc)))
      .where(col("rk") === 1 && col("margin") >= lit(minMargin))
      .select("src_id", "tgt_id", "cosine", "margin")
  }
}
