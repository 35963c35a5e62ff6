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
  * Scale shape: [[marginMining]]'s directional top-k passes are
  * [[Ann.bruteForceTopK]]'s no-shuffle scored-broadcast plan (the
  * corpus never shuffles; per-partition sorted-truncate then a rank
  * over partitions × k survivors) — the exact mining protocol, with a
  * deliberate O(|src|·|tgt|) score term. [[marginMiningApprox]] IS
  * the 100 TB form: both directions ride the bounded-probe IVFADC
  * shortlist ([[Ann.ivfPqCosineTopK]], same output contract —
  * identity at kc=1/full probe and a planted-pair recall floor are
  * BitextSpec-pinned, and q203 gates the bounded-probe composition
  * against the DuckDB oracle end to end). Everything after the
  * neighborhood search runs on shortlist-sized data (≤
  * (|src|+|tgt|)·k rows): neighborhood sums are map-side-combined
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
    marginFromTopK(
      Ann.bruteForceTopK(src, tgt, idCol, vecCol, k),
      Ann.bruteForceTopK(tgt, src, idCol, vecCol, k), k, minMargin)
  }

  /** [[marginMining]] with both directional top-k passes served by the
    * bounded-probe IVFADC index ([[Ann.ivfPqCosineTopK]] — ADC
    * shortlist over `nprobe` probed cells, exact cosine re-rank of the
    * `shortlist` finalists) instead of the exhaustive scored pass.
    * Same output contract and margin algebra; the ONLY change is where
    * each side's k-nearest neighborhood comes from. This is the 100 TB
    * form: per direction the corpus pipeline is one map-side coded
    * scan, probing reads nprobe/kc of the cells, and the exact cosine
    * touches |queries|·shortlist vectors — no quadratic term anywhere.
    *
    * Contract pins (BitextSpec): kc=1/nprobe=1/shortlist ≥ |corpus| is
    * EXACTLY [[marginMining]] (the probed candidate set degenerates to
    * all pairs and the re-rank is bit-identical to bruteForceTopK);
    * bounded settings are gated by a planted-pair recall floor. */
  def marginMiningApprox(src: DataFrame, tgt: DataFrame, idCol: String,
                         vecCol: String, k: Int, minMargin: Double,
                         kc: Int, m: Int, pqK: Int, iters: Int,
                         nprobe: Int, shortlist: Int): DataFrame = {
    require(k >= 1, s"need a positive neighborhood size, got $k")
    // the two directions' quantizer TRAININGS (eager Lloyd collects at
    // construction) are independent — build them on two threads so the
    // per-iteration jobs overlap and back-fill each other's stragglers
    // (guide §2.6); each direction's training is deterministic on its
    // own corpus, so the returned plans are byte-identical to the
    // sequential form's
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val fwdF = Future(Ann.ivfPqCosineTopK(src, tgt, idCol, vecCol,
      kc, m, pqK, iters, nprobe, shortlist, k))
    val bwdF = Future(Ann.ivfPqCosineTopK(tgt, src, idCol, vecCol,
      kc, m, pqK, iters, nprobe, shortlist, k))
    marginFromTopK(Await.result(fwdF, Duration.Inf),
      Await.result(bwdF, Duration.Inf), k, minMargin)
  }

  /** [[marginMiningApprox]] under FROZEN pre-trained per-direction
    * quantizer states ([[Ann.ivfPqCosineTopKWithState]]) — the
    * cached-quantizer mining tier: training is the rare batch job, so
    * a serving deployment (and the bench median) pays coding + probing
    * + re-ranking only. `tgtState` serves the forward direction (src
    * queries against the tgt corpus), `srcState` the backward, the
    * [[marginMiningIndexed]] convention. Identical output to
    * [[marginMiningApprox]] at equal parameters when each state was
    * trained on its direction's corpus — which is how q203 rides the
    * full-train oracle (q207 keeps the in-query training E2E gated). */
  def marginMiningApproxWithState(src: DataFrame, tgt: DataFrame,
                                  srcState: Ann.IvfPqState,
                                  tgtState: Ann.IvfPqState,
                                  idCol: String, vecCol: String, k: Int,
                                  minMargin: Double, nprobe: Int,
                                  shortlist: Int): DataFrame = {
    require(k >= 1, s"need a positive neighborhood size, got $k")
    marginFromTopK(
      Ann.ivfPqCosineTopKWithState(tgtState, src, tgt, idCol, vecCol,
        nprobe, shortlist, k),
      Ann.ivfPqCosineTopKWithState(srcState, tgt, src, idCol, vecCol,
        nprobe, shortlist, k), k, minMargin)
  }

  /** [[marginMiningApprox]] over two WRITTEN per-direction indexes —
    * the serving topology at 100 TB: each side's codes live
    * cell-partitioned on disk ([[Ann.ivfPqBuildIndex]]'s layout, the
    * q169 contract), so every probe prunes the file listing to its
    * nprobe cells and maintenance (append/delete) is the index's
    * O(delta) problem, not the miner's. `tgtIdx` serves the forward
    * direction (src queries against the tgt corpus), `srcIdx` the
    * backward. Identical output to [[marginMiningApprox]] at equal
    * parameters (codes and state round-trip bit-exact — the q169 ≡
    * q162 identity), which is how q206 rides q203's oracle. */
  def marginMiningIndexed(src: DataFrame, tgt: DataFrame,
                          srcIdx: Ann.IvfPqIndex, tgtIdx: Ann.IvfPqIndex,
                          idCol: String, vecCol: String, k: Int,
                          minMargin: Double, nprobe: Int,
                          shortlist: Int): DataFrame = {
    require(k >= 1, s"need a positive neighborhood size, got $k")
    marginFromTopK(
      Ann.ivfPqCosineSearchIndex(tgtIdx, src, tgt, idCol, vecCol,
        nprobe, shortlist, k),
      Ann.ivfPqCosineSearchIndex(srcIdx, tgt, src, idCol, vecCol,
        nprobe, shortlist, k), k, minMargin)
  }

  /** The shared margin algebra over two directional top-k lists
    * ((query_id, neighbor_id, cosine) with cosine on the 1e-6 grid) —
    * everything below the neighborhood search runs on shortlist-sized
    * data (≤ (|src|+|tgt|)·k rows). */
  private def marginFromTopK(fwdTopK: DataFrame, bwdTopK: DataFrame,
                             k: Int, minMargin: Double): DataFrame = {
    // cm: the ranked cosine as exact 1e-6 fixed-point (the cosine is
    // already rounded to the 1e-6 grid, so this is lossless)
    val fwd = fwdTopK
      .withColumn("cm", floor(col("cosine") * lit(1e6) + lit(0.5)).cast("long"))
    val bwd = bwdTopK
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
