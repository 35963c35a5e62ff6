package graft.curation

import graft.core.Materialize.StableOps
import graft.text.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** UniMax language-budget allocation (Chung et al. 2023, "UniMax:
  * Fairer and More Effective Language Sampling for Large-Scale
  * Multilingual Pretraining", ICLR 2023): distribute a total token
  * budget across languages so no language exceeds `nEpochs` passes
  * over its data, spreading the leftover uniformly — water-filling
  * with per-language caps.
  *
  * The paper states the algorithm as a sequential loop (smallest
  * language first, give each `min(cap, remaining/left)`); that loop
  * has a closed form this operator computes with window functions:
  * with caps sorted ascending, the water level is the candidate
  * u_i = (B − Σ_{j<i} cap_j) / (L − i + 1) at the FIRST position
  * where u_i ≤ cap_i; languages before that position are capped,
  * languages from it on get u. (For B ≥ Σ caps no position
  * qualifies and every language is capped.)
  *
  * Scale shape at 100 TB: the corpus collapses to one map-side-
  * combined groupBy into L language rows — eagerly checkpointed so
  * the window/selection branches never re-plan the corpus scan — and
  * everything after is arithmetic over the dictionary-sized
  * allocation table. All pre-division arithmetic is exact integer
  * token counts; the two divisions (candidate level, epoch ratio) are
  * single IEEE ops mirrored in the DuckDB oracle.
  */
object Unimax {

  /** Per-language allocation rows (`langCol`, n_tokens, cap_tokens,
    * alloc_tokens, epochs) for a budget of `budgetNum`/`budgetDen` of
    * the corpus total (integer DIV, exact) and an `nEpochs` cap. */
  def allocation(docs: DataFrame, textCol: String, langCol: String,
                 budgetNum: Long, budgetDen: Long, nEpochs: Long): DataFrame = {
    require(budgetNum >= 1 && budgetDen >= 1, "budget fraction must be positive")
    require(nEpochs >= 1, s"need a positive epoch cap, got $nEpochs")

    // Corpus -> L rows, checkpointed: the four consumers below would
    // each re-plan the corpus tokenize otherwise (the q170 lesson).
    val counts = docs
      .groupBy(col(langCol))
      .agg(sum(Text.tokenCount(col(textCol)).cast("long")).as("n"))
      .stable()

    val w = counts
      .crossJoin(broadcast(counts.agg(sum(col("n")).as("t"))))
      .select(col(langCol), col("n"), (col("n") * lit(nEpochs)).as("cap"),
        expr(s"(t * ${budgetNum}L) DIV ${budgetDen}L").as("b"))

    val byCap = Window.orderBy(col("cap"), col(langCol))
    val all = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val o = w
      .withColumn("idx", row_number().over(byCap).cast("long"))
      .withColumn("pre", coalesce(
        sum(col("cap")).over(byCap.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("l", count(lit(1)).over(all))
      .withColumn("cand",
        (col("b") - col("pre")).cast("double")
          / (col("l") - col("idx") + lit(1L)).cast("double"))

    // First qualifying position = the water level (min struct orders
    // by idx); no qualifier -> budget covers every cap.
    val sel = o.agg(min(when(col("cand") <= col("cap").cast("double"),
      struct(col("idx"), col("cand")))).as("s"))

    val round6 = (c: org.apache.spark.sql.Column) =>
      floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
    o.crossJoin(broadcast(sel))
      .withColumn("alloc_raw",
        when(col("s").isNotNull && col("idx") >= col("s.idx"), col("s.cand"))
          .otherwise(col("cap").cast("double")))
      .select(col(langCol), col("n").as("n_tokens"), col("cap").as("cap_tokens"),
        round6(col("alloc_raw")).as("alloc_tokens"),
        round6(col("alloc_raw") / col("n").cast("double")).as("epochs"))
  }
}
