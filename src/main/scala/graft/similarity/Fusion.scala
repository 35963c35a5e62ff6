package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion — Cormack, Clarke & Büttcher 2009 ("RRF
  * outperforms Condorcet and individual rank learning methods",
  * SIGIR): fuse K retrieval systems' rankings by
  *
  *   score(d) = Σ_i 1 / (k0 + rank_i(d))
  *
  * — rank-only (score-scale-free), which is why it is THE standard
  * glue of hybrid lexical+dense retrieval. A document absent from one
  * system's list simply contributes nothing for that system.
  *
  * Determinism: each contribution is one IEEE division off integer
  * ranks snapped to 1e-6, contributions fold per (query, doc) in
  * SYSTEM order (the q92 recipe — a two-system sum is order-free only
  * until a third system joins), final rank ties on id → hash-exact.
  *
  * Scale shape: inputs are top-k lists (nQueries·topK rows each) —
  * dictionary-sized next to any corpus; one union, one aggregation,
  * one per-query rank window. The heavy lifting happened inside the
  * systems being fused. */
object Fusion {

  /** Fuse ranked lists (each with query_id, neighbor_id, rank) into a
    * per-query top-`topK`; `k0` is RRF's damping constant (60 in the
    * paper). */
  def rrf(rankings: Seq[DataFrame], k0: Int, topK: Int): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking to fuse")
    require(k0 >= 1 && topK >= 1, s"bad k0=$k0 / topK=$topK")
    val round6 = (c: org.apache.spark.sql.Column) =>
      floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
    val tagged = rankings.zipWithIndex.map { case (r, i) =>
      r.select(col("query_id"), col("neighbor_id"), lit(i).as("sys"),
        round6(lit(1.0) / (lit(k0.toDouble) + col("rank").cast("double")))
          .as("contrib"))
    }.reduce(_ unionByName _)
    tagged
      .groupBy("query_id", "neighbor_id")
      .agg(aggregate(
        array_sort(collect_list(struct(col("sys"), col("contrib")))),
        lit(0.0), (acc, x) => acc + x.getField("contrib")).as("s"))
      .select(col("query_id"), col("neighbor_id"), round6(col("s")).as("rrf"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("rrf").desc, col("neighbor_id").asc)))
      .where(col("rank") <= topK)
  }
}
