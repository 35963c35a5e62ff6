package graft.ml

import graft.core.Materialize.StableOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed linear quality-probe training — the classifier-training
  * counterpart of [[graft.similarity.Ann.lloydCluster]]'s k-means: a
  * corpus-curation pipeline scores documents with a cheap linear model
  * over their embeddings (quality probes, fastText-style domain
  * filters), and at 100 TB the training loop must be the same shape as
  * every other trainer here — featurize/snap the corpus into a
  * (dim+1)-wide table ONCE (eager checkpoint), then one pass over that
  * table per iteration with a dictionary-sized exchange, the
  * (dim+1)-vector of weights as bounded driver state.
  *
  * Full-batch gradient descent on a LINEAR probe with the rational
  * sigmoid link s(z) = 0.5 + z / (2·(1+|z|)). The rational link is
  * deliberate: unlike exp-based logistic it evaluates with only
  * +,·,/,abs — IEEE-deterministic in every engine — so the whole
  * training trajectory is reproducible cross-engine (Math.exp is NOT
  * correctly rounded and differs between libm implementations, which
  * would cascade through the weight updates and break hash parity).
  *
  * Cross-engine determinism (the q149 oracle), extending the q147
  * recipe from centroids to gradients: input coordinates snap to the
  * 2^-20 grid (exactly representable doubles, so the snap itself is
  * engine-invariant); each iteration's gradient contribution
  * floor(r·x·2^20 + 0.5) is an exact BIGINT, so the per-dimension sums
  * are accumulation-order independent; the weight update
  * w_d − lr·(g_d / (n·2^20)) is a fixed IEEE double op sequence on
  * exact integers. Both engines therefore derive bit-equal weights at
  * every iteration, and the final scores gate the full geometry.
  *
  * Scale shape per iteration: the gradient groupBy(dim) after the
  * posexplode is map-side combined, so the shuffle carries dim+1
  * partial sums per partition — never rows or vectors; the bias rides
  * as a constant trailing 1.0 feature so one explode covers it. */
object LinearProbe {

  /** Train `iters` full-batch GD steps on target y = label % 2, then
    * score every document with the final weights. Returns one row per
    * document: (vec_id, label, score_micros, pred) where score_micros
    * is the rational-sigmoid score in 1e-6 units and pred ⇔ z ≥ 0
    * (the same predicate the oracle uses — comparing s ≥ 0.5 instead
    * could diverge by one rounding ulp at z ≈ 0). */
  def scored(df: DataFrame, vecCol: String, idCol: String, labelCol: String,
             iters: Int, lr: Double): DataFrame = {
    // Checkpoint the snapped feature table ONCE: every GD iteration's
    // gradient collect, the width probe, and the final scoring pass
    // are separate actions, and without truncation each re-executes
    // the full upstream featurization (for q172 that meant re-hashing
    // every bigram 4+ times per bench run). At 100 TB this is the
    // standard trainer shape anyway: materialize the (dim+1)-wide
    // feature table in one corpus scan, iterate over THAT.
    val e = df.select(col(idCol).as("vec_id"), col(labelCol).as("label"),
      (col(labelCol) % 2).cast("double").as("y"),
      concat(transform(col(vecCol),
          x => floor(x.cast("double") * lit(1048576.0) + lit(0.5)) / lit(1048576.0)),
        array(lit(1.0))).as("xs"))
      .stable()
    // dim+1 from a one-row probe aggregate (bounded, like the IVF
    // sample cap); the corpus itself is never collected. The probe
    // also guards the two inputs the iteration silently mis-handles:
    // an empty corpus (head() on nothing) and ragged vector widths
    // (the gradient's per-dim count would diverge from the global n
    // this implementation — and the DuckDB oracle — assume uniform).
    val probe = e.agg(count(lit(1)).as("c"), min(size(col("xs"))).as("mn"),
      max(size(col("xs"))).as("mx")).head()
    require(probe.getLong(0) > 0L, "LinearProbe: empty input DataFrame")
    require(probe.getInt(1) == probe.getInt(2),
      s"LinearProbe: ragged embedding widths ${probe.getInt(1)}..${probe.getInt(2)} " +
        "— uniform vector width required (per-dim n would silently diverge)")
    val width = probe.getInt(2)
    var w: Seq[Double] = Seq.fill(width)(0.0)

    def z = graft.functions.VectorFunctions.doubleDot(col("xs"), typedLit(w))
    def s = lit(0.5) + z / (lit(2.0) * (lit(1.0) + abs(z)))

    for (_ <- 1 to iters) {
      val grad = e.withColumn("r", s - col("y"))
        .select(col("r"), posexplode(col("xs")).as(Seq("dim", "x")))
        .groupBy("dim")
        .agg(sum(floor(col("r") * col("x") * lit(1048576.0) + lit(0.5))
          .cast("long")).as("g"), count(lit(1)).as("n"))
        .collect() // dim+1 rows — bounded driver state
      val n = grad.head.getLong(2).toDouble
      val byDim = grad.map(r => r.getInt(0) -> r.getLong(1)).toMap
      w = w.indices.map(d => w(d) - lr * (byDim(d).toDouble / (n * 1048576.0)))
    }
    e.select(col("vec_id"), col("label"),
      floor(s * lit(1e6) + lit(0.5)).cast("long").as("score_micros"),
      (z >= lit(0.0)).as("pred"))
  }
}
