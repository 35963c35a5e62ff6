package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed spectral post-processing for embedding corpora: the
  * dominant principal direction via power iteration, the first step of
  * the "all-but-the-top" embedding cleanup (Mu & Viswanath 2018,
  * arXiv:1702.01417 — remove the mean and the top principal
  * direction(s) and isotropy/retrieval quality improves). At corpus
  * scale the covariance matrix is never materialized: each power step
  * is Σ_rows c·(cᵀv) — one corpus scan feeding a map-side-combined
  * groupBy(dim) whose exchange carries dim partial sums per partition,
  * exactly the [[LinearProbe]] gradient shape — and the direction
  * vector is bounded driver state.
  *
  * Cross-engine determinism (the q152 oracle), same recipe as
  * q147/q149: inputs snap to the 2^-20 grid; the mean is derived from
  * exact integer sums; each iteration's update floor(c_d·(cᵀv)·2^20 +
  * 0.5) is an exact BIGINT sum (order-independent), so both engines
  * derive bit-equal direction vectors; projections then compare in
  * 1e-6 fixed point through a fixed IEEE op sequence. */
object Spectral {

  /** `iters` power-iteration steps on the mean-centered snapped corpus
    * from the deterministic all-ones start, then project every
    * document onto the resulting direction. Returns one row per
    * document: (vec_id, label, proj_micros) where proj_micros is the
    * centered projection onto the UNIT direction in 1e-6 units. The
    * direction's sign is itself deterministic (fixed start vector), so
    * signed projections are comparable cross-engine. */
  def dominantProjection(df: DataFrame, vecCol: String, idCol: String,
                         labelCol: String, iters: Int): DataFrame = {
    val e = df.select(col(idCol).as("vec_id"), col(labelCol).as("label"),
      transform(col(vecCol),
        x => floor(x.cast("double") * lit(1048576.0) + lit(0.5)) / lit(1048576.0))
        .as("xs"))
    // one-row probe: width plus the guards the iteration assumes (an
    // empty corpus would throw a bare NoSuchElementException; ragged
    // widths would silently mix per-dim counts into the mean)
    val probe = e.agg(count(lit(1)).as("c"), min(size(col("xs"))).as("mn"),
      max(size(col("xs"))).as("mx")).head()
    require(probe.getLong(0) > 0L, "Spectral: empty input DataFrame")
    require(probe.getInt(1) == probe.getInt(2),
      s"Spectral: ragged embedding widths ${probe.getInt(1)}..${probe.getInt(2)} " +
        "— uniform vector width required")
    val width = probe.getInt(2)

    // mean from exact integer sums (the snapped x times 2^20 is the
    // integer k_d itself, so the snap-before-sum is lossless here)
    val muRows = e.select(posexplode(col("xs")).as(Seq("dim", "x")))
      .groupBy("dim")
      .agg(sum(floor(col("x") * lit(1048576.0) + lit(0.5)).cast("long")).as("s"),
        count(lit(1)).as("n"))
      .collect()
    val nD = muRows.head.getLong(2).toDouble
    val mu: Seq[Double] = muRows.map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1).map { case (_, s) => s.toDouble / (nD * 1048576.0) }.toSeq

    // materialized once per row per scan — as a def the interpreted
    // zip_with would be instantiated twice in the same select (the dot
    // AND the posexplode), doubling per-element lambda work
    def centered = zip_with(col("xs"), typedLit(mu), (x, m) => x - m)

    var v: Seq[Double] = Seq.fill(width)(1.0)
    for (_ <- 1 to iters) {
      val rows = e
        .withColumn("cs", centered)
        .withColumn("dot",
          graft.functions.VectorFunctions.doubleDot(col("cs"), typedLit(v)))
        .select(col("dot"), posexplode(col("cs")).as(Seq("dim", "c")))
        .groupBy("dim")
        .agg(sum(floor(col("c") * col("dot") * lit(1048576.0) + lit(0.5))
          .cast("long")).as("g"), count(lit(1)).as("n"))
        .collect() // dim rows — bounded driver state
      val n = rows.head.getLong(2).toDouble
      v = rows.map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
        .map { case (_, g) => g.toDouble / (n * 1048576.0) }.toSeq
    }
    // unit-normalize at projection time; the left-fold norm matches the
    // oracle's in-order list_sum (same IEEE op sequence). A degenerate
    // corpus (all documents identical, or a shrinking direction hitting
    // the quantization floor) yields an all-zero v: emit NULL
    // projections rather than NaN/0 (NaN would crash the long cast
    // under ANSI and silently read as a real zero otherwise).
    val norm = math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x))
    val proj = graft.functions.VectorFunctions.doubleDot(centered, typedLit(v))
    val projMicros =
      if (norm == 0.0) lit(null).cast("long")
      else floor(proj / lit(norm) * lit(1e6) + lit(0.5)).cast("long")
    e.select(col("vec_id"), col("label"), projMicros.as("proj_micros"))
  }
}
