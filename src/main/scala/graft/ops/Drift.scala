package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring for ingest pipelines — the
  * Population Stability Index (the standard model-monitoring drift
  * score; see e.g. Yurdakul 2018, "Statistical Properties of
  * Population Stability Index"): for a categorical feature,
  *   PSI = Σ_cat (p_cur − p_ref) · ln(p_cur / p_ref),
  * compared against the conventional 0.1 (moderate) / 0.2 (major)
  * alert thresholds. A shard-arrival pipeline runs this between the
  * reference corpus profile and each incoming shard before admitting
  * it to the training mix.
  *
  * Determinism (the q92/q186 transcendental recipe): counts are exact
  * integers; each category's term is ONE double expression in a fixed
  * operation order — (c_cur/N_cur − c_ref/N_ref) · ln((c_cur·N_ref)/
  * (c_ref·N_cur)) — snapped to 1e-6 micros with floor(x·1e6 + 0.5)
  * and summed as exact integers, so the total is order-independent
  * and cross-engine exact. Categories absent from either window get a
  * NULL term and are excluded from the total (the ε-smoothing
  * alternative is a caller-side concern; NULL keeps the report
  * honest about one-sided categories).
  *
  * Scale shape: ONE corpus scan collapsing to a per-category
  * conditional aggregate (map-side combined, one shuffle carrying one
  * row per category); the grand-total windows and the PSI fold run on
  * that category-sized table. Nothing corpus-scale crosses a second
  * exchange.
  */
object Drift {

  /** Per-category PSI report: (cat, c_ref, c_cur, term_micros,
    * psi_total_micros, drifted). `isRef` marks the reference window;
    * everything else is the current window. */
  def psiReport(df: DataFrame, catCol: String, isRef: Column,
                thresholdMicros: Long): DataFrame =
    psiFromCounts(
      df.groupBy(col(catCol))
        .agg(sum(when(isRef, 1L).otherwise(0L)).as("c_ref"),
          sum(when(isRef, 0L).otherwise(1L)).as("c_cur")),
      catCol, thresholdMicros)

  /** The PSI math over an already-aggregated category profile —
    * (`catCol`, c_ref, c_cur), one row per category present in either
    * window — shared by the batch gate above and the streaming twin
    * ([[graft.streaming.DriftStream]], which maintains c_cur as a
    * live Complete-mode streaming count). Grand totals, terms and the
    * fold all run on category-sized rows. */
  def psiFromCounts(counts: DataFrame, catCol: String,
                    thresholdMicros: Long): DataFrame = {
    val all = Window.partitionBy(lit(1))
    val totaled = counts
      .withColumn("n_ref", sum("c_ref").over(all))
      .withColumn("n_cur", sum("c_cur").over(all))
    val pRef = col("c_ref").cast("double") / col("n_ref").cast("double")
    val pCur = col("c_cur").cast("double") / col("n_cur").cast("double")
    val ratio = (col("c_cur").cast("double") * col("n_ref").cast("double")) /
      (col("c_ref").cast("double") * col("n_cur").cast("double"))
    val term = floor((pCur - pRef) * log(ratio) * lit(1e6) + lit(0.5))
      .cast("long")
    totaled
      .withColumn("term_micros",
        when(col("c_ref") > 0 && col("c_cur") > 0, term))
      .withColumn("psi_total_micros",
        coalesce(sum("term_micros").over(all), lit(0L)))
      .withColumn("drifted", col("psi_total_micros") >= thresholdMicros)
      .select(col(catCol), col("c_ref"), col("c_cur"), col("term_micros"),
        col("psi_total_micros"), col("drifted"))
  }
}
