package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of [[graft.ops.Drift.psiReport]] — continuous
  * ingest-drift monitoring: the reference window's per-category
  * counts are a small STATIC profile computed once; current-window
  * events arrive as a stream whose per-category counts are maintained
  * as a Complete-mode streaming aggregation (Spark's own aggregation
  * state — one row of state per category, NOT per event); the PSI
  * report derives from the live profile joined with the reference.
  * This is exactly how a shard-arrival pipeline runs the gate: the
  * profile updates with every micro-batch, and each new shard is
  * admitted or flagged off the current report.
  *
  * Determinism & oracle: with a single ordered micro-batch the live
  * profile equals the batch conditional aggregate row for row, so the
  * whole report is q200's batch operator — q205 rides q200's ORACLE
  * SQL hash-exact through a real stateful streaming query (the
  * q187/q196 twin pattern). The cross-batch cumulative path (counts
  * accumulate across micro-batches; PSI after N batches equals the
  * batch gate over the union of those batches) is DriftStreamSpec's.
  *
  * Scale shape: the streaming state and every post-aggregation
  * operator are category-sized; event-scale data exists only inside
  * each micro-batch's map side. The reference profile joins with a
  * broadcast (it is category-sized by construction).
  */
object DriftStream {

  /** The live current-window profile: a Complete-mode streaming count
    * keyed by category — (`catCol`, c_cur). Attach `.writeStream
    * .outputMode("complete")` to a sink; state is one counter per
    * category. */
  def profileStream(stream: DataFrame, catCol: String): DataFrame =
    stream.groupBy(col(catCol)).agg(count(lit(1)).as("c_cur"))

  /** PSI report off a live profile vs the static reference counts —
    * (`catCol`, c_ref) — with [[graft.ops.Drift.psiFromCounts]]'s
    * output contract. Categories seen in only one window keep a zero
    * count on the other side (their term is NULL, excluded from the
    * total — the batch gate's semantics exactly). */
  def psiFromProfile(profile: DataFrame, reference: DataFrame,
                     catCol: String, thresholdMicros: Long): DataFrame = {
    val counts = reference.select(col(catCol), col("c_ref"))
      .join(profile.select(col(catCol), col("c_cur")), Seq(catCol), "full_outer")
      .select(col(catCol),
        coalesce(col("c_ref"), lit(0L)).as("c_ref"),
        coalesce(col("c_cur"), lit(0L)).as("c_cur"))
    graft.ops.Drift.psiFromCounts(counts, catCol, thresholdMicros)
  }
}
