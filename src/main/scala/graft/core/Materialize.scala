package graft.core

import org.apache.spark.sql.DataFrame

/** Cluster-safe eager materialization of a reused intermediate frame.
  *
  * The engine cuts repeated-subtree evaluation (gate chains, verify
  * slivers, keyed frames) with eager checkpoints. In local mode
  * `localCheckpoint(true)` is the right tool: blocks live in the one
  * executor that is also the driver, and losing it loses the session
  * anyway. On a real cluster localCheckpoint stores blocks on
  * executors with NO lineage fallback — one executor loss kills the
  * query (guide §5's caution) — so at the 100 TB target the same call
  * sites must be able to switch to RELIABLE checkpointing (HDFS/object
  * store via `SparkContext.setCheckpointDir`) without touching every
  * operator.
  *
  * [[stable]] is that switch:
  *
  *   - `spark.graft.checkpoint.reliable=true` AND a checkpoint dir set
  *     (`spark.graft.checkpoint.dir` conf, or a prior
  *     `sc.setCheckpointDir`) → eager RELIABLE `Dataset.checkpoint`:
  *     blocks on durable storage, executor loss survivable;
  *   - otherwise (the default, and the bench/verify configuration) →
  *     eager `localCheckpoint(true)`, byte-identical to the historical
  *     behavior.
  *
  * Both paths are EAGER and both truncate lineage, so plan shapes
  * downstream are identical; only the block store differs. Lazy
  * `localCheckpoint(false)` sites (iterative-loop internals that are
  * re-derived every round) intentionally stay as they are — their
  * blocks are transient by construction.
  */
object Materialize {

  private val ReliableKey = "spark.graft.checkpoint.reliable"
  private val DirKey = "spark.graft.checkpoint.dir"

  /** Chainable form: `df.transform(...).stable()`. */
  implicit final class StableOps(private val df: DataFrame) extends AnyVal {
    def stable(): DataFrame = Materialize.stable(df)
  }

  /** Eagerly materialize `df` and truncate its lineage; reliable when
    * configured (see object doc), local otherwise. */
  def stable(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val reliable =
      try spark.conf.get(ReliableKey, "false").toBoolean
      catch { case _: IllegalArgumentException => false }
    if (reliable) {
      val sc = spark.sparkContext
      if (sc.getCheckpointDir.isEmpty)
        spark.conf.getOption(DirKey).foreach(sc.setCheckpointDir)
      if (sc.getCheckpointDir.isDefined) df.checkpoint(eager = true)
      else df.localCheckpoint(eager = true) // misconfigured: stay correct
    } else df.localCheckpoint(eager = true)
  }
}
