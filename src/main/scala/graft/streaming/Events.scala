package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/** Event-stream operators, batch and Structured Streaming forms.
  *
  * The reference is batch-only (SURVEY.md §2.9) — its one temporal
  * pattern is append-new-batch with overlap checks. Here both forms are
  * first-class: every streaming op has a batch twin with identical
  * semantics (the batch twin is what the DuckDB oracle checks), so
  * pipelines can run `Trigger.AvailableNow` incrementally or as plain
  * batch over the same code.
  */
object Events {

  /** Tumbling-window counts/sums per event type (batch form). Exact
    * cents-scaled sum -> deterministic across partitionings. */
  def hourlyStats(events: DataFrame): DataFrame =
    events
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        (sum(round(col("value") * 100).cast("long")) / 100.0).as("sum_value"))

  /** Streaming twin of [[hourlyStats]]: watermarked tumbling window. */
  def hourlyStatsStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        (sum(round(col("value") * 100).cast("long")) / 100.0).as("sum_value"))

  /** APPEND-mode hourly counts — the watermark form with REAL
    * late-data accounting. [[hourlyStatsStream]] runs complete mode
    * (every window lives in state forever and re-emits each trigger —
    * fine for a bounded replay, unbounded state on a real stream);
    * this one emits each window EXACTLY ONCE when the watermark passes
    * its end, evicts its state, and DROPS late rows whose window was
    * already evicted — the at-scale contract for continuous event
    * ingestion. Measured drop semantics (pinned by q223's oracle and
    * LateDataSpec): the late filter in trigger N uses the watermark in
    * effect during trigger N−1 (one-trigger lag — a late row is
    * dropped iff its window end ≤ the PREVIOUS trigger's watermark,
    * i.e. iff its window was evicted at the end of an earlier
    * trigger), while eviction/emission use trigger N's own watermark;
    * the closing no-data trigger flushes every window whose end ≤ the
    * final watermark. */
  def hourlyCountsAppend(events: DataFrame,
                         delay: String = "90 minutes"): DataFrame =
    events.withWatermark("ts", delay)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))

  /** Batch sessionization: a session breaks after `gapMinutes` of user
    * inactivity. Session id = running count of gap-breaks per user —
    * one window over (user_id, ts) and no state store needed in batch. */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_new_session",
        when(col("prev_ts").isNull, 1)
          .when(unix_micros(col("ts").cast("timestamp")) -
            unix_micros(col("prev_ts").cast("timestamp")) >
            gapMinutes * 60000000L, 1)
          .otherwise(0))
      .withColumn("session_seq",
        sum(col("is_new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("prev_ts", "is_new_session")
  }

  /** SFT TRANSCRIPT assembly — interaction logs become supervised
    * fine-tuning examples: each (user, session) collapses to ONE
    * training document of role-alternating turns ("user: …" /
    * "assistant: …" by kept-turn parity), truncated to the LAST
    * `maxTurns` turns (the context-window trim a conversation dataset
    * applies — the tail of a session is the part that fits). Turn
    * order is the total (ts, event_id) order, so the transcript bytes
    * are deterministic and the oracle gates every character. One
    * shuffle on (user, session); the truncation is a per-session
    * window, never a global sort. */
  def sftTranscripts(events: DataFrame, gapMinutes: Int,
                     maxTurns: Int): DataFrame = {
    require(maxTurns > 0, s"need maxTurns > 0, got $maxTurns")
    val bySession = Window.partitionBy("user_id", "session_seq")
    val kept = sessionize(events, gapMinutes)
      .withColumn("__rnd", row_number().over(
        bySession.orderBy(col("ts").desc, col("event_id").desc)))
      .where(col("__rnd") <= maxTurns)
      .withColumn("__n", count(lit(1)).over(bySession))
      // 0-based ascending index within the KEPT turns
      .withColumn("__idx", col("__n") - col("__rnd"))
      .withColumn("__line",
        concat(when(col("__idx") % 2 === 0, lit("user"))
          .otherwise(lit("assistant")), lit(": "), col("event_type")))
    kept.groupBy(col("user_id"), col("session_seq").as("session_id"))
      .agg(count(lit(1)).as("n_turns"),
        array_join(transform(
          sort_array(collect_list(struct(
            unix_micros(col("ts")).as("t"), col("event_id").as("e"),
            col("__line").as("l")))),
          r => r.getField("l")), "\n").as("transcript"))
  }

  /** Per-user session count (batch; oracle-checkable). */
  def sessionCounts(events: DataFrame, gapMinutes: Int): DataFrame =
    sessionize(events, gapMinutes)
      .groupBy("user_id")
      .agg(max(col("session_seq")).cast("long").as("n_sessions"),
        count(lit(1)).as("n_events"))

  // ---- streaming sessionization with explicit state ----

  case class Ev(user_id: Long, ts_us: Long, event_id: Long)
  case class SessionState(sessionCount: Long, lastTsUs: Long)
  case class UserSessions(user_id: Long, n_sessions: Long)

  /** Streaming twin of [[sessionCounts]] via mapGroupsWithState: state is
    * one (count, lastTs) pair per user — O(users) state, not O(events).
    * Gap arithmetic in microseconds, matching the batch form exactly
    * (events carry sub-millisecond timestamps). */
  def sessionCountsStream(spark: SparkSession, events: DataFrame,
                          gapMinutes: Int): Dataset[UserSessions] = {
    import spark.implicits._
    events.select(col("user_id").cast("long").as("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"),
        col("event_id").cast("long").as("event_id"))
      .as[Ev]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (user: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          val sorted = evs.toSeq.sortBy(e => (e.ts_us, e.event_id))
          var st = state.getOption.getOrElse(SessionState(0L, Long.MinValue))
          sorted.foreach { e =>
            if (st.lastTsUs == Long.MinValue ||
                e.ts_us - st.lastTsUs > gapMinutes * 60000000L)
              st = SessionState(st.sessionCount + 1, e.ts_us)
            else st = st.copy(lastTsUs = e.ts_us)
          }
          state.update(st)
          UserSessions(user, st.sessionCount)
      }
  }

  case class SessionWindow(user_id: Long, session_seq: Long,
                           start_us: Long, end_us: Long, n_events: Long)
  case class OpenSession(seq: Long, startUs: Long, lastUs: Long, n: Long)

  /** Session-window emission via flatMapGroupsWithState: a session is
    * EMITTED when a gap closes it (append semantics); the open session
    * per user stays in the state store across micro-batches. The batch
    * twin of the emitted set is `sessionize(...)` grouped to bounds,
    * minus each user's final (still-open) session. */
  def sessionWindowsStream(spark: SparkSession, events: DataFrame,
                           gapMinutes: Int): Dataset[SessionWindow] = {
    import spark.implicits._
    val gapUs = gapMinutes * 60000000L
    events.select(col("user_id").cast("long").as("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"),
        col("event_id").cast("long").as("event_id"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (user: Long, evs: Iterator[Ev], state: GroupState[OpenSession]) => {
          val sorted = evs.toSeq.sortBy(e => (e.ts_us, e.event_id))
          var open = state.getOption.orNull
          val closed = scala.collection.mutable.ArrayBuffer.empty[SessionWindow]
          sorted.foreach { e =>
            if (open == null)
              open = OpenSession(1L, e.ts_us, e.ts_us, 1L)
            else if (e.ts_us - open.lastUs > gapUs) {
              closed += SessionWindow(user, open.seq, open.startUs, open.lastUs, open.n)
              open = OpenSession(open.seq + 1, e.ts_us, e.ts_us, 1L)
            } else open = open.copy(lastUs = e.ts_us, n = open.n + 1)
          }
          if (open != null) state.update(open)
          closed.iterator
        })
  }

  /** Run a streaming query over a bounded parquet dir and return the
    * final result via the memory sink (test/driver harness helper). */
  // ---- streaming exact-duplicate suppression ----

  /** Batch form of key-dedup: the distinct key set (what the oracle
    * checks — emitting only the keys keeps the result independent of
    * which physical duplicate row survives). */
  def distinctKeys(events: DataFrame, keys: Seq[String]): DataFrame =
    events.select(keys.map(col): _*).distinct()

  /** Streaming twin via `dropDuplicatesWithinWatermark`: state is one
    * entry per key seen within the watermark horizon, so state size is
    * bounded by key cardinality × horizon — the 100 TB-safe form of
    * streaming dedup (plain `dropDuplicates` keeps ALL keys forever).
    * Duplicates arriving later than `delay` after the original can
    * re-emit; the horizon is the dedup contract, exactly as in an
    * at-least-once event-delivery pipeline. */
  def distinctKeysStream(events: DataFrame, keys: Seq[String],
                         tsCol: String = "ts",
                         delay: String = "24 hours"): DataFrame =
    events.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keys)
      .select(keys.map(col): _*)

  /** Run `body` with `spark.sql.shuffle.partitions` temporarily lowered.
    * Stateful streaming operators allocate one state store per shuffle
    * partition and checkpoint each of them every micro-batch; for a
    * bounded replay into a memory sink that fixed I/O dominates, so the
    * streaming twins run with fewer state partitions. Results are
    * partition-count independent. On a real cluster ingesting an
    * unbounded stream you would size this to the executor count
    * instead — the knob is the same. */
  def withStatePartitions[T](spark: SparkSession, n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, n.toString)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  def runAvailableNow(spark: SparkSession, dir: String, schema: StructType,
                      transform: DataFrame => DataFrame, queryName: String,
                      outputMode: OutputMode = OutputMode.Append()): DataFrame = {
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = transform(stream).writeStream
      .format("memory").queryName(queryName).outputMode(outputMode).start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }
}
