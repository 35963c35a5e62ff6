package graft.streaming

import graft.text.Text
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.dedup.Dedup.incrementalStatus]] — the
  * continuous form of shard-arrival exact dedup: documents stream in,
  * each is labeled `dup_of_base` (fingerprint in the already-ingested
  * index), `dup_in_delta` (seen earlier in THIS stream), or `new`,
  * without ever re-reading the base corpus.
  *
  * Scale design: the base check is a stream-static join against the
  * fingerprint INDEX (16-byte keys — broadcastable while it fits, a
  * shuffle hash join beyond); the within-stream memory is
  * flatMapGroupsWithState keyed by fingerprint holding ONE BOOLEAN per
  * distinct fingerprint seen — the minimal dedup state. Within a
  * micro-batch a fingerprint group is processed in id order, and
  * across batches the state bit marks prior sightings, so with id-
  * ordered arrival the labels equal the batch twin's min-id semantics
  * exactly (the oracle gate); production would add a state TTL
  * (GroupStateTimeout) bounded by the re-dup horizon.
  */
object IngestDedupStream {

  /** Label every streamed document. `baseFp` is the static distinct-
    * fingerprint index of the already-ingested corpus. */
  def statusStream(spark: SparkSession, stream: DataFrame, baseFp: DataFrame,
                   textCol: String, idCol: String): DataFrame = {
    import spark.implicits._
    val withFp = stream
      .select(col(idCol).cast("long").as("doc_id"),
        Text.fingerprint(col(textCol)).as("fingerprint"))
      .join(broadcast(baseFp.select(col("fingerprint"),
        lit(true).as("in_base"))), Seq("fingerprint"), "left")
      .select(col("fingerprint"), col("doc_id"),
        coalesce(col("in_base"), lit(false)).as("in_base"))
      .as[(String, Long, Boolean)]
    withFp
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (fp: String, rows: Iterator[(String, Long, Boolean)],
         state: GroupState[Boolean]) =>
          val sorted = rows.toSeq.sortBy(_._2)
          val seenBefore = state.exists && state.get
          state.update(true)
          sorted.zipWithIndex.iterator.map { case ((_, id, inBase), i) =>
            val status =
              if (inBase) "dup_of_base"
              else if (seenBefore || i > 0) "dup_in_delta"
              else "new"
            (id, fp, status)
          }
      }
      .toDF("doc_id", "fingerprint", "status")
  }
}
