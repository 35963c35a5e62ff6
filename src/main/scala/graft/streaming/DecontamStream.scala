package graft.streaming

import graft.text.Text
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.curation.Curate.bloomContamination]] —
  * continuous benchmark decontamination at ingest time: training
  * documents stream in, their shingles are prefiltered MAP-SIDE by
  * the broadcast Bloom bit array (no state, no join touches the
  * non-candidate 99%+), survivors verify against the exact benchmark
  * shingle set via a stream-static join, and per-doc state accumulates
  * the distinct contaminated shingles so replayed or split arrivals
  * never double-count.
  *
  * Scale design mirrors the batch operator: the Bloom bits are the
  * only corpus-sized broadcast (10 bits/element), state exists ONLY
  * for documents with at least one verified overlap (a vanishing
  * fraction) and holds their contaminated-shingle set; a clean
  * document carries zero state and emits nothing. With a single
  * ordered micro-batch the emissions equal the batch operator
  * row-for-row, which is how q196 rides q190's oracle SQL; the
  * cross-batch cumulative-revision path is spec-pinned
  * (`DecontamStreamSpec`). Production would add a state TTL bounded
  * by the ingest-replay horizon.
  */
object DecontamStream {

  /** Per streamed doc, the running count of distinct benchmark
    * n-grams it shares — emitted (as a revision) whenever a batch
    * adds NEW contaminated shingles for that doc. */
  def contaminationStream(spark: SparkSession, stream: DataFrame,
                          benchShingles: DataFrame, words: Seq[Long],
                          kHashes: Int, n: Int,
                          textCol: String, idCol: String): DataFrame = {
    import spark.implicits._
    val cand = stream
      .select(col(idCol).cast("long").as("doc_id"),
        Text.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), explode(Text.shingles(col("toks"), n)).as("shingle"))
      .where(graft.functions.HashFunctions.bloomMightContain(
        col("shingle"), words, kHashes))
      .join(broadcast(benchShingles.select(col("shingle"))), Seq("shingle"))
      .select(col("doc_id"), col("shingle"))
      .as[(Long, String)]
    cand
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (doc: Long, rows: Iterator[(Long, String)],
         state: GroupState[Set[String]]) =>
          val seen = state.getOption.getOrElse(Set.empty[String])
          val fresh = rows.map(_._2).toSet -- seen
          if (fresh.isEmpty) Iterator.empty
          else {
            val all = seen ++ fresh
            state.update(all)
            Iterator((doc, all.size.toLong))
          }
      }
      .toDF("doc_id", "n_contaminated_ngrams")
  }
}
