package graft.pipelines

import graft.curation.Curate
import graft.text.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** L-series end-to-end composition (SURVEY.md §2.11): one ingestion
  * round of a raw document batch into a curated corpus — the job a
  * training-data pipeline runs on every crawl drop. Chains the
  * curation primitives in their pruning order, cheapest first, so
  * each stage shrinks what the next one shuffles:
  *
  *  1. quality gate — map-only token-count floor; no shuffle.
  *  2. within-batch exact dedup — min-id per MD5 fingerprint, one
  *     shuffle on a 16-byte key (`Dedup.exactCanonicalIds` semantics).
  *  3. against-corpus dedup — left-anti join against the corpus's
  *     DISTINCT fingerprint projection: the accumulated corpus
  *     contributes 16 bytes per doc to the exchange, never text.
  *  4. benchmark decontamination — `Curate.contamination` (broadcast
  *     bench shingles); any n-gram hit disqualifies the doc.
  *  5. append — `unionByName` onto the corpus.
  *
  * Every rule is deterministic and relational, so the whole round is
  * DuckDB-replayable — q100 oracle-checks corpus ∪ survivors.
  * The streaming continuation of step 2/4 is `DedupStream` (near-dup
  * state at ingestion); this job is the batch drop-ingestion form.
  */
object CorpusIngest {

  /** Returns the corpus with the batch's surviving docs appended.
    * `corpus` and `batch` must share the document schema; `bench`
    * needs (idCol, textCol). */
  def ingest(corpus: DataFrame, batch: DataFrame, bench: DataFrame,
             minTokens: Int, ngram: Int = 3,
             idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val quality = batch.where(Text.tokenCount(col(textCol)) >= minTokens)
    val withFp = quality.withColumn("__fp", Text.fingerprint(col(textCol)))
    val dedupped = withFp
      .withColumn("__canon", min(col(idCol)).over(Window.partitionBy("__fp")))
      .where(col(idCol) === col("__canon")).drop("__canon")
    val corpusFp = corpus
      .select(Text.fingerprint(col(textCol)).as("__fp")).distinct()
    val fresh = dedupped.join(corpusFp, Seq("__fp"), "left_anti").drop("__fp")
    val contaminated = Curate.contamination(fresh, bench, ngram, idCol, textCol)
      .select(idCol)
    val clean = fresh.join(contaminated, Seq(idCol), "left_anti")
    corpus.unionByName(clean)
  }

  /** Per-document ADMISSION AUDIT — the answer to "why was my doc
    * rejected?" that [[ingest]]'s funnel counts cannot give: one row
    * per batch doc with its FIRST failing gate, in [[ingest]]'s own
    * stage order:
    *
    *   - `quality`       token count under the floor
    *   - `dup_in_batch`  not the min-id canonical of its fingerprint
    *                     among the quality survivors
    *   - `dup_of_corpus` fingerprint already ingested
    *   - `contaminated`  n-gram overlap with the benchmark set
    *   - `admitted`      survived every gate
    *
    * The quality/fingerprint flags ride ONE pass over the batch (the
    * canonical is a min-over-quality-rows window, so the dedup verdict
    * needs no second subtree); corpus membership is the fingerprint
    * left join; contamination is per-doc independent (each doc vs the
    * bench shingle set), so evaluating it on the dedupped survivors
    * gives the identical flag the ingest's fresh-set evaluation would
    * — the when-chain enforces first-fail either way. A spec pins
    * `admitted` ≡ the ids [[ingest]] actually appends. */
  def rejectionReasons(corpus: DataFrame, batch: DataFrame, bench: DataFrame,
                       minTokens: Int, ngram: Int = 3,
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    val qOk = Text.tokenCount(col(textCol)) >= minTokens
    val corpusFp = corpus
      .select(Text.fingerprint(col(textCol)).as("__fp")).distinct()
      .withColumn("__in_corpus", lit(true))
    val dedupped = batch.where(qOk)
      .withColumn("__fp", Text.fingerprint(col(textCol)))
      .withColumn("__canon", min(col(idCol)).over(Window.partitionBy("__fp")))
      .where(col(idCol) === col("__canon"))
    val contamIds = Curate
      .contamination(dedupped, bench, ngram, idCol, textCol)
      .select(col(idCol)).withColumn("__cont", lit(true))
    batch.select(col(idCol), col(textCol))
      .withColumn("__q", qOk)
      .withColumn("__fp", Text.fingerprint(col(textCol)))
      .withColumn("__canon",
        min(when(col("__q"), col(idCol))).over(Window.partitionBy("__fp")))
      .join(corpusFp, Seq("__fp"), "left")
      .join(contamIds, Seq(idCol), "left")
      .select(col(idCol),
        when(!col("__q"), lit("quality"))
          .when(col(idCol) =!= col("__canon"), lit("dup_in_batch"))
          .when(col("__in_corpus"), lit("dup_of_corpus"))
          .when(col("__cont"), lit("contaminated"))
          .otherwise(lit("admitted")).as("reason"))
  }
}
