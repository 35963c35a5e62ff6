package graft.pipelines

import graft.curation.Curate
import graft.text.Text
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** PRETRAINING-RELEASE end-to-end composition — the EXPORT-side
  * analogue of [[CorpusIngest]]'s admission chain and the last
  * pipeline a training-data release actually runs: curation floor →
  * exact dedup → benchmark decontamination → temperature mixture →
  * token-shard export with doc-span sidecar and a VERIFIED manifest.
  * Each stage is an already-oracle-gated primitive (q100's quality/
  * dedup/decontam gates, q165's α-temperature copies, q219/q225's
  * shard export); this job chains them so the whole release is ONE
  * hash-gated query (q232) whose oracle replays every stage's CTE
  * text verbatim.
  *
  * Scale shape — the reason this is not just `ingest` piped into
  * `pack`: the GATES never shuffle document text. Every admission
  * decision rides map-side-reduced columns:
  *
  *  1. quality floor — map-only token-count flag;
  *  2. exact dedup — min-id window over (doc_id, 16-byte
  *     fingerprint); the exchange moves ids + digests, never text;
  *  3. decontamination — shingles explode map-side from the scan and
  *     meet the broadcast benchmark shingle set; only HIT doc ids
  *     reach an exchange (contamination is per-doc independent, so
  *     evaluating it beside the dedup window — rather than after it —
  *     yields the identical flags, the [[CorpusIngest.rejectionReasons]]
  *     argument);
  *  4. temperature mixture — per-group histogram (bounded driver
  *     state, [[Curate.temperatureCopies]]) realized as hash-Bernoulli
  *     copy counts on ids alone.
  *
  * Document text then shuffles exactly TWICE for the whole release:
  * once when the admitted (doc_id, copy_no) list joins back to the
  * corpus text, and once inside [[graft.io.TokenShards.pack]]'s
  * offsets join; the token stream shuffles once onto shard ids. A
  * contiguous deterministic repack cannot move less.
  *
  * Release identity: copy `c` of doc `d` packs as
  * `release_id = d·copyCap + (c−1)`, so copies of a doc are adjacent
  * in the stream and the global order replays as plain integer order
  * in the oracle. `copyCap` is a CHECKED bound (raise_error), not an
  * assumption — a mixture weight that produced more copies than the
  * encoding can hold fails the release loudly.
  */
object PretrainRelease {

  /** The admitted (doc_id, copy_no) list — the gates and the mixture,
    * ids only, NO text column anywhere in the plan. This is the
    * subtree worth materializing: [[graft.io.TokenShards.pack]]'s
    * two-pass prefix sum plans its input twice, and a persisted copy
    * list (16 bytes/row) turns that into "the corpus text scans
    * twice" (the q219 shape, unavoidable for a global repack) instead
    * of "the whole gate chain runs twice". */
  def admittedCopies(docs: DataFrame, bench: DataFrame, minTokens: Int,
                     alphaQuarters: Int, ngram: Int = 3,
                     idCol: String = "doc_id", textCol: String = "text",
                     groupCol: String = "lang"): DataFrame = {
    require(minTokens > 0, s"minTokens must be positive, got $minTokens")
    val id = col(idCol).cast("long")

    // gates ride map-side-reduced columns — ids, flags, one digest
    val gated = docs.select(
      id.as("doc_id"), col(groupCol).as("__g"),
      Text.fingerprint(col(textCol)).as("__fp"),
      (Text.tokenCount(col(textCol)) >= minTokens).as("__q"))
    val dedup = gated.where(col("__q"))
      .withColumn("__canon", min(col("doc_id")).over(Window.partitionBy("__fp")))
      .where(col("doc_id") === col("__canon"))
      .select(col("doc_id"), col("__g"))

    // per-doc independent: same flags whether evaluated on quality
    // survivors or dedup survivors; ids-only output
    val contamIds = Curate.contamination(
        docs.where(Text.tokenCount(col(textCol)) >= minTokens),
        bench, ngram, idCol, textCol)
      .select(col(idCol).cast("long").as("doc_id"))
    val clean = dedup.join(contamIds, Seq("doc_id"), "left_anti")

    Curate.temperatureCopies(
        clean.withColumnRenamed("__g", groupCol), alphaQuarters,
        groupCol = groupCol, idCol = "doc_id")
      .select(col("doc_id"), col("copy_no"))
  }

  /** Join an admitted copy list back to corpus text as the release
    * stream `(release_id, text)` — the ONE text-bearing join of the
    * chain; copy_no is bound-checked into the encoding. */
  private def joinText(copies: DataFrame, docs: DataFrame, copyCap: Int,
                       idCol: String, textCol: String): DataFrame = {
    require(copyCap > 0, s"copyCap must be positive, got $copyCap")
    val checkedCopy = when(col("copy_no") > copyCap,
      raise_error(concat(
        lit(s"pretrain release: copy_no exceeds copyCap=$copyCap for doc "),
        col("doc_id").cast("string"))).cast("int"))
      .otherwise(col("copy_no"))
    copies
      .join(docs.select(col(idCol).cast("long").as("doc_id"),
        col(textCol).as("__text")), "doc_id")
      .select(
        (col("doc_id") * copyCap + checkedCopy - 1).as("release_id"),
        col("__text").as("text"))
  }

  /** The admitted release stream: one row per (doc, copy),
    * `(release_id, text)`, release_id = doc_id·copyCap + copy_no−1.
    * `docs` is the candidate corpus (id, text, group), `bench` the
    * decontamination benchmark (idCol, textCol). Callers that feed
    * [[graft.io.TokenShards.pack]] should prefer [[releaseShards]] /
    * [[releaseDocSpans]], which persist the copy list across pack's
    * two passes. */
  def releaseDocs(docs: DataFrame, bench: DataFrame, minTokens: Int,
                  alphaQuarters: Int, ngram: Int = 3, copyCap: Int = 16,
                  idCol: String = "doc_id", textCol: String = "text",
                  groupCol: String = "lang"): DataFrame =
    joinText(
      admittedCopies(docs, bench, minTokens, alphaQuarters, ngram,
        idCol, textCol, groupCol),
      docs, copyCap, idCol, textCol)

  /** Run `body` with the admitted copy list persisted (and always
    * unpersisted after): pack's two passes then share the gate
    * chain's one evaluation instead of re-running dedup/decontam/
    * mixture per pass. The persisted state is O(release docs) ids —
    * 16 bytes a row, disk-spillable — never text. */
  private def withPersistedCopies[A](docs: DataFrame, bench: DataFrame,
                                     minTokens: Int, alphaQuarters: Int,
                                     ngram: Int, copyCap: Int)
                                    (body: DataFrame => A): A = {
    val copies = admittedCopies(docs, bench, minTokens, alphaQuarters, ngram)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      copies.count() // materialize before the dual-pass consumer plans
      body(joinText(copies, docs, copyCap, "doc_id", "text"))
    } finally { copies.unpersist(false); () }
  }

  /** Run the whole release: gate, mix, pack, WRITE shards under
    * `path`, re-read the bytes, and GATE the re-read against the
    * writer's manifest ([[graft.io.TokenShards.verifyManifest]] —
    * divergence is an error, not a wrong answer). Returns the
    * shard-level stats of the bytes actually on disk. */
  def releaseShards(docs: DataFrame, bench: DataFrame, path: String,
                    minTokens: Int, alphaQuarters: Int, vocab: Int,
                    seqLen: Int, seqsPerShard: Int, ngram: Int = 3,
                    copyCap: Int = 16, nBuckets: Int = 32): DataFrame =
    withPersistedCopies(docs, bench, minTokens, alphaQuarters, ngram,
      copyCap) { rel =>
      val packed = graft.io.TokenShards.pack(rel, "release_id", "text",
        vocab, seqLen, seqsPerShard, nBuckets)
      val manifest = graft.io.TokenShards.write(packed, path)
      graft.io.TokenShards.verifyManifest(
        graft.io.TokenShards.readStats(docs.sparkSession, path), manifest)
    }

  /** The release's doc-span sidecar at the same release grain: one
    * row per (sequence, release doc) overlap — the masking metadata
    * shipped beside the shards ([[graft.io.TokenShards.docSpans]]). */
  def releaseDocSpans(docs: DataFrame, bench: DataFrame, minTokens: Int,
                      alphaQuarters: Int, vocab: Int, seqLen: Int,
                      ngram: Int = 3, copyCap: Int = 16,
                      nBuckets: Int = 32): DataFrame = {
    // LAZY plan (no write barrier to scope a persist against), so the
    // gate chain appears in both of docSpans' prefix-sum passes; a
    // release that wants shards AND spans should run them in one job
    // off one persisted copy list rather than call this beside
    // releaseShards. The spans themselves never explode the token
    // stream — O(docs + crossings) rows.
    val rel = releaseDocs(docs, bench, minTokens, alphaQuarters, ngram, copyCap)
    graft.io.TokenShards.docSpans(rel, "release_id", "text",
      vocab, seqLen, nBuckets)
  }
}
