package graft.streaming

import graft.functions.HashFunctions
import graft.text.Text
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming near-duplicate detection — the continuous-ingestion form
  * of `Dedup.minhashCanonicalIds` (SURVEY.md §2.11 L2): every arriving
  * document is checked against everything seen so far WITHOUT re-scanning
  * the corpus. This is the shape a production pipeline actually runs:
  * the batch dedup bootstraps the corpus once, then ingestion keeps it
  * clean incrementally.
  *
  * Scale design (what makes this work at 100 TB of accumulated corpus):
  *  - State is keyed by LSH band bucket and holds SIGNATURES ONLY —
  *    k longs + a canonical id per doc, never text. A doc's state
  *    footprint is ~`bands × (k+2) × 8` bytes, independent of doc size.
  *  - An arriving doc compares against ONE bucket's members per band
  *    (the same candidates the batch band join would produce), so
  *    per-doc work is O(bucket occupancy), not O(corpus).
  *  - Degenerate buckets (boilerplate that collides everything) are
  *    capped at `maxPerBucket`: past the cap a bucket stops absorbing
  *    new members — the exact analogue of the batch winnowing `maxDf`
  *    stop-fingerprint guard, trading recall on pathological keys for
  *    bounded state and latency.
  *
  * Match semantics mirror the batch path: MinHash estimator agreement
  * ≥ threshold against a bucket member; the canonical id propagates
  * (a member stored with canonical=A hands A to its own matches, so
  * A->B->C chains collapse within a bucket); cross-band resolution is
  * min(canonical) per doc, done by [[resolveCanonical]] on the sink.
  */
object DedupStream {

  /** One bucket member: doc id, its resolved canonical, its signature. */
  final case class SigEntry(id: Long, canonical: Long, sig: Array[Long])

  /** Per-(doc, band) candidate verdict emitted by the stateful op. */
  final case class BandVerdict(id: Long, canonical: Long)

  /** Internal row shape between banding and the stateful op (public:
    * encoder codegen must be able to construct it). */
  final case class BandedSig(bucket: String, id: Long, sig: Array[Long])

  /** Estimator agreement between two equal-k signatures. */
  private def agreement(a: Array[Long], b: Array[Long]): Double = {
    var same = 0; var i = 0
    while (i < a.length) { if (a(i) == b(i)) same += 1; i += 1 }
    same.toDouble / a.length
  }

  /** Stateful core: per-bucket arrival-order matching. Emits one
    * verdict per (doc, band); `resolveCanonical` reduces to one row
    * per doc. Works identically on a streaming or batch Dataset —
    * the spec's batch-twin check relies on that. */
  def bandVerdicts(docs: DataFrame, textCol: String, idCol: String,
                   threshold: Double, shingleSize: Int = 1,
                   bands: Int = 2, rowsPerBand: Int = 16,
                   maxPerBucket: Int = 1000): Dataset[BandVerdict] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val k = bands * rowsPerBand
    val toks = Text.tokens(col(textCol))
    val units = if (shingleSize <= 1) toks else Text.shingles(toks, shingleSize)
    val sigs = docs.select(col(idCol).cast("long").as("id"),
      HashFunctions.minhashSignature(units, k).as("sig"))
    val bandStructs = (0 until bands).map(b =>
      struct(lit(b).as("band"),
        hash(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)).as("bucket")))
    val banded = sigs
      .select(col("id"), col("sig"), explode(array(bandStructs: _*)).as("bb"))
      .select(concat_ws(":", col("bb.band"), col("bb.bucket")).as("bucket"),
        col("id"), col("sig"))
      .as[BandedSig]

    // estimator slack mirrors Dedup.minhashNearDups: the per-band
    // signature variance must not drop boundary pairs
    val tSafe = threshold - 0.1

    banded.groupByKey(_.bucket)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: String, rows: Iterator[BandedSig], state: GroupState[List[SigEntry]]) => {
          var members = state.getOption.getOrElse(Nil)
          var nMembers = members.size
          val out = List.newBuilder[BandVerdict]
          // micro-batch arrival order is not defined across partitions;
          // sorting by id makes replay deterministic and matches the
          // batch path's min-id canonical convention
          rows.toSeq.sortBy(_.id).foreach { row =>
            val hit = members.iterator
              .filter(m => agreement(m.sig, row.sig) >= tSafe)
              .reduceOption((a, b) => if (a.canonical <= b.canonical) a else b)
            val canonical = hit.map(_.canonical).getOrElse(row.id)
            out += BandVerdict(row.id, canonical)
            if (nMembers < maxPerBucket) {
              members = SigEntry(row.id, canonical, row.sig) :: members
              nMembers += 1
            }
          }
          state.update(members)
          out.result().iterator
        })
  }

  /** Reduce band verdicts to one (id, canonical_id) row per doc —
    * min across bands, batch aggregation on the sink output. */
  def resolveCanonical(verdicts: DataFrame): DataFrame =
    verdicts.groupBy(col("id"))
      .agg(min(col("canonical")).as("canonical_id"))

  /** md5-arithmetic streaming dedup — the oracle-replayable sibling of
    * [[bandVerdicts]] (the q202 technique; see
    * [[graft.dedup.Dedup.minhashCanonicalIdsMd5]] for the batch form):
    * signatures are md5-slice MinHash minima computed PER ROW with
    * array expressions (no pre-state aggregation — Structured
    * Streaming allows one stateful op, and it must be the bucket
    * state), band keys concatenate each band's integer minima, and the
    * match rule is an INTEGER agreement floor (≥ ceil(k·(tau−0.1))
    * equal components) so the whole arrival-order state machine
    * replays in SQL: a doc's verdict in a bucket is the minimum id
    * reachable through match edges to earlier-id members (the
    * insertion-time canonical propagation collapses to exactly that
    * closure when one micro-batch carries the corpus), and
    * [[resolveCanonical]] takes the min across bands. Token-less docs
    * carry no signature and are dropped — the batch sibling's
    * contract.
    *
    * State shape is [[bandVerdicts]]'s: k longs + a canonical per
    * member, `maxPerBucket`-capped buckets, O(bucket) work per
    * arrival. */
  def bandVerdictsMd5(docs: DataFrame, textCol: String, idCol: String,
                      tauMicros: Long = 950000L, shingleSize: Int = 1,
                      k: Int = 16, bands: Int = 2,
                      maxPerBucket: Int = 1000): Dataset[BandVerdict] = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(k % 4 == 0 && k % bands == 0,
      s"k=$k must split into 32-bit md5 slices and bands=$bands")
    val r = k / bands
    val agreeMin = graft.dedup.Dedup.md5AgreeMin(k, tauMicros).toInt
    val toks = Text.tokens(col(textCol))
    val units0 = if (shingleSize <= 1) toks else Text.shingles(toks, shingleSize)
    val units = array_distinct(units0)
    // per-row signature via a compiled flatMap kernel: one digest per
    // (unit, md5 group), four 32-bit slices per digest — byte-level
    // identical to Dedup.md5Slice / the DuckDB replay (Md5DedupSpec).
    // An expression-tree formulation (16 interpreted array_min ∘
    // transform folds) measured ~6× slower at sf0.1 because each fold
    // re-digested every unit.
    val banded = docs
      .select(col(idCol).cast("long").as("id"), units.as("us"))
      .as[(Long, Seq[String])]
      .flatMap { case (id, us) =>
        if (us == null || us.isEmpty) Iterator.empty
        else {
          val md = java.security.MessageDigest.getInstance("MD5")
          val mins = Array.fill(k)(Long.MaxValue)
          us.foreach { u =>
            var g = 0
            while (g < k / 4) {
              val digest = md.digest((u + ":" + g).getBytes("UTF-8"))
              var j = 0
              while (j < 4) {
                val v = ((digest(4 * j) & 0xffL) << 24) |
                  ((digest(4 * j + 1) & 0xffL) << 16) |
                  ((digest(4 * j + 2) & 0xffL) << 8) | (digest(4 * j + 3) & 0xffL)
                if (v < mins(g * 4 + j)) mins(g * 4 + j) = v
                j += 1
              }
              g += 1
            }
          }
          (0 until bands).iterator.map { b =>
            val key = b.toString + "|" +
              (b * r until (b + 1) * r).map(mins).mkString("|")
            BandedSig(key, id, mins)
          }
        }
      }

    def agreeCount(a: Array[Long], b: Array[Long]): Int = {
      var same = 0; var i = 0
      while (i < a.length) { if (a(i) == b(i)) same += 1; i += 1 }
      same
    }

    banded.groupByKey(_.bucket)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: String, rows: Iterator[BandedSig], state: GroupState[List[SigEntry]]) => {
          var members = state.getOption.getOrElse(Nil)
          var nMembers = members.size
          val out = List.newBuilder[BandVerdict]
          rows.toSeq.sortBy(_.id).foreach { row =>
            val hit = members.iterator
              .filter(m => agreeCount(m.sig, row.sig) >= agreeMin)
              .reduceOption((a, b) => if (a.canonical <= b.canonical) a else b)
            val canonical = hit.map(_.canonical).getOrElse(row.id)
            out += BandVerdict(row.id, canonical)
            if (nMembers < maxPerBucket) {
              members = SigEntry(row.id, canonical, row.sig) :: members
              nMembers += 1
            }
          }
          state.update(members)
          out.result().iterator
        })
  }
}
