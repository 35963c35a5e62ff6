package graft.io

import java.nio.file.{Files, Paths, StandardCopyOption}
import graft.pipelines.IncrementalUpdate
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Delta-style snapshot versioning over the Vc storage contract — the
  * S10 upgrade path (SURVEY.md §2.9: "implement as idempotent batch
  * MERGE"; reference flow:
  * `/root/reference/src/export_from_fieldmap/query_fieldmap_update_fieldwork2022.Rmd:945-1076`,
  * which read-unions-rewrites a single file and therefore has no
  * atomicity, no history, and no idempotent re-apply).
  *
  * Layout under `dir/`:
  *   v00001.tsv + v00001.yml             immutable snapshot files (Vc)
  *   manifest.json                       ordered snapshot log
  *
  * Guarantees:
  *   - snapshots are write-once; a merge NEVER rewrites an old version,
  *     so concurrent readers of v(n) are unaffected by the commit of
  *     v(n+1) and history stays queryable (time travel by version);
  *   - the manifest is committed by atomic rename — a crashed merge
  *     leaves at worst an orphaned (unreferenced) snapshot file, never
  *     a corrupt table;
  *   - merges carry a caller-supplied `batchId`: re-applying a batch
  *     that is already in the manifest is a no-op (idempotent re-runs,
  *     the property the reference's fieldwork-update flow lacks).
  *
  * At 100 TB the same protocol applies with `Vc.writeSharded` parquet
  * snapshots; only `snapshotBase` changes. The manifest stays tiny (one
  * row per batch) regardless of data scale.
  */
object VcSnapshots {

  final case class Entry(version: Int, batchId: String, dataHash: String)

  private def snapshotBase(dir: String, version: Int): String =
    Paths.get(dir, f"v$version%05d").toString

  private def manifestPath(dir: String) = Paths.get(dir, "manifest.json")

  private def hashOf(base: String): String = Vc.dataHash(base)

  /** Ordered snapshot log (oldest first); empty if uninitialized. */
  def entries(dir: String): Seq[Entry] = {
    val p = manifestPath(dir)
    if (!Files.exists(p)) return Seq.empty
    val text = Files.readString(p)
    val entry = ("\\{\\s*\"version\":\\s*(\\d+),\\s*\"batch_id\":\\s*\"([^\"]*)\"," +
      "\\s*\"data_hash\":\\s*\"([0-9a-f]*)\"\\s*\\}").r
    entry.findAllMatchIn(text)
      .map(m => Entry(m.group(1).toInt, m.group(2), m.group(3))).toSeq
      .sortBy(_.version)
  }

  /** Batch ids are manifest content: constrain them to a JSON-inert
    * charset up front so a quote or control character can never corrupt
    * the log (a corrupt entry would vanish from `entries()`, breaking
    * both idempotency and the write-once version counter). */
  private def checkBatchId(batchId: String): Unit =
    require(batchId.matches("[A-Za-z0-9._ :-]{1,100}"),
      s"batchId must match [A-Za-z0-9._ :-]{1,100}, got '$batchId'")

  private def writeManifest(dir: String, es: Seq[Entry]): Unit = {
    val body = es.map(e =>
        s"""{"version": ${e.version}, "batch_id": "${e.batchId}", "data_hash": "${e.dataHash}"}""")
      .mkString("{\"snapshots\": [\n  ", ",\n  ", "\n]}")
    val tmp = Paths.get(dir, "manifest.json.tmp")
    Files.writeString(tmp, body)
    try Files.move(tmp, manifestPath(dir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    catch { case _: java.nio.file.AtomicMoveNotSupportedException =>
      Files.move(tmp, manifestPath(dir), StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** Create the table with its first snapshot. */
  def init(df: DataFrame, dir: String, sortKeys: Seq[String],
           batchId: String = "init"): Int = {
    checkBatchId(batchId)
    require(entries(dir).isEmpty, s"$dir is already a snapshot table")
    Files.createDirectories(Paths.get(dir))
    val base = snapshotBase(dir, 1)
    Vc.write(df, base, sortKeys)
    writeManifest(dir, Seq(Entry(1, batchId, hashOf(base))))
    1
  }

  /** Idempotent batch merge: applies `incoming` onto the current
    * snapshot (guarded-append, or upsert with `replace = true` —
    * [[IncrementalUpdate.merge]] semantics incl. the overlap check and
    * key-uniqueness re-check) and commits a NEW snapshot. If `batchId`
    * was already merged, returns the current version without touching
    * anything. */
  def merge(spark: SparkSession, dir: String, incoming: DataFrame,
            keys: Seq[String], sortKeys: Seq[String], batchId: String,
            replace: Boolean = false): Int = {
    checkBatchId(batchId)
    val es = entries(dir)
    require(es.nonEmpty, s"$dir is not an initialized snapshot table")
    if (es.exists(_.batchId == batchId)) return es.last.version
    val current = Vc.read(spark, snapshotBase(dir, es.last.version))
    val merged = IncrementalUpdate.merge(current, incoming, keys, replace)
    val v = es.last.version + 1
    val base = snapshotBase(dir, v)
    Vc.write(merged, base, sortKeys)
    writeManifest(dir, es :+ Entry(v, batchId, hashOf(base)))
    v
  }

  /** Read the current snapshot, or a pinned historical `version`
    * (time travel — hash-verified like every Vc read). */
  def read(spark: SparkSession, dir: String, version: Option[Int] = None): DataFrame = {
    val es = entries(dir)
    require(es.nonEmpty, s"$dir is not an initialized snapshot table")
    val v = version.getOrElse(es.last.version)
    require(es.exists(_.version == v), s"no snapshot v$v under $dir")
    Vc.read(spark, snapshotBase(dir, v))
  }
}
