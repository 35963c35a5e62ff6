package graft.io

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.security.MessageDigest
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Versioned-table I/O — the git2rdata `write_vc`/`read_vc` output
  * contract (SURVEY.md §2.1 S5/S8): a deterministically sorted TSV plus
  * a sidecar carrying the schema, the declared sort key, and a SHA-256
  * of the sorted bytes, so any two runs producing the same data produce
  * byte-identical, diff-friendly files
  * (`/root/reference/src/export_from_fieldmap/query_fieldmap.Rmd:1959-1974`).
  *
  * Scale note: the byte-stable contract forces a total order and a
  * single writer task for the final file — correct for the reference's
  * 1e2-1e5-row curated outputs. Large fact tables should use
  * `writeSharded` (sorted within shards, manifest of shard hashes),
  * which keeps determinism without the single-task bottleneck.
  */
object Vc {

  private def sha256(path: java.nio.file.Path): String = {
    val md = MessageDigest.getInstance("SHA-256")
    val in = Files.newInputStream(path)
    try {
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n >= 0) { if (n > 0) md.update(buf, 0, n); n = in.read(buf) }
    } finally in.close()
    md.digest().map("%02x".format(_)).mkString
  }

  /** Write `df` as `<base>.tsv` + `<base>.schema.json` sidecar. */
  def write(df: DataFrame, base: String, sortKeys: Seq[String]): Unit = {
    val tmp = base + ".tmp"
    df.orderBy(sortKeys.map(col): _*)
      .coalesce(1)
      .write.mode(SaveMode.Overwrite)
      .option("sep", "\t").option("header", "true").option("nullValue", "NA")
      .csv(tmp)
    val partFile = Files.list(Paths.get(tmp)).filter(_.getFileName.toString.startsWith("part-"))
      .findFirst().orElseThrow(() => new IllegalStateException(s"no part file under $tmp"))
    val dest = Paths.get(base + ".tsv")
    Files.createDirectories(dest.toAbsolutePath.getParent)
    Files.move(partFile, dest, StandardCopyOption.REPLACE_EXISTING)
    Files.walk(Paths.get(tmp)).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(p => Files.deleteIfExists(p))
    // canonical schema: all-nullable (TSV round-trip cannot carry nullability)
    val schema = StructType(df.schema.fields.map(_.copy(nullable = true)))
    val meta =
      s"""{"schema": ${schema.json},
         | "sorting": [${sortKeys.map("\"" + _ + "\"").mkString(", ")}],
         | "data_hash": "${sha256(dest)}"}""".stripMargin
    Files.writeString(Paths.get(base + ".schema.json"), meta)
  }

  /** Read a `write`-produced table back with its declared schema and
    * verify the content hash (fails fast on corrupted data). */
  def read(spark: SparkSession, base: String): DataFrame = {
    val metaText = Files.readString(Paths.get(base + ".schema.json"))
    val hashInMeta = "\"data_hash\":\\s*\"([0-9a-f]{64})\"".r
      .findFirstMatchIn(metaText).map(_.group(1))
    val actual = sha256(Paths.get(base + ".tsv"))
    if (!hashInMeta.contains(actual))
      throw new IllegalStateException(
        s"$base.tsv content hash $actual does not match sidecar ${hashInMeta.orNull}")
    val schemaJson = metaText.substring(metaText.indexOf("{", metaText.indexOf("\"schema\"")))
    val schema = DataType.fromJson(
      schemaJson.substring(0, balancedEnd(schemaJson))).asInstanceOf[StructType]
    spark.read
      .option("sep", "\t").option("header", "true").option("nullValue", "NA")
      .schema(schema)
      .csv(base + ".tsv")
  }

  private def balancedEnd(s: String): Int = {
    var depth = 0
    var i = 0
    var inStr = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '"' && s.charAt(i - 1) != '\\') inStr = false }
      else c match {
        case '"' => inStr = true
        case '{' => depth += 1
        case '}' => depth -= 1; if (depth == 0) return i + 1
        case _ =>
      }
      i += 1
    }
    s.length
  }

  /** Scale path: sorted-within-shard parquet, repartitioned by range so
    * shard boundaries are deterministic; no single-task bottleneck. */
  def writeSharded(df: DataFrame, dir: String, sortKeys: Seq[String], shards: Int): Unit =
    df.repartitionByRange(shards, sortKeys.map(col): _*)
      .sortWithinPartitions(sortKeys.map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(dir)

  /** Scale path: hive-style partitioned parquet (SURVEY.md §4
    * "partition pruning — adopt: partition processed tables by
    * source/mon_cycle"). Readers filtering on `partitionCols` scan only
    * matching directories — verify with `prunesPartitions`. */
  def writePartitioned(df: DataFrame, dir: String, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(dir)

  /** True iff `df`'s scan carries a partition filter (pruning active). */
  def prunesPartitions(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan.toString
    val m = "PartitionFilters: \\[([^\\]]*)\\]".r.findFirstMatchIn(plan)
    m.exists(_.group(1).trim.nonEmpty)
  }
}
