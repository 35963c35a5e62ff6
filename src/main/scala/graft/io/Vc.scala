package graft.io

import graft.core.Materialize.StableOps
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.security.MessageDigest
import graft.core.FactorDomain
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

/** Versioned-table I/O — the git2rdata `write_vc`/`read_vc` output
  * contract (SURVEY.md §2.1 S5/S8): a deterministically sorted TSV plus
  * a YAML sidecar carrying the column classes (including factor-level
  * dictionaries), the declared sort key, the NA string convention, and
  * split `hash`/`data_hash` digests, so any two runs producing the same
  * data produce byte-identical, diff-friendly files
  * (`/root/reference/src/export_from_fieldmap/query_fieldmap.Rmd:1959-1974`;
  * sidecar shape mirrors `processed/fieldmap_mhq/cover_species.yml`).
  *
  * Sidecar fields, following the published .yml layout:
  *   - `..generic` block: format version, `optimize` flag (we store
  *     values verbatim — git2rdata's non-optimized mode), `NA string`,
  *     `sorting` list, `hash` (digest of the metadata descriptor: any
  *     schema drift changes it) and `data_hash` (digest of the TSV
  *     bytes: any data drift changes it). Digests are SHA-256 (the
  *     reference package uses SHA-1; documented deviation).
  *   - one block per column: `class` in git2rdata vocabulary
  *     (character / integer / numeric / logical / Date / POSIXct /
  *     factor); factors carry `labels`, `index` and `ordered`, and
  *     [[read]] enforces the level dictionary (a value outside the
  *     declared levels fails loudly — the round-trip keeps the factor
  *     contract, not just the strings). 64-bit integer columns carry
  *     `bits: 64` (R needs bit64 for these; documented extension).
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

  private def sha256(s: String): String = {
    val md = MessageDigest.getInstance("SHA-256")
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** git2rdata class name (+ extra attribute lines) for a Spark type. */
  private def classOf(dt: DataType): (String, Seq[String]) = dt match {
    case StringType => ("character", Nil)
    case IntegerType | ShortType | ByteType => ("integer", Nil)
    case LongType => ("integer", Seq("bits: 64"))
    case DoubleType => ("numeric", Nil)
    case FloatType => ("numeric", Seq("bits: 32"))
    case BooleanType => ("logical", Nil)
    case DateType => ("Date", Seq("origin: '1970-01-01'"))
    case TimestampType => ("POSIXct", Seq("origin: '1970-01-01 00:00:00'"))
    case other => throw new IllegalArgumentException(
      s"Vc cannot carry ${other.simpleString} through a TSV round-trip; " +
        "flatten or cast it first (the git2rdata contract is scalar columns)")
  }

  private def sparkTypeOf(cls: String, attrs: Map[String, String]): DataType = cls match {
    case "character" | "factor" => StringType
    case "integer" => if (attrs.get("bits").contains("64")) LongType else IntegerType
    case "numeric" => if (attrs.get("bits").contains("32")) FloatType else DoubleType
    case "logical" => BooleanType
    case "Date" => DateType
    case "POSIXct" => TimestampType
    case other => throw new IllegalStateException(s"unknown sidecar class '$other'")
  }

  /** YAML scalar: plain if inert, single-quoted (with '' escaping) else. */
  private def yamlScalar(s: String): String =
    if (s.nonEmpty && s.matches("[A-Za-z0-9_][A-Za-z0-9_ .\\-]*") && !s.endsWith(" ")) s
    else "'" + s.replace("'", "''") + "'"

  /** Per-column sidecar blocks (class + attrs; factor level dicts). */
  private def colBlocksOf(schema: StructType, factors: Seq[FactorDomain]): String = {
    val byName = factors.map(f => f.name -> f).toMap
    schema.fields.map { f =>
      byName.get(f.name) match {
        case Some(dom) =>
          val labels = dom.levels.map(l => s"  - ${yamlScalar(l)}").mkString("\n")
          val index = dom.levels.indices.map(i => s"  - ${i + 1}").mkString("\n")
          s"""${f.name}:
             |  class: factor
             |  labels:
             |$labels
             |  index:
             |$index
             |  ordered: ${if (dom.ordered) "yes" else "no"}""".stripMargin
        case None =>
          val (cls, attrs) = classOf(f.dataType)
          (s"${f.name}:\n  class: $cls" +: attrs.map("  " + _)).mkString("\n")
      }
    }.mkString("\n")
  }

  /** Write `df` as `<base>.tsv` + git2rdata-style `<base>.yml` sidecar.
    * Columns named in `factors` are validated against their level
    * dictionary BEFORE anything is written (git2rdata's write_vc errors
    * on unknown levels) and their dictionary rides in the sidecar. */
  def write(df: DataFrame, base: String, sortKeys: Seq[String],
            factors: Seq[FactorDomain] = Nil, naString: String = "NA"): Unit = {
    factors.foreach { f =>
      require(df.columns.contains(f.name), s"factor column '${f.name}' not in frame")
      require(df.schema(f.name).dataType == StringType,
        s"factor column '${f.name}' must be a string column")
      f.assertValid(df, f.name)
    }
    val tmp = base + ".tmp"
    // single-partition sort instead of orderBy+coalesce(1) (r22): a
    // global orderBy plans a range exchange whose boundary SAMPLING job
    // evaluates the whole upstream chain a second time before the real
    // pass — for report chains (q139's LSVI cascade) that doubled the
    // query. The single-file contract already collapses to one task,
    // so sorting INSIDE that task yields the same total order (sort
    // keys are each table's grain) with ONE upstream evaluation.
    val one = df.coalesce(1)
    val sorted1 =
      if (sortKeys.nonEmpty) one.sortWithinPartitions(sortKeys.map(col): _*)
      else one
    sorted1
      .write.mode(SaveMode.Overwrite)
      .option("sep", "\t").option("header", "true").option("nullValue", naString)
      .csv(tmp)
    val partFile = Files.list(Paths.get(tmp)).filter(_.getFileName.toString.startsWith("part-"))
      .findFirst().orElseThrow(() => new IllegalStateException(s"no part file under $tmp"))
    val dest = Paths.get(base + ".tsv")
    Files.createDirectories(dest.toAbsolutePath.getParent)
    Files.move(partFile, dest, StandardCopyOption.REPLACE_EXISTING)
    Files.walk(Paths.get(tmp)).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(p => Files.deleteIfExists(p))

    val colBlocks = colBlocksOf(df.schema, factors)
    // metadata digest: any change to columns, classes, levels, sorting
    // or the NA convention changes `hash`; `data_hash` covers the TSV
    val descriptor = colBlocks + "\nsorting: " + sortKeys.mkString(",") +
      "\nNA: " + naString
    val yml =
      s"""..generic:
         |  git2rdata: 0.5.1
         |  optimize: no
         |  NA string: ${yamlScalar(naString)}
         |  sorting:
         |${sortKeys.map(k => s"  - $k").mkString("\n")}
         |  hash: ${sha256(descriptor)}
         |  data_hash: ${sha256(dest)}
         |$colBlocks
         |""".stripMargin
    Files.writeString(Paths.get(base + ".yml"), yml)
  }

  /** Minimal parser for the sidecar shape [[write]] emits: top-level
    * keys own 2-space-indented `key: value` lines and `- item` lists. */
  private[io] def parseSidecar(text: String):
      Seq[(String, Map[String, String], Map[String, Seq[String]])] = {
    val blocks = scala.collection.mutable.ArrayBuffer
      .empty[(String, scala.collection.mutable.LinkedHashMap[String, String],
              scala.collection.mutable.LinkedHashMap[String, scala.collection.mutable.ArrayBuffer[String]])]
    var listKey: Option[String] = None
    def unquote(s: String): String =
      if (s.length >= 2 && s.startsWith("'") && s.endsWith("'"))
        s.substring(1, s.length - 1).replace("''", "'")
      else s
    text.split("\n").foreach { raw =>
      val line = raw.replaceAll("\\s+$", "")
      if (line.nonEmpty) {
        if (!line.startsWith(" ") && line.endsWith(":")) {
          blocks += ((line.dropRight(1),
            scala.collection.mutable.LinkedHashMap.empty,
            scala.collection.mutable.LinkedHashMap.empty))
          listKey = None
        } else if (line.startsWith("  - ")) {
          val (_, _, lists) = blocks.last
          val k = listKey.getOrElse(throw new IllegalStateException(
            s"list item outside a list in sidecar: $line"))
          lists.getOrElseUpdate(k, scala.collection.mutable.ArrayBuffer.empty) +=
            unquote(line.drop(4).trim)
        } else if (line.startsWith("  ")) {
          val t = line.trim
          val i = t.indexOf(':')
          val (k, v) = (t.substring(0, i), t.substring(i + 1).trim)
          val (_, scalars, lists) = blocks.last
          if (v.isEmpty) { listKey = Some(k); lists.getOrElseUpdate(k, scala.collection.mutable.ArrayBuffer.empty) }
          else { scalars(k) = unquote(v); listKey = None }
        }
      }
    }
    blocks.map { case (n, s, l) => (n, s.toMap, l.map { case (k, v) => k -> v.toSeq }.toMap) }.toSeq
  }

  /** Read a `write`-produced table back with its declared classes,
    * verify the content hash (fails fast on corrupted data), and
    * enforce factor-level dictionaries (a value outside the declared
    * levels is a loud failure, as in git2rdata's read_vc). Legacy
    * `.schema.json` sidecars (pre-yml tables) still read. */
  def read(spark: SparkSession, base: String): DataFrame = {
    if (!Files.exists(Paths.get(base + ".yml")) &&
        Files.exists(Paths.get(base + ".schema.json")))
      return readLegacy(spark, base)
    val blocks = parseSidecar(Files.readString(Paths.get(base + ".yml")))
    val generic = blocks.find(_._1 == "..generic").getOrElse(
      throw new IllegalStateException(s"$base.yml has no ..generic block"))
    val expectedHash = generic._2.getOrElse("data_hash",
      throw new IllegalStateException(s"$base.yml has no data_hash"))
    val actual = sha256(Paths.get(base + ".tsv"))
    if (expectedHash != actual)
      throw new IllegalStateException(
        s"$base.tsv content hash $actual does not match sidecar $expectedHash")
    val naString = generic._2.getOrElse("NA string", "NA")
    val cols = blocks.filterNot(_._1 == "..generic")
    val schema = StructType(cols.map { case (name, scalars, _) =>
      StructField(name, sparkTypeOf(scalars("class"), scalars), nullable = true)
    })
    val df = spark.read
      .option("sep", "\t").option("header", "true").option("nullValue", naString)
      .schema(schema)
      .csv(base + ".tsv")
    val factorDomains = cols.collect {
      case (name, scalars, lists) if scalars.get("class").contains("factor") =>
        FactorDomain(name, lists.getOrElse("labels", Nil),
          ordered = scalars.get("ordered").contains("yes"))
    }
    factorDomains.foreach(d => d.assertValid(df, d.name))
    df
  }

  private def readLegacy(spark: SparkSession, base: String): DataFrame = {
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

  /** data_hash recorded in a table's sidecar (yml or legacy json). */
  def dataHash(base: String): String = {
    val yml = Paths.get(base + ".yml")
    if (Files.exists(yml))
      parseSidecar(Files.readString(yml))
        .find(_._1 == "..generic").flatMap(_._2.get("data_hash")).getOrElse("")
    else {
      val meta = Files.readString(Paths.get(base + ".schema.json"))
      "\"data_hash\":\\s*\"([0-9a-f]{64})\"".r.findFirstMatchIn(meta)
        .map(_.group(1)).getOrElse("")
    }
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

  /** Order-independent distributed digest of `df` restricted to `cols`:
    * the exact-decimal SUM of per-row xxhash64 over null-explicit JSON
    * in sidecar column order. Any shard/partition layout of the same
    * rows yields the same digest, so the verified-read contract (S5)
    * survives the move from one sorted TSV to partitioned parquet. */
  private def dataDigest(df: DataFrame, cols: Seq[String]): String = {
    import org.apache.spark.sql.functions.{struct, sum, to_json, xxhash64}
    val opts = new java.util.HashMap[String, String]()
    opts.put("ignoreNullFields", "false") // {"a":null} must differ from {}
    val h = xxhash64(to_json(struct(cols.map(col): _*), opts))
    val r = df.select(sum(h.cast(DecimalType(38, 0))).as("s")).head()
    if (r.isNullAt(0)) "0" else r.getDecimal(0).toBigIntegerExact.toString
  }

  /** Scale path: hive-style partitioned parquet twin of [[write]]
    * (SURVEY.md §4 "partition pruning — adopt: partition processed
    * tables by source/mon_cycle") with the SAME sidecar contract —
    * column classes, factor dictionaries, sort key, `hash` over the
    * descriptor and a `data_hash` that is order-independent
    * ([[dataDigest]]) because parquet bytes are not canonical. The
    * sidecar lives at `<dir>/_vc.yml` (underscore-prefixed, so scan
    * file indexes ignore it). Readers filtering on `partitionCols`
    * list only matching directories — `VcPartitionedSpec` pins the
    * pruned file count, `prunesPartitions` checks a plan ad hoc. */
  def writePartitioned(df: DataFrame, dir: String, partitionCols: Seq[String],
                       sortKeys: Seq[String] = Nil,
                       factors: Seq[FactorDomain] = Nil,
                       naString: String = "NA"): Unit = {
    factors.foreach { f => f.assertValid(df, f.name) }
    val sorted =
      if (sortKeys.nonEmpty) df.sortWithinPartitions(sortKeys.map(col): _*)
      else df
    sorted.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(dir)
    val colBlocks = colBlocksOf(df.schema, factors)
    val descriptor = colBlocks + "\nsorting: " + sortKeys.mkString(",") +
      "\npartitioning: " + partitionCols.mkString(",") + "\nNA: " + naString
    // digest the files just WRITTEN (schema imposed, so partition
    // values are not re-inferred from directory names): one upstream
    // computation instead of two, and the digest covers what is
    // actually on disk — a corrupted write fails its own sidecar
    val back = df.sparkSession.read.schema(df.schema).parquet(dir)
    val yml =
      s"""..generic:
         |  git2rdata: 0.5.1
         |  optimize: no
         |  NA string: ${yamlScalar(naString)}
         |  sorting:
         |${sortKeys.map(k => s"  - $k").mkString("\n")}
         |  partitioning:
         |${partitionCols.map(k => s"  - $k").mkString("\n")}
         |  hash: ${sha256(descriptor)}
         |  data_hash: ${dataDigest(back, df.columns.toIndexedSeq)}
         |$colBlocks
         |""".stripMargin
    Files.writeString(Paths.get(dir, "_vc.yml"), yml)
  }

  /** Incremental append to a [[writePartitioned]] table — the
    * index-maintenance path (e.g. new embedding shards joining a
    * written IVFADC index, q192): the delta's rows land in their
    * hive partition directories via SaveMode.Append, and the
    * sidecar's `data_hash` is updated ARITHMETICALLY — the digest is
    * an exact integer SUM of per-row hashes ([[dataDigest]]), so
    * digest(base ∪ delta) = digest(base) + digest(delta) and the
    * append never rescans the base. That is the property that keeps
    * the verified-table contract affordable at 100 TB: maintenance
    * cost is O(delta), while `readPartitioned(verify = true)` remains
    * the full-scan audit and still validates the merged table
    * (`VcPartitionedSpec` pins the round trip).
    *
    * The delta must match the existing sidecar's column set — loud
    * fail otherwise (appending a drifted schema would corrupt the
    * descriptor contract, not just the digest). */
  def appendPartitioned(df: DataFrame, dir: String): Unit = {
    val blocks = parseSidecar(Files.readString(Paths.get(dir, "_vc.yml")))
    val generic = blocks.find(_._1 == "..generic").getOrElse(
      throw new IllegalStateException(s"$dir/_vc.yml has no ..generic block"))
    val cols = blocks.filterNot(_._1 == "..generic").map(_._1)
    require(df.columns.toSet == cols.toSet,
      s"append schema ${df.columns.toSeq.sorted} does not match sidecar " +
        s"columns ${cols.sorted} at $dir")
    val partitionCols = generic._3.getOrElse("partitioning", Nil)
    val sortKeys = generic._3.getOrElse("sorting", Nil)
    require(partitionCols.nonEmpty,
      s"$dir is not a partitioned table (no partitioning in sidecar)")
    val ordered = df.select(cols.map(col): _*)
    val sorted =
      if (sortKeys.nonEmpty) ordered.sortWithinPartitions(sortKeys.map(col): _*)
      else ordered
    sorted.write.mode(SaveMode.Append)
      .partitionBy(partitionCols: _*)
      .parquet(dir)
    val oldHash = BigInt(generic._2.getOrElse("data_hash",
      throw new IllegalStateException(s"$dir/_vc.yml has no data_hash")))
    val deltaHash = BigInt(dataDigest(ordered, cols))
    val old = Files.readString(Paths.get(dir, "_vc.yml"))
    Files.writeString(Paths.get(dir, "_vc.yml"),
      old.replace(s"data_hash: ${generic._2("data_hash")}",
        s"data_hash: ${(oldHash + deltaHash).toString}"))
  }

  /** Targeted delete from a [[writePartitioned]] table — the other
    * half of [[appendPartitioned]]'s maintenance story: rows matching
    * `pred` are removed by REWRITING ONLY the partitions that contain
    * them (dynamic partition overwrite), and the sidecar digest is
    * updated arithmetically — digest(base ∖ removed) = digest(base) −
    * digest(removed), so neither the digest nor the rewrite ever
    * touches an unaffected partition. At 100 TB the practical cost is
    * one codes-only scan to locate the affected partitions (pruned
    * further when `pred` constrains the partition column itself) plus
    * a rewrite of those partitions; `readPartitioned(verify = true)`
    * remains the full audit. */
  def deleteFromPartitioned(spark: SparkSession, dir: String,
                            pred: Column): Unit = {
    val blocks = parseSidecar(Files.readString(Paths.get(dir, "_vc.yml")))
    val generic = blocks.find(_._1 == "..generic").getOrElse(
      throw new IllegalStateException(s"$dir/_vc.yml has no ..generic block"))
    val cols = blocks.filterNot(_._1 == "..generic").map(_._1)
    val partitionCols = generic._3.getOrElse("partitioning", Nil)
    require(partitionCols.nonEmpty,
      s"$dir is not a partitioned table (no partitioning in sidecar)")
    val sortKeys = generic._3.getOrElse("sorting", Nil)
    val df = readPartitioned(spark, dir, verify = false)
    val removed = df.where(pred)
    val removedHash = BigInt(dataDigest(removed, cols))
    // affected partitions — bounded driver state (deletes are small)
    val cells = removed.select(partitionCols.map(col): _*).distinct().collect()
    if (cells.nonEmpty) {
      val cellPred = cells.map { r =>
        partitionCols.zipWithIndex
          .map { case (c, i) => col(c) === lit(r.get(i)) }
          .reduce(_ && _)
      }.reduce(_ || _)
      // eager checkpoint: the rewrite reads the very files it
      // overwrites — survivors must be materialized (they are the
      // affected partitions' remainder, small by assumption) before
      // the dynamic overwrite commits
      val kept = df.where(cellPred && !pred).select(cols.map(col): _*)
        .stable()
      val sorted =
        if (sortKeys.nonEmpty) kept.sortWithinPartitions(sortKeys.map(col): _*)
        else kept
      val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try
        sorted.write.mode(SaveMode.Overwrite)
          .partitionBy(partitionCols: _*)
          .parquet(dir)
      finally prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
      // a cell whose every row was removed has nothing in `kept`, so
      // dynamic overwrite never touches its directory — drop it
      val keptCells = kept.select(partitionCols.map(col): _*).distinct()
        .collect().map(_.toSeq).toSet
      cells.filterNot(r => keptCells.contains(r.toSeq)).foreach { r =>
        val sub = partitionCols.zipWithIndex
          .map { case (c, i) => s"$c=${r.get(i)}" }.mkString("/")
        val p = Paths.get(dir, sub)
        if (Files.exists(p))
          Files.walk(p).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
            .forEach(q => { Files.deleteIfExists(q); () })
      }
      val oldHash = BigInt(generic._2.getOrElse("data_hash",
        throw new IllegalStateException(s"$dir/_vc.yml has no data_hash")))
      val old = Files.readString(Paths.get(dir, "_vc.yml"))
      Files.writeString(Paths.get(dir, "_vc.yml"),
        old.replace(s"data_hash: ${generic._2("data_hash")}",
          s"data_hash: ${(oldHash - removedHash).toString}"))
    }
  }

  /** Compact FRAGMENTED partitions of a [[writePartitioned]] table —
    * the fourth leg of the maintenance story (write / append / delete
    * / compact): every [[appendPartitioned]] leaves one more small
    * file per touched partition, and after N shard arrivals a hot
    * partition is N delta files whose per-file open/footer cost
    * dominates the scan. Compaction rewrites ONLY partitions holding
    * more than `maxFilesPerPartition` data files (the
    * [[deleteFromPartitioned]] dynamic-overwrite machinery pointed at
    * fragmentation instead of rows): their rows are materialized
    * (they are the fragmented slice, small relative to the table),
    * re-sorted per the sidecar sort key, and dynamically overwritten
    * as one file per partition. The row set is IDENTICAL, so the
    * sidecar — including the order-independent arithmetic
    * `data_hash` — is untouched by construction, untouched partitions
    * keep their files (and mtimes), and `readPartitioned(verify =
    * true)` still passes. Returns the partition-value rows that were
    * rewritten (bounded driver state, like delete's cell list). */
  def compactPartitioned(spark: SparkSession, dir: String,
                         maxFilesPerPartition: Int = 1): Seq[Seq[String]] = {
    require(maxFilesPerPartition >= 1,
      s"need maxFilesPerPartition >= 1, got $maxFilesPerPartition")
    val blocks = parseSidecar(Files.readString(Paths.get(dir, "_vc.yml")))
    val generic = blocks.find(_._1 == "..generic").getOrElse(
      throw new IllegalStateException(s"$dir/_vc.yml has no ..generic block"))
    val cols = blocks.filterNot(_._1 == "..generic").map(_._1)
    val partitionCols = generic._3.getOrElse("partitioning", Nil)
    require(partitionCols.nonEmpty,
      s"$dir is not a partitioned table (no partitioning in sidecar)")
    val sortKeys = generic._3.getOrElse("sorting", Nil)
    // walk the hive layout for fragmented leaves: <dir>/p1=v1/.../pk=vk
    // holding > maxFilesPerPartition part files. Directory listing is
    // driver-side but O(partitions), the same cost class as the file
    // index every scan of the table already builds.
    def leaves(p: java.io.File, depth: Int): Seq[java.io.File] =
      if (depth == partitionCols.length) Seq(p)
      else Option(p.listFiles()).getOrElse(Array.empty).toSeq
        .filter(c => c.isDirectory &&
          c.getName.startsWith(partitionCols(depth) + "="))
        .flatMap(c => leaves(c, depth + 1))
    val fragmented = leaves(new java.io.File(dir), 0).filter { leaf =>
      Option(leaf.listFiles()).getOrElse(Array.empty)
        .count(_.getName.startsWith("part-")) > maxFilesPerPartition
    }
    if (fragmented.isEmpty) return Nil
    // partition values from the fragmented leaves' directory names
    val base = Paths.get(dir)
    val values: Seq[Seq[String]] = fragmented.map { leaf =>
      val rel = base.relativize(leaf.toPath)
      (0 until partitionCols.length)
        .map(i => rel.getName(i).toString.split("=", 2)(1))
    }
    val df = readPartitioned(spark, dir, verify = false)
    // literal-side cast keeps the predicate foldable, so the rewrite's
    // own read PRUNES to the fragmented partitions' files
    val cellPred = values.map { vs =>
      partitionCols.zip(vs)
        .map { case (c, v) =>
          col(c) === lit(v).cast(df.schema(c).dataType) }
        .reduce(_ && _)
    }.reduce(_ || _)
    // eager checkpoint: the rewrite reads the very files it replaces
    // (the delete-path contract)
    val kept = df.where(cellPred).select(cols.map(col): _*)
      .stable()
    val sorted =
      if (sortKeys.nonEmpty)
        kept.repartition(partitionCols.map(col): _*)
          .sortWithinPartitions(sortKeys.map(col): _*)
      else kept.repartition(partitionCols.map(col): _*)
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try
      sorted.write.mode(SaveMode.Overwrite)
        .partitionBy(partitionCols: _*)
        .parquet(dir)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    values
  }

  /** Verified read of a [[writePartitioned]] table: restores the
    * sidecar column order and classes (the partition column comes back
    * from directory names, so its sidecar class wins over inference),
    * enforces factor dictionaries, and — when `verify` — recomputes
    * [[dataDigest]] against the sidecar. `verify` is a full scan; at
    * 100 TB leave it off on the hot path (or verify a partition slice)
    * the same way the reference only re-hashes on explicit checks. */
  def readPartitioned(spark: SparkSession, dir: String,
                      verify: Boolean = true): DataFrame = {
    val blocks = parseSidecar(Files.readString(Paths.get(dir, "_vc.yml")))
    val generic = blocks.find(_._1 == "..generic").getOrElse(
      throw new IllegalStateException(s"$dir/_vc.yml has no ..generic block"))
    val cols = blocks.filterNot(_._1 == "..generic")
    // impose the sidecar schema on the read: partition-column values
    // are then parsed per their declared class instead of re-inferred
    // from directory names (inference would turn a STRING partition
    // value "0123" into int 123 and corrupt the round trip)
    val schema = StructType(cols.map { case (name, scalars, _) =>
      StructField(name, sparkTypeOf(scalars("class"), scalars), nullable = true)
    })
    val raw = spark.read.schema(schema).parquet(dir)
    val df = raw.select(cols.map { case (name, _, _) => col(name) }: _*)
    if (verify) {
      val expected = generic._2.getOrElse("data_hash",
        throw new IllegalStateException(s"$dir/_vc.yml has no data_hash"))
      val actual = dataDigest(df, cols.map(_._1))
      if (expected != actual) throw new IllegalStateException(
        s"partitioned table $dir data digest $actual does not match " +
          s"sidecar $expected")
    }
    val factorDomains = cols.collect {
      case (name, scalars, lists) if scalars.get("class").contains("factor") =>
        FactorDomain(name, lists.getOrElse("labels", Nil),
          ordered = scalars.get("ordered").contains("yes"))
    }
    factorDomains.foreach(d => d.assertValid(df, d.name))
    df
  }

  /** True iff `df`'s scan carries a partition filter (pruning active). */
  def prunesPartitions(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan.toString
    val m = "PartitionFilters: \\[([^\\]]*)\\]".r.findFirstMatchIn(plan)
    m.exists(_.group(1).trim.nonEmpty)
  }
}
