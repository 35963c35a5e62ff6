package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — the multi-column data-skipping
  * path for the 100 TB target. A single-column sort gives parquet
  * row-group min/max pruning on ONE predicate column and destroys it
  * for every other; interleaving the bits of several normalized keys
  * clusters rows so every participating column's min/max stays tight
  * per file, and a scan with a selective predicate on ANY of them
  * skips most row groups.
  *
  * Everything here is a plain Column expression built from codegen'd
  * built-ins (casts, bit shifts, masks) — no UDF, no custom expression
  * needed; Catalyst folds the unrolled interleave into whole-stage
  * codegen. Bounds are caller-declared (table statistics the caller
  * owns), which keeps the z-value a pure per-row function: map-only,
  * deterministic, and replayable by any engine with integer bit ops.
  */
object Layout {

  /** One dimension of a z-order key: a numeric column with its
    * declared [lo, hi] domain. Values are clamped into the domain,
    * then scaled to an unsigned `bits`-wide integer grid cell. */
  final case class ZDim(column: Column, lo: Double, hi: Double)

  /** Normalize one dimension to its grid cell in [0, 2^bits).
    * Scales by 2^bits and clamps the top cell (v = hi) back down —
    * scaling by 2^bits - 1 would mis-bin exact grid points, because
    * e.g. (1.0/3.0)*3.0 < 1.0 in IEEE doubles and the floor lands one
    * cell low. floor (not round) keeps the cell replayable across
    * engines — round() tie rules differ, floor does not. */
  private def cell(d: ZDim, bits: Int): Column = {
    require(d.hi > d.lo, s"z-order dimension needs hi > lo, got [${d.lo}, ${d.hi}]")
    val maxCell = (1L << bits) - 1
    val clamped = least(greatest(d.column.cast("double"), lit(d.lo)), lit(d.hi))
    val scaled = (clamped - lit(d.lo)) / lit(d.hi - d.lo) * lit((1L << bits).toDouble)
    least(floor(scaled).cast("long"), lit(maxCell))
  }

  /** Morton code of `dims` at `bits` bits per dimension: bit b of
    * dimension i lands at position `b * dims.length + i`. Unrolled
    * into (bits × dims) shift/mask terms summed with bitwise OR —
    * constant-folded per row inside whole-stage codegen. */
  def zvalue(dims: Seq[ZDim], bits: Int = 16): Column = {
    require(dims.nonEmpty, "z-order needs at least one dimension")
    require(bits > 0 && bits * dims.length <= 63,
      s"bits * dims must fit a signed long, got $bits * ${dims.length}")
    val cells = dims.map(cell(_, bits))
    val terms = for {
      (c, i) <- cells.zipWithIndex
      b <- 0 until bits
    } yield shiftleft(shiftright(c, b).bitwiseAND(lit(1L)), b * dims.length + i)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Rewrite `df` into `files` z-clustered parquet files: range-exchange
    * on the z-value (one shuffle, AQE-samplable boundaries), sort each
    * shard by it, drop the helper column, write. Every output file then
    * covers a compact hyper-rectangle of the dimension space, which is
    * exactly what parquet footer min/max pruning needs. */
  def writeZOrdered(df: DataFrame, path: String, dims: Seq[ZDim],
                    files: Int, bits: Int = 16): Unit = {
    df.withColumn("__z", zvalue(dims, bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Per-file min/max envelope of `cols` (what a parquet footer would
    * record) — the skipping-effectiveness probe used by the spec and
    * available as a layout-audit report at scale. */
  def fileEnvelopes(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max")))
    df.groupBy(input_file_name().as("file")).agg(aggs.head, aggs.tail: _*)
  }

  /** Small-file compaction: rewrite `inputPath` as
    * ceil(totalBytes / targetBytes) files sorted on `sortKeys` —
    * the steady-state maintenance op for incrementally-ingested
    * tables, where every micro-batch adds a few files and scan
    * planning eventually dominates query time. Sizing uses the actual
    * on-disk file lengths (driver-side metadata listing only, no data
    * read); the rewrite itself is one range exchange. Returns the
    * target file count. */
  def compact(spark: org.apache.spark.sql.SparkSession,
              inputPath: String, outputPath: String,
              targetBytes: Long, sortKeys: Seq[String]): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    // overwrite-writes outputPath while lazily reading inputPath: the
    // same path — or a nested one, in either direction — would delete
    // input files mid-read
    val conf = spark.sparkContext.hadoopConfiguration
    val inP = new org.apache.hadoop.fs.Path(inputPath)
    val outP = new org.apache.hadoop.fs.Path(outputPath)
    val qIn = inP.getFileSystem(conf).makeQualified(inP).toString.stripSuffix("/")
    val qOut = outP.getFileSystem(conf).makeQualified(outP).toString.stripSuffix("/")
    require(qIn != qOut && !qIn.startsWith(qOut + "/") && !qOut.startsWith(qIn + "/"),
      s"compact cannot write onto (or under/over) its own input: $inputPath -> $outputPath")
    val df = spark.read.parquet(inputPath)
    val totalBytes = df.inputFiles.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      p.getFileSystem(conf).getFileStatus(p).getLen
    }.sum
    val n = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    df.repartitionByRange(n, sortKeys.map(col): _*)
      .sortWithinPartitions(sortKeys.map(col): _*)
      .write.mode("overwrite").parquet(outputPath)
    n
  }
}
