package graft.io

import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** JSON-Lines corpus ingest — the de-facto interchange format for raw
  * training corpora (one JSON object per line, shards usually
  * gzipped). A §2.11 scale-layer source: the reference has no JSON
  * surface, but a user pointing this engine at a real corpus ingests
  * .jsonl.gz shard deliveries long before anything is parquet.
  *
  * Contract (the Csv2/Tables stance): schemas are always SUPPLIED,
  * never inferred — inference is a full extra scan of 100 TB before
  * the first useful byte, and silent re-typing is exactly the schema
  * drift `core.Tables` exists to catch. Two read modes:
  *
  *  - [[read]] (PERMISSIVE): malformed lines land whole in a
  *    `_corrupt_record` column with every data column null, so one
  *    truncated line in a million-shard delivery cannot kill the
  *    ingest job; the caller audits `_corrupt_record IS NOT NULL`
  *    rows (the q100 corpus-ingest convention) and decides.
  *  - [[readStrict]] (FAILFAST): any malformed line fails the read
  *    loudly — the precondition stance (S11/S12) for pipelines that
  *    must not proceed past a bad shard.
  *
  * Scale shape: gzip is not splittable, so parallelism is per shard
  * FILE — which is the layout a real corpus delivery has (thousands
  * of .jsonl.gz shards, each a map task). The decode is Spark's
  * codegen'd Jackson line parser, and the supplied schema prunes
  * parsing to the referenced columns.
  */
object Jsonl {

  /** The corrupt-line capture column appended by [[read]]. */
  val CorruptCol = "_corrupt_record"

  /** Read JSONL under `path` with the supplied `schema` plus a
    * [[CorruptCol]] string column: null for clean lines, the raw line
    * for malformed ones (whose data columns are all null). */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"supplied schema must not already contain $CorruptCol")
    spark.read
      .schema(StructType(schema.fields :+
        StructField(CorruptCol, StringType, nullable = true)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
  }

  /** Read JSONL with the supplied schema, failing LOUDLY on the first
    * malformed line (FAILFAST). */
  def readStrict(spark: SparkSession, path: String,
                 schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(path)

  /** STREAMING form of [[read]] — shard deliveries arriving over time
    * (each new .jsonl.gz file under `path` becomes part of the next
    * micro-batch), with the same PERMISSIVE corrupt-line capture: a
    * torn line in a streamed shard flows through as a
    * [[CorruptCol]]-marked row instead of killing the continuous
    * ingestion job, and the admission pipeline filters or audits it
    * exactly like the batch path (q217). */
  def readStream(spark: SparkSession, path: String,
                 schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"supplied schema must not already contain $CorruptCol")
    spark.readStream
      .schema(StructType(schema.fields :+
        StructField(CorruptCol, StringType, nullable = true)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
  }

  /** Write one JSON object per line under `path` (default gzip —
    * the shard format ingest expects back). Partition count is the
    * caller's: each partition becomes one .jsonl.gz shard. */
  def write(df: DataFrame, path: String, compression: String = "gzip"): Unit =
    df.write.mode("overwrite").option("compression", compression).json(path)
}
