package graft.io

import org.apache.spark.sql.functions.{col, input_file_name}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Raw-text corpus ingest — the OTHER common corpus delivery format
  * next to [[Jsonl]]: plain `.txt(.gz)` shards, either one document
  * per LINE (the line-corpus layout: sentence/paragraph corpora,
  * log-style dumps) or one document per FILE (scraped pages, books —
  * the layout where the filename IS the document key).
  *
  * Same stance as [[Jsonl]]: no schema inference question even arises
  * (a text line has no schema), parallelism is per shard FILE for
  * gzip (not splittable — which matches how deliveries arrive), per
  * split for uncompressed shards, and the decode is Spark's native
  * text reader (codegen'd, zero parsing cost). Line mode cannot
  * represent embedded newlines — that is the FORMAT's contract, not
  * a reader limitation; corpora with multi-line documents ship as
  * [[Jsonl]] or per-file text.
  */
object RawText {

  /** One document per LINE across every shard under `path`; column
    * `value` (Spark's text-source contract). Order is not meaningful
    * — consumers key on content (fingerprints) or attach provenance
    * via [[readFiles]]. */
  def readLines(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  /** One document per FILE: (`file`, `value`) with the full shard
    * path as the document key — `wholetext` keeps each file one row,
    * so a 100 TB crawl of small pages parallelizes per file and no
    * document is ever split across tasks. */
  def readFiles(spark: SparkSession, path: String): DataFrame =
    spark.read.option("wholetext", "true").text(path)
      .select(input_file_name().as("file"), col("value"))

  /** Write a single-string-column frame as text shards under `path`
    * (default gzip — the delivery format ingest expects back); one
    * partition = one shard. */
  def writeLines(df: DataFrame, path: String,
                 compression: String = "gzip"): Unit = {
    require(df.schema.fields.length == 1 &&
      df.schema.fields.head.dataType ==
        org.apache.spark.sql.types.StringType,
      s"text shards take exactly one string column, got ${df.schema.simpleString}")
    df.write.mode("overwrite").option("compression", compression).text(path)
  }
}
