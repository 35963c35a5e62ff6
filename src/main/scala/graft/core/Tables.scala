package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table registry over the harness parquet star schema (TESTDATA.md).
  *
  * Mirrors the reference's "source registry" idea (SURVEY.md §2.1 S1-S3:
  * `/root/reference/src/export_from_fieldmap/query_fieldmap.Rmd:139-154`
  * dispatches an ODBC driver per file extension). Here the registry
  * dispatches on table name -> parquet path; a production deployment
  * would add jdbc/csv entries to the same map.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is INT64 TIMESTAMP(NANOS) — Spark has no nanosecond
      // timestamp type, so read the raw nanos and floor-convert to
      // microseconds (matches DuckDB's TIMESTAMP_NS -> epoch_us floor).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Lowercase-normalize all column names — the reference lowercases after
    * every fetch (`query_fieldmap.Rmd:156,203-204,251`). */
  def lowercased(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(_.toLowerCase(java.util.Locale.ROOT)).toIndexedSeq: _*)
}
