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
    if (name == "events") normalizeEventsTs(spark, readEvents(spark, dir))
    else spark.read.parquet(s"$dir/$name.parquet")

  /** Raw events read. `ts` has appeared as both INT64 TIMESTAMP(NANOS)
    * and plain TIMESTAMP(MICROS) across testdata generations; under
    * `nanosAsLong` the nanos variant surfaces as a raw long (Spark has no
    * nanosecond timestamp type) and the micros variant is unaffected. */
  private def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
  }

  /** Adapt `ts` to a proper TIMESTAMP on the OBSERVED type: a long is
    * raw nanos → floor-convert to microseconds (matches DuckDB's
    * TIMESTAMP_NS -> epoch_us floor); TIMESTAMP_NTZ (parquet micros with
    * isAdjustedToUTC=false, as pandas writes) → cast to TIMESTAMP — exact
    * under the UTC session timezone, and required by event-time features
    * (`withWatermark` rejects NTZ); TIMESTAMP passes through. Keeps every
    * events consumer green regardless of the harness's encoding. */
  def normalizeEventsTs(spark: SparkSession, df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }

  /** Lowercase-normalize all column names — the reference lowercases after
    * every fetch (`query_fieldmap.Rmd:156,203-204,251`). */
  def lowercased(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(_.toLowerCase(java.util.Locale.ROOT)).toIndexedSeq: _*)
}
