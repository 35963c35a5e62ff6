package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed table storage for co-located joins (SURVEY.md §4 /
  * builder brief: "repartition()/bucketing for co-located joins").
  *
  * Writing both sides of a recurring big-big join bucketed (and
  * sorted) by the join key removes the per-query shuffle entirely:
  * the sort-merge join reads matching buckets file-locally. At 100 TB
  * this converts the dominant repeated cost (a full-data exchange per
  * run) into a one-time write-side layout decision — the batch
  * analogue of the reference's per-database key organization.
  */
object Bucketed {

  /** Persist `df` bucketed+sorted by `keys` as managed table `name`. */
  def write(df: DataFrame, name: String, buckets: Int, keys: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(name)

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** True iff the physical plan of `df` contains no shuffle exchange —
    * the co-location check used by tests and plan audits. */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange")
}
