package graft.tools

import graft.core.Tables
import graft.dedup.Dedup
import org.apache.spark.sql.SparkSession

/** One-off stage profiler for the MinHash-LSH near-dup pipeline. */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents")
    def time[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$what: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    time("full pipeline COLD")(println("  n = " +
      Dedup.minhashNearDups(docs, "text", "doc_id", 0.95, 1, 2, 16).count()))
    time("full pipeline WARM")(println("  n = " +
      Dedup.minhashNearDups(docs, "text", "doc_id", 0.95, 1, 2, 16).count()))
    spark.stop()
  }
}
