package graft.tools

import graft.core.Tables
import graft.dedup.Dedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Round-3 profiler: q45 (canonical ids) + q46 (length-banded jaccard) at sf0.1. */
object ProfileR3 {
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
    for (i <- 1 to 3) {
      time(s"q45 canonical run$i")(println("  n = " +
        Dedup.minhashCanonicalIds(docs, "text", "doc_id", 0.95, 1, 2, 16)
          .where(col("canonical_id") =!= col("doc_id")).count()))
      time(s"q46 banded run$i")(println("  n = " +
        Dedup.blockedJaccardPairs(docs, "text", "doc_id", Seq("lang", "source"), 0.5).count()))
    }
    spark.stop()
  }
}
