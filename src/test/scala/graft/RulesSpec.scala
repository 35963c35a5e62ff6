package graft

import graft.functions.JaccardFunctions
import graft.rules.JaccardLengthPruning
import org.apache.spark.sql.functions._

class RulesSpec extends SparkSuite {
  import spark.implicits._

  // parquet-backed so ConvertToLocalRelation cannot fold the Filter away
  private lazy val pairsPath = {
    val dir = java.nio.file.Files.createTempDirectory("rules").toString + "/pairs"
    Seq(
      (1L, Seq("a", "b", "c", "d", "e", "f", "g", "h"), Seq("a", "b")), // ratio 0.25 -> prunable
      (2L, Seq("a", "b", "c", "d"), Seq("a", "b", "c", "e")),           // J = 0.6
      (3L, Seq("a", "b", "c", "d"), Seq("a", "b", "c", "d"))            // J = 1.0
    ).toDF("id", "set_a", "set_b").write.parquet(dir)
    dir
  }
  private def pairs = spark.read.parquet(pairsPath)

  private def query = pairs
    .withColumn("jaccard", round(JaccardFunctions.jaccardSim(col("set_a"), col("set_b")), 6))
    .where(col("jaccard") >= 0.5)
    .select("id", "jaccard")

  test("rule injects size prefilters, is idempotent, and is sound") {
    val optimized = JaccardLengthPruning(query.queryExecution.optimizedPlan)
    val txt = optimized.toString
    assert(txt.contains("size("), s"prefilter missing in:\n$txt")
    assert(JaccardLengthPruning(optimized).toString === txt) // idempotent
    assert(query.as[(Long, Double)].collect().toSet === Set((2L, 0.6), (3L, 1.0)))
  }

  test("rule active on a live session preserves results end-to-end") {
    val before = query.as[(Long, Double)].collect().toSet
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ JaccardLengthPruning
    try {
      val q2 = query // fresh plan under the extended optimizer
      val planTxt = q2.queryExecution.optimizedPlan.toString
      assert(planTxt.contains("size("), s"rule inactive:\n$planTxt")
      assert(q2.as[(Long, Double)].collect().toSet === before)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == JaccardLengthPruning)
    }
  }
}
