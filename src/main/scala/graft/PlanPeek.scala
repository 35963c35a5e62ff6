package graft
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args) {
      val df = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      val scans = "file:[^\\]\\s]*/(\\w+)\\.parquet".r
        .findAllMatchIn(df.queryExecution.sparkPlan.toString).size
      val ex = df.queryExecution.executedPlan.toString
      val shuffles = "Exchange".r.findAllIn(ex).size -
        "BroadcastExchange".r.findAllIn(ex).size
      println(s"PLANPEEK $q scans=$scans shuffles=$shuffles")
    }
    spark.stop()
  }
}
