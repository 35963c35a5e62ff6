object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args) {
      try {
        val qe = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").queryExecution
        val sp = qe.sparkPlan.toString
        val ep = qe.executedPlan.toString
        val scans = "file:[^\\]\\s]*/(\\w+)\\.parquet".r.findAllMatchIn(sp).map(_.group(1)).toSeq
        val ex = "Exchange".r.findAllIn(ep).size - "BroadcastExchange".r.findAllIn(ep).size
        val bc = "BroadcastExchange".r.findAllIn(ep).size
        println(s"== $q scans=${scans.size} (${scans.groupBy(identity).map{case(k,v)=>s"$k:${v.size}"}.mkString(",")}) shuffles=$ex broadcasts=$bc")
      } catch { case e: Throwable => println(s"== $q ERROR ${e.getMessage}") }
    }
  }
}
