package graft

/** Dev aid: print scan/shuffle counts + formatted plan for one query.
  * `sbt "runMain graft.PlanCheck q174_dsir_select [sfDir]"` — the
  * numbers here are what ScanCountSpec pins.
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.PlanCheck <queryName> [sfDir]")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(args(0))(spark, sfDir)
    val plan = df.queryExecution.sparkPlan.toString
    val scans = "file:[^\\]\\s]*/(\\w+)\\.parquet".r.findAllMatchIn(plan).size
    val ex = df.queryExecution.executedPlan.toString
    val sh = "Exchange".r.findAllIn(ex).size - "BroadcastExchange".r.findAllIn(ex).size
    println(s"SCANS=$scans SHUFFLES=$sh")
    df.explain("formatted")
  }
}
