package graft

/** Dev aid: print scan/shuffle counts for one or more queries (plus
  * the formatted plan when exactly one is given).
  * `sbt "runMain graft.PlanCheck q174_dsir_select [q175_... ...]"` —
  * the numbers here are what ScanCountSpec pins. Non-query args (no
  * leading "q") are taken as the sf dir (default sf0.001).
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.PlanCheck <queryName...> [sfDir]")
    val (queries, dirs) = args.partition(_.startsWith("q"))
    val sfDir = dirs.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- queries) {
      val df = SparkEntry.queries(q)(spark, sfDir)
      val plan = df.queryExecution.sparkPlan.toString
      val scans = "file:[^\\]\\s]*/(\\w+)\\.parquet".r.findAllMatchIn(plan).size
      val ex = df.queryExecution.executedPlan.toString
      val sh = "Exchange".r.findAllIn(ex).size - "BroadcastExchange".r.findAllIn(ex).size
      println(s"PLANCHECK $q SCANS=$scans SHUFFLES=$sh")
      if (queries.length == 1) df.explain("formatted")
    }
    spark.stop()
  }
}
