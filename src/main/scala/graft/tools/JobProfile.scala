package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev profiler: run queries (warm) and attribute wall time to each
  * Spark job by its call site ("collect at TokenShards.scala:253"), so
  * overhead-dominated multi-action queries show WHERE the seconds go.
  * The gap between consecutive jobs (and between query start and job 0)
  * is driver-side work: planning, codegen, local collects.
  *
  * `sbt "runMain graft.tools.JobProfile q235_release_delta [sfDir]"`
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val (queries, rest) = args.partition(_.startsWith("q"))
    val sfDir = rest.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var base = System.nanoTime()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, Double, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = Option(js.properties.getProperty("callSite.short"))
          .orElse(js.stageInfos.lastOption.map(_.name))
          .getOrElse("?")
        starts.put(js.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.remove(je.jobId)).foreach { case (t0, site) =>
          rows.add((je.jobId, (t0 - base) / 1e9, (System.nanoTime() - t0) / 1e9, site))
        }
      }
    })

    // warmup pass (JVM + codegen caches), not profiled
    queries.foreach { q =>
      try { graft.SparkEntry.queries(q)(spark, sfDir).count(); () }
      catch { case e: Throwable => println(s"warmup $q failed: $e") }
    }
    for (q <- queries) {
      rows.clear()
      base = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, sfDir).count()
      val total = (System.nanoTime() - base) / 1e9
      Thread.sleep(700) // listener bus is async
      import scala.jdk.CollectionConverters._
      val js = rows.asScala.toSeq.sortBy(_._1)
      println(f"== $q rows=$n total=$total%.2f s jobs=${js.size} " +
        f"in-job=${js.map(_._3).sum}%.2f s")
      js.foreach { case (id, off, t, site) =>
        println(f"  job $id%4d  @$off%6.2f  $t%6.2f s  $site")
      }
    }
    spark.stop()
  }
}
