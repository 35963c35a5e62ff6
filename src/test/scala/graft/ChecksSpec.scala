package graft

import graft.core.Checks
import org.apache.spark.sql.functions._

class ChecksSpec extends SparkSuite {
  import spark.implicits._

  private lazy val path = {
    val dir = java.nio.file.Files.createTempDirectory("checks").toString + "/t"
    (1 to 100).map(i => (i.toLong, i % 10)).toDF("id", "v").write.parquet(dir)
    dir
  }
  private def df = spark.read.parquet(path)

  private def jobsDuring(f: => Unit): Int = {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val n = new java.util.concurrent.atomic.AtomicInteger()
    val l = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = n.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try { f; org.apache.spark.sql.GraftBridge.waitListenerBusEmpty(spark.sparkContext) }
    finally spark.sparkContext.removeSparkListener(l)
    n.get()
  }

  test("predicate reportRemoved matches the two-frame form") {
    val keep = col("v") =!= 0
    val twoFrame = Checks.reportRemoved(df, df.where(keep), "drop v=0")
    val onePass = Checks.reportRemoved(df, keep, "drop v=0")
    assert(onePass === twoFrame && onePass === ("drop v=0" -> 10L))
  }

  test("removalReport: sequential per-stage removals in one aggregation") {
    val rules = Seq(
      "v nonzero" -> (col("v") =!= 0),        // removes 10
      "v under 8" -> (col("v") < 8),          // removes 20 of the survivors
      "id not 1"  -> (col("id") =!= 1L))      // removes 1 survivor (id=1, v=1)
    val got = Checks.removalReport(df, rules)
    assert(got === Seq("v nonzero" -> 10L, "v under 8" -> 20L, "id not 1" -> 1L))
    // cross-check against the naive sequential filters
    val s1 = df.where(rules(0)._2)
    val s2 = s1.where(rules(1)._2)
    val s3 = s2.where(rules(2)._2)
    assert(df.count() - s1.count() === 10L)
    assert(s1.count() - s2.count() === 20L)
    assert(s2.count() - s3.count() === 1L)
  }

  test("removalReport job count does not grow with the number of rules") {
    df.count() // warm the footer cache so job counts are just the agg
    // (AQE materializes each exchange as its own job, so the absolute
    // count is >1 even for one pass; the one-pass property is that it
    // stays CONSTANT while the naive form scans once per rule)
    val one = jobsDuring(Checks.removalReport(df, Seq("a" -> (col("v") =!= 0))))
    val five = jobsDuring(Checks.removalReport(df, Seq(
      "a" -> (col("v") =!= 0), "b" -> (col("v") < 8), "c" -> (col("v") < 7),
      "d" -> (col("id") =!= 1L), "e" -> (col("id") < 95L))))
    assert(five === one, s"$five jobs for 5 rules vs $one for 1 — not one-pass")
  }
}
