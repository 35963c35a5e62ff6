package graft

import graft.streaming.Events
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Append-mode watermark semantics (q223): pins the measured late-data
  * contract of [[Events.hourlyCountsAppend]] on a hand-built
  * three-delivery stream —
  *
  *  - the late filter in trigger N uses trigger N−1's watermark (a
  *    "late" row in the SECOND delivery still merges, because nothing
  *    was evicted before it),
  *  - a replayed row whose window was already evicted is DROPPED (no
  *    duplicate window, no resurrected state),
  *  - every window emits exactly once, and only once the FINAL
  *    watermark passes its end.
  */
class LateDataSpec extends SparkSuite {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("event_type", StringType)))

  private def t(hhmm: String) =
    java.sql.Timestamp.valueOf(s"2024-03-01 $hhmm:00")

  test("one-trigger-lag filter, eviction drop, exactly-once emission") {
    val dir = java.nio.file.Files.createTempDirectory("latedata").toString
    // delivery 1: one row per hour 00:30 .. 10:30 -> wm after = 09:00
    val d1 = (0 to 10).map(h => (h.toLong, t(f"$h%02d:30"), "a"))
    // delivery 2: a late row (05:30; its window 06:00 is <= wm 09:00
    // but NOT yet evicted -> must merge) + a fresh row (10:45)
    val d2 = Seq((100L, t("05:30"), "a"), (101L, t("10:45"), "a"))
    // delivery 3: a replay into an EVICTED window (03:30 -> dropped),
    // a row whose window is still live (09:30 -> merges), and a fresh
    // row (11:50) that advances the final wm to 10:20
    val d3 = Seq((200L, t("03:30"), "a"), (201L, t("09:30"), "a"),
      (202L, t("11:50"), "a"))
    Seq(d1 -> "d=1", d2 -> "d=2", d3 -> "d=3").foreach { case (rows, n) =>
      rows.toDF("event_id", "ts", "event_type")
        .coalesce(1).write.parquet(s"$dir/$n")
    }
    Seq("d=1", "d=2", "d=3").zipWithIndex.foreach { case (n, i) =>
      new java.io.File(s"$dir/$n").listFiles()
        .foreach(_.setLastModified(1700000000000L + i * 60000L))
    }
    val sink = s"late_sink_${System.nanoTime()}"
    Events.withStatePartitions(spark, 4) {
      val q = Events.hourlyCountsAppend(
          spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
            .parquet(dir))
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      q.processAllAvailable(); q.stop()
    }
    val got = spark.table(sink)
      .select(date_format(col("window.end"), "HH:mm").as("e"), col("n_events"))
      .as[(String, Long)].collect().sorted.toSeq
    val want = Seq(
      "01:00" -> 1L, "02:00" -> 1L, "03:00" -> 1L,
      "04:00" -> 1L, // the 03:30 replay was DROPPED (evicted window)
      "05:00" -> 1L,
      "06:00" -> 2L, // delivery 2's "late" 05:30 merged (nothing evicted yet)
      "07:00" -> 1L, "08:00" -> 1L, "09:00" -> 1L,
      "10:00" -> 2L  // delivery 3's 09:30 merged into live state
      // 11:00/12:00 windows: end > final wm 10:20 -> never emitted
    ).map { case (e, n) => (e, n) }.sorted
    assert(got === want)
    // exactly-once: no duplicate (window, type) rows in the sink
    assert(got.map(_._1).distinct.size === got.size)
  }
}
