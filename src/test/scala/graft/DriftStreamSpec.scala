package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** q205's cross-batch contract, which the single-batch oracle gate
  * cannot see: the live category profile ACCUMULATES across
  * micro-batches (Complete-mode streaming count), so the PSI report
  * after N batches equals the batch gate run over the union of those
  * batches — and a drift planted in a later shard flips the verdict
  * that the earlier shards alone would not.
  */
class DriftStreamSpec extends SparkSuite {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("event_id", LongType), StructField("event_type", StringType)))

  private def report(profile: org.apache.spark.sql.DataFrame,
                     ref: org.apache.spark.sql.DataFrame) =
    graft.streaming.DriftStream
      .psiFromProfile(profile, ref, "event_type", thresholdMicros = 200000L)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(4), r.getBoolean(5)))
      .toMap

  test("cross-batch accumulation: PSI after two shards = batch gate over their union") {
    val dir = java.nio.file.Files.createTempDirectory("driftstream").toString
    // reference window: balanced a/b
    val ref = Seq.tabulate(40)(i => (i.toLong, if (i % 2 == 0) "a" else "b"))
      .toDF("event_id", "event_type")
      .groupBy(col("event_type")).agg(count(lit(1)).as("c_ref"))
    // shard 1 is balanced; shard 2 is all-"a" (the planted drift)
    Seq.tabulate(20)(i => (100L + i, if (i % 2 == 0) "a" else "b"))
      .toDF("event_id", "event_type").coalesce(1).write.parquet(s"$dir/f=1")
    Seq.tabulate(20)(i => (200L + i, "a"))
      .toDF("event_id", "event_type").coalesce(1).write.parquet(s"$dir/f=2")

    val sink = s"drift_sink_${System.nanoTime()}"
    graft.streaming.Events.withStatePartitions(spark, 4) {
      val q = graft.streaming.DriftStream.profileStream(
          spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1").parquet(dir), "event_type")
        .writeStream.format("memory").queryName(sink)
        .outputMode("complete").start()
      q.processAllAvailable()
      q.stop()
    }
    val streamed = report(spark.table(sink), ref)

    // batch equivalent over the union of both shards
    val union = spark.read.parquet(s"$dir/f=1").unionByName(
      spark.read.parquet(s"$dir/f=2"))
    val batch = report(
      union.groupBy(col("event_type")).agg(count(lit(1)).as("c_cur")), ref)
    assert(streamed === batch)

    // the planted shard-2 skew (30 a / 10 b vs the balanced 20/20
    // reference) must cross the 0.2 alert threshold...
    assert(streamed("a")._4, s"expected drift verdict, got $streamed")
    // ...which shard 1 alone (balanced, zero PSI) would not: replay
    // only f=1 and assert the clean verdict
    val clean = report(
      spark.read.parquet(s"$dir/f=1")
        .groupBy(col("event_type")).agg(count(lit(1)).as("c_cur")), ref)
    assert(!clean("a")._4 && clean("a")._3 === 0L,
      s"balanced shard should show zero PSI, got $clean")
  }

  test("one-sided categories keep NULL terms through the profile join") {
    // category "c" exists only in the stream, "b" only in the
    // reference — both get a zero count on the missing side and a
    // NULL term (excluded from the total), the batch gate's exact
    // semantics for one-sided categories
    val ref = Seq(("a", 10L), ("b", 5L)).toDF("event_type", "c_ref")
    val profile = Seq(("a", 10L), ("c", 3L)).toDF("event_type", "c_cur")
    val rows = graft.streaming.DriftStream
      .psiFromProfile(profile, ref, "event_type", 200000L)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet === Set("a", "b", "c"))
    assert(rows("b").getLong(rows("b").fieldIndex("c_cur")) === 0L)
    assert(rows("c").getLong(rows("c").fieldIndex("c_ref")) === 0L)
    assert(rows("b").isNullAt(rows("b").fieldIndex("term_micros")))
    assert(rows("c").isNullAt(rows("c").fieldIndex("term_micros")))
  }
}
