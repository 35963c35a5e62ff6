package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** q196's cross-batch contract, which the single-batch oracle gate
  * cannot see: per-doc state accumulates contaminated shingles across
  * micro-batches (revisions emit the CUMULATIVE distinct count),
  * already-seen shingles never double-count, and clean docs neither
  * emit nor hold state. */
class DecontamStreamSpec extends SparkSuite {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  test("cross-batch state: revisions are cumulative, replays never double-count") {
    val dir = java.nio.file.Files.createTempDirectory("decontamstream").toString
    // bench 3-grams: {"a b c", "b c d"}
    val benchSh = Seq("a b c d").toDF("text")
      .select(graft.text.Text.tokens(col("text")).as("toks"))
      .select(explode(graft.text.Text.shingles(col("toks"), 3)).as("shingle"))
      .distinct()
    val words = graft.curation.Curate.bloomBits(benchSh, 1 << 12, 4)
    // batch 1: doc 10 shares "a b c"; batch 2: doc 10 arrives again
    // with "b c d" (new) AND "a b c" (already counted), doc 11 is
    // clean, doc 12 shares "a b c" twice in one doc (counts once)
    Seq((10L, "a b c z1 z2"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$dir/f=1")
    Seq((10L, "a b c d q2"), (11L, "p q r s"), (12L, "a b c a b c"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$dir/f=2")
    val name = s"decontam_sink_${System.nanoTime()}"
    val q = graft.streaming.DecontamStream.contaminationStream(spark,
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(dir),
        benchSh, words.toIndexedSeq, 4, 3, "text", "doc_id")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table(name).as[(Long, Long)].collect().toSeq
    // doc 10 emits twice (1, then the cumulative 2 — "a b c" is in
    // state and does not recount); doc 11 never emits; doc 12 counts
    // its repeated shingle once
    assert(got.sorted === Seq((10L, 1L), (10L, 2L), (12L, 1L)))
  }
}
