package graft

import graft.streaming.{Events, IngestDedupStream}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming restart recovery (q229): two SEPARATE query starts over
  * one checkpoint + file sink. Pins the three guarantees the q229
  * oracle relies on, each on a row where it is NOT vacuous:
  *
  *  - state restoration: a fingerprint first seen in delivery A labels
  *    its delivery-B arrival `dup_in_delta` — only possible if the
  *    state store survived the stop/start;
  *  - source exactly-once: run 2 processes ONLY delivery B (run 1's
  *    rows are not re-emitted — output row count grows by exactly
  *    |B|);
  *  - sink exactly-once: the final read (through _spark_metadata)
  *    contains each doc exactly once.
  */
class RestartRecoverySpec extends SparkSuite {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  test("state, source offsets and sink commits all survive a restart") {
    val dir = java.nio.file.Files.createTempDirectory("restart").toString
    val src = s"$dir/src"; val out = s"$dir/out"; val ckpt = s"$dir/ckpt"
    val base = Seq((100L, "base doc y")).toDF("doc_id", "text")
    val baseFp = base.select(
      graft.text.Text.fingerprint(col("text")).as("fingerprint")).distinct()

    def run(): Unit = Events.withStatePartitions(spark, 4) {
      val q = IngestDedupStream.statusStream(spark,
          spark.readStream.schema(schema).parquet(src),
          baseFp, "text", "doc_id")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      q.processAllAvailable(); q.stop()
    }

    Seq((1L, "delta doc x"), (2L, "base doc y"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$src/d=1")
    run()
    val afterA = spark.read.parquet(out)
      .as[(Long, String, String)].collect()
    assert(afterA.length === 2)

    Seq((3L, "delta doc x"),   // dup of A's doc 1 -> needs RESTORED state
        (4L, "fresh doc z"), (5L, "fresh doc z"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$src/d=2")
    run()

    val finals = spark.read.parquet(out)
      .select("doc_id", "status").as[(Long, String)].collect()
    // sink exactly-once: each doc exactly once, A's rows not re-emitted
    assert(finals.length === 5)
    assert(finals.map(_._1).sorted.toSeq === Seq(1L, 2L, 3L, 4L, 5L))
    val byId = finals.toMap
    assert(byId(1L) === "new")
    assert(byId(2L) === "dup_of_base")
    assert(byId(3L) === "dup_in_delta") // the restored-state assertion
    assert(byId(4L) === "new")
    assert(byId(5L) === "dup_in_delta") // within-run-2 dup still works
  }
}
