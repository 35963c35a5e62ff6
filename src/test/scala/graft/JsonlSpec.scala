package graft

import graft.io.Jsonl
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL corpus ingest (q209): supplied-schema reads, corrupt-line
  * capture, and write/read fidelity. */
class JsonlSpec extends SparkSuite {
  import spark.implicits._

  private val docSchema = StructType(Seq(
    StructField("id", LongType), StructField("text", StringType),
    StructField("score", DoubleType)))

  test("round trip preserves values: nulls, unicode, quotes, newlines") {
    val rows = Seq(
      (1L, "plain ascii", Option(1.5)),
      (2L, "quotes \" and \\ backslash", Option(-0.25)),
      (3L, "embedded\nnewline\tand tab", None),
      (4L, "unicode éü 𝕏 😀", Option(0.0)),
      (5L, null.asInstanceOf[String], Option(2.0)))
    val df = rows.toDF("id", "text", "score")
    val dir = java.nio.file.Files.createTempDirectory("jsonl_rt").toString
    Jsonl.write(df, s"$dir/out")
    // gzip shards actually written
    val shards = new java.io.File(s"$dir/out").listFiles()
      .filter(_.getName.endsWith(".json.gz"))
    assert(shards.nonEmpty, "expected gzipped jsonl shards")
    // cache: a query referencing ONLY the corrupt column off a raw
    // json read is disallowed (Spark's QUERY_ONLY_CORRUPT_RECORD rule)
    val back = Jsonl.read(spark, s"$dir/out", docSchema).cache()
    assert(back.where(col(Jsonl.CorruptCol).isNotNull).count() === 0)
    val got = back.select("id", "text", "score")
      .as[(Long, Option[String], Option[Double])].collect().toSet
    val want = rows.map { case (i, t, s) => (i, Option(t), s) }.toSet
    assert(got === want)
    back.unpersist()
  }

  test("permissive read captures malformed lines whole; clean lines parse") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl_bad").toString
    val f = new java.io.PrintWriter(s"$dir/shard.jsonl")
    f.println("""{"id": 1, "text": "good line", "score": 0.5}""")
    f.println("""{"id": 2, "text": "truncated""")
    f.println("""not json at all""")
    f.println("""{"id": 3, "text": "another good", "score": null}""")
    f.close()
    val back = Jsonl.read(spark, s"$dir/shard.jsonl", docSchema).cache()
    val bad = back.where(col(Jsonl.CorruptCol).isNotNull)
    assert(bad.count() === 2)
    // the raw line is preserved for the audit trail; data columns null
    assert(bad.select(Jsonl.CorruptCol).as[String].collect().toSet ===
      Set("""{"id": 2, "text": "truncated""", "not json at all"))
    assert(bad.where(col("id").isNotNull || col("text").isNotNull).count() === 0)
    val good = back.where(col(Jsonl.CorruptCol).isNull)
    assert(good.select("id").as[Long].collect().toSet === Set(1L, 3L))
    back.unpersist()
  }

  test("readStrict fails loudly on the first malformed line") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl_strict").toString
    val f = new java.io.PrintWriter(s"$dir/shard.jsonl")
    f.println("""{"id": 1, "text": "ok", "score": 1.0}""")
    f.println("""{broken""")
    f.close()
    val e = intercept[org.apache.spark.SparkException] {
      Jsonl.readStrict(spark, s"$dir/shard.jsonl", docSchema).collect()
    }
    assert(e.getMessage.toLowerCase.contains("malformed") ||
      Option(e.getCause).exists(_.getMessage.toLowerCase.contains("malformed")))
  }

  test("readStream: corrupt lines in later shard deliveries don't kill the stream") {
    // the q217 contract across micro-batches: shard 1 is clean,
    // shard 2 carries a torn line — the continuous job must keep
    // emitting clean rows and carry the corrupt one as a marked row
    val dir = java.nio.file.Files.createTempDirectory("jsonl_stream").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "a_shard1.jsonl"),
      """{"id": 1, "text": "first", "score": 1.0}""" + "\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "b_shard2.jsonl"),
      """{"id": 2, "text": "second", "score": 2.0}""" + "\n" +
        """{"id": 3, "text": "torn""" + "\n")
    val name = s"jsonl_stream_${System.nanoTime()}"
    val q = Jsonl.readStream(spark, dir, docSchema)
      .writeStream.format("memory").queryName(name).outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("jsonl_ck").toString)
      .start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table(name).cache()
    assert(rows.where(col(Jsonl.CorruptCol).isNull)
      .select("id").as[Long].collect().toSet === Set(1L, 2L))
    assert(rows.where(col(Jsonl.CorruptCol).isNotNull).count() === 1)
    rows.unpersist()
  }

  test("a schema already containing _corrupt_record is rejected") {
    val bad = StructType(docSchema.fields :+
      StructField(Jsonl.CorruptCol, StringType))
    val e = intercept[IllegalArgumentException] {
      Jsonl.read(spark, "/tmp/nowhere", bad)
    }
    assert(e.getMessage.contains(Jsonl.CorruptCol))
  }

  test("q209 shape: checksum changes when text is mangled") {
    // the content-checksum column is the part of the q209 gate that
    // catches encode/decode mangling — prove it actually moves
    val d = Seq((1L, "alpha", "en", "s", 5L), (2L, "beta", "en", "s", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    def checksum(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum(conv(substring(md5(col("text")), 1, 8), 16, 10)
        .cast("long"))).as[Long].collect().head
    assert(checksum(d) !==
      checksum(d.withColumn("text", concat(col("text"), lit(" ")))))
  }
}
