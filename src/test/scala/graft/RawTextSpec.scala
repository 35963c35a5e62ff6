package graft

import graft.io.{Csv2, RawText}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Raw-text corpus shards (q215) and the semicolon-CSV delivery audit
  * twins (q216): line/file read modes, corrupt-line capture, and
  * write/read fidelity. */
class RawTextSpec extends SparkSuite {
  import spark.implicits._

  test("line mode round-trips shard content; gzip shards written") {
    val docs = Seq("alpha beta", "unicode éü 𝕏", "third line")
      .toDF("text")
    val dir = java.nio.file.Files.createTempDirectory("rawtext").toString
    RawText.writeLines(docs, s"$dir/out")
    val shards = new java.io.File(s"$dir/out").listFiles()
      .filter(_.getName.endsWith(".txt.gz"))
    assert(shards.nonEmpty, "expected gzipped text shards")
    val back = RawText.readLines(spark, s"$dir/out")
      .as[String].collect().toSet
    assert(back === Set("alpha beta", "unicode éü 𝕏", "third line"))
  }

  test("writeLines rejects multi-column frames (the format cannot carry them)") {
    val e = intercept[IllegalArgumentException] {
      RawText.writeLines(Seq((1L, "x")).toDF("id", "text"), "/tmp/nowhere")
    }
    assert(e.getMessage.contains("one string column"))
  }

  test("file mode: one row per file, filename is the document key") {
    val dir = java.nio.file.Files.createTempDirectory("rawtext_files").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "doc_a.txt"), "first doc\nspans lines")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "doc_b.txt"), "second doc")
    val got = RawText.readFiles(spark, dir)
      .select(regexp_extract(col("file"), "([^/]+)\\.txt$", 1), col("value"))
      .as[(String, String)].collect().toMap
    assert(got === Map(
      "doc_a" -> "first doc\nspans lines",
      "doc_b" -> "second doc"))
  }

  private val csvSchema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("score", DoubleType)))

  test("Csv2.readAudit captures malformed lines whole; decimal commas still cast") {
    val dir = java.nio.file.Files.createTempDirectory("csv_audit").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "shard.csv"),
      "id;name;score\n1;alpha;2,5\n2;torn;row;with;extra;fields\n3;beta;0,25\n")
    val back = Csv2.readAudit(spark, dir, csvSchema).cache()
    val bad = back.where(col(Csv2.CorruptCol).isNotNull)
    assert(bad.count() === 1)
    assert(bad.select(Csv2.CorruptCol).as[String].head()
      === "2;torn;row;with;extra;fields")
    assert(bad.where(col("id").isNotNull || col("name").isNotNull).count() === 0)
    val good = back.where(col(Csv2.CorruptCol).isNull)
      .select("id", "name", "score").as[(Long, String, Double)]
      .collect().toSet
    assert(good === Set((1L, "alpha", 2.5), (3L, "beta", 0.25)))
    back.unpersist()
  }

  test("Csv2.readStrict fails loudly on the first malformed line") {
    val dir = java.nio.file.Files.createTempDirectory("csv_strict").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "shard.csv"),
      "id;name;score\n1;ok;1,0\n2;broken;1;2;3\n")
    val e = intercept[org.apache.spark.SparkException] {
      Csv2.readStrict(spark, dir, csvSchema).collect()
    }
    assert(e.getMessage.toLowerCase.contains("malformed") ||
      Option(e.getCause).exists(_.getMessage.toLowerCase.contains("malformed")))
  }

  test("Csv2.readAudit rejects a schema already containing the corrupt column") {
    val bad = StructType(csvSchema.fields :+
      StructField(Csv2.CorruptCol, StringType))
    val e = intercept[IllegalArgumentException] {
      Csv2.readAudit(spark, "/tmp/nowhere", bad)
    }
    assert(e.getMessage.contains(Csv2.CorruptCol))
  }
}
