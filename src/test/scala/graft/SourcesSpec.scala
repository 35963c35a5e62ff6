package graft

import graft.core.{Csv2Source, JdbcQuerySource, JdbcTableSource, JsonLinesSource, LowercaseSource, OrcSource, ParquetSource, SourceRegistry}
import org.apache.spark.sql.types._
import java.nio.file.Files
import java.sql.DriverManager

/** S1-S4 through the registry — including a REAL JDBC round-trip
  * against an embedded Derby database (the same driver-dispatch shape
  * as the reference's ODBC extracts). */
class SourcesSpec extends SparkSuite {

  private lazy val derbyUrl = {
    val dir = Files.createTempDirectory("derby").toString
    val url = s"jdbc:derby:$dir/testdb;create=true"
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE plots (plot_id INT, status VARCHAR(20), area DOUBLE)")
    st.execute("INSERT INTO plots VALUES (1, 'done', 12.5), (2, 'planned', 7.25), (3, 'done', 3.0)")
    st.close(); conn.close()
    s"jdbc:derby:$dir/testdb"
  }

  test("S2 whole-table JDBC fetch via registry") {
    import spark.implicits._
    val reg = SourceRegistry(Map("plots" -> JdbcTableSource(derbyUrl, "plots")))
    val got = reg.load(spark, "plots")
    assert(got.columns.map(_.toLowerCase).toSeq === Seq("plot_id", "status", "area"))
    assert(got.count() === 3)
    assert(got.where($"STATUS" === "done").count() === 2)
  }

  test("LowercaseSource normalizes Derby's uppercased identifiers") {
    import spark.implicits._
    val reg = SourceRegistry(Map(
      "plots" -> LowercaseSource(JdbcTableSource(derbyUrl, "plots"))))
    val got = reg.load(spark, "plots")
    // Derby returns PLOT_ID/STATUS/AREA; downstream code is lowercase
    assert(got.columns.toSeq === Seq("plot_id", "status", "area"))
    assert(got.where($"status" === "done").count() === 2)
  }

  test("S1 pushed-down JDBC query via registry") {
    import spark.implicits._
    val reg = SourceRegistry(Map("done_plots" -> JdbcQuerySource(derbyUrl,
      "SELECT plot_id, area FROM plots WHERE status = 'done'")))
    val got = reg.load(spark, "done_plots")
    assert(got.count() === 2)
    assert(got.select($"AREA".cast("double")).as[Double].collect().sorted.toSeq === Seq(3.0, 12.5))
  }

  test("JSONL and ORC sources load through the registry with declared schemas") {
    import spark.implicits._
    val dir = Files.createTempDirectory("src2").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/docs.jsonl"),
      """{"doc_id": 1, "text": "alpha beta"}
        |{"doc_id": 2, "text": "gamma"}
        |not valid json at all
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    Seq((1L, "x"), (2L, "y")).toDF("id", "s").write.orc(s"$dir/t.orc")
    val reg = SourceRegistry(Map(
      "docs" -> JsonLinesSource(s"$dir/docs.jsonl", schema),
      "facts" -> OrcSource(s"$dir/t.orc")))
    val docs = reg.load(spark, "docs")
    // the malformed line becomes a NULL row (PERMISSIVE), not a failure
    assert(docs.count() === 3)
    assert(docs.where($"doc_id".isNotNull).as[(Long, String)].collect().toSet
      === Set((1L, "alpha beta"), (2L, "gamma")))
    assert(reg.load(spark, "facts").count() === 2)
  }

  test("S4/parquet dispatch and unknown-source error") {
    val dir = Files.createTempDirectory("src").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/d.csv"), "name;v\na;1,5\n")
    val schema = StructType(Seq(StructField("name", StringType), StructField("v", DoubleType)))
    import spark.implicits._
    val pq = Seq((1, "x")).toDF("id", "s")
    pq.write.mode("overwrite").parquet(s"$dir/p")
    val reg = SourceRegistry(Map(
      "dict" -> Csv2Source(s"$dir/d.csv", schema),
      "facts" -> ParquetSource(s"$dir/p")))
    assert(reg.load(spark, "dict").as[(String, Double)].collect().toSeq === Seq(("a", 1.5)))
    assert(reg.load(spark, "facts").count() === 1)
    val e = intercept[IllegalArgumentException] { reg.load(spark, "nope") }
    assert(e.getMessage.contains("registered: dict, facts"))
  }
}
