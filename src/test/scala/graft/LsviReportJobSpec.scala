package graft

import graft.pipelines.LsviReportJob
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end publish composition ([[LsviReportJob]]): the forest
  * group runs from the published detail-measurement replay to a result
  * directory whose FILE SET matches the reference's
  * `processed/lsvi_mhq/forests/result/` `_fs` family exactly — each
  * table a sorted TSV + git2rdata yml sidecar with the published sort
  * keys — and whose chain/status content matches the published values
  * where they are published.
  *
  * `passend_beheer` is synthesized (the reference draws it from an
  * unpublished management layer) so the `status_beheer` path runs; the
  * continuous `*_dikdoodhout` shapes need the unpublished tree-level
  * inventory and are fed separately ([[graft.lsvi.LsviStatus
  * .statusContinuous]], q125/q126), so they are not part of the job's
  * file-set contract.
  */
class LsviReportJobSpec extends SparkSuite {
  import spark.implicits._

  private val refDir = "/root/reference/processed/lsvi_mhq/forests/result"

  private def readTsv(name: String): DataFrame =
    spark.read
      .option("sep", "\t").option("header", "true").option("nullValue", "NA")
      .csv(s"$refDir/$name")

  private lazy val pubDetail = readTsv("lsvi_detail_fs.tsv").cache()

  private lazy val measurements =
    pubDetail.select(
      col("id"), col("voorwaarde"), col("waarde"),
      when(col("waarde_numeric").isNotNull, col("waarde").cast("double"))
        .as("value_numeric"),
      when(col("waarde_numeric").isNull, col("waarde")).as("value_category"))

  private lazy val plots =
    pubDetail.select("id", "type_analysis", "survey", "record_id_square",
      "record_id_circle", "type_observed", "plot_type").distinct()

  private lazy val meta =
    readTsv("lsvi_plot_fs.tsv")
      .select(col("id"), col("date").cast("int").as("date"),
        col("point_code"), col("x").cast("double").as("x"),
        col("y").cast("double").as("y"),
        col("in_sac").cast("int").as("in_sac"))
      // synthetic: exercises the status_beheer path (unpublished layer)
      .withColumn("passend_beheer",
        when(abs(hash(col("point_code"))) % 5 < 3, "ja").otherwise("nee"))
      .distinct()

  private lazy val outDir =
    java.nio.file.Files.createTempDirectory("lsvi-report").toString

  private lazy val written = LsviReportJob.run(plots, measurements,
    graft.lsvi.Versie3Forests.rulesDf(spark), meta, outDir,
    LsviReportJob.Config(suffix = "fs"))

  test("the written file set matches the published _fs family exactly") {
    written.size // force the run
    val mine = new java.io.File(outDir).listFiles().map(_.getName).toSet
    val pub = new java.io.File(refDir).listFiles().map(_.getName)
      .filter(_.matches(".*_fs\\.(tsv|yml)")).toSet
    assert(mine === pub, s"missing: ${pub -- mine}; extra: ${mine -- pub}")
  }

  test("every sidecar carries the published sort keys (column-filtered)") {
    written.foreach { case (name, df) =>
      val yml = java.nio.file.Files.readString(
        java.nio.file.Paths.get(s"$outDir/${name}_fs.yml"))
      val expected = LsviReportJob.sortKeys(name)
        .filter(df.columns.contains)
      val sortingBlock = yml.split("sorting:\n")(1)
        .split("  hash:")(0).split("\n").map(_.trim.stripPrefix("- ")).toSeq
        .filter(_.nonEmpty)
      assert(sortingBlock === expected, s"$name: $sortingBlock vs $expected")
    }
  }

  test("the written chain tables replay the published rows") {
    // lsvi_globaal: row-for-row verdict equality with the published table
    val mineG = spark.read
      .option("sep", "\t").option("header", "true").option("nullValue", "NA")
      .csv(s"$outDir/lsvi_globaal_fs.tsv")
    val pubG = readTsv("lsvi_globaal_fs.tsv")
    assert(mineG.count() === pubG.count())
    val badStatus = mineG.alias("m")
      .join(pubG.alias("p"), Seq("id", "type_analysis"))
      .where(!(col("m.status").cast("boolean") <=> col("p.status").cast("boolean")))
      .count()
    assert(badStatus === 0L)
    // lsvi_plot: the published plot table reproduces (ids + verdicts)
    val mineP = spark.read
      .option("sep", "\t").option("header", "true").option("nullValue", "NA")
      .csv(s"$outDir/lsvi_plot_fs.tsv")
    val pubP = readTsv("lsvi_plot_fs.tsv")
    assert(mineP.count() === pubP.count())
    val badPlot = mineP.alias("m").join(pubP.alias("p"), Seq("id"))
      .where(col("m.lsvi") =!= col("p.lsvi") ||
        col("m.habitattype") =!= col("p.habitattype") ||
        col("m.habitatsubtype") =!= col("p.habitatsubtype"))
      .count()
    assert(badPlot === 0L)
  }

  test("a second group (heath/inland dunes) runs end-to-end to the published _hs_id file set") {
    // same composition, different rule data and suffix — proves the
    // job is group-generic, not forests-shaped
    val hDir = "/root/reference/processed/lsvi_mhq/heath_inland_dunes/result"
    def readH(name: String): DataFrame = spark.read
      .option("sep", "\t").option("header", "true").option("nullValue", "NA")
      .csv(s"$hDir/$name")
    val hDetail = readH("lsvi_detail_hs_id.tsv").cache()
    val hMeasurements = hDetail.select(
      col("id"), col("type_analysis"), col("voorwaarde"), col("waarde"),
      col("plot_type"),
      col("waarde").cast("double").as("value_numeric"),
      lit(null).cast("string").as("value_category"),
      when(col("voorwaarde") === graft.lsvi.Versie3Heath.dynamicVoorwaarde,
        col("referentiewaarde").cast("double")).as("ref_override"))
      .distinct()
    val hPlots = hDetail.select("id", "type_analysis", "survey",
      "record_id_square", "record_id_circle", "type_observed").distinct()
    val hMeta = readH("lsvi_plot_hs_id.tsv")
      .select(col("id"), col("date").cast("int").as("date"), col("point_code"),
        col("x").cast("double").as("x"), col("y").cast("double").as("y"),
        col("in_sac").cast("int").as("in_sac"))
      .withColumn("passend_beheer",
        when(abs(hash(col("point_code"))) % 5 < 3, "ja").otherwise("nee"))
      .distinct()
    val hOut =
      java.nio.file.Files.createTempDirectory("lsvi-report-heath").toString
    LsviReportJob.run(hPlots, hMeasurements,
      graft.lsvi.Versie3Heath.rulesDf(spark), hMeta, hOut,
      LsviReportJob.Config(suffix = "hs_id"))
    val mine = new java.io.File(hOut).listFiles().map(_.getName).toSet
    val pub = new java.io.File(hDir).listFiles().map(_.getName)
      .filter(_.matches(".*_hs_id\\.(tsv|yml)")).toSet
    assert(mine === pub, s"missing: ${pub -- mine}; extra: ${mine -- pub}")
  }

  test("the rw mode reproduces the streams-published file set with weighted estimators") {
    // the streams group publishes lsvi_plot + the nine design-weighted
    // reporting shapes as `*_rw` (no chain tables, no status_beheer);
    // run the job in that mode (weights synthetic — the real ones are
    // unpublished) and require the file set to match the reference's
    // streams result directory exactly
    val rwDir = java.nio.file.Files.createTempDirectory("lsvi-report-rw").toString
    val metaW = meta.withColumn("weight",
      ((abs(hash(col("point_code"))) % 4 + 1).cast("double") * 0.25))
    LsviReportJob.run(plots, measurements,
      graft.lsvi.Versie3Forests.rulesDf(spark), metaW, rwDir,
      LsviReportJob.Config(suffix = "rw", weightCol = Some("weight"),
        tables = Some(LsviReportJob.streamsTables)))
    val mine = new java.io.File(rwDir).listFiles().map(_.getName).toSet
    val pub = new java.io.File("/root/reference/processed/lsvi_mhq/streams/result")
      .listFiles().map(_.getName).toSet
    assert(mine === pub, s"missing: ${pub -- mine}; extra: ${mine -- pub}")
  }

  test("the written status tables carry the validated stratum estimates") {
    // status_habitat stratum rows are plain proportions: the written
    // file must agree with the published single-subtype stratum rows
    val mine = spark.read
      .option("sep", "\t").option("header", "true").option("nullValue", "NA")
      .csv(s"$outDir/status_habitat_fs.tsv")
    val pub = readTsv("status_habitat_fs.tsv")
      .where(!col("habitatsubtype").contains(";") &&
        col("sbzh").isin("Binnen", "Buiten"))
    val joined = mine.alias("m").join(pub.alias("p"),
      col("m.habitattype") === col("p.habitatsubtype") &&
        col("m.sbzh") === col("p.sbzh"))
    assert(joined.count() === pub.count())
    val bad = joined.where(
      col("m.n_obs").cast("long") =!= col("p.n_obs").cast("long") ||
        abs(col("m.aandeel_gunstig").cast("double") -
          col("p.aandeel_gunstig").cast("double")) > 0.005)
      .count()
    assert(bad === 0L)
  }
}
