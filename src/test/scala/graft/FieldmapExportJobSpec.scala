package graft

import graft.pipelines.FieldmapExportJob
import graft.pipelines.FieldmapExportJob.Inputs
import graft.io.Vc
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** E1 end-to-end on FIXTURES.md-shaped fixtures: union -> recode ->
  * latest-status -> type resolution -> QA assembly -> versioned write. */
class FieldmapExportJobSpec extends SparkSuite {
  import spark.implicits._

  private def inputs = Inputs(
    gridPointsByCycle = Seq(
      1 -> Seq(
        (1, "2020-01-01", "gedaan"), (1, "2020-06-01", "uitgevoerd"), // latest wins
        (2, "2020-02-01", "gepland")).toDF("plot_id", "date_status", "status_fieldwork"),
      2 -> Seq(
        (1, "2023-01-01", "done"), (3, "2023-03-01", "weird_status"))
        .toDF("plot_id", "date_status", "status_fieldwork")),
    squareObs = Seq((1, "2130")).toDF("plot_id", "type_observed_square"),
    circleObs = Seq((2, 1, "6510"), (2, 2, "6230"), (3, 1, "4030"))
      .toDF("plot_id", "segment_id", "type_observed_circle"),
    coverLong = Seq(
      (1, "herblayer", "CoverVeglayers", Some(1)),
      (2, "herblayer", "CoverVeglayers", Some(9)), // unmatched class -> check frame
      (3, "shrublayer", "CoverVeglayers", None: Option[Int]))
      .toDF("plot_id", "layer", "coverscale_name", "class_id"),
    coverScales = Seq(("CoverVeglayers", 1, "<1%", 0.5))
      .toDF("coverscale_name", "class_id", "cover_description", "cover_mean"),
    observerDates = Seq((1, "2020-06-02"), (2, "2020-02-05"))
      .toDF("plot_id", "date_assessment"))

  test("E1 job: full flow, checks, and versioned outputs") {
    val out = FieldmapExportJob.run(inputs)

    // latest status per (plot, cycle) + recode
    val status = out.sampleStatus
      .select("plot_id", "mon_cycle", "status_fieldwork")
      .as[(Int, Int, String)].collect().toSet
    assert(status === Set((1, 1, "done"), (2, 1, "planned"), (1, 2, "done"), (3, 2, "other")))

    // type resolution: square wins for plot 1; plot 2 mixed
    assert(out.checks("check_mixed_type").as[Int].collect().toSeq === Seq(2))
    assert(out.checks("check_dup_status").count() === 0)
    assert(out.checks("check_unmatched_scale").count() === 1)

    // QA: only plot 3 is incomplete (has a type but no cover record and
    // no assessment date); plot 2's unmatched cover CLASS is a separate
    // check frame, not a missing RECORD
    val qa = out.checkMissingData
      .select("plot_id", "has_type_observed", "has_cover", "has_assessment_date")
      .as[(Int, Boolean, Boolean, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(qa.keySet === Set(3))
    assert(qa(3) === ((3, true, false, false)))

    // versioned write round-trips
    val dir = Files.createTempDirectory("e1").toString
    FieldmapExportJob.write(out, dir)
    assert(Vc.read(spark, s"$dir/sample_status").count() === 4)
    assert(Vc.read(spark, s"$dir/cover_species").count() === 3)
    assert(Vc.read(spark, s"$dir/check_missing_data").count() === 1)
  }
}
