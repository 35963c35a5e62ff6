package graft

import graft.pipelines.{InbovegPrepJob, VbiReconcileJob}
import org.apache.spark.sql.functions._

class E2E3JobSpec extends SparkSuite {
  import spark.implicits._

  test("E2 InbovegPrepJob: filter, completeness, flags, typed site vars") {
    val in = InbovegPrepJob.Inputs(
      header = Seq(
        ("r1", "HT31xx", "3130_aom"), ("r2", "HT31xx", "gh"),
        ("r3", "HT31xx", null), ("r9", "OTHER", "3140"))
        .toDF("recording_givid", "survey", "type_observed"),
      classif = Seq(("r1", "HT31xx", "3130_aom"), ("r4", "HT31xx", "3160"))
        .toDF("recording_givid", "survey", "type_observed"),
      qualifiers = Seq(
        ("r1", "depth", "water depth", "1,5"),
        ("r1", "secchi", "secchi depth", "<0,3"),
        ("r2", "class", "veg class", "K2"))
        .toDF("recording_givid", "var_code", "var", "value"),
      surveys = Seq("HT31xx"))
    val out = InbovegPrepJob.run(in)

    val flags = out.header.select("recording_givid", "suitable_mhq", "measured")
      .as[(String, Boolean, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(flags("r1") === ((true, true)))
    assert(flags("r2") === ((false, true)))  // gh -> unsuitable, but measured
    assert(flags("r3") === ((false, false)))
    assert(!flags.contains("r9"))            // other survey filtered out

    // completeness: r4 classified but no header row; r2/r3 have headers
    // but no classification record
    assert(out.checks("check_missing_header").select("recording_givid")
      .as[String].collect().toSeq === Seq("r4"))
    assert(out.checks("check_missing_classif").select("recording_givid")
      .as[String].collect().toSet === Set("r2", "r3"))

    val site = out.siteCharacteristics
      .select("recording_givid", "var_code", "is_below_LOQ", "value_adjusted")
      .as[(String, String, Boolean, Option[Double])].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(site(("r1", "depth")) === ((false, Some(1.5))))
    assert(site(("r1", "secchi")) === ((true, Some(0.15))))
    assert(site(("r2", "class")) === ((false, None)))
    assert(out.checks("check_dup_site_var").count() === 0)
  }

  test("E3 VbiReconcileJob: overlay, rules, manual merge, checks") {
    def rect(x0: Double, y0: Double, w: Double, h: Double) =
      Seq((x0, y0), (x0 + w, y0), (x0 + w, y0 + h), (x0, y0 + h))
    val in = VbiReconcileJob.Inputs(
      strata = Seq(
        (1, 1, 1, "4030"), (1, 1, 2, "2310"),  // periode 2 wins
        (2, 1, 2, "6510"),                     // map disagrees -> removed by rule2
        (3, 1, 2, null),                       // removed by rule1
        (4, 1, 2, "9999"))                     // no polygon -> unlocated check
        .toDF("plot_id", "segment_id", "periode", "type_observed"),
      coords = Seq((1, 10.0, 10.0), (2, 30.0, 10.0), (3, 10.0, 30.0), (4, 500.0, 500.0))
        .toDF("plot_id", "x", "y"),
      habitatPolygons = Seq(
        ("pA", rect(0, 0, 20, 20)), ("pB", rect(20, 0, 20, 20)), ("pC", rect(0, 20, 20, 20)))
        .toDF("polygon_id", "ring_raw")
        .select(col("polygon_id"), transform(col("ring_raw"),
          p => struct(p.getField("_1").as("x"), p.getField("_2").as("y"))).as("ring")),
      polygonTypes = Seq(("pA", "2310", 80.0), ("pB", "2330", 100.0), ("pC", "4030", 60.0))
        .toDF("polygon_id", "type", "phab"),
      manualVerdicts = Seq((2, "6510_manual")).toDF("plot_id", "type_observed"))

    val out = VbiReconcileJob.run(in, cellSize = 20.0)
    val finalTypes = out.typeObservedUpdate.as[(Int, String)].collect().toMap
    assert(finalTypes(1) === "2310")          // latest cycle + map-confirmed
    assert(finalTypes(2) === "6510_manual")   // manual verdict appended/overrides
    assert(!finalTypes.contains(3))
    val removed1 = out.removed("rule1_observed_type_known")
      .select("plot_id").distinct().as[Int].collect().toSet
    assert(removed1 === Set(3))
    val removed2 = out.removed("rule2_map_confirms")
      .select("plot_id").distinct().as[Int].collect().toSet
    assert(removed2 === Set(2))
    assert(out.checks("check_dup_final").count() === 0)
    assert(out.checks("check_unlocated_plots").select("plot_id")
      .as[Int].collect().toSet === Set(4))
  }
}
