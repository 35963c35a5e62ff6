package graft

import graft.core.FactorDomain
import graft.pipelines.{Inboveg, Vbi}
import org.apache.spark.sql.functions._

class VbiInbovegSpec extends SparkSuite {
  import spark.implicits._

  test("K4 tree volume: per-type polynomial from broadcast params") {
    val trees = Seq((1L, 10L, 200.0, 20.0), (2L, 11L, 100.0, 10.0), (3L, 99L, 100.0, 10.0))
      .toDF("tree_id", "tree_species_id", "perimeter_cm", "height_m")
    val params = Seq(
      (10L, 1.0, 2.0, 3.0, 4.0, 0.0, 0.0, 1),   // type 1: 1 + 2c + 3c^2 + 4c^3
      (11L, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 2))   // type 2
      .toDF("tree_species_id", "a", "b", "c", "d", "e", "f", "formule_type")
    val got = Vbi.treeVolume(trees, params)
      .select("tree_id", "vol_m3").as[(Long, Option[Double])].collect().toMap
    // tree 1: c150=2 -> 1 + 4 + 12 + 32 = 49
    assert(got(1L) === Some(49.0))
    // tree 2: c150=1, h=10 -> 1 + 2 + 3 + 40 + 50 + 60 = 156
    assert(got(2L) === Some(156.0))
    // unknown species -> NULL volume, row kept
    assert(got(3L) === None)
  }

  test("E3: latest cycle + decision rules with removed-records reporting") {
    val strata = Seq(
      (1, 1, 2, "forest"), (1, 1, 3, "heath"), (2, 1, 2, "dune"))
      .toDF("plot_id", "segment_id", "periode", "landuse")
    val latest = Vbi.latestCycle(strata)
    assert(latest.count() === 2)
    assert(latest.where(col("plot_id") === 1).select("landuse")
      .as[String].collect().head === "heath")

    val (kept, removed) = Vbi.applyDecisionRules(latest, Seq(
      "rule1_no_dune" -> (col("landuse") =!= "dune"),
      "rule2_known_plot" -> col("plot_id").isNotNull))
    assert(kept.count() === 1)
    assert(removed("rule1_no_dune").count() === 1)
    assert(removed("rule2_known_plot").count() === 0)
  }

  test("E2: LOQ/numeric/class parsing of raw qualifier strings") {
    val raw = Seq("2,5", "<0,5", "> 10", "K2", "7").toDF("value")
    val got = Inboveg.parseStructureValues(raw)
      .select("value", "is_below_LOQ", "is_above_LOQ", "is_numeric", "value_numeric")
      .as[(String, Boolean, Boolean, Boolean, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    assert(got("2,5") === (("2,5", false, false, true, Some(2.5))))
    assert(got("<0,5") === (("<0,5", true, false, true, Some(0.5))))
    assert(got("> 10") === (("> 10", false, true, true, Some(10.0))))
    assert(got("K2") === (("K2", false, false, false, None)))
    assert(got("7") === (("7", false, false, true, Some(7.0))))

    val adj = Inboveg.loqAdjusted(Inboveg.parseStructureValues(raw))
      .where(col("value") === "<0,5").select("value_adjusted")
      .as[Double].collect().head
    assert(adj === 0.25)
  }

  test("E2: completeness anti-joins in both directions") {
    val classif = Seq("a", "b", "c").toDF("recording_givid")
    val measured = Seq("b", "c", "d").toDF("recording_givid")
    val (missingMeas, missingClassif) = Inboveg.completeness(classif, measured)
    assert(missingMeas.as[String].collect().toSet === Set("a"))
    assert(missingClassif.as[String].collect().toSet === Set("d"))
  }

  test("E2: HT3260 sitequal spread + header flags (Rmd:70-115,157-178)") {
    val header = Seq(("r1", "HT3260"), ("r2", "HT3260"), ("r3", "HT3260"), ("r4", "HT3260"))
      .toDF("recording_givid", "survey")
    val classif = Seq(("r1", "3260"), ("r2", "-9"), ("r3", "0"))
      .toDF("recording_givid", "value_code") // r4 unclassified -> NULL type
    val sitequal = Seq(
      ("r1", "Betrouwbaarheid opname: hoog", None),
      ("r2", "Betrouwbaarheid opname: matig", None),
      ("r2", "Geen opname: niet toegankelijk", Some("brug afgesloten")),
      ("r3", "Geen opname: drooggevallen", None))
      .toDF("recording_givid", "value", "comment")
    val all = Seq("r1", "r2", "r3", "r4").toDF("recording_givid")
    val noR3 = Seq("r1", "r2", "r4").toDF("recording_givid")
    val got = Inboveg.ht3260Header(header, classif, sitequal,
        structure = all, layerqual = noR3, vegetation = all)
      .select("recording_givid", "type_observed", "reliability",
        "reason_no_survey", "comment_not_measured", "suitable_mhq", "measured")
      .collect().map(r => r.getString(0) -> r).toMap
    // prefix strip + factor recode + flags
    assert(got("r1").getString(1) === "3260" && got("r1").getString(2) === "hoog")
    assert(got("r1").getBoolean(5) && got("r1").getBoolean(6))
    // "niet toegankelijk" recodes to "ongeschikt"; comment concatenates
    assert(got("r2").getString(1) === "gh")
    assert(got("r2").getString(3) === "ongeschikt")
    assert(got("r2").getString(4) === "ongeschikt; brug afgesloten")
    assert(!got("r2").getBoolean(5))
    // r3: reason present without comment; missing from layerqual -> not measured
    assert(got("r3").getString(4) === "drooggevallen" && !got("r3").getBoolean(6))
    // r4: no classification -> NULL type -> suitable NULL (reported, not false)
    assert(got("r4").isNullAt(1) && got("r4").isNullAt(5))
  }

  test("FactorDomain validates declared levels") {
    val df = Seq("3140", "gh", "9999", null).toDF("type_observed")
    val bad = FactorDomain.TypeObserved.violations(df, "type_observed")
      .as[String].collect()
    assert(bad.toSeq === Seq("9999"))
    intercept[graft.core.Checks.CheckFailed] {
      FactorDomain.TypeObserved.assertValid(df, "type_observed")
    }
  }
}
