package graft

import graft.lsvi.Lsvi
import org.apache.spark.sql.functions._

class LsviSpec extends SparkSuite {
  import spark.implicits._

  private def rules = Seq(
    ("crit1", "indA", "v1", "b", ">=", Option(10.0), Option.empty[Seq[String]]),
    ("crit1", "indA", "v2", "b", "<", Option(5.0), Option.empty[Seq[String]]),
    ("crit1", "indB", "v3", "zb", "<=", Option(1.0), Option.empty[Seq[String]]),
    ("crit2", "indC", "v4", "b", "in", Option.empty[Double], Option(Seq("x", "y"))))
    .toDF("criterium", "indicator", "voorwaarde", "belang", "op",
      "ref_numeric", "ref_categories")

  private def meas(rows: (String, String, Option[Double], Option[String])*) =
    rows.toSeq.toDF("id", "voorwaarde", "value_numeric", "value_category")

  test("detail evaluates every operator data-driven") {
    val m = meas(
      ("p1", "v1", Some(12.0), None), ("p1", "v2", Some(3.0), None),
      ("p1", "v3", Some(0.5), None), ("p1", "v4", None, Some("x")))
    val d = Lsvi.detail(m, rules)
    val verdicts = d.select("voorwaarde", "voldoet").as[(String, Boolean)].collect().toMap
    assert(verdicts === Map("v1" -> true, "v2" -> true, "v3" -> true, "v4" -> true))
  }

  test("detailReport: published forest column set + verschilscore rescaling") {
    // rules enriched with the report columns (referentiewaarde char form,
    // theoretisch maximum), as in lsvi_detail_fs.yml
    val repRules = Seq(
      ("crit1", "indA", "v1", "b", ">=", Option(10.0), Option.empty[Seq[String]], "10", Option(20.0)),
      ("crit1", "indB", "v3", "zb", "<=", Option(1.0), Option.empty[Seq[String]], "1", Option(5.0)),
      ("crit2", "indC", "v4", "b", "in", Option.empty[Double], Option(Seq("x", "y")), "x, y", Option.empty[Double]))
      .toDF("criterium", "indicator", "voorwaarde", "belang", "op",
        "ref_numeric", "ref_categories", "referentiewaarde", "theoretisch_maximum")
    val m = Seq(
      ("p1", "v1", Some(15.0), Option.empty[String]), // met up: (15-10)/(20-10) = 0.5
      ("p2", "v1", Some(8.0), Option.empty[String]),  // unmet up: (8-10)/10 = -0.2
      ("p1", "v3", Some(0.25), Option.empty[String]), // met down: (1-0.25)/1 = 0.75
      ("p2", "v3", Some(2.0), Option.empty[String]),  // unmet down: (1-2)/(5-1) = -0.25
      ("p1", "v4", Option.empty[Double], Some("x")),  // met categorical: +1
      ("p2", "v4", Option.empty[Double], Some("z")))  // unmet categorical: -1
      .toDF("id", "voorwaarde", "value_numeric", "value_category")
      .withColumn("type_observed", lit("9120"))
      .withColumn("plot_type", lit("circle"))
      .withColumn("waarde", coalesce(col("value_category"),
        col("value_numeric").cast("string")))
    val rep = Lsvi.detailReport(m, repRules)
    // the exact column set of data_lsvi_forests.R:32's select
    assert(rep.columns.toSeq === Seq("id", "type_observed", "criterium",
      "indicator", "belang", "voorwaarde", "plot_type", "waarde",
      "waarde_numeric", "referentiewaarde", "status_voorwaarde",
      "theoretischmaximum", "verschilscore"))
    val scores = rep.select("id", "voorwaarde", "status_voorwaarde", "verschilscore")
      .as[(String, String, Boolean, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(scores(("p1", "v1")) === ((true, 0.5)))
    assert(scores(("p2", "v1")) === ((false, -0.2)))
    assert(scores(("p1", "v3")) === ((true, 0.75)))
    assert(scores(("p2", "v3")) === ((false, -0.25)))
    assert(scores(("p1", "v4")) === ((true, 1.0)))
    assert(scores(("p2", "v4")) === ((false, -1.0)))
    // theoretischmaximum rides through; categorical rows carry NA
    val maxima = rep.select("voorwaarde", "theoretischmaximum")
      .distinct().collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(maxima === Map("v1" -> Some(20.0), "v3" -> Some(5.0), "v4" -> None))
  }

  test("indicator = AND of conditions; unknown propagates, not drops") {
    val m = meas(
      ("p1", "v1", Some(12.0), None), ("p1", "v2", Some(9.0), None), // v2 fails -> indA false
      ("p2", "v1", None, None), ("p2", "v2", Some(3.0), None))       // v1 NA -> indA unknown
    val i = Lsvi.indicator(Lsvi.detail(m, rules))
    val byId = i.select("id", "indicator", "gunstig", "n_onbekend")
      .as[(String, String, Boolean, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(byId(("p1", "indA")) === ((false, 0L)))
    assert(byId(("p2", "indA")) === ((false, 1L)))
  }

  test("globaal: RapportageHR share rule with zb veto") {
    // p1: all four favorable -> gunstig
    // p2: only zb indicator unfavorable -> veto -> ongunstig despite 2/3 share
    val m = meas(
      ("p1", "v1", Some(12.0), None), ("p1", "v2", Some(3.0), None),
      ("p1", "v3", Some(0.5), None), ("p1", "v4", None, Some("y")),
      ("p2", "v1", Some(12.0), None), ("p2", "v2", Some(3.0), None),
      ("p2", "v3", Some(2.0), None), ("p2", "v4", None, Some("x")))
    val g = Lsvi.globaal(Lsvi.indicator(Lsvi.detail(m, rules)))
      .select("id", "lsvi", "n_zb_ongunstig", "aandeel_gunstig")
      .as[(String, String, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(g("p1")._2 === "gunstig")
    assert(g("p1")._4 === 100.0)
    assert(g("p2")._2 === "ongunstig")
    assert(g("p2")._3 === 1L)
    assert(math.abs(g("p2")._4 - 200.0 / 3) < 1e-6)
  }

  test("criterium = AND of its indicators") {
    val m = meas(
      ("p1", "v1", Some(12.0), None), ("p1", "v2", Some(3.0), None),
      ("p1", "v3", Some(9.0), None)) // indB fails -> crit1 false
    val c = Lsvi.criterium(Lsvi.indicator(Lsvi.detail(m, rules)))
      .select("criterium", "gunstig").as[(String, Boolean)].collect().toMap
    assert(c("crit1") === false)
  }

  test("Versie 3: class->value mapping (HT31xx_LSVI.Rmd:140-149) feeds the horst voorwaarde") {
    import graft.lsvi.Versie3
    val habitat = Seq(("r1", "3130"), ("r2", "3130"), ("r3", "3130"))
      .toDF("id", "habitattype")
    val sc = Seq(
      ("r1", "horst", "g10m²"), // -> 10.01-20 -> midpoint 15.005 -> >= 10 holds
      ("r2", "horst", "10m2"),  // -> 1-10 -> 5.5 -> fails
      ("r3", "horst", "1m2"))   // -> 0-0.99 -> 0.495 -> fails
      .toDF("id", "var_code", "value")
    val vw = Versie3.prepareVoorwaarden(habitat, sc)
    val values = vw.select("id", "value_numeric").as[(String, Double)].collect().toMap
    assert(values === Map("r1" -> 15.005, "r2" -> 5.5, "r3" -> 0.495))
    val verdicts = graft.lsvi.Lsvi.detailByType(vw, Versie3.rulesDf(spark))
      .select("id", "voldoet").as[(String, Boolean)].collect().toMap
    assert(verdicts === Map("r1" -> true, "r2" -> false, "r3" -> false))
  }

  test("Versie 3: VZuSS substitutes Vzuur on 3160 sites only; LOQ numerics halve") {
    import graft.lsvi.Versie3
    val habitat = Seq(("h1", "3160"), ("h2", "3130")).toDF("id", "habitattype")
    val sc = Seq(
      ("h1", "Vzuur", "40,0"),  // 3160: plain Vzuur dropped (not Versie-3 relevant)
      ("h1", "VZuSS", "<8,0"),  // 3160: becomes Vzuur, halved to 4.0 -> <= 10 holds
      ("h2", "Vzuur", "12,5"),  // 3130: plain Vzuur kept -> 12.5 -> fails
      ("h2", "VZuSS", "2,0"))   // non-3160 VZuSS dropped
      .toDF("id", "var_code", "value")
    val vw = Versie3.prepareVoorwaarden(habitat, sc)
      .where(col("voorwaarde") === "bedekking verzuring")
    val values = vw.select("id", "value_numeric").as[(String, Double)].collect().toMap
    assert(values === Map("h1" -> 4.0, "h2" -> 12.5))
    val verdicts = graft.lsvi.Lsvi.detailByType(vw, Versie3.rulesDf(spark))
      .select("id", "voldoet").as[(String, Boolean)].collect().toMap
    assert(verdicts === Map("h1" -> true, "h2" -> false))
  }

  test("Versie 3: taxon canonicalization + TANSLEY sleutelsoorten share") {
    import graft.lsvi.Versie3
    val habitat = Seq(("k1", "3140")).toDF("id", "habitattype")
    // Chara hispida L. canonicalizes to Chara major (a 3140 key species);
    // Elodea canadensis is not a key species. Share = 100*75/(75+35)
    val veg = Seq(
      ("k1", "Chara hispida L.", "d"),    // 75
      ("k1", "Elodea canadensis", "a"))   // 35
      .toDF("id", "name", "cover_code")
    val vw = Versie3.sleutelsoortenVoorwaarden(habitat, Versie3.soortenKenmerken(veg))
    val row = vw.select("voorwaarde", "value_numeric").as[(String, Double)].collect().head
    assert(row._1 === "aandeel sleutelsoorten")
    assert(math.abs(row._2 - 100.0 * 75 / 110) < 1e-6)
  }
}
