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
}
