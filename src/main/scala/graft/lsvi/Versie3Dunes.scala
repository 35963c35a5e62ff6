package graft.lsvi

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The REAL LSVI Versie-3 rule content for the COASTAL-DUNE habitat
  * types (2120, 2130_had, 2130_hd, 2160, 2170, 2180, 2190_mp), read
  * off `/root/reference/processed/lsvi_mhq/coastal_dunes/result/` —
  * the fourth habitat group through the shared [[LsviForest]] engine.
  *
  * Validated against the published tables:
  *   - status 4,112/4,112 evaluable detail rows; verschilscore
  *     4,110/4,112 at 4 decimals (the 2 residuals are `bedekking
  *     rijshout` rows whose score implies a value/100 conversion the
  *     published data does not determine — same class of anomaly as the
  *     grassland group's mixed recording scales; the spec gates them);
  *   - the `WT` reference ("weinig talrijk"): score reference 1.85 on
  *     the 0-100 cover scale (solved exactly from the published score
  *     ladder: 0->1, 0.5->0.7297, 1->0.4595, 2->-0.0015, 5->-0.0321),
  *     with split status references — downward WT conditions verdict at
  *     <= 3, upward at >= 1.5 (the published met/unmet brackets are
  *     (2,5] and (1,1.5]); class-coded WT conditions verdict by
  *     membership: {Afwezig, zs, s, wt} for downward, its complement
  *     above wt for upward;
  *   - a zero numeric reference on a downward condition publishes 1.0
  *     when the value is 0 (absent = optimal), not a 0/0 NULL;
  *   - `sleutelsoorten` combines per type: the 2130_hd / 2130_had
  *     voorwaarde pairs are OR (max — 104/104 and 42/42 published
  *     rows), the 2120 / 2170 pairs are AND (min — 103/103, 50/50);
  *   - criterium aggregation exact on all 1,392 published rows;
  *     globaal exact except 20 `index_mean_crit` values scattered over
  *     the types (2170: 6, 2130_hd: 5, 2160: 5, 2120: 3, 2180: 1) —
  *     the same published-anomaly class as heath's 2330 pair: no
  *     aggregation of the published criterium table reproduces them.
  */
object Versie3Dunes {

  val habitattypes: Seq[String] = Seq("2120", "2130_had", "2130_hd", "2160",
    "2170", "2180", "2190_mp")

  val downVoorwaarden: Set[String] = Set(
    "bedekking alle mossen",
    "bedekking boomlaag",
    "bedekking invasief mos",
    "bedekking invasieve exoten",
    "bedekking overige exoten",
    "bedekking rijshout",
    "bedekking soorten pionierduingrasland",
    "bedekking structuurverstoring",
    "bedekking tredplanten",
    "bedekking verbossing",
    "bedekking vergrassing",
    "bedekking verruiging")

  /** The OR-combined voorwaarden (both 2130 sleutelsoorten pairs). */
  val orVoorwaarden: Set[String] = Set(
    "aantal sleutelsoorten droog tot vochtig duin",
    "aantal sleutelsoorten kalkrijk mosduin en pionier",
    "aantal sleutelsoorten mosduin en pionierduin",
    "aantal sleutelsoorten zuur duingrasland")

  /** WT scoring: continuous score reference on the 0-100 cover scale. */
  val wtScoreRef: Double = 1.85

  /** WT status thresholds: value-coded conditions verdict at these
    * bounds (down: met when <= 3; up: met when >= 1.5). */
  val wtStatusDown: Double = 3.0
  val wtStatusUp: Double = 1.5

  /** WT class-coded conditions: met-class set per voorwaarde. */
  val wtCategorical: Map[String, Seq[String]] = Map(
    "bedekking invasieve exoten" -> Seq("Afwezig", "zs", "s", "wt"),
    "bedekking vochtminnende soorten" -> Seq("wt", "t", "kb", "hb", "b", "d"))

  /** WT value-coded conditions (numeric measurement, WT reference). */
  val wtNumeric: Set[String] = Set(
    "bedekking structuurverstoring", "open plekken aanwezig",
    "aanwezigheid schorklif/breuksteenbestorting")

  // 61 rule rows read off processed/lsvi_mhq/coastal_dunes/result/lsvi_detail_cd.tsv
  val rules: Seq[(String, String, String, String, String, String, Double)] = Seq(
    ("2120", "Structuur", "(korst)moslaag", "zb", "bedekking alle mossen", "30", 100.0),
    ("2120", "Structuur", "dynamiek", "zb", "spontane verstuiving aanwezig", "1", 1.0),
    ("2120", "Structuur", "horizontale structuur", "b", "fijnmazige afwisseling", "1", 1.0),
    ("2120", "Structuur", "kruidlaag", "zb", "bedekking soorten pionierduingrasland", "30", 100.0),
    ("2120", "Structuur", "naakte bodem", "b", "afwisseling van begroeide en vegetatieloze duinen", "1", 1.0),
    ("2120", "Vegetatie", "sleutelsoorten", "b", "aantal sleutelsoorten", "1", 3.0),
    ("2120", "Vegetatie", "sleutelsoorten", "b", "aanwezigheid helm", "1", 1.0),
    ("2120", "Verstoring", "exoten", "b", "bedekking overige exoten", "10", 100.0),
    ("2120", "Verstoring", "rijshout", "b", "bedekking rijshout", "10", 100.0),
    ("2120", "Verstoring", "structuurverstoring", "b", "bedekking structuurverstoring", "WT", 100.0),
    ("2120", "Verstoring", "vergrassing", "zb", "bedekking vergrassing", "30", 100.0),
    ("2120", "Verstoring", "verruiging", "zb", "bedekking verruiging", "30", 100.0),
    ("2130_had", "Vegetatie", "bedekking sleutelsoorten", "b", "bedekking sleutelsoorten", "50", 100.0),
    ("2130_had", "Vegetatie", "sleutelsoorten", "b", "aantal sleutelsoorten mosduin en pionierduin", "4", 12.0),
    ("2130_had", "Vegetatie", "sleutelsoorten", "b", "aantal sleutelsoorten zuur duingrasland", "4", 12.0),
    ("2130_had", "Verstoring", "invasief mos", "zb", "bedekking invasief mos", "10", 100.0),
    ("2130_had", "Verstoring", "invasieve exoten", "zb", "bedekking invasieve exoten", "0", 100.0),
    ("2130_had", "Verstoring", "overbetreding", "b", "bedekking tredplanten", "10", 100.0),
    ("2130_had", "Verstoring", "verbossing", "b", "bedekking verbossing", "10", 100.0),
    ("2130_had", "Verstoring", "vergrassing", "zb", "bedekking vergrassing", "30", 100.0),
    ("2130_had", "Verstoring", "verruiging", "zb", "bedekking verruiging", "10", 100.0),
    ("2130_hd", "Vegetatie", "bedekking sleutelsoorten", "b", "bedekking sleutelsoorten", "50", 100.0),
    ("2130_hd", "Vegetatie", "sleutelsoorten", "b", "aantal sleutelsoorten droog tot vochtig duin", "4", 12.0),
    ("2130_hd", "Vegetatie", "sleutelsoorten", "b", "aantal sleutelsoorten kalkrijk mosduin en pionier", "4", 12.0),
    ("2130_hd", "Verstoring", "invasieve exoten", "zb", "bedekking invasieve exoten", "0", 100.0),
    ("2130_hd", "Verstoring", "overbetreding", "b", "bedekking tredplanten", "10", 100.0),
    ("2130_hd", "Verstoring", "overige exoten", "b", "bedekking overige exoten", "10", 100.0),
    ("2130_hd", "Verstoring", "verbossing", "b", "bedekking verbossing", "10", 100.0),
    ("2130_hd", "Verstoring", "vergrassing", "zb", "bedekking vergrassing", "30", 100.0),
    ("2130_hd", "Verstoring", "verruiging", "zb", "bedekking verruiging", "10", 100.0),
    ("2160", "Structuur", "horizontale structuur", "b", "aantal struweelsoorten", "2", 4.0),
    ("2160", "Structuur", "horizontale structuur", "b", "open plekken aanwezig", "WT", 100.0),
    ("2160", "Vegetatie", "sleutelsoorten", "b", "aantal sleutelsoorten talrijk", "5", 15.0),
    ("2160", "Verstoring", "invasieve exoten", "zb", "bedekking invasieve exoten", "WT", 1.0),
    ("2160", "Verstoring", "overige exoten", "b", "bedekking overige exoten", "10", 100.0),
    ("2160", "Verstoring", "verbossing", "b", "bedekking boomlaag", "10", 100.0),
    ("2170", "Vegetatie", "sleutelsoorten", "b", "aantal sleutelsoorten", "3", 9.0),
    ("2170", "Vegetatie", "sleutelsoorten", "b", "aanwezigheid kruipwilg", "1", 1.0),
    ("2170", "Verstoring", "invasieve exoten", "zb", "bedekking invasieve exoten", "WT", 1.0),
    ("2170", "Verstoring", "overige exoten", "b", "bedekking overige exoten", "10", 100.0),
    ("2170", "Verstoring", "verbossing", "b", "bedekking verbossing", "10", 100.0),
    ("2170", "Verstoring", "verruiging", "zb", "bedekking verruiging", "10", 100.0),
    ("2180", "Structuur", "aandeel dood hout", "b", "aandeel dood hout", "4", 100.0),
    ("2180", "Structuur", "bosconstantie", "zb", "bosconstantie", "100", 250.0),
    ("2180", "Structuur", "hoeveelheid dik dood hout", "zb", "aantal exemplaren dik dood hout per ha", "1", 3.0),
    ("2180", "Structuur", "horizontale structuur", "b", "aantal groeiklassen aanwezig", "3", 7.0),
    ("2180", "Structuur", "horizontale structuur", "b", "groeiklasse 7 aanwezig", "1", 1.0),
    ("2180", "Structuur", "horizontale structuur", "b", "natuurlijke mozaïekstructuur", "1", 1.0),
    ("2180", "Structuur", "horizontale structuur", "b", "schaalgrootte ingrepen (ha)", "1", 3.0),
    ("2180", "Structuur", "minimum structuurareaal", "zb", "MSA", "40", 120.0),
    ("2180", "Structuur", "verticale structuur", "b", "aantal vegetatielagen talrijk aanwezig", "4", 4.0),
    ("2180", "Vegetatie", "sleutelsoorten van de boom- en struiklaag", "b", "grondvlak sleutelsoorten boom- en struiklaag", "70", 100.0),
    ("2180", "Vegetatie", "sleutelsoorten van de kruidlaag", "b", "aantal sleutelsoorten kruidlaag", "8", 15.0),
    ("2180", "Verstoring", "invasieve exoten", "b", "bedekking invasieve exoten", "0", 100.0),
    ("2180", "Verstoring", "overige exoten", "b", "bedekking overige exoten", "30", 100.0),
    ("2180", "Verstoring", "verruiging", "zb", "bedekking verruiging", "30", 100.0),
    ("2190_mp", "Vegetatie", "sleutelsoorten", "b", "aantal sleutelsoorten", "3", 9.0),
    ("2190_mp", "Verstoring", "invasieve exoten", "zb", "bedekking invasieve exoten", "0", 100.0),
    ("2190_mp", "Verstoring", "verbossing", "b", "bedekking verbossing", "10", 100.0),
    ("2190_mp", "Verstoring", "verdroging", "zb", "bedekking vochtminnende soorten", "WT", 1.0),
    ("2190_mp", "Verstoring", "verruiging", "zb", "bedekking verruiging", "30", 100.0)
  )

  /** Shared rule-row -> engine-contract expansion for the WT-bearing
    * groups (coastal dunes and the moneos 1330_da schorren): the same
    * columns [[Versie3Forests.rulesDf]] established. A voorwaarde may
    * be numeric under one reference and class-coded under another, so
    * everything is keyed by (voorwaarde, referentiewaarde). */
  private[lsvi] def expandRules(spark: SparkSession,
      ruleRows: Seq[(String, String, String, String, String, String, Double)],
      down: Set[String], or: Set[String], noAgg: Set[String]): DataFrame = {
    import spark.implicits._
    val base = ruleRows.toDF("habitattype", "criterium", "indicator", "belang",
      "voorwaarde", "referentiewaarde", "theoretischmaximum")
    val catMet = typedLit(wtCategorical ++ Versie3Forests.categorical.map {
      case (k, (met, _)) => k -> met
    })
    val catRef = typedLit(
      wtCategorical.map { case (k, _) => k -> wtScoreRef } ++
        Versie3Forests.categorical.map { case (k, (_, ref)) => k -> ref })
    val isWt = col("referentiewaarde") === "WT"
    val isForestCat = col("referentiewaarde").isin("B", "ZS")
    val isCat = (isWt && !col("voorwaarde").isin(wtNumeric.toSeq: _*)) || isForestCat
    val opCol =
      when(col("voorwaarde").isin(down.toSeq: _*), "<=").otherwise(">=")
    val numericRef =
      when(col("referentiewaarde").rlike("^[0-9.]+$"),
        col("referentiewaarde").cast("double"))
    base
      .withColumn("op", opCol)
      .withColumn("ref_categories",
        when(isCat, element_at(catMet, col("voorwaarde"))))
      .withColumn("ref_numeric",
        when(isWt, lit(wtScoreRef))
          .when(isForestCat, element_at(catRef, col("voorwaarde")))
          .otherwise(numericRef))
      .withColumn("status_ref",
        when(isWt && !isCat,
          when(opCol === "<=", wtStatusDown).otherwise(wtStatusUp))
          .otherwise(col("ref_numeric")))
      .withColumn("score_max",
        when(isWt || isForestCat, lit(100.0)).otherwise(col("theoretischmaximum")))
      .withColumn("role",
        when(col("voorwaarde").isin(or.toSeq: _*), "or").otherwise("and"))
      .withColumn("aggregate", !col("indicator").isin(noAgg.toSeq: _*))
  }

  def rulesDf(spark: SparkSession): DataFrame =
    expandRules(spark, rules, downVoorwaarden, orVoorwaarden, Set.empty)
}
