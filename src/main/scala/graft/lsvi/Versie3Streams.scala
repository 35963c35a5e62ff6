package graft.lsvi

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The REAL LSVI Versie-3 rule content for the STREAMS habitat type
  * (3260, lowland rivers with water-crowfoot vegetation) — the seventh
  * and final habitat group the reference publishes result tables for,
  * read off `/root/reference/processed/inboveg_mhq_aq/HT3260_ResDetail
  * .tsv` and validated against the published chain
  * (`HT3260_ResInd.tsv`, `lsvi_mhq/streams/result/lsvi_plot_rw.tsv`,
  * `status_indicatoren_rw.tsv`); prep contract from
  * `src/export_from_inboveg/HT3260_LSVI.Rmd:96-137`.
  *
  * Validated against the published tables (see `StreamsVersie3Spec`):
  *   - 6 rule rows; the `sleutelsoorten` indicator is the group's only
  *     OR pair ("minstens 1 sleutelsoort minstens laag-abundant OF
  *     minstens 2 frequent", BeoordelingID `569 OR 465`) — statuses
  *     combine as ANY, verschilscores as max, exactly the engine's
  *     `role = "or"` path;
  *   - `grootste vegetatievlek in m²` is a STRICT > verdict (the
  *     published v = 10 boundary rows verify nothing here — none occur
  *     — but the operator column says `>` and v = 0.25 rows score the
  *     below-reference branch);
  *   - `bedekking invasieve exoten` carries the group's novelty: a
  *     TANSLEY-CLASS reference `r` ("hoogstens zeldzaam") against a
  *     measurement that is usually a numeric percentage and once a
  *     Tansley class. Solved exactly from the 86 published FALSE-row
  *     scores: verdict at the class UPPER BOUND (0.1), score against
  *     the class MIDPOINT (0.05) — the same split status/score
  *     reference scheme as heath's `B`/`HB` — with score_max 100 (the
  *     one row published with TheoretischMaximum 1 still scores
  *     against 100; its own published score proves it);
  *   - class-coded measurement VALUES convert to class midpoints on
  *     the prep side ([[tansleyMidpoints]]: the published `o` row
  *     scores as 1.05, i.e. the midpoint of the 0.1-2 band), so the
  *     engine's numeric path handles them — `ref_categories` stays
  *     NULL for every streams rule;
  *   - all 984 published detail rows and all 820 indicator rows
  *     reproduce exactly (statuses, and scores after clamping: the
  *     reference publishes RAW verschilscores at detail/indicator
  *     level, e.g. vegetatievlek 350 -> 17.0, and clamps to [-1, 1]
  *     only when aggregating to the plot level — clamping commutes
  *     with min/max, so the engine's clamped detail scores yield the
  *     identical indicator/plot chain);
  *   - all 164 published plot rows (`lsvi_plot_rw.tsv`: lsvi verdict,
  *     n_zb_ongunstig, aandeel_gunstig, index_mean_ind) reproduce
  *     exactly under RapportageHR;
  *   - `status_indicatoren_rw.tsv` is stratified: the Binnen (n=76)
  *     and Buiten (n=21) rows are plain proportions with integer
  *     numerators, and every "Binnen & Buiten" row is the SAC-stratum
  *     mix of those at weights solving to 0.667-0.668 : 0.333-0.332 —
  *     i.e. the frame's 2:1 SAC share with per-plot design weights
  *     varying slightly (published values within 0.011 of the exact
  *     2/3 + 1/3 mix; the spec gates 0.015 and the convex hull). The
  *     exact 97-plot subset (76+21 of the 107 most-recent segment
  *     visits) and the per-plot weights are drawn in the reference's
  *     analysis repo, outside this snapshot.
  */
object Versie3Streams {

  val habitattypes: Seq[String] = Seq("3260")

  val downVoorwaarden: Set[String] = Set(
    "bedekking helofyten",
    "bedekking eutrofiëring",
    "bedekking invasieve exoten")

  /** The strict-> verdict (published Operator column). */
  val strictVoorwaarden: Set[String] = Set("grootste vegetatievlek in m²")

  /** The OR-combined sleutelsoorten pair (BeoordelingID `569 OR 465`). */
  val orVoorwaarden: Set[String] = Set(
    "aantal sleutelsoorten frequent",
    "aantal sleutelsoorten laag-abundant")

  /** The Tansley-class reference rule and its split refs: verdict at
    * the class upper bound, score at the class midpoint (solved from
    * the published scores: v=1 -> -(1-0.05)/(100-0.05)). */
  val tansleyVoorwaarde: String = "bedekking invasieve exoten"
  val tansleyStatusRef: Double = 0.1
  val tansleyScoreRef: Double = 0.05

  /** Class -> percentage midpoints for class-coded measurement values
    * (prep-side conversion; the published `o` row pins 1.05 — the
    * midpoint of the 0.1-2 band — and `r` is by construction the
    * score reference itself). Higher classes never occur as values in
    * the published data and are deliberately not invented here. */
  val tansleyMidpoints: Map[String, Double] = Map("r" -> 0.05, "o" -> 1.05)

  /** The inboveg Tansley (waterlopen) recording ladder, class ->
    * species_cover, exactly as published in `HT3260_vegetation.tsv`.
    * `r` and `o` share species_cover 1 — which is why the reference's
    * prep remaps `r` to 0.1 first (HT3260_LSVI.Rmd:100-104): it makes
    * the cover -> class back-join unique. */
  val speciesCoverLadder: Seq[(String, Double)] = Seq(
    "r" -> 1.0, "o" -> 1.0, "f" -> 2.5, "la" -> 15.0,
    "a" -> 38.5, "cd" -> 62.5, "d" -> 87.5)

  /** Effective cover per class after the r -> 0.1 remap (the values the
    * max-cover selection compares, and the back-join dictionary). */
  val effectiveCover: Map[String, Double] =
    speciesCoverLadder.toMap + ("r" -> 0.1)

  /** cover -> class inverse of [[effectiveCover]] (unique by
    * construction of the remap). */
  val coverToClass: Map[Double, String] =
    effectiveCover.map { case (c, v) => v -> c }

  // 6 rule rows read off processed/inboveg_mhq_aq/HT3260_ResDetail.tsv
  val rules: Seq[(String, String, String, String, String, String, Double)] = Seq(
    ("3260", "Structuur", "horizontale structuur", "zb", "grootste vegetatievlek in m²", "10", 30.0),
    ("3260", "Structuur", "verticale structuur", "zb", "bedekking helofyten", "30", 100.0),
    ("3260", "Vegetatie", "sleutelsoorten", "b", "aantal sleutelsoorten frequent", "2", 6.0),
    ("3260", "Vegetatie", "sleutelsoorten", "b", "aantal sleutelsoorten laag-abundant", "1", 3.0),
    ("3260", "Verstoring", "eutrofiëring", "zb", "bedekking eutrofiëring", "30", 100.0),
    ("3260", "Verstoring", "invasieve exoten", "zb", "bedekking invasieve exoten", "r", 100.0)
  )

  /** The HT3260_LSVI.Rmd:96-119 species prep: a species recorded under
    * several growth forms keeps its maximum cover (after the r -> 0.1
    * remap), then maps the winning cover back to its class code via
    * the (unique) inverse dictionary. Input: (id, name, class_code);
    * output: (id, name, class_code, cover) with one row per species.
    * One hash aggregation — no window, no second scan. */
  def prepSpecies(veg: DataFrame): DataFrame = {
    val cov = element_at(typedLit(effectiveCover), col("class_code"))
    val inv = typedLit(coverToClass)
    veg
      .withColumn("cover", cov)
      .groupBy("id", "name")
      .agg(max(col("cover")).as("cover"))
      .withColumn("class_code", element_at(inv, col("cover")))
  }

  /** Rule table in the [[LsviForest.detail]] contract (the columns
    * [[Versie3Forests.rulesDf]] established). Streams has no
    * class-membership verdicts (class-coded values are converted to
    * midpoints on the prep side), one strict-> rule, and one split
    * status/score reference (the Tansley `r`). */
  def rulesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val base = rules.toDF("habitattype", "criterium", "indicator", "belang",
      "voorwaarde", "referentiewaarde", "theoretischmaximum")
    val isTansley = col("voorwaarde") === tansleyVoorwaarde
    // ANSI-safe: the class reference never reaches the numeric cast
    val numericRef =
      when(col("referentiewaarde").rlike("^[0-9.]+$"),
        col("referentiewaarde").cast("double"))
    base
      .withColumn("op",
        when(col("voorwaarde").isin(strictVoorwaarden.toSeq: _*), ">")
          .when(col("voorwaarde").isin(downVoorwaarden.toSeq: _*), "<=")
          .otherwise(">="))
      .withColumn("ref_categories", lit(null).cast("array<string>"))
      .withColumn("ref_numeric",
        when(isTansley, lit(tansleyScoreRef)).otherwise(numericRef))
      .withColumn("status_ref",
        when(isTansley, lit(tansleyStatusRef)).otherwise(numericRef))
      .withColumn("score_max", col("theoretischmaximum"))
      .withColumn("role",
        when(col("voorwaarde").isin(orVoorwaarden.toSeq: _*), "or")
          .otherwise("and"))
      .withColumn("aggregate", lit(true))
  }
}
