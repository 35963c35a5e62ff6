package graft.lsvi

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The REAL LSVI Versie-3 rule content for the GRASSLAND / MARSH
  * habitat types (1330_hpr, the 6230 / 6410 / 6510 subtype families,
  * 7140_meso, 7140_oli), read off
  * `/root/reference/processed/lsvi_mhq/grassland_marsh/result/` — the
  * sixth habitat group through the shared [[LsviForest]] engine, which
  * completes every group the reference publishes a detail table for.
  *
  * Validated against the published tables:
  *   - every evaluable detail row classifies under the shared formula;
  *     two voorwaarden carry the reference's mixed recording scales
  *     (`bedekking strooisellaag` / `bedekking structuurschade`: 333 of
  *     8,592 evaluable rows score as value/100 with no discriminator in
  *     the published data OR the published engine-input tables under
  *     `input/` — the spec gates exactly those);
  *   - strict `<` verdicts for `bedekking hoge grassen` and `dominantie
  *     van een soort` (boundary rows prove strictness; the other
  *     downward rules are `<=`);
  *   - `bedekking grasachtigen rbbzil <= som van de bedekking
  *     sleutelsoorten` is a per-plot dynamic reference (59 distinct
  *     published reference values), delivered via `ref_override`;
  *   - the `T` ("talrijk") reference: class-coded `bedekking` verdicts
  *     by membership {Afwezig, zs, s, wt, t}; value-coded `bedekking
  *     microrelief` verdicts upward at >= 1.5; both score against 3.75
  *     on the 0-100 scale — solved exactly from the published ladder
  *     (class midpoints 1/2/4/30/80 reproduce every published score);
  *   - indicator combination is plain AND (min) — fits all 9,662
  *     published indicator rows including the multi-voorwaarde ones;
  *   - criterium aggregation exact on all 2,562 published rows; globaal
  *     exact except 126 `index_mean_crit` values (the same
  *     published-anomaly class seen in heath/dunes, at larger share).
  */
object Versie3Grasslands {

  val habitattypes: Seq[String] = Seq("1330_hpr", "6230_ha", "6230_hmo", "6230_hn",
    "6230_hnk", "6410_mo", "6410_ve", "6510_hu", "6510_hua", "6510_huk",
    "6510_hus", "7140_meso", "7140_oli")

  val downVoorwaarden: Set[String] = Set(
    "bedekking", // class-coded T condition
    "bedekking eutrofiëring",
    "bedekking grasachtigen rbbzil <= som van de bedekking sleutelsoorten",
    "bedekking hoge grassen",
    "bedekking invasieve exoten",
    "bedekking strooisellaag",
    "bedekking structuurschade",
    "bedekking verbossing",
    "bedekking verbraming",
    "bedekking verdroging",
    "bedekking vergrassing",
    "bedekking vermossing",
    "bedekking vernatting",
    "bedekking verruiging",
    "bedekking verzuring",
    "dominantie van een soort",
    "dominantie van een soort excl. sleutelsoorten")

  /** Strict-< verdicts (boundary rows in the published data prove the
    * strictness; everything else downward is <=). */
  val strictVoorwaarden: Set[String] = Set(
    "bedekking hoge grassen",
    "dominantie van een soort")

  /** Per-plot dynamic reference rule (ref_override in measurements). */
  val dynamicVoorwaarde: String =
    "bedekking grasachtigen rbbzil <= som van de bedekking sleutelsoorten"

  /** The T ("talrijk") reference: score reference on the 0-100 scale
    * plus the upward value-coded status threshold. */
  val tScoreRef: Double = 3.75
  val tStatusUp: Double = 1.5

  /** T class-coded condition: met-class set. */
  val tCategorical: Map[String, Seq[String]] = Map(
    "bedekking" -> Seq("Afwezig", "zs", "s", "wt", "t"))

  /** T value-coded condition (numeric measurement, T reference). */
  val tNumeric: Set[String] = Set("bedekking microrelief")

  // 141 rule rows read off processed/lsvi_mhq/grassland_marsh/result/lsvi_detail_gr_bm.tsv
  // (the dynamic per-plot reference of the rbbzil rule is marked 'dynamisch')
  val rules: Seq[(String, String, String, String, String, String, Double)] = Seq(
    ("1330_hpr", "Structuur", "dominantie van één soort", "zb", "dominantie van een soort", "70", 100.0),
    ("1330_hpr", "Structuur", "horizontale structuur", "zb", "differentiatie in zout- en tredplanten", "1", 1.0),
    ("1330_hpr", "Structuur", "microreliëf", "zb", "bedekking microrelief", "T", 100.0),
    ("1330_hpr", "Vegetatie", "bedekking sleutelsoorten", "b", "bedekking sleutelsoorten", "30", 100.0),
    ("1330_hpr", "Vegetatie", "sleutelsoorten", "b", "aantal sleutelsoorten", "2", 6.0),
    ("1330_hpr", "Verstoring", "overgang naar rbbzil", "zb", "bedekking grasachtigen rbbzil <= som van de bedekking sleutelsoorten", "dynamisch", 100.0),
    ("1330_hpr", "Verstoring", "rietontwikkeling", "zb", "bedekking", "T", 1.0),
    ("6230_ha", "Vegetatie", "bedekking sleutelsoorten", "b", "bedekking sleutelsoorten", "10", 100.0),
    ("6230_ha", "Vegetatie", "sleutelsoorten", "b", "aantal sleutelsoorten", "4", 12.0),
    ("6230_ha", "Verstoring", "eutrofiëring", "zb", "bedekking eutrofiëring", "10", 100.0),
    ("6230_ha", "Verstoring", "strooisellaag", "b", "bedekking strooisellaag", "10", 100.0),
    ("6230_ha", "Verstoring", "verbossing", "b", "bedekking verbossing", "10", 100.0),
    ("6230_ha", "Verstoring", "verbraming", "b", "bedekking verbraming", "10", 100.0),
    ("6230_ha", "Verstoring", "vergrassing inclusief vervilting", "zb", "bedekking vergrassing", "50", 100.0),
    ("6230_ha", "Verstoring", "vermossing", "zb", "bedekking vermossing", "30", 100.0),
    ("6230_ha", "Verstoring", "verruiging inclusief ruderalisering", "zb", "bedekking verruiging", "10", 100.0),
    ("6230_hmo", "Vegetatie", "bedekking sleutelsoorten", "b", "bedekking sleutelsoorten", "10", 100.0),
    ("6230_hmo", "Vegetatie", "sleutelsoorten", "b", "aantal sleutelsoorten", "4", 12.0),
    ("6230_hmo", "Verstoring", "eutrofiëring", "zb", "bedekking eutrofiëring", "10", 100.0),
    ("6230_hmo", "Verstoring", "strooisellaag", "b", "bedekking strooisellaag", "10", 100.0),
    ("6230_hmo", "Verstoring", "verbossing", "b", "bedekking verbossing", "10", 100.0),
    ("6230_hmo", "Verstoring", "verbraming", "b", "bedekking verbraming", "10", 100.0),
    ("6230_hmo", "Verstoring", "verdroging", "zb", "bedekking verdroging", "30", 100.0),
    ("6230_hmo", "Verstoring", "vergrassing inclusief vervilting", "zb", "bedekking vergrassing", "50", 100.0),
    ("6230_hmo", "Verstoring", "vermossing", "zb", "bedekking vermossing", "30", 100.0),
    ("6230_hmo", "Verstoring", "vernatting", "zb", "bedekking vernatting", "30", 100.0),
    ("6230_hmo", "Verstoring", "verruiging inclusief ruderalisering", "zb", "bedekking verruiging", "10", 100.0),
    ("6230_hn", "Vegetatie", "bedekking sleutelsoorten", "b", "bedekking sleutelsoorten", "10", 100.0),
    ("6230_hn", "Vegetatie", "sleutelsoorten", "b", "aantal sleutelsoorten", "4", 12.0),
    ("6230_hn", "Verstoring", "eutrofiëring", "zb", "bedekking eutrofiëring", "10", 100.0),
    ("6230_hn", "Verstoring", "strooisellaag", "b", "bedekking strooisellaag", "10", 100.0),
    ("6230_hn", "Verstoring", "verbossing", "b", "bedekking verbossing", "10", 100.0),
    ("6230_hn", "Verstoring", "verbraming", "b", "bedekking verbraming", "10", 100.0),
    ("6230_hn", "Verstoring", "vergrassing inclusief vervilting", "zb", "bedekking vergrassing", "50", 100.0),
    ("6230_hn", "Verstoring", "vermossing", "zb", "bedekking vermossing", "30", 100.0),
    ("6230_hn", "Verstoring", "verruiging inclusief ruderalisering", "zb", "bedekking verruiging", "10", 100.0),
    ("6230_hnk", "Vegetatie", "bedekking sleutelsoorten", "b", "bedekking sleutelsoorten", "10", 100.0),
    ("6230_hnk", "Vegetatie", "sleutelsoorten", "b", "aantal heischrale sleutelsoorten", "2", 6.0),
    ("6230_hnk", "Vegetatie", "sleutelsoorten", "b", "aantal kalkminnende sleutelsoorten", "2", 6.0),
    ("6230_hnk", "Vegetatie", "sleutelsoorten", "b", "aantal sleutelsoorten", "5", 15.0),
    ("6230_hnk", "Verstoring", "eutrofiëring", "zb", "bedekking eutrofiëring", "10", 100.0),
    ("6230_hnk", "Verstoring", "strooisellaag", "b", "bedekking strooisellaag", "10", 100.0),
    ("6230_hnk", "Verstoring", "verbossing", "b", "bedekking verbossing", "10", 100.0),
    ("6230_hnk", "Verstoring", "verbraming", "b", "bedekking verbraming", "10", 100.0),
    ("6230_hnk", "Verstoring", "vergrassing inclusief vervilting", "zb", "bedekking vergrassing", "50", 100.0),
    ("6230_hnk", "Verstoring", "vermossing", "zb", "bedekking vermossing", "30", 100.0),
    ("6230_hnk", "Verstoring", "verruiging inclusief ruderalisering", "zb", "bedekking verruiging", "10", 100.0),
    ("6410_mo", "Structuur", "levensvormen", "b", "bedekking lage schijngrassen", "10", 100.0),
    ("6410_mo", "Vegetatie", "bedekking sleutelsoorten", "b", "bedekking sleutelsoorten", "10", 100.0),
    ("6410_mo", "Vegetatie", "sleutelsoorten", "b", "aantal sleutelsoorten", "5", 15.0),
    ("6410_mo", "Verstoring", "eutrofiëring", "zb", "bedekking eutrofiëring", "10", 100.0),
    ("6410_mo", "Verstoring", "strooisellaag", "b", "bedekking strooisellaag", "10", 100.0),
    ("6410_mo", "Verstoring", "verbossing", "b", "bedekking verbossing", "10", 100.0),
    ("6410_mo", "Verstoring", "verbraming", "b", "bedekking verbraming", "10", 100.0),
    ("6410_mo", "Verstoring", "verdroging", "zb", "bedekking verdroging", "30", 100.0),
    ("6410_mo", "Verstoring", "vergrassing inclusief vervilting", "zb", "bedekking vergrassing", "50", 100.0),
    ("6410_mo", "Verstoring", "vermossing", "zb", "bedekking vermossing", "30", 100.0),
    ("6410_mo", "Verstoring", "vernatting", "zb", "bedekking vernatting", "30", 100.0),
    ("6410_mo", "Verstoring", "verruiging inclusief ruderalisering", "zb", "bedekking verruiging", "10", 100.0),
    ("6410_mo", "Verstoring", "verzuring", "zb", "bedekking verzuring", "30", 100.0),
    ("6410_ve", "Structuur", "levensvormen", "b", "bedekking lage schijngrassen", "10", 100.0),
    ("6410_ve", "Vegetatie", "bedekking sleutelsoorten", "b", "bedekking sleutelsoorten", "10", 100.0),
    ("6410_ve", "Vegetatie", "sleutelsoorten", "b", "aantal sleutelsoorten", "5", 15.0),
    ("6410_ve", "Verstoring", "eutrofiëring", "zb", "bedekking eutrofiëring", "10", 100.0),
    ("6410_ve", "Verstoring", "strooisellaag", "b", "bedekking strooisellaag", "10", 100.0),
    ("6410_ve", "Verstoring", "verbossing", "b", "bedekking verbossing", "10", 100.0),
    ("6410_ve", "Verstoring", "verbraming", "b", "bedekking verbraming", "10", 100.0),
    ("6410_ve", "Verstoring", "verdroging", "zb", "bedekking verdroging", "30", 100.0),
    ("6410_ve", "Verstoring", "vergrassing inclusief vervilting", "zb", "bedekking vergrassing", "50", 100.0),
    ("6410_ve", "Verstoring", "vermossing", "zb", "bedekking vermossing", "30", 100.0),
    ("6410_ve", "Verstoring", "vernatting", "zb", "bedekking vernatting", "30", 100.0),
    ("6410_ve", "Verstoring", "verruiging inclusief ruderalisering", "zb", "bedekking verruiging", "10", 100.0),
    ("6410_ve", "Verstoring", "verzuring", "zb", "bedekking verzuring", "30", 100.0),
    ("6510_hu", "Structuur", "dominantie van één soort", "b", "dominantie van een soort excl. sleutelsoorten", "50", 100.0),
    ("6510_hu", "Structuur", "verticale structuur", "b", "bedekking hoge grassen", "70", 100.0),
    ("6510_hu", "Structuur", "verticale structuur", "b", "bedekking middelhoge grassen", "5", 100.0),
    ("6510_hu", "Vegetatie", "bedekking sleutelsoorten", "b", "bedekking sleutelsoorten", "30", 100.0),
    ("6510_hu", "Vegetatie", "sleutelsoorten", "b", "aantal sleutelsoorten", "7", 21.0),
    ("6510_hu", "Verstoring", "eutrofiëring", "zb", "bedekking eutrofiëring", "30", 100.0),
    ("6510_hu", "Verstoring", "strooisellaag", "b", "bedekking strooisellaag", "10", 100.0),
    ("6510_hu", "Verstoring", "verbossing", "b", "bedekking verbossing", "10", 100.0),
    ("6510_hu", "Verstoring", "verbraming", "b", "bedekking verbraming", "10", 100.0),
    ("6510_hu", "Verstoring", "vergrassing inclusief vervilting", "zb", "bedekking vergrassing", "50", 100.0),
    ("6510_hu", "Verstoring", "verruiging inclusief ruderalisering", "zb", "bedekking verruiging", "30", 100.0),
    ("6510_hua", "Structuur", "dominantie van één soort", "b", "dominantie van een soort excl. sleutelsoorten", "50", 100.0),
    ("6510_hua", "Structuur", "verticale structuur", "b", "bedekking hoge grassen", "70", 100.0),
    ("6510_hua", "Structuur", "verticale structuur", "b", "bedekking middelhoge grassen", "5", 100.0),
    ("6510_hua", "Vegetatie", "bedekking sleutelsoorten", "b", "bedekking sleutelsoorten", "10", 100.0),
    ("6510_hua", "Vegetatie", "sleutelsoorten", "b", "aantal sleutelsoorten", "3", 9.0),
    ("6510_hua", "Vegetatie", "sleutelsoorten", "b", "aanwezigheid specifieke sleutelsoorten", "1", 2.0),
    ("6510_hua", "Verstoring", "eutrofiëring", "zb", "bedekking eutrofiëring", "30", 100.0),
    ("6510_hua", "Verstoring", "strooisellaag", "b", "bedekking strooisellaag", "10", 100.0),
    ("6510_hua", "Verstoring", "verbossing", "b", "bedekking verbossing", "10", 100.0),
    ("6510_hua", "Verstoring", "verbraming", "b", "bedekking verbraming", "10", 100.0),
    ("6510_hua", "Verstoring", "verdroging", "zb", "bedekking verdroging", "30", 100.0),
    ("6510_hua", "Verstoring", "vergrassing inclusief vervilting", "zb", "bedekking vergrassing", "50", 100.0),
    ("6510_hua", "Verstoring", "vernatting", "zb", "bedekking vernatting", "30", 100.0),
    ("6510_hua", "Verstoring", "verruiging inclusief ruderalisering", "zb", "bedekking verruiging", "30", 100.0),
    ("6510_huk", "Structuur", "dominantie van één soort", "b", "dominantie van een soort excl. sleutelsoorten", "50", 100.0),
    ("6510_huk", "Structuur", "levensvormen", "b", "bedekking rozetplanten", "10", 100.0),
    ("6510_huk", "Vegetatie", "bedekking sleutelsoorten", "b", "bedekking sleutelsoorten", "30", 100.0),
    ("6510_huk", "Vegetatie", "sleutelsoorten", "b", "aantal sleutelsoorten", "5", 15.0),
    ("6510_huk", "Verstoring", "eutrofiëring", "zb", "bedekking eutrofiëring", "30", 100.0),
    ("6510_huk", "Verstoring", "strooisellaag", "b", "bedekking strooisellaag", "10", 100.0),
    ("6510_huk", "Verstoring", "verbossing", "b", "bedekking verbossing", "10", 100.0),
    ("6510_huk", "Verstoring", "verbraming", "b", "bedekking verbraming", "10", 100.0),
    ("6510_huk", "Verstoring", "vergrassing inclusief vervilting", "zb", "bedekking vergrassing", "50", 100.0),
    ("6510_huk", "Verstoring", "verruiging inclusief ruderalisering", "zb", "bedekking verruiging", "30", 100.0),
    ("6510_hus", "Structuur", "dominantie van één soort", "b", "dominantie van een soort excl. sleutelsoorten", "50", 100.0),
    ("6510_hus", "Structuur", "verticale structuur", "b", "bedekking hoge grassen", "70", 100.0),
    ("6510_hus", "Structuur", "verticale structuur", "b", "bedekking middelhoge grassen", "5", 100.0),
    ("6510_hus", "Vegetatie", "bedekking sleutelsoorten", "b", "bedekking sleutelsoorten", "30", 100.0),
    ("6510_hus", "Vegetatie", "sleutelsoorten", "b", "aantal sleutelsoorten", "7", 21.0),
    ("6510_hus", "Verstoring", "eutrofiëring", "zb", "bedekking eutrofiëring", "30", 100.0),
    ("6510_hus", "Verstoring", "strooisellaag", "b", "bedekking strooisellaag", "10", 100.0),
    ("6510_hus", "Verstoring", "verbossing", "b", "bedekking verbossing", "10", 100.0),
    ("6510_hus", "Verstoring", "verbraming", "b", "bedekking verbraming", "10", 100.0),
    ("6510_hus", "Verstoring", "vergrassing inclusief vervilting", "zb", "bedekking vergrassing", "50", 100.0),
    ("6510_hus", "Verstoring", "verruiging inclusief ruderalisering", "zb", "bedekking verruiging", "30", 100.0),
    ("7140_meso", "Structuur", "(korst)moslaag", "b", "bedekking moslaag", "10", 100.0),
    ("7140_meso", "Structuur", "dominantie van één soort", "b", "dominantie van een soort", "70", 100.0),
    ("7140_meso", "Vegetatie", "bedekking sleutel- en overige soorten", "b", "bedekking sleutelsoorten", "30", 100.0),
    ("7140_meso", "Vegetatie", "sleutelsoorten", "b", "aantal sleutelsoorten", "4", 12.0),
    ("7140_meso", "Verstoring", "eutrofiëring", "zb", "bedekking eutrofiëring", "10", 100.0),
    ("7140_meso", "Verstoring", "invasieve exoten", "zb", "bedekking invasieve exoten", "0", 100.0),
    ("7140_meso", "Verstoring", "strooisellaag", "b", "bedekking strooisellaag", "30", 100.0),
    ("7140_meso", "Verstoring", "structuurschade", "b", "bedekking structuurschade", "10", 100.0),
    ("7140_meso", "Verstoring", "verbossing", "zb", "bedekking verbossing", "10", 100.0),
    ("7140_meso", "Verstoring", "vergrassing", "zb", "bedekking vergrassing", "30", 100.0),
    ("7140_meso", "Verstoring", "vermossing", "zb", "bedekking vermossing", "30", 100.0),
    ("7140_meso", "Verstoring", "verruiging", "zb", "bedekking verruiging", "30", 100.0),
    ("7140_oli", "Structuur", "veenmossen", "zb", "bedekking veenmossen", "30", 100.0),
    ("7140_oli", "Vegetatie", "bedekking sleutelsoorten", "b", "bedekking sleutelsoorten", "30", 100.0),
    ("7140_oli", "Vegetatie", "sleutelsoorten", "b", "aantal sleutelsoorten", "3", 9.0),
    ("7140_oli", "Verstoring", "eutrofiëring", "zb", "bedekking eutrofiëring", "10", 100.0),
    ("7140_oli", "Verstoring", "strooisellaag", "b", "bedekking strooisellaag", "30", 100.0),
    ("7140_oli", "Verstoring", "structuurschade", "b", "bedekking structuurschade", "10", 100.0),
    ("7140_oli", "Verstoring", "verbossing", "zb", "bedekking verbossing", "10", 100.0),
    ("7140_oli", "Verstoring", "vergrassing", "zb", "bedekking vergrassing", "30", 100.0),
    ("7140_oli", "Verstoring", "vermossing", "zb", "bedekking vermossing", "30", 100.0),
    ("7140_oli", "Verstoring", "verruiging", "zb", "bedekking verruiging", "10", 100.0)
  )

  /** Rule table in the [[LsviForest.detail]] engine contract. */
  def rulesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val base = rules.toDF("habitattype", "criterium", "indicator", "belang",
      "voorwaarde", "referentiewaarde", "theoretischmaximum")
    val isT = col("referentiewaarde") === "T"
    val isCat = isT && !col("voorwaarde").isin(tNumeric.toSeq: _*)
    val catMet = typedLit(tCategorical)
    val numericRef =
      when(col("referentiewaarde").rlike("^[0-9.]+$"),
        col("referentiewaarde").cast("double"))
    base
      .withColumn("op",
        when(col("voorwaarde").isin(strictVoorwaarden.toSeq: _*), "<")
          .when(col("voorwaarde").isin(downVoorwaarden.toSeq: _*), "<=")
          .otherwise(">="))
      .withColumn("ref_categories", when(isCat, element_at(catMet, col("voorwaarde"))))
      .withColumn("ref_numeric",
        when(isT, lit(tScoreRef)).otherwise(numericRef))
      .withColumn("status_ref",
        when(isT && !isCat, lit(tStatusUp)).otherwise(col("ref_numeric")))
      .withColumn("score_max",
        when(isT, lit(100.0)).otherwise(col("theoretischmaximum")))
      .withColumn("role", lit("and"))
      .withColumn("aggregate", lit(true))
  }
}
