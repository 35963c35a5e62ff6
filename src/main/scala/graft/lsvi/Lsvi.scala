package graft.lsvi

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** K2: the LSVI habitat-quality scoring engine, re-expressed as a pure
  * data-driven DataFrame program (SURVEY.md §2.10 K2; the reference
  * calls the external `LSVI::berekenLSVIbasis` with rule metadata from
  * a database, `/root/reference/src/export_from_inboveg/HT31xx_LSVI.Rmd:198-205`).
  *
  * Contracts reproduced from the observable I/O (the input and result
  * `.yml` schemas under `processed/lsvi_mhq/` and the frames built at
  * `HT31xx_LSVI.Rmd:68-185`):
  *
  *   - measurements: (id, voorwaarde, value_numeric | value_category)
  *   - rules: (habitattype, criterium, indicator, voorwaarde, belang
  *     "b"|"zb", op, ref_numeric | ref_categories)
  *   - results: 4 tables — detail (per voorwaarde), indicator,
  *     criterium, globaal — mirroring `resultaat$Resultaat_detail` etc.
  *     (`HT31xx_LSVI.Rmd:242-247`).
  *
  * Aggregation follows the published "RapportageHR" method: an
  * indicator is favorable iff all its conditions hold; global status is
  * favorable iff more than half of the indicators are favorable AND no
  * very-important ("zb") indicator is unfavorable; `aandeel_gunstig`
  * and `n_zb_ongunstig` are reported alongside, as in
  * `processed/lsvi_mhq/forests/result/lsvi_plot_fs.yml`.
  *
  * Everything is joins + groupBy: the rules table broadcasts (it is
  * dictionary-sized) and the measurement table streams — one shuffle
  * per aggregation level, no UDFs, safe at any plot count.
  */
object Lsvi {

  /** Data-driven comparison evaluator. `op` is a column holding one of
    * >=, <=, >, <, =, != (numeric) or in / not_in (categorical against
    * `refCats` array). NULL measurement -> NULL verdict (the reference
    * propagates NA and reports it, `HT31xx_LSVI.Rmd:232-239`). */
  def verdict(op: Column, value: Column, refNum: Column,
              category: Column, refCats: Column): Column =
    when(op === ">=", value >= refNum)
      .when(op === "<=", value <= refNum)
      .when(op === ">", value > refNum)
      .when(op === "<", value < refNum)
      .when(op === "=", value === refNum)
      .when(op === "!=", value =!= refNum)
      .when(op === "in", array_contains(refCats, category))
      .when(op === "not_in", !array_contains(refCats, category))

  /** Detail table: one row per (id, voorwaarde) with its verdict.
    * `measurements`: (id, voorwaarde, value_numeric, value_category);
    * `rules`: (criterium, indicator, voorwaarde, belang, op,
    * ref_numeric, ref_categories). */
  def detail(measurements: DataFrame, rules: DataFrame): DataFrame =
    measurements.join(broadcast(rules), Seq("voorwaarde"))
      .withColumn("voldoet",
        verdict(col("op"), col("value_numeric"), col("ref_numeric"),
          col("value_category"), col("ref_categories")))
      .select("id", "criterium", "indicator", "voorwaarde", "belang",
        "value_numeric", "value_category", "op", "ref_numeric", "voldoet")

  /** Detail with a habitattype-scoped rule join: rule tables that differ
    * per habitat type (the Versie-3 content, [[Versie3.rules]]) join on
    * (habitattype, voorwaarde) so a measurement only meets the rules of
    * its own type. */
  def detailByType(measurements: DataFrame, rules: DataFrame): DataFrame =
    measurements.join(broadcast(rules), Seq("habitattype", "voorwaarde"))
      .withColumn("voldoet",
        verdict(col("op"), col("value_numeric"), col("ref_numeric"),
          col("value_category"), col("ref_categories")))
      .select("id", "habitattype", "criterium", "indicator", "voorwaarde", "belang",
        "value_numeric", "value_category", "op", "ref_numeric", "voldoet")

  /** Indicator table: favorable iff ALL conditions hold (missing
    * verdicts make the indicator NULL-unknown, reported not dropped);
    * `score` = fraction of evaluable conditions met (the per-indicator
    * index feeding index_mean_ind in the result schema,
    * `processed/lsvi_mhq/forests/result/lsvi_plot_fs.yml`). */
  def indicator(detail: DataFrame): DataFrame =
    detail.groupBy("id", "criterium", "indicator", "belang")
      .agg(
        (count(when(col("voldoet") === false, 1)) === 0 &&
          count(when(col("voldoet").isNull, 1)) === 0).as("gunstig"),
        count(when(col("voldoet").isNull, 1)).as("n_onbekend"),
        (count(when(col("voldoet") === true, 1)) /
          greatest(count(when(col("voldoet").isNotNull, 1)), lit(1L))).as("score"))

  /** Criterium table: favorable iff all its indicators are. */
  def criterium(indicator: DataFrame): DataFrame =
    indicator.groupBy("id", "criterium")
      .agg(
        (count(when(col("gunstig") === false, 1)) === 0).as("gunstig"),
        count(lit(1)).as("n_indicatoren"))

  /** Global table (RapportageHR): share-of-favorable-indicators rule
    * with a very-important-indicator veto, plus the mean indicator
    * index (`index_mean_ind`). */
  def globaal(indicator: DataFrame): DataFrame =
    indicator.groupBy("id")
      .agg(
        count(lit(1)).as("n_ind"),
        count(when(col("gunstig"), 1)).as("n_gunstig"),
        count(when(col("belang") === "zb" && !col("gunstig"), 1)).as("n_zb_ongunstig"),
        round(sum(col("score")) / count(lit(1)), 6).as("index_mean_ind"))
      .withColumn("aandeel_gunstig",
        round(lit(100.0) * col("n_gunstig") / col("n_ind"), 6))
      .withColumn("status",
        col("n_zb_ongunstig") === 0 && col("n_gunstig") * 2 > col("n_ind"))
      .withColumn("lsvi", when(col("status"), "gunstig").otherwise("ongunstig"))
      .select("id", "n_ind", "n_gunstig", "n_zb_ongunstig",
        "aandeel_gunstig", "index_mean_ind", "status", "lsvi")

  /** Convenience: run the full engine, returning all four tables. */
  def score(measurements: DataFrame, rules: DataFrame):
      (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val d = detail(measurements, rules)
    val i = indicator(d)
    (d, i, criterium(i), globaal(i))
  }
}
