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

  /** Forest-detail report shape — the column set the reference's forest
    * report consumes (`/root/reference/src/data_questions/data_lsvi_forests.R:32`;
    * schema `processed/lsvi_mhq/forests/result/lsvi_detail_fs.yml`):
    * per (id, voorwaarde) the verdict is published as
    * `status_voorwaarde` alongside `theoretischmaximum` (the declared
    * theoretical maximum of the measured variable, from the rule table)
    * and `verschilscore` — the LSVI difference score: the observed
    * value's distance from the reference value rescaled to [-1, 1],
    * positive iff the condition is met (0 = exactly at the reference,
    * +1 = at the theoretical optimum, -1 = at the theoretical worst).
    *
    * Numeric conditions: for an upward condition (op >= / >)
    * met ⇒ (value-ref)/(max-ref), unmet ⇒ (value-ref)/ref; a downward
    * condition (<= / <) mirrors: met ⇒ (ref-value)/ref, unmet ⇒
    * (ref-value)/(max-ref). Zero denominators yield NULL (reported, not
    * dropped). Categorical/equality conditions score +1 met / -1 unmet.
    *
    * `measurements` additionally carries the report passthroughs
    * (`type_observed`, `plot_type`, display `waarde`); `rules`
    * additionally carries `referentiewaarde` (the reference value's
    * character form) and `theoretisch_maximum`. Same join shape as
    * [[detail]]: rules broadcast, measurements stream.
    */
  def detailReport(measurements: DataFrame, rules: DataFrame): DataFrame = {
    val joined = measurements.join(broadcast(rules), Seq("voorwaarde"))
      .withColumn("status_voorwaarde",
        verdict(col("op"), col("value_numeric"), col("ref_numeric"),
          col("value_category"), col("ref_categories")))
    val up = col("op").isin(">=", ">")
    val down = col("op").isin("<=", "<")
    def div(n: Column, d: Column) = when(d =!= 0.0, n / d)
    val maxMinusRef = col("theoretisch_maximum") - col("ref_numeric")
    val vs =
      when(col("status_voorwaarde").isNull, lit(null).cast("double"))
        .when(up, when(col("status_voorwaarde"),
            div(col("value_numeric") - col("ref_numeric"), maxMinusRef))
          .otherwise(div(col("value_numeric") - col("ref_numeric"), col("ref_numeric"))))
        .when(down, when(col("status_voorwaarde"),
            div(col("ref_numeric") - col("value_numeric"), col("ref_numeric")))
          .otherwise(div(col("ref_numeric") - col("value_numeric"), maxMinusRef)))
        .otherwise(when(col("status_voorwaarde"), lit(1.0)).otherwise(lit(-1.0)))
    joined
      .withColumn("verschilscore", vs)
      .select(col("id"), col("type_observed"), col("criterium"), col("indicator"),
        col("belang"), col("voorwaarde"), col("plot_type"), col("waarde"),
        col("value_numeric").as("waarde_numeric"), col("referentiewaarde"),
        col("status_voorwaarde"),
        col("theoretisch_maximum").as("theoretischmaximum"), col("verschilscore"))
  }

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
