package graft.pipelines

import graft.core.{InbovegSource, SourceRegistry}
import graft.lsvi.Versie3
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The aquatic chain end-to-end: S3 extract -> E2 prepare -> K2 score.
  *
  * Composes the reference's three aquatic notebooks as one job:
  * `query_inboveg.Rmd:185-238` (five-extract pull for the aquatic
  * surveys), `HT31xx_data_preparation.Rmd` (completeness, flags, typed
  * structure variables), `HT31xx_LSVI.Rmd` (Versie-3 scoring to the
  * four result tables). A user of the reference runs the three Rmds in
  * sequence through files on disk; here the same flow is one lazy plan
  * per output — nothing materializes between stages, so Catalyst prunes
  * across stage boundaries (e.g. the header columns the scorer never
  * touches are never fetched).
  *
  * Scale stance: the survey filter is pushed into the JDBC scans
  * ([[InbovegSource]]); rule/dictionary joins broadcast; the only
  * fact-sized shuffles are the per-recording aggregations in the
  * scorer.
  *
  * Documented deviation: qualifier `var_code` case is preserved to
  * match the published Versie-3 dictionary keys; the reference
  * lowercases both sides (`query_inboveg.Rmd:227`).
  */
object InbovegAquaticJob {

  /** The reference's aquatic survey list (`query_inboveg.Rmd:188-190`). */
  val aquaticSurveys: Seq[String] = Seq(
    "HT31xx_LSVI_StilstaandeWateren", "HT31xx_Plassen", "HT3260",
    "HT2190_a_LSVI_StilstaandeWateren")

  case class Outputs(header: DataFrame, siteCharacteristics: DataFrame,
                     detail: DataFrame, indicator: DataFrame,
                     criterium: DataFrame, globaal: DataFrame,
                     checks: Map[String, DataFrame])

  def run(spark: SparkSession, registry: SourceRegistry,
          surveys: Seq[String] = aquaticSurveys): Outputs = {
    val ex = InbovegSource(registry, surveys).extracts(spark, "MQ")

    // N2k classification -> observed habitat type (`query_inboveg.Rmd:195-199`);
    // a recording with several N2k rows resolves to min(type) — a
    // DETERMINISTIC pick (dropDuplicates keeps a partition-order-
    // dependent row, which would break hash-stable outputs)
    val habitat = ex.classification
      .where(col("classif_type") === "N2k")
      .groupBy(col("recording_givid").as("id"))
      .agg(min(col("type_observed")).as("habitattype"))

    // MQ qualifiers in the aquatic shape (`query_inboveg.Rmd:214-227`):
    // present/recent measurements only (Q1 in A/B), value = Elucidation,
    // NA-string rows dropped (R's `%in%` keeps SQL NULLs)
    val qualifiers = ex.qualifier
      .where(col("q1_code").isin("A", "B"))
      .select(col("recording_givid"), col("q2_code").as("var_code"),
        lower(col("q2_description")).as("var"),
        col("elucidation").as("value"))
      .where(col("value").isNull || !col("value").isin("NA", "n/a"))

    val prep = InbovegPrepJob.run(InbovegPrepJob.Inputs(
      header = ex.header.join(
        habitat.select(col("id").as("recording_givid"),
          col("habitattype").as("type_observed")),
        Seq("recording_givid"), "left"),
      classif = ex.classification.where(col("classif_type") === "N2k"),
      qualifiers = qualifiers,
      surveys = surveys))

    // vegetation stream for the key-species share (`HT31xx_LSVI.Rmd:169-185`)
    val vegetation = ex.recording.select(
      col("recording_givid").as("id"),
      col("name_scientific").as("name"),
      col("layer_cover").as("cover_code"))

    val sc = prep.siteCharacteristics
      .select(col("recording_givid").as("id"), col("var_code"), col("value"))
    val (d, i, c, g) = Versie3.score(habitat, sc, vegetation)
    Outputs(prep.header, prep.siteCharacteristics, d, i, c, g, prep.checks)
  }
}
