package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S3: the INBOVEG survey-database facade — the Spark re-expression of
  * the reference's five `get_inboveg_*` extract calls, each
  * parameterized by a survey list
  * (`/root/reference/src/export_from_inboveg/query_inboveg.Rmd:36-64,185-238`).
  *
  * The reference calls five R helpers that render SQL against the
  * INBOVEG SQL Server schema and collect the result. Here the raw
  * entities are [[SourceRegistry]] entries (JDBC in production —
  * pushdown keeps the survey filter server-side; parquet/CSV fixtures
  * in tests) and each extract is a declarative plan over them:
  *
  *   inboveg_survey          (survey_id, name)
  *   inboveg_recording       (recording_givid, survey_id, user_reference,
  *                            location_code, area, vague_date_begin,
  *                            vague_date_end, latitude, longitude)
  *   inboveg_classification  (recording_givid, classif, action_group,
  *                            list_name, cover)
  *   inboveg_species         (recording_givid, layer_code, cover_code,
  *                            original_name, scientific_name,
  *                            phenology_code, coverage_code, pct_value,
  *                            recording_scale)
  *   inboveg_layer           (recording_givid, layer_code,
  *                            layer_description, cover_code, percentage)
  *   inboveg_qualifier       (recording_givid, qualifier_type, q1_code,
  *                            q1_description, q2_code, q2_description,
  *                            q3_code, q3_description, elucidation)
  *
  * Scale stance: the survey dimension is tiny, so recording scoping is
  * a broadcast semi join; child tables scope on `recording_givid` the
  * same way. With JDBC sources Catalyst additionally pushes the
  * resulting IN-filters into the remote scan, so at production scale
  * only the selected surveys ever cross the wire — the same effect as
  * the reference's hand-rendered `WHERE Name IN (...)`, but composed
  * rather than string-built.
  */
final case class InbovegSource(registry: SourceRegistry, surveyNames: Seq[String]) {

  private def scopedRecordings(spark: SparkSession): DataFrame = {
    val surveys = registry.load(spark, "inboveg_survey")
      .where(col("name").isin(surveyNames: _*))
    registry.load(spark, "inboveg_recording")
      .join(broadcast(surveys), Seq("survey_id"))
  }

  /** Child-table scoping: attach (survey, recording) context. */
  private def scoped(spark: SparkSession, table: String): DataFrame = {
    val rec = scopedRecordings(spark)
      .select(col("recording_givid"), col("name").as("survey"),
        col("user_reference"))
    registry.load(spark, table).join(broadcast(rec), Seq("recording_givid"))
  }

  /** `get_inboveg_classification`: one row per (recording, assigned
    * type); the reference keeps `ActionGroup == "N2k"` rows downstream. */
  def classification(spark: SparkSession): DataFrame =
    scoped(spark, "inboveg_classification")
      .select(col("recording_givid"), col("survey"),
        col("classif").as("type_observed"),
        col("action_group").as("classif_type"),
        col("list_name").as("classif_key"),
        col("cover").as("type_cover"))

  /** `get_inboveg_header`: one row per recording with location/date. */
  def header(spark: SparkSession): DataFrame =
    scopedRecordings(spark)
      .select(col("recording_givid"), col("name").as("survey"),
        col("user_reference"), col("location_code").as("location"),
        col("area"), col("vague_date_begin"), col("vague_date_end"),
        col("latitude"), col("longitude"))

  /** `get_inboveg_recording`: the species × layer observations. */
  def recording(spark: SparkSession): DataFrame =
    scoped(spark, "inboveg_species")
      .select(col("survey"), col("recording_givid"), col("layer_code"),
        col("cover_code").as("layer_cover"),
        col("original_name").as("name_original"),
        col("scientific_name").as("name_scientific"),
        col("phenology_code"),
        col("coverage_code").as("species_cover_code"),
        col("pct_value").as("species_cover"),
        col("recording_scale").as("scale"))

  /** `get_inboveg_layer_cover`: per-layer cover codes + percentages. */
  def layerCover(spark: SparkSession): DataFrame =
    scoped(spark, "inboveg_layer")
      .select(col("survey"), col("recording_givid"), col("user_reference"),
        col("layer_code"), col("layer_description"),
        col("cover_code").as("layer_cover"), col("percentage"))

  /** `get_inboveg_qualifier(qualifier_type = ...)`: the MQ ("measured
    * qualifier") / SQ ("site qualifier") long tables. */
  def qualifier(spark: SparkSession, qualifierType: String): DataFrame =
    scoped(spark, "inboveg_qualifier")
      .where(col("qualifier_type") === qualifierType)
      .select(col("survey"), col("recording_givid"), col("user_reference"),
        col("q1_code"), col("q1_description"),
        col("q2_code"), col("q2_description"),
        col("q3_code"), col("q3_description"), col("elucidation"))

  /** All five frames of the reference's extract block in one call
    * (`query_inboveg.Rmd:40-64`). */
  def extracts(spark: SparkSession,
               qualifierType: String = "MQ"): InbovegExtracts =
    InbovegExtracts(classification(spark), header(spark), recording(spark),
      layerCover(spark), qualifier(spark, qualifierType))
}

/** The five-frame result of one INBOVEG extract run. */
final case class InbovegExtracts(classification: DataFrame, header: DataFrame,
                                 recording: DataFrame, layerCover: DataFrame,
                                 qualifier: DataFrame)

object InbovegSource {

  /** The reference's MQ structure-cover coercion
    * (`query_inboveg.Rmd:56-61`): numeric `Q3Description` wins; a null
    * falls back to the `Q3Code`, where the sub-LOQ marker "ZS"
    * ("zeer schaars") means 0.5 and other codes parse numerically. */
  def structureCover(q3Description: Column, q3Code: Column): Column = {
    def num(c: Column): Column = { // ANSI-safe numeric parse, "," decimals
      val t = translate(trim(c), ",", ".")
      when(t.rlike("^-?[0-9]+(\\.[0-9]+)?$"), t.cast("double"))
    }
    coalesce(num(q3Description),
      when(q3Code === "ZS", lit(0.5)).otherwise(num(q3Code)))
  }
}
