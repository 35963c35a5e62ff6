package graft.pipelines

import graft.core.Checks
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** E2 end-to-end: INBOVEG survey preparation (SURVEY.md §3 E2;
  * `/root/reference/src/export_from_inboveg/HT31xx_data_preparation.Rmd`):
  * survey filter, completeness anti-joins, suitability/measured flags,
  * structure-variable typing with LOQ flags, uniqueness checks.
  */
object InbovegPrepJob {

  case class Inputs(
      header: DataFrame,       // recording_givid, survey, type_observed, suitable_raw
      classif: DataFrame,      // recording_givid, survey, type_observed
      qualifiers: DataFrame,   // recording_givid, var_code, var, value
      surveys: Seq[String])

  case class Outputs(
      header: DataFrame,
      siteCharacteristics: DataFrame,
      checks: Map[String, DataFrame])

  def run(in: Inputs): Outputs = {
    // survey filter (`:44-52`)
    val header = in.header.where(col("survey").isin(in.surveys: _*))
    val classif = in.classif.where(col("survey").isin(in.surveys: _*))

    // completeness in both directions (`:76-89`)
    val (missingHeader, missingClassif) =
      Inboveg.completeness(classif, header, "recording_givid")

    // suitability / measured flags (`:128-144`): suitable iff a target
    // type was observed; measured iff any qualifier rows exist
    val withFlags = header
      .withColumn("suitable_mhq",
        col("type_observed").isNotNull && col("type_observed") =!= "gh")
      .join(in.qualifiers.select("recording_givid").distinct()
          .withColumn("measured", lit(true)),
        Seq("recording_givid"), "left")
      .withColumn("measured", coalesce(col("measured"), lit(false)))

    // structure variables: typed numeric-vs-class long table (`:189-321`);
    // scoped to the filtered surveys via semi join (never a collected list)
    val site = Inboveg.loqAdjusted(
      Inboveg.parseStructureValues(
        in.qualifiers.join(header.select("recording_givid"),
          Seq("recording_givid"), "left_semi")))

    val checks = Map(
      "check_missing_header" -> missingHeader,
      "check_missing_classif" -> missingClassif,
      "check_dup_recording" -> Checks.duplicateKeys(withFlags, Seq("recording_givid")),
      "check_dup_site_var" -> Checks.duplicateKeys(site, Seq("recording_givid", "var_code")))

    Outputs(withFlags, site, checks)
  }
}
