package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** E2 INBOVEG data-preparation kernels (SURVEY.md §3 E2;
  * `/root/reference/src/export_from_inboveg/HT31xx_data_preparation.Rmd:189-321`):
  * restructure raw qualifier values into a typed numeric-vs-class long
  * table with limit-of-quantification (LOQ) flags.
  *
  * Raw `value` strings mix: decimal-comma numerics ("2,5"), LOQ-marked
  * numerics ("<0,5", ">10"), and categorical class codes ("K2"). The
  * reference parses with `as.numeric(str_replace(",", "."))` after
  * stripping the marker and halves below-LOQ values downstream
  * (`HT31xx_LSVI.Rmd:129-132`).
  */
object Inboveg {

  /** Adds is_below_LOQ / is_above_LOQ / is_numeric / value_numeric to a
    * qualifier table's raw string `valueCol`. Pure column expressions —
    * regexes are anchored and cheap, no UDF. */
  def parseStructureValues(df: DataFrame, valueCol: String = "value"): DataFrame = {
    val raw = trim(col(valueCol))
    val below = raw.startsWith("<")
    val above = raw.startsWith(">")
    val stripped = translate(regexp_replace(raw, "^[<>]\\s*", ""), ",", ".")
    val numeric = stripped.rlike("^[0-9]+(\\.[0-9]+)?$")
    df.withColumn("is_below_LOQ", below)
      .withColumn("is_above_LOQ", above)
      .withColumn("is_numeric", numeric)
      .withColumn("value_numeric", when(numeric, stripped.cast("double")))
  }

  /** LOQ halving used when feeding the LSVI engine
    * (`HT31xx_LSVI.Rmd:129-132`): below-LOQ measurements enter as
    * half the quantification limit. */
  def loqAdjusted(df: DataFrame): DataFrame =
    df.withColumn("value_adjusted",
      when(col("is_below_LOQ"), col("value_numeric") / 2)
        .otherwise(col("value_numeric")))

  /** Completeness anti-joins (`HT31xx_data_preparation.Rmd:76-89`):
    * recordings present in the classification but missing from the
    * measurement table, and vice versa. */
  def completeness(classif: DataFrame, measured: DataFrame,
                   key: String = "recording_givid"): (DataFrame, DataFrame) =
    (classif.join(measured, Seq(key), "left_anti"),
      measured.join(classif, Seq(key), "left_anti"))

  /** HT3260 sitequal spread + recode chain
    * (`/root/reference/src/export_from_inboveg/HT3260_data_preparation.Rmd:70-86`):
    * qualifier rows whose value carries the "Betrouwbaarheid opname:"
    * prefix become the `reliability` column, "Geen opname:" rows the
    * `reason_no_survey` column (R2 spread, here a deterministic
    * min-pick pivot); the prefixes are stripped, "niet toegankelijk"
    * recodes to "ongeschikt", and the not-measured comment concatenates
    * the reason with any explicit comment row. Input:
    * (recording_givid, value, comment). */
  def sitequalSpread(sitequal: DataFrame): DataFrame = {
    val spread = sitequal
      .groupBy("recording_givid")
      .agg(
        min(when(col("value").contains("Betrouwbaarheid opname:"), col("value")))
          .as("reliability"),
        min(when(col("value").contains("Geen opname:"), col("value")))
          .as("reason_no_survey"),
        min(col("comment")).as("comment"))
      .withColumn("reliability",
        regexp_replace(col("reliability"), "Betrouwbaarheid opname: ", ""))
      .withColumn("reason_no_survey",
        regexp_replace(
          regexp_replace(col("reason_no_survey"), "Geen opname: ", ""),
          "niet toegankelijk", "ongeschikt"))
    spread.withColumn("comment_not_measured",
      when(col("comment").isNull, col("reason_no_survey"))
        .otherwise(concat_ws("; ", col("reason_no_survey"), col("comment"))))
      .drop("comment")
  }

  /** HT3260 header assembly
    * (`HT3260_data_preparation.Rmd:88-115` + flag definitions at
    * `:157-178`): the N2k classification value recodes through the
    * declared factor levels (-9 → gh, 0 → unknown, 3260 → 3260);
    * `suitable_mhq` = observed 3260 with no no-survey reason;
    * `measured` = the recording appears in ALL THREE measurement
    * extracts (structure, layer qualifiers, vegetation) — the
    * reference's `no_survey` union of anti-joins, kept as joins on the
    * fact side (never a collected id list). */
  def ht3260Header(header: DataFrame, classif: DataFrame, sitequal: DataFrame,
                   structure: DataFrame, layerqual: DataFrame,
                   vegetation: DataFrame): DataFrame = {
    def presentIn(df: DataFrame, flag: String) =
      df.select("recording_givid").distinct().withColumn(flag, lit(true))
    header
      .join(classif.select(col("recording_givid"), col("value_code")),
        Seq("recording_givid"), "left")
      .withColumn("type_observed",
        when(col("value_code") === "-9", "gh")
          .when(col("value_code") === "0", "unknown")
          .when(col("value_code") === "3260", "3260"))
      .drop("value_code")
      .join(sitequalSpread(sitequal), Seq("recording_givid"), "left")
      .withColumn("suitable_mhq",
        col("type_observed") === "3260" && col("reason_no_survey").isNull)
      .join(presentIn(structure, "has_structure"), Seq("recording_givid"), "left")
      .join(presentIn(layerqual, "has_layers"), Seq("recording_givid"), "left")
      .join(presentIn(vegetation, "has_vegetation"), Seq("recording_givid"), "left")
      .withColumn("measured",
        coalesce(col("has_structure"), lit(false)) &&
          coalesce(col("has_layers"), lit(false)) &&
          coalesce(col("has_vegetation"), lit(false)))
      .drop("has_structure", "has_layers", "has_vegetation")
  }
}
