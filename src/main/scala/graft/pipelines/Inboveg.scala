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
}
