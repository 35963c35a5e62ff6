package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Census polygon reconstruction shared by [[CensusShapesSpec]] (the
  * estimator replay) and [[LsviReportJobSpec]] (the publication
  * composition): rebuild one polygon per (stratum, verdict) from a
  * published census table's Binnen and Habitattype rows (Buiten areas
  * are the difference — the tables publish no Buiten stratum), keyed
  * by optional detail columns. */
object CensusFixtures {

  def polysFrom(pub: DataFrame, detail: Seq[String]): DataFrame = {
    val dcols = detail.map(col)
    val binnen = pub.where(col("type_resultaat") === "SBZH" &&
      col("sbzh") === "Binnen")
    val all = pub.where(col("type_resultaat") === "Habitattype")
    val keys = Seq("habitattype") ++ detail
    val j = all.select((col("habitattype") +:
        col("opp_gunstig_ha").cast("double").as("tg") +:
        col("opp_ongunstig_ha").cast("double").as("to") +:
        col("opp_onbekend_ha").cast("double").as("tu") +: dcols): _*)
      .join(binnen.select((col("habitattype") +:
        col("opp_gunstig_ha").cast("double").as("bg") +:
        col("opp_ongunstig_ha").cast("double").as("bo") +:
        col("opp_onbekend_ha").cast("double").as("bu") +: dcols): _*),
        keys, "left")
    j.select((col("habitattype") +:
        explode(array(
          struct(lit(1).as("in_sac"), lit("gunstig").as("verdict"),
            coalesce(col("bg"), lit(0.0)).as("area_ha")),
          struct(lit(1).as("in_sac"), lit("ongunstig").as("verdict"),
            coalesce(col("bo"), lit(0.0)).as("area_ha")),
          struct(lit(1).as("in_sac"), lit("onbekend").as("verdict"),
            coalesce(col("bu"), lit(0.0)).as("area_ha")),
          struct(lit(0).as("in_sac"), lit("gunstig").as("verdict"),
            (col("tg") - coalesce(col("bg"), lit(0.0))).as("area_ha")),
          struct(lit(0).as("in_sac"), lit("ongunstig").as("verdict"),
            (col("to") - coalesce(col("bo"), lit(0.0))).as("area_ha")),
          struct(lit(0).as("in_sac"), lit("onbekend").as("verdict"),
            (col("tu") - coalesce(col("bu"), lit(0.0))).as("area_ha"))))
          .as("p") +: dcols): _*)
      .select((col("habitattype") +: col("p.in_sac").as("in_sac") +:
        col("p.verdict").as("verdict") +: col("p.area_ha").as("area_ha") +:
        dcols): _*)
      .where(col("area_ha") > 0)
  }
}
