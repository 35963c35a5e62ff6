package graft.pipelines

import graft.core.Checks
import graft.io.Vc
import graft.ops.Relational
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** E1 end-to-end: the fieldmap export job (SURVEY.md §3 E1;
  * `/root/reference/src/export_from_fieldmap/query_fieldmap.Rmd`),
  * composed from the operator library:
  *
  *   1. extract   — caller supplies per-cycle raw frames (the source
  *                  registry's JDBC reads in production);
  *   2. union     — cycle-tagged `bind_rows` (U1, `:1314-1366`);
  *   3. normalize — status recode (P12, `:1326-1336`), latest status
  *                  per (plot, cycle) (W2, `:1376-1379`), square-vs-
  *                  circle type resolution (`:1560-1595`);
  *   4. validate  — duplicate-key probes + mixed-type review frames
  *                  (§5.1, materialized not silently dropped);
  *   5. assemble  — missing-data QA table via chained left joins +
  *                  membership flags (`:1640-1663`);
  *   6. load      — date_assessment joined onto every fact table
  *                  (`:1855-1938`) and sorted versioned writes
  *                  (`:1959-1974`).
  */
object FieldmapExportJob {

  case class Inputs(
      gridPointsByCycle: Seq[(Int, DataFrame)], // plot_id, date_status, status_fieldwork
      squareObs: DataFrame,                     // plot_id, type_observed_square
      circleObs: DataFrame,                     // plot_id, segment_id, type_observed_circle
      coverLong: DataFrame,                     // plot_id, layer, coverscale_name, class_id
      coverScales: DataFrame,                   // coverscale_name, class_id, cover_*
      observerDates: DataFrame)                 // plot_id, date_assessment

  case class Outputs(
      sampleStatus: DataFrame,
      typeObserved: DataFrame,
      coverSpecies: DataFrame,
      checkMissingData: DataFrame,
      checks: Map[String, DataFrame])

  /** Status recode of the reference's mixed vocabulary (P12,
    * `query_fieldmap.Rmd:1326-1336` style). */
  def recodeStatus(df: DataFrame): DataFrame =
    df.withColumn("status_fieldwork",
      when(col("status_fieldwork").isin("done", "gedaan", "uitgevoerd"), "done")
        .when(col("status_fieldwork").isin("planned", "gepland"), "planned")
        .when(col("status_fieldwork").isNull, lit(null).cast("string"))
        .otherwise("other"))

  def run(in: Inputs): Outputs = {
    // 2-3: union cycles, recode, latest status per (plot, cycle)
    val unioned = recodeStatus(Relational.unionCycles(in.gridPointsByCycle))
    val sampleStatus = Relational.latestPerKey(unioned,
      Seq("plot_id", "mon_cycle"), Seq(col("date_status").desc))

    // 3b: observed type square-vs-circle resolution
    val typeObserved = Fieldmap.resolveTypeObserved(in.squareObs, in.circleObs)

    // cover dictionary enrichment (K3)
    val covers = Fieldmap.joinCoverScale(in.coverLong, in.coverScales)

    // 6: date_assessment onto facts
    val dates = in.observerDates.select("plot_id", "date_assessment")
    val coverSpecies = covers.join(dates, Seq("plot_id"), "left")

    // 5: missing-data QA — every known plot, flags per source
    val plots = sampleStatus.select("plot_id").distinct()
    val qa0 = Relational.withMembershipFlag(plots, "plot_id",
      typeObserved.where(col("type_observed").isNotNull).select("plot_id"),
      "plot_id", "has_type_observed")
    val qa1 = Relational.withMembershipFlag(qa0, "plot_id",
      covers.where(col("class_id").isNotNull).select("plot_id"),
      "plot_id", "has_cover")
    val checkMissingData = Relational.withMembershipFlag(qa1, "plot_id",
      dates.select("plot_id"), "plot_id", "has_assessment_date")
      .where(!col("has_type_observed") || !col("has_cover") || !col("has_assessment_date"))

    // 4: validation frames (expected empty / reviewed by humans)
    val checks = Map(
      "check_dup_status" ->
        Checks.duplicateKeys(sampleStatus, Seq("plot_id", "mon_cycle")),
      "check_mixed_type" ->
        typeObserved.where(col("is_mixed")).select("plot_id").distinct(),
      "check_unmatched_scale" ->
        covers.where(col("class_id").isNotNull && col("cover_mean").isNull))

    Outputs(sampleStatus, typeObserved, coverSpecies, checkMissingData, checks)
  }

  /** 6b: sorted versioned writes of the assembled tables. */
  def write(out: Outputs, dir: String): Unit = {
    Vc.write(out.sampleStatus, s"$dir/sample_status", Seq("plot_id", "mon_cycle"))
    Vc.write(out.typeObserved.select("plot_id", "segment_id", "type_observed", "is_mixed"),
      s"$dir/type_observed", Seq("plot_id", "segment_id"))
    Vc.write(out.coverSpecies, s"$dir/cover_species", Seq("plot_id", "layer"))
    Vc.write(out.checkMissingData, s"$dir/check_missing_data", Seq("plot_id"))
  }
}
