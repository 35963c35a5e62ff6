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

  // ===== full 16-table export (`query_fieldmap.Rmd:1959-1974`) ============

  /** The remaining raw frames of the full export. Forest-habitat facts
    * (trees/shoots/logs/standdescription) carry no `mon_cycle` — they
    * join on `plot_id` alone, as in the reference (`:1911-1936`).
    * `core.gridPointsByCycle` frames must additionally carry
    * `info_status_fieldwork`, `remark`, and `db` (source-database tag)
    * passenger columns — they flow through the latest-status window
    * untouched. */
  case class FullInputs(
      core: Inputs,
      dateRecords: DataFrame,     // plot_id, mon_cycle, date_vegetation, date_dendro, date_assessment
      coordinates: DataFrame,     // plot_id, mon_cycle, x, y
      coverVeglayers: DataFrame,  // plot_id, mon_cycle, layer, cover
      structureVars: DataFrame,   // plot_id, segment_id, mon_cycle, structure_var, cover
      treesA3a4: DataFrame,       // plot_id, segment_id, tree_id, ...
      treesA2: DataFrame,         // plot_id, name_nl, ...
      shoots: DataFrame,          // plot_id, tree_id, shoot_id, ...
      logs: DataFrame,            // plot_id, idline_intersect_method, ...
      standdescription: DataFrame, // plot_id, segment_id, landuse, stand_age, stand_type, mix_type
      knownTypes: Seq[String] = Seq.empty) // `types$type` dictionary (:1882)

  /** All 16 versioned tables by their reference names + check frames. */
  case class FullOutputs(tables: Map[String, DataFrame],
                         checks: Map[String, DataFrame])

  /** The reference's info-status vocabulary (`:1874-1881`). */
  private val InaccessibleShort = "tijdelijk geen toestemming/geen toegang (eigenaar/hond/vee)"
  private val InaccessibleLong = "geen toestemming/geen toegang (eigenaar/hond/vee)"
  private val NotMeasurableShort = "opname tijdelijk onmogelijk (gemaaid/te nat/ondoordringbaar)"
  private val NotMeasurableLong = "opname onmogelijk (gemaaid/begraasd/te nat/ondoordringbaar)"
  private val NoHabitat = "geen habitat (akker, houtkant, tuin,...)"
  private val Completed = "100% afgewerkt"

  /** `date_assessment` resolution (`:1505-1518`): forest rows get
    * `pmin(date_vegetation, date_dendro)` (Spark's `least` skips nulls,
    * matching `na.rm = TRUE`), then the max assessment date per
    * distinct (cycle, plot, veg-date, dendro-date) record. */
  def resolveDateAssessment(dates: DataFrame): DataFrame =
    dates
      .withColumn("date_assessment",
        coalesce(col("date_assessment"),
          least(col("date_vegetation"), col("date_dendro"))))
      .distinct()
      .groupBy("mon_cycle", "plot_id", "date_vegetation", "date_dendro")
      .agg(max("date_assessment").as("date_assessment"))

  /** The per-fact date-join idiom (`:1855-1938`): inner join the
    * (plot, cycle, date) slice of sample_status. Facts without
    * `mon_cycle` (forest dendro tables) join on plot alone and inherit
    * the cycle. The (broadcastable) slice is tiny — one row per plot ×
    * cycle — so at scale every fact table keeps its own partitioning. */
  def withAssessmentDate(fact: DataFrame, statusDate: DataFrame,
                         keys: Seq[String]): DataFrame =
    fact.join(
      broadcast(statusDate.select("plot_id", "mon_cycle", "date_assessment")
        .distinct()), keys)

  def runFull(in: FullInputs): FullOutputs = {
    val base = run(in.core)
    val ss = base.sampleStatus

    val dateAssessment = resolveDateAssessment(in.dateRecords)
    val ssd = ss
      .join(broadcast(dateAssessment.select("plot_id", "mon_cycle", "date_assessment")),
        Seq("plot_id", "mon_cycle"), "left")
      .withColumn("date_assessment",
        coalesce(col("date_assessment"), to_date(col("date_status"))))

    val byPlotCycle = Seq("plot_id", "mon_cycle")
    val byPlot = Seq("plot_id")
    val typeObservedDate = withAssessmentDate(
      base.typeObserved.dropDuplicates(), ssd, byPlot)
    val coverSpeciesDate = base.coverSpecies // dates already joined in run()
    val coverVeglayersDate = withAssessmentDate(in.coverVeglayers, ssd, byPlotCycle)
    val structureVarsDate = withAssessmentDate(in.structureVars, ssd, byPlotCycle)
    val coordinatesDate = withAssessmentDate(in.coordinates, ssd, byPlotCycle)
    val treesA3a4Date = withAssessmentDate(in.treesA3a4, ssd, byPlot)
    val treesA2Date = withAssessmentDate(in.treesA2, ssd, byPlot)
    val shootsDate = withAssessmentDate(in.shoots, ssd, byPlot)
    val logsDate = withAssessmentDate(in.logs, ssd, byPlot)
    // standdescription: date join + the stand-variable melt (`:1936-1944`)
    val standMelt = graft.ops.Reshape.melt(
      withAssessmentDate(in.standdescription, ssd, byPlot),
      ids = Seq("plot_id", "mon_cycle", "date_assessment", "segment_id", "landuse"),
      values = Seq("stand_age", "stand_type", "mix_type"),
      varName = "variable", valName = "category")

    // data_overview (`:1640-1663`): membership flags per source table
    val isForest = col("db").isin("foresthab", "foresthab_past2020")
    val isOpenhab = col("db").rlike("openhab") || col("db").isNull
    var qa = ssd
    def flag(lookup: DataFrame, as: String): Unit =
      qa = Relational.withMembershipFlag(qa, "plot_id",
        lookup.select("plot_id"), "plot_id", as)
    flag(in.coordinates, "coordinates_record")
    flag(in.core.coverLong, "cover_species_record")
    flag(in.coverVeglayers, "cover_veglayers_record")
    flag(in.treesA3a4, "__a3a4")
    flag(in.treesA2, "__a2")
    flag(in.logs, "__logs")
    flag(in.structureVars, "__struct")
    val typeObs = base.typeObserved.where(col("type_observed").isNotNull)
      .select("plot_id", "type_observed").dropDuplicates()
    val dataOverview = qa
      .join(broadcast(typeObs), Seq("plot_id"), "left")
      .withColumn("a3a4_record", when(isForest, col("__a3a4")))
      .withColumn("a2_record", when(isForest, col("__a2")))
      .withColumn("logs_record", when(isForest, col("__logs")))
      .withColumn("dendro_record",
        col("a3a4_record") || col("a2_record") || col("logs_record"))
      .withColumn("structure_openhab_record", when(isOpenhab, col("__struct")))
      .withColumn("inaccessible",
        when(col("info_status_fieldwork") === InaccessibleShort, "short term")
          .when(col("info_status_fieldwork") === InaccessibleLong, "long term"))
      .withColumn("not_measurable",
        when(col("info_status_fieldwork") === NotMeasurableShort, "short term")
          .when(col("info_status_fieldwork") === NotMeasurableLong, "long term"))
      .withColumn("assessment_source",
        when((col("inaccessible").isNull && col("not_measurable").isNull) ||
          (if (in.knownTypes.isEmpty) col("type_observed").isNotNull
           else col("type_observed").isin(in.knownTypes: _*)) ||
          col("type_observed") === NoHabitat, "field assessment"))
      .withColumn("lsvi_measurement", col("info_status_fieldwork") === Completed)
      .drop("__a3a4", "__a2", "__logs", "__struct")

    // assessments (`:1665-1668`): field-assessed or explained rows only
    val assessments = dataOverview
      .where(!(col("assessment_source").isNull && col("inaccessible").isNull &&
        col("not_measurable").isNull))
      .select("mon_cycle", "plot_id", "status_fieldwork", "info_status_fieldwork",
        "assessment_source", "date_assessment", "inaccessible", "not_measurable",
        "type_observed", "lsvi_measurement")

    // habitat-class QA splits (`:1692-1700`, `:1797-1805`)
    val checkOpenhab = dataOverview.where(isOpenhab &&
        (col("date_assessment").isNull || !col("cover_species_record") ||
          !coalesce(col("structure_openhab_record"), lit(true))))
      .select("plot_id", "mon_cycle", "date_assessment", "status_fieldwork",
        "info_status_fieldwork", "cover_species_record", "structure_openhab_record")
    val checkForesthab = dataOverview.where(isForest &&
        (col("date_assessment").isNull || !col("cover_species_record") ||
          !coalesce(col("dendro_record"), lit(true))))
      .select("plot_id", "mon_cycle", "date_assessment", "status_fieldwork",
        "info_status_fieldwork", "cover_species_record", "dendro_record",
        "a2_record", "a3a4_record")

    FullOutputs(
      tables = Map(
        "sample_status" -> ssd,
        "type_observed" -> typeObservedDate,
        "cover_veglayers" -> coverVeglayersDate,
        "cover_species" -> coverSpeciesDate,
        "structure_vars" -> structureVarsDate,
        "date_assessment" -> dateAssessment,
        "coordinates" -> coordinatesDate,
        "trees_a3a4" -> treesA3a4Date,
        "trees_a2" -> treesA2Date,
        "standdescription" -> standMelt,
        "shoots" -> shootsDate,
        "logs" -> logsDate,
        "data_overview" -> dataOverview,
        "assessments" -> assessments,
        "check_missing_data_foresthab" -> checkForesthab,
        "check_missing_data_openhab" -> checkOpenhab),
      checks = base.checks ++ Map(
        "check_date_double" -> Checks.duplicateKeys(ssd, byPlotCycle),
        "check_coordinates_double" ->
          Checks.duplicateKeys(in.coordinates, byPlotCycle)))
  }

  /** Reference sort keys per table (`:1959-1974`), intersected with the
    * columns actually present. */
  private val sortKeys: Map[String, Seq[String]] = Map(
    "sample_status" -> Seq("plot_id", "date_assessment"),
    "type_observed" -> Seq("plot_id", "segment_id", "date_assessment"),
    "cover_veglayers" -> Seq("plot_id", "date_assessment", "layer"),
    "cover_species" -> Seq("plot_id", "date_assessment", "layer"),
    "structure_vars" -> Seq("plot_id", "segment_id", "date_assessment", "structure_var"),
    "date_assessment" -> Seq("plot_id", "mon_cycle"),
    "coordinates" -> Seq("plot_id", "date_assessment"),
    "trees_a3a4" -> Seq("plot_id", "segment_id", "tree_id", "date_assessment"),
    "trees_a2" -> Seq("plot_id", "date_assessment"),
    "standdescription" -> Seq("plot_id", "segment_id", "date_assessment", "variable"),
    "shoots" -> Seq("plot_id", "tree_id", "shoot_id"),
    "logs" -> Seq("plot_id", "date_assessment", "idline_intersect_method"),
    "data_overview" -> Seq("plot_id"),
    "assessments" -> Seq("plot_id", "date_assessment", "mon_cycle"),
    "check_missing_data_foresthab" -> Seq("plot_id", "mon_cycle"),
    "check_missing_data_openhab" -> Seq("plot_id", "mon_cycle"))

  /** Sorted versioned write of the full 16-table export. */
  def writeFull(out: FullOutputs, dir: String): Unit =
    out.tables.foreach { case (name, df) =>
      Vc.write(df, s"$dir/$name", sortKeys(name).filter(df.columns.contains))
    }
}
