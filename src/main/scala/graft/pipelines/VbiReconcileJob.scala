package graft.pipelines

import graft.core.Checks
import graft.geo.GeoJoin
import graft.ops.Relational
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** E3 end-to-end: VBI observed-habitat-type reconciliation
  * (SURVEY.md §3 E3;
  * `/root/reference/src/export_from_vbidwh/check_observed_habitat_type.Rmd`):
  * latest-cycle strata per plot, spatial overlay of plot coordinates on
  * the habitat map, sequential decision rules with per-rule removed-
  * records reporting, merge of manual-check verdicts, key-uniqueness
  * check on the final update table.
  */
object VbiReconcileJob {

  case class Inputs(
      strata: DataFrame,        // plot_id, segment_id, periode, type_observed
      coords: DataFrame,        // plot_id, x, y (CRS 31370)
      habitatPolygons: DataFrame, // polygon_id, ring array<struct<x,y>>
      polygonTypes: DataFrame,  // polygon_id, type, phab
      manualVerdicts: DataFrame) // plot_id, type_observed (reviewer overrides)

  case class Outputs(
      typeObservedUpdate: DataFrame,
      removed: Map[String, DataFrame],
      checks: Map[String, DataFrame])

  def run(in: Inputs, cellSize: Double = 1000.0): Outputs = {
    // latest cycle per plot (`:87-91,133-139`)
    val latest = Vbi.latestCycle(in.strata)

    // spatial overlay: plots x habitat-map polygons (`:146-176`)
    val located = GeoJoin.pointInPolygonJoin(
        latest.join(in.coords, Seq("plot_id")),
        in.habitatPolygons, "x", "y", "ring", cellSize)
      .join(in.polygonTypes, Seq("polygon_id"), "left")
      .withColumnRenamed("type", "type_map")

    // map type agreement flags (W4-style, kept on rows)
    val flagged = Relational.withGroupAny(located, Seq("plot_id"),
      col("type_map") === col("type_observed"), "any_match")

    // sequential decision rules, removed records reported (`:186-295`)
    val (kept, removed) = Vbi.applyDecisionRules(flagged, Seq(
      "rule1_observed_type_known" -> col("type_observed").isNotNull,
      "rule2_map_confirms" -> col("any_match")))

    // merge manual-check verdicts (`:441-462`): reviewer rows replace
    val merged = Relational.applyPatches(
      kept.select("plot_id", "type_observed").distinct(),
      in.manualVerdicts.select("plot_id", "type_observed"),
      keys = Seq("plot_id"))

    val checks = Map(
      "check_dup_final" -> Checks.duplicateKeys(merged, Seq("plot_id")),
      "check_unlocated_plots" ->
        latest.join(located.select("plot_id").distinct(), Seq("plot_id"), "left_anti"))

    Outputs(merged, removed, checks)
  }
}
