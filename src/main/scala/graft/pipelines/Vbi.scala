package graft.pipelines

import graft.ops.Relational
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** VBI forest-inventory kernels (SURVEY.md §2.10 K4, §3 E3).
  */
object Vbi {

  /** K4: tree volume tariff evaluation. The reference exports parameter
    * tables (a..g per species and `formule_type`,
    * `/root/reference/src/export_from_vbidwh/export_from_vbidwh.Rmd:231-268`)
    * whose downstream evaluation is a per-type polynomial in perimeter
    * (1-entry) or perimeter+height (2-entry). Data-driven column
    * expression over the broadcast parameter table — no UDF:
    *
    *   type 1 (1-entry):  vol = a + b*c150 + c*c150^2 + d*c150^3
    *   type 2 (2-entry):  vol = a + b*c150 + c*c150^2 + d*h
    *                            + e*c150*h + f*c150^2*h
    *   type 3 (2-entry, log form used for some broadleaves):
    *                      vol = a + b*c150^2 + c*c150^2*h + d*h
    *
    * c150 = perimeter at 1.5 m (m), h = height (m). Unknown types
    * yield NULL (reported, not dropped).
    */
  def treeVolume(trees: DataFrame, params: DataFrame,
                 perimeterCol: String = "perimeter_cm",
                 heightCol: String = "height_m"): DataFrame = {
    val joined = trees.join(broadcast(params), Seq("tree_species_id"), "left")
    val c150 = col(perimeterCol) / 100.0
    val h = col(heightCol)
    def poly1: Column =
      col("a") + col("b") * c150 + col("c") * c150 * c150 +
        col("d") * c150 * c150 * c150
    def poly2: Column =
      col("a") + col("b") * c150 + col("c") * c150 * c150 + col("d") * h +
        col("e") * c150 * h + col("f") * c150 * c150 * h
    def poly3: Column =
      col("a") + col("b") * c150 * c150 + col("c") * c150 * c150 * h + col("d") * h
    joined.withColumn("vol_m3",
      when(col("formule_type") === 1, poly1)
        .when(col("formule_type") === 2, poly2)
        .when(col("formule_type") === 3, poly3))
  }

  /** Dendrometry metrics per tree (the reference's exported
    * `basalarea_m2` column, `processed/fieldmap_mhq/trees_a3a4.yml`):
    * basal area from diameter at breast height, and stem density when
    * expanded by plot weight. Pure column math. */
  def withTreeMetrics(trees: DataFrame, dbhMmCol: String = "dbh_mm"): DataFrame =
    trees.withColumn("basalarea_m2",
      lit(math.Pi) * (col(dbhMmCol) / 2000.0) * (col(dbhMmCol) / 2000.0))

  /** Deadwood volume from line-intersect sampling (the downstream
    * evaluation of the reference's `lim_data` export —
    * `query_fieldmap.Rmd:911-917` ships (diameter_cm, angle_degrees)):
    * Van Wagner (1968) with the tilt correction,
    * V [m3/ha] = pi^2/(8 L) * sum(d_m^2 / cos(angle)) * 10000. */
  def deadwoodVolume(lim: DataFrame, plotCol: String, lineLengthM: Double): DataFrame =
    lim.groupBy(plotCol)
      .agg(
        count(lit(1)).as("n_pieces"),
        (lit(math.Pi * math.Pi / (8 * lineLengthM) * 10000) *
          sum(pow(col("diameter_cm") / 100.0, 2) /
            cos(radians(col("angle_degrees"))))).as("vol_m3_ha"))

  /** E3 step 2: latest-cycle selection per plot
    * (`check_observed_habitat_type.Rmd:87-91,133-139`). */
  def latestCycle(strata: DataFrame): DataFrame =
    Relational.latestPerKey(strata, Seq("plot_id"),
      Seq(col("periode").desc, col("segment_id").asc))

  /** E3 steps 4-5: sequential decision rules with per-rule removed-
    * records reporting (`check_observed_habitat_type.Rmd:186-295`).
    * Each rule is (name, keep-predicate); returns the surviving frame
    * plus one review frame per rule (the reference's check tables). */
  def applyDecisionRules(df: DataFrame, rules: Seq[(String, Column)])
      : (DataFrame, Map[String, DataFrame]) =
    rules.foldLeft((df, Map.empty[String, DataFrame])) {
      case ((current, removed), (name, keep)) =>
        (current.where(keep), removed + (name -> current.where(!keep || keep.isNull)))
    }
}
