package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** External-variables pipeline — the reference's
  * `process_external_data.Rmd`: joins survey-plot coordinates to
  * external GIS layers and dictionaries to derive per-plot forest-age
  * and minimum-structural-area attributes
  * (`processed/extra_var_mhq/{bosconstantie,msa}_*.tsv`).
  *
  * Shapes re-expressed Spark-first:
  *   - the spatial joins (`st_join`, Rmd:75,113,119,158,167) are the
  *     grid-indexed broadcast PIP join ([[graft.geo.GeoJoin]]) — the
  *     coordinates side never shuffles, the polygon layer broadcasts
  *     with its grid index;
  *   - the `msa_clusters` / `msa_type` lookups (Rmd:78-79,122-123) are
  *     broadcast dictionary joins;
  *   - the paired-coordinate QA check (Rmd:103-106, `pivot_wider` over
  *     periode then a Euclidean distance) is ONE hash aggregation with
  *     conditional-max cycle pivots — no wide-pivot scan, no self-join.
  */
object ExtraVars {

  /** Minimum-structural-area attribution (Rmd:71-81 for the single-type
    * MONEOS flow, Rmd:117-126 for the multi-type flow): PIP-join the
    * coordinates to the habitat-map polygons, then broadcast-join
    * polygon -> cluster -> type rows, keep the requested columns,
    * and dedupe (a plot may hit several polygons of one cluster).
    * `types` is pre-filtered by the caller when a single habitat type
    * is wanted (Rmd:68-69). Only the vbi flow drops plots without an
    * msa match (`!is.na(msa_area_ha)`, Rmd:124); the MONEOS 91E0_sf
    * flow (Rmd:71-81) keeps them as NA rows — `dropNaMsa` selects
    * between the two reference behaviors. */
  def msa(coords: DataFrame, habmapPolys: DataFrame, clusters: DataFrame,
          types: DataFrame, keep: Seq[String], cellSize: Double,
          dropNaMsa: Boolean = true): DataFrame = {
    val joined = graft.geo.GeoJoin
      .pointInPolygonJoin(coords, habmapPolys, "x", "y", "ring", cellSize)
      .join(broadcast(clusters), Seq("polygon_id"), "left")
      .join(broadcast(types), Seq("cluster_id"), "left")
    (if (dropNaMsa) joined.where(col("msa_area_ha").isNotNull) else joined)
      .select(keep.map(col): _*)
      .distinct()
  }

  /** Forest-age attribution (Rmd:111-115): PIP-join the coordinates to
    * the forest-age polygon layer (attribute `blk`), keep the hits. */
  def bosconstantie(coords: DataFrame, agePolys: DataFrame,
                    keep: Seq[String], cellSize: Double): DataFrame =
    graft.geo.GeoJoin
      .pointInPolygonJoin(coords, agePolys, "x", "y", "ring", cellSize)
      .where(col("blk").isNotNull)
      .select(keep.map(col): _*)
      .distinct()

  /** Forest-constancy years from a first-forested year (Rmd:64-66):
    * `bosconstantie = refYear - jaar_bos + 2`. */
  def bosconstantieAge(df: DataFrame, refYear: Int): DataFrame =
    df.withColumn("bosconstantie", lit(refYear) - col("jaar_bos") + lit(2))

  /** Paired-coordinate QA distance (Rmd:96-106): among re-measured
    * plots (periode > 1, at least two distinct periods), pivot the two
    * cycles' coordinates wide and compute the Euclidean re-location
    * distance. The reference pivots with `pivot_wider` after a grouped
    * n_distinct filter and an idgroup null-filter; here both fold into
    * ONE aggregation — the cycle pivots take only idgroup-carrying
    * rows (the reference drops those rows before pivoting) while the
    * period count spans all rows, and plots without any idgroup drop
    * with the final filter. Column names follow the reference
    * (`x_2`/`x_3` etc. for periods 2 and 3). */
  def pairedCoordinateDistance(coords: DataFrame, p1: Int, p2: Int): DataFrame = {
    val k = coords.where(col("periode") > 1)
    def pick(p: Int, c: String) =
      max(when(col("periode") === p && col("idgroup").isNotNull, col(c)))
    val agg = k.groupBy("idplots").agg(
      countDistinct(col("periode")).as("nc"),
      max(col("idgroup")).as("idgroup"),
      pick(p1, "x").as(s"x_$p1"), pick(p1, "y").as(s"y_$p1"),
      pick(p1, "type").as(s"type_$p1"),
      pick(p2, "x").as(s"x_$p2"), pick(p2, "y").as(s"y_$p2"),
      pick(p2, "type").as(s"type_$p2"))
    agg.where(col("nc") >= 2 && col("idgroup").isNotNull)
      .withColumn("distance",
        sqrt(pow(col(s"x_$p1") - col(s"x_$p2"), 2) +
             pow(col(s"y_$p1") - col(s"y_$p2"), 2)))
      .drop("nc")
  }
}
