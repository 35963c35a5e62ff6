package graft.geo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Spatial point-in-polygon join (J11) with a grid-index prefilter —
  * the SURVEY.md §4 "custom Catalyst work" item 2, realized as a
  * composed plan instead of a planner rule:
  *
  *   1. each polygon is exploded to the grid cells its bbox covers
  *      (small side; the reference's habitat map is ~1e5 polygons);
  *   2. each point computes its single grid cell — a map-only pass;
  *   3. broadcast-hash join on the cell key;
  *   4. exact ray-casting test post-filter.
  *
  * At 100 TB the points side never shuffles: cell derivation is
  * narrow, the polygon-cell index broadcasts, and the exact test is a
  * per-row expression. Cell size should approximate the median
  * polygon diameter so bbox explosion stays O(1) cells per polygon.
  */
object GeoJoin {

  /** `points`: (pointCols..., x, y); `polygons`: (polyCols..., ring).
    * Returns points joined to every polygon whose ring contains them
    * (inner join; points in no polygon drop out — use a left variant
    * downstream if the reference flow needs "unmatched" reporting). */
  def pointInPolygonJoin(points: DataFrame, polygons: DataFrame,
                         xCol: String, yCol: String, ringCol: String,
                         cellSize: Double): DataFrame = {
    val cellified = polygons
      .withColumn("__xs", transform(col(ringCol), p => p.getField("x")))
      .withColumn("__ys", transform(col(ringCol), p => p.getField("y")))
      .withColumn("__cx0", floor(array_min(col("__xs")) / cellSize))
      .withColumn("__cx1", floor(array_max(col("__xs")) / cellSize))
      .withColumn("__cy0", floor(array_min(col("__ys")) / cellSize))
      .withColumn("__cy1", floor(array_max(col("__ys")) / cellSize))
      .withColumn("__cellx", explode(sequence(col("__cx0"), col("__cx1"))))
      .withColumn("__celly", explode(sequence(col("__cy0"), col("__cy1"))))
      .drop("__xs", "__ys", "__cx0", "__cx1", "__cy0", "__cy1")

    val cells = points
      .withColumn("__cellx", floor(col(xCol) / cellSize))
      .withColumn("__celly", floor(col(yCol) / cellSize))

    cells.join(broadcast(cellified), Seq("__cellx", "__celly"))
      .where(GeoFunctions.pointInRing(col(ringCol), col(xCol), col(yCol)))
      .drop("__cellx", "__celly")
  }

  /** J11 against multipolygon layers with holes — the shape of the
    * reference's habitat map (check_observed_habitat_type.Rmd:99,148).
    * `polygons` carries `ringsCol: array<array<struct<x,y>>>` (e.g. from
    * [[WkbFunctions.wkbToRings]]); containment is the even-odd rule over
    * all rings, the grid index covers the bbox of all parts. Same scale
    * shape as [[pointInPolygonJoin]]: the points side never shuffles. */
  def pointInMultiPolygonJoin(points: DataFrame, polygons: DataFrame,
                              xCol: String, yCol: String, ringsCol: String,
                              cellSize: Double): DataFrame = {
    val cellified = polygons
      .withColumn("__xs", flatten(transform(col(ringsCol),
        r => transform(r, p => p.getField("x")))))
      .withColumn("__ys", flatten(transform(col(ringsCol),
        r => transform(r, p => p.getField("y")))))
      .withColumn("__cx0", floor(array_min(col("__xs")) / cellSize))
      .withColumn("__cx1", floor(array_max(col("__xs")) / cellSize))
      .withColumn("__cy0", floor(array_min(col("__ys")) / cellSize))
      .withColumn("__cy1", floor(array_max(col("__ys")) / cellSize))
      .withColumn("__cellx", explode(sequence(col("__cx0"), col("__cx1"))))
      .withColumn("__celly", explode(sequence(col("__cy0"), col("__cy1"))))
      .drop("__xs", "__ys", "__cx0", "__cx1", "__cy0", "__cy1")

    val cells = points
      .withColumn("__cellx", floor(col(xCol) / cellSize))
      .withColumn("__celly", floor(col(yCol) / cellSize))

    cells.join(broadcast(cellified), Seq("__cellx", "__celly"))
      .where(GeoFunctions.pointInRings(col(ringsCol), col(xCol), col(yCol)))
      .drop("__cellx", "__celly")
  }
}
