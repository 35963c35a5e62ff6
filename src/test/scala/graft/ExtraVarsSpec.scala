package graft

import graft.pipelines.ExtraVars
import org.apache.spark.sql.functions._

/** Semantics of the external-variables pipeline
  * (`process_external_data.Rmd`): the msa attribution dedupes
  * multi-polygon hits within a cluster, unmatched plots drop, the
  * forest-constancy derivation is refYear - jaar_bos + 2, and the
  * paired-coordinate check pivots only idgroup-carrying rows while
  * counting periods over all rows. */
class ExtraVarsSpec extends SparkSuite {
  import spark.implicits._

  private def ring(x0: Double, y0: Double, x1: Double, y1: Double) =
    Seq((x0, y0), (x1, y0), (x1, y1), (x0, y1))

  test("msa: PIP + cluster/type joins, distinct, unmatched drop") {
    // two overlapping polygons in one cluster, one polygon without a
    // type row, one point outside everything
    val pts = Seq((1L, 2L, 1.0, 1.0), (2L, 2L, 50.0, 50.0))
      .toDF("plot_id", "periode", "x", "y")
    val polys = Seq((10L, ring(0, 0, 2, 2)), (11L, ring(0.5, 0.5, 3, 3)),
        (12L, ring(49, 49, 51, 51)))
      .map { case (id, r) => (id, r.map { case (x, y) => (x, y) }) }
      .toDF("polygon_id", "ring0")
      .select(col("polygon_id"), transform(col("ring0"),
        p => struct(p.getField("_1").as("x"), p.getField("_2").as("y")))
        .as("ring"))
    val clusters = Seq((10L, 100L), (11L, 100L), (12L, 200L))
      .toDF("polygon_id", "cluster_id")
    val types = Seq((100L, "91E0_sf", 12.5)) // cluster 200 has no type
      .toDF("cluster_id", "type", "msa_area_ha")
    val out = ExtraVars.msa(pts, polys, clusters, types,
      Seq("plot_id", "type", "msa_area_ha"), cellSize = 4.0).collect()
    // plot 1 hits polygons 10 and 11 -> ONE deduped row; plot 2's
    // cluster has no type row -> dropped
    assert(out.toSeq.map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      == Seq((1L, "91E0_sf", 12.5)))
  }

  test("bosconstantieAge: refYear - jaar_bos + 2") {
    val df = Seq((1L, 1975), (2L, 2023)).toDF("plot_id", "jaar_bos")
    val got = ExtraVars.bosconstantieAge(df, 2025)
      .select("plot_id", "bosconstantie").as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 52, 2L -> 4))
  }

  test("pairedCoordinateDistance: idgroup-null rows feed the count, not the pivot") {
    val coords = Seq(
      // plot 1: both cycles, idgroup present -> distance 5
      (1L, 2, Some(7L), "a", 0.0, 0.0),
      (1L, 3, Some(7L), "a", 3.0, 4.0),
      // plot 2: cycle-3 row lost its idgroup -> pivot side null, but
      // the plot still passes the two-period gate (max keeps idgroup)
      (2L, 2, Some(9L), "b", 1.0, 1.0),
      (2L, 3, None, "b", 2.0, 2.0),
      // plot 3: single cycle -> dropped
      (3L, 2, Some(5L), "c", 0.0, 0.0),
      // plot 4: no idgroup at all -> dropped
      (4L, 2, None, "d", 0.0, 0.0),
      (4L, 3, None, "d", 1.0, 1.0))
      .toDF("idplots", "periode", "idgroup", "type", "x", "y")
    val out = ExtraVars.pairedCoordinateDistance(coords, 2, 3)
      .orderBy("idplots").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(out(0).getAs[Double]("distance") == 5.0)
    assert(out(1).isNullAt(out(1).fieldIndex("distance")))
    assert(out(1).getAs[Double]("x_2") == 1.0)
  }
}
