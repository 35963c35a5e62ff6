package graft

import graft.geo.{GeoPackage, GeoPackageWriter, Wkb}
import org.apache.spark.sql.functions._

/** S7 write half: files produced by [[GeoPackageWriter]] must read
  * back bit-faithfully through the independent [[GeoPackage]] SQLite
  * walker — including multi-page b-trees (interior pages) and
  * overflow-chain blobs. */
class GeoPackageWriterSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(name: String) =
    java.nio.file.Files.createTempDirectory("gpkgw").resolve(name).toString

  private def square(cx: Double, cy: Double, r: Double): Array[Byte] = {
    val xs = Array(cx - r, cx + r, cx + r, cx - r, cx - r)
    val ys = Array(cy - r, cy - r, cy + r, cy + r, cy - r)
    Wkb.encodePolygonRings(Seq((xs, ys)))
  }

  test("small feature table round-trips: schema, values, nulls, geometry") {
    val path = tmp("small.gpkg")
    val df = Seq(
      (1L, "poly_a", Some(2.5), square(0, 0, 1)),
      (2L, "poly_b", None, square(10, 10, 2)),
      (3L, null.asInstanceOf[String], Some(-1.25), null.asInstanceOf[Array[Byte]]))
      .toDF("pid", "name", "area", "geom")
      .withColumn("area", col("area").cast("double"))
    GeoPackageWriter.write(path, "habitat", df, geomCol = "geom", srid = 31370)

    assert(GeoPackage.tables(path).toSet === Set(("habitat", "features")))
    val back = GeoPackage.read(spark, path, "habitat")
    assert(back.columns.toSeq === Seq("fid", "pid", "name", "area", "geom"))
    assert(back.select("fid").as[Long].collect().sorted.toSeq === Seq(1L, 2L, 3L))
    val r2 = back.where($"pid" === 2L).head()
    assert(r2.getAs[String]("name") === "poly_b")
    assert(r2.isNullAt(r2.fieldIndex("area")))
    val r3 = back.where($"pid" === 3L).head()
    assert(r3.isNullAt(r3.fieldIndex("name")) &&
      r3.getAs[Double]("area") === -1.25 &&
      r3.isNullAt(r3.fieldIndex("geom")))
    // the GP header strips back to the exact WKB that went in
    val g1 = back.where($"pid" === 1L).select("geom").as[Array[Byte]].head()
    assert(g1.toSeq === square(0, 0, 1).toSeq)
    val (tpe, rings) = Wkb.decodeTyped(g1)
    assert(tpe === 3 && rings.length === 1 && rings(0)._1.length === 5)
  }

  test("multi-page b-tree: 5000 rows force interior pages and read back") {
    val path = tmp("big.gpkg")
    val df = (1 to 5000).map(i =>
        (i.toLong, s"poly_$i", i * 0.5, square(i, i, 0.25)))
      .toDF("pid", "name", "area", "geom")
    GeoPackageWriter.write(path, "many", df, geomCol = "geom")
    val back = GeoPackage.read(spark, path, "many")
    assert(back.count() === 5000)
    assert(back.agg(sum("pid")).as[Long].head() === 5000L * 5001 / 2)
    val mid = back.where($"pid" === 2500L).head()
    assert(mid.getAs[String]("name") === "poly_2500" &&
      mid.getAs[Double]("area") === 1250.0)
    assert(Wkb.decodeTyped(mid.getAs[Array[Byte]]("geom"))._1 === 3)
  }

  test("overflow chains: a blob spanning several pages survives") {
    val path = tmp("overflow.gpkg")
    // ~20 KB of ring coordinates -> payload far beyond one 4 KB page
    val n = 1200
    val xs = (0 until n).map(i => math.cos(2 * math.Pi * i / (n - 1))).toArray
    val ys = (0 until n).map(i => math.sin(2 * math.Pi * i / (n - 1))).toArray
    val big = Wkb.encodePolygonRings(Seq((xs.updated(n - 1, xs(0)), ys.updated(n - 1, ys(0)))))
    val df = Seq((1L, "big", big), (2L, "small", square(0, 0, 1)))
      .toDF("pid", "name", "geom")
    GeoPackageWriter.write(path, "ovf", df, geomCol = "geom")
    val back = GeoPackage.read(spark, path, "ovf")
    val got = back.where($"pid" === 1L).select("geom").as[Array[Byte]].head()
    assert(got.toSeq === big.toSeq)
    assert(back.where($"pid" === 2L).select("geom").as[Array[Byte]].head().toSeq
      === square(0, 0, 1).toSeq)
  }

  test("metadata tables carry the declared srid and geometry type") {
    val path = tmp("meta.gpkg")
    val df = Seq((1L, square(0, 0, 1))).toDF("pid", "geom")
    GeoPackageWriter.write(path, "layer", df, geomCol = "geom",
      srid = 4326, geometryType = "POLYGON")
    val geomCols = GeoPackage.read(spark, path, "gpkg_geometry_columns")
    val row = geomCols.head()
    assert(row.getAs[String]("table_name") === "layer" &&
      row.getAs[String]("column_name") === "geom" &&
      row.getAs[Long]("srs_id") === 4326L)
    val srs = GeoPackage.read(spark, path, "gpkg_spatial_ref_sys")
    assert(srs.select("srs_id").as[Long].collect().toSet === Set(-1L, 0L, 4326L))
  }

  test("driver-side sink refuses an over-budget frame with a clear error") {
    val path = tmp("guarded.gpkg")
    val df = (1 to 50).map(i => (i.toLong, square(i, i, 0.5))).toDF("pid", "geom")
    val err = intercept[IllegalArgumentException] {
      GeoPackageWriter.write(path, "toolarge", df, geomCol = "geom", maxRows = 10L)
    }
    assert(err.getMessage.contains("50 rows exceeds maxRows=10"))
    assert(err.getMessage.contains("WKB-in-parquet"))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(path)),
      "guard must fire before any bytes are written")
    // an explicit raise still writes fine
    GeoPackageWriter.write(path, "toolarge", df, geomCol = "geom", maxRows = 50L)
    assert(GeoPackage.read(spark, path, "toolarge").count() === 50)
  }
}
