package graft

import graft.geo.{GeoFunctions, GeoJoin, GeoKernels}
import graft.pipelines.PlotSegments
import org.apache.spark.sql.functions._

class GeoSpec extends SparkSuite {
  import spark.implicits._

  private def ring(pts: (Double, Double)*) = pts.map { case (x, y) => (x, y) }

  test("pointInRing: unit square") {
    val xs = Array(0.0, 1.0, 1.0, 0.0)
    val ys = Array(0.0, 0.0, 1.0, 1.0)
    assert(GeoKernels.pointInRing(xs, ys, 0.5, 0.5))
    assert(!GeoKernels.pointInRing(xs, ys, 1.5, 0.5))
    assert(!GeoKernels.pointInRing(xs, ys, -0.1, 0.5))
  }

  test("area: shoelace on square and triangle, either orientation") {
    assert(GeoKernels.area(Array(0, 4, 4, 0.0), Array(0, 0, 4, 4.0)) === 16.0)
    assert(GeoKernels.area(Array(0, 0, 4, 4.0), Array(0, 4, 4, 0.0)) === 16.0)
    assert(GeoKernels.area(Array(0, 2, 0.0), Array(0, 0, 3.0)) === 3.0)
  }

  test("circleIntersectionArea: analytic cases") {
    val bigSq = (Array(-20.0, 20, 20, -20), Array(-20.0, -20, 20, 20))
    // circle fully inside polygon -> pi r^2
    val full = GeoKernels.circleIntersectionArea(bigSq._1, bigSq._2, 0, 0, 9)
    assert(math.abs(full - math.Pi * 81) < 1e-9)
    // polygon fully inside circle -> polygon area
    val small = GeoKernels.circleIntersectionArea(
      Array(-1.0, 1, 1, -1), Array(-1.0, -1, 1, 1), 0, 0, 9)
    assert(math.abs(small - 4.0) < 1e-9)
    // half plane: square [0,20]x[-20,20], circle at origin -> half disc
    val half = GeoKernels.circleIntersectionArea(
      Array(0.0, 20, 20, 0), Array(-20.0, -20, 20, 20), 0, 0, 9)
    assert(math.abs(half - math.Pi * 81 / 2) < 1e-9)
    // disjoint -> 0
    val none = GeoKernels.circleIntersectionArea(
      Array(100.0, 101, 101, 100), Array(0.0, 0, 1, 1), 0, 0, 9)
    assert(math.abs(none) < 1e-9)
  }

  test("circleIntersectionArea matches Monte Carlo on an L-shaped ring") {
    val xs = Array(0.0, 12, 12, 6, 6, 0)
    val ys = Array(0.0, 0, 5, 5, 12, 12)
    val exact = GeoKernels.circleIntersectionArea(xs, ys, 3, 3, 7)
    val rng = new scala.util.Random(42)
    var hit = 0
    val n = 400000
    for (_ <- 0 until n) {
      val a = rng.nextDouble() * 2 * math.Pi
      val r = 7 * math.sqrt(rng.nextDouble())
      if (GeoKernels.pointInRing(xs, ys, 3 + r * math.cos(a), 3 + r * math.sin(a))) hit += 1
    }
    val mc = math.Pi * 49 * hit.toDouble / n
    assert(math.abs(exact - mc) < 0.5, s"exact=$exact mc=$mc")
  }

  test("Lambert-72 <-> WGS84: roundtrip and plausibility (Brussels)") {
    // Brussels-ish point in EPSG:31370
    val (lon, lat) = GeoKernels.lambert72ToWgs84(150000.0, 170000.0)
    assert(lon > 4.2 && lon < 4.5, s"lon=$lon")
    assert(lat > 50.7 && lat < 50.9, s"lat=$lat")
    val (x2, y2) = GeoKernels.wgs84ToLambert72(lon, lat)
    assert(math.abs(x2 - 150000.0) < 0.001 && math.abs(y2 - 170000.0) < 0.001,
      s"roundtrip -> ($x2, $y2)")
    // known bearing sanity: Ostend (west coast) is west of Arlon (southeast)
    val (lonO, latO) = GeoKernels.lambert72ToWgs84(50000.0, 210000.0)
    val (lonA, latA) = GeoKernels.lambert72ToWgs84(250000.0, 30000.0)
    assert(lonO < lonA && latO > latA)
  }

  test("grid point-in-polygon join equals brute force") {
    val rng = new scala.util.Random(7)
    val polys = Seq(
      (1L, ring((0, 0), (10, 0), (10, 10), (0, 10))),
      (2L, ring((5, 5), (25, 5), (25, 25), (5, 25))),
      (3L, ring((30, 30), (40, 30), (35, 42)))
    ).toDF("poly_id", "ring_raw")
      .select(col("poly_id"),
        transform(col("ring_raw"), p =>
          struct(p.getField("_1").as("x"), p.getField("_2").as("y"))).as("ring"))
    val points = (0 until 500).map(i =>
      (i.toLong, rng.nextDouble() * 50, rng.nextDouble() * 50)).toDF("pid", "x", "y")

    val grid = GeoJoin.pointInPolygonJoin(points, polys, "x", "y", "ring", cellSize = 8.0)
      .select("pid", "poly_id").as[(Long, Long)].collect().toSet
    val brute = points.crossJoin(polys)
      .where(GeoFunctions.pointInRing(col("ring"), col("x"), col("y")))
      .select("pid", "poly_id").as[(Long, Long)].collect().toSet
    assert(grid === brute)
    assert(brute.nonEmpty)
  }

  test("PlotSegments.withAreas: K1 areas and weights") {
    // plot 1: two half-plane segments splitting the 9m circle
    val segs = Seq(
      (1, 1, ring((-20, -20), (0, -20), (0, 20), (-20, 20))),
      (1, 2, ring((0, -20), (20, -20), (20, 20), (0, 20)))
    ).toDF("plot_id", "segment_id", "ring_raw")
      .select(col("plot_id"), col("segment_id"),
        transform(col("ring_raw"), p =>
          struct(p.getField("_1").as("x"), p.getField("_2").as("y"))).as("ring"))
    val got = PlotSegments.withAreas(segs)
      .select("segment_id", "area_a3_m2", "area_a4_m2", "segment_weight_a3")
      .as[(Int, Double, Double, Double)].collect().sortBy(_._1)
    assert(math.abs(got(0)._2 - math.Pi * 81 / 2) < 1e-9)
    assert(math.abs(got(0)._3 - 800.0) < 1e-9)
    assert(math.abs(got(0)._4 - 0.5) < 1e-12)
    assert(math.abs(got(1)._4 - 0.5) < 1e-12)
  }

  test("WKB decode: polygon exterior ring, point, both byte orders, garbage") {
    import graft.geo.{Wkb, WkbFunctions}
    val xs = Array(0.0, 4.0, 4.0, 0.0)
    val ys = Array(0.0, 0.0, 4.0, 4.0)
    val wkb = Wkb.encodePolygon(xs, ys)
    val df = Seq(
      (1L, wkb),
      (2L, Wkb.encodePoint(2.5, -1.5)),
      (3L, Array[Byte](9, 9, 9))).toDF("id", "g")
    val rings = df.select(col("id"), WkbFunctions.wkbToRing(col("g")).as("ring"))
    val area = rings.where(col("id") === 1)
      .select(GeoFunctions.ringArea(col("ring"))).as[Double].collect().head
    assert(area === 16.0)
    val pt = rings.where(col("id") === 2)
      .select(col("ring")(0)("x"), col("ring")(0)("y")).as[(Double, Double)].collect().head
    assert(pt === ((2.5, -1.5)))
    assert(rings.where(col("id") === 3).where(col("ring").isNull).count() === 1)

    // big-endian variant decodes identically
    val be = java.nio.ByteBuffer.allocate(wkb.length)
    be.put(0.toByte).putInt(3).putInt(1).putInt(4)
    for (i <- 0 until 4) { be.putDouble(xs(i)); be.putDouble(ys(i)) }
    val (bx, by) = graft.geo.Wkb.decode(be.array())
    assert(bx.toSeq === xs.toSeq && by.toSeq === ys.toSeq)
  }

  test("EWKB: SRID prefix is skipped, Z/M-flagged geometries decode to null") {
    import java.nio.{ByteBuffer, ByteOrder}
    import graft.geo.Wkb
    // EWKB point, SRID flag set (0x20000000), SRID 31370
    val srid = ByteBuffer.allocate(25).order(ByteOrder.LITTLE_ENDIAN)
    srid.put(1.toByte).putInt(1 | 0x20000000).putInt(31370)
      .putDouble(150000.5).putDouble(200000.25)
    val (px, py) = Wkb.decode(srid.array())
    assert(px.toSeq === Seq(150000.5) && py.toSeq === Seq(200000.25))

    // Z-flagged EWKB point -> null (extra coordinate not modeled)
    val z = ByteBuffer.allocate(29).order(ByteOrder.LITTLE_ENDIAN)
    z.put(1.toByte).putInt(1 | 0x80000000).putDouble(1.0).putDouble(2.0).putDouble(3.0)
    assert(Wkb.decode(z.array()) === null)

    // M-flagged -> null; ISO WKB Z point (type 1001) -> null
    val m = ByteBuffer.allocate(29).order(ByteOrder.LITTLE_ENDIAN)
    m.put(1.toByte).putInt(1 | 0x40000000).putDouble(1.0).putDouble(2.0).putDouble(3.0)
    assert(Wkb.decode(m.array()) === null)
    val iso = ByteBuffer.allocate(29).order(ByteOrder.LITTLE_ENDIAN)
    iso.put(1.toByte).putInt(1001).putDouble(1.0).putDouble(2.0).putDouble(3.0)
    assert(Wkb.decode(iso.array()) === null)
  }

  test("WKB multipolygon + holes: decodeRings, even-odd containment, hole-aware area") {
    import graft.geo.{Wkb, WkbFunctions}
    def rect(x0: Double, y0: Double, x1: Double, y1: Double) =
      (Array(x0, x1, x1, x0), Array(y0, y0, y1, y1))
    // part A: 10x10 square with a 2x2 hole; part B: disjoint 4x4 square
    val partA = Seq(rect(0, 0, 10, 10), rect(4, 4, 6, 6))
    val partB = Seq(rect(20, 0, 24, 4))
    val wkb = Wkb.encodeMultiPolygon(Seq(partA, partB))
    val rings = Wkb.decodeRings(wkb)
    assert(rings.length === 3)
    // legacy single-ring decode must refuse multipart (not mis-contain)
    assert(Wkb.decode(wkb) === null)
    // polygon-with-holes WKB also decodes via decodeRings
    assert(Wkb.decodeRings(Wkb.encodePolygonRings(partA)).length === 2)

    val (xss, yss) = (rings.map(_._1), rings.map(_._2))
    assert(GeoKernels.pointInRings(xss, yss, 2.0, 2.0))       // in A, outside hole
    assert(!GeoKernels.pointInRings(xss, yss, 5.0, 5.0))      // inside the hole
    assert(GeoKernels.pointInRings(xss, yss, 22.0, 2.0))      // in part B
    assert(!GeoKernels.pointInRings(xss, yss, 15.0, 5.0))     // between parts
    assert(GeoKernels.ringsArea(xss, yss) === 100.0 - 4.0 + 16.0)

    // expression path: wkb_to_rings + point_in_rings + rings_area
    val df = Seq((1L, wkb)).toDF("id", "g")
      .select(col("id"), WkbFunctions.wkbToRings(col("g")).as("rings"))
    val got = df.select(
      GeoFunctions.pointInRings(col("rings"), lit(5.0), lit(5.0)),
      GeoFunctions.pointInRings(col("rings"), lit(2.0), lit(2.0)),
      GeoFunctions.ringsArea(col("rings"))).as[(Boolean, Boolean, Double)].collect().head
    assert(got === ((false, true, 112.0)))
  }

  test("WKB malformed ring counts decode to null, never garbage") {
    import java.nio.{ByteBuffer, ByteOrder}
    import graft.geo.Wkb
    // 2-ring polygon whose exterior-ring count (10) overruns into ring-2
    // data: must be rejected (total bytes present, but ring 2's header
    // would be consumed as coordinates)
    val buf = ByteBuffer.allocate(1 + 4 + 4 + 4 + 4 * 16 + 4 + 4 * 16)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put(1.toByte).putInt(3).putInt(2).putInt(10)
    for (i <- 0 until 4) { buf.putDouble(i); buf.putDouble(i) }
    buf.putInt(4)
    for (i <- 0 until 4) { buf.putDouble(i); buf.putDouble(i) }
    assert(Wkb.decodeRings(buf.array()) === null)
    assert(Wkb.decode(buf.array()) === null)

    // single-ring polygon with trailing bytes -> null (exact consume)
    val ok = Wkb.encodePolygon(Array(0.0, 1.0, 1.0), Array(0.0, 0.0, 1.0))
    assert(Wkb.decodeRings(ok ++ Array[Byte](0, 0)) === null)
    // truncated multipolygon part count -> null
    val mp = Wkb.encodeMultiPolygon(Seq(Seq((Array(0.0, 1.0, 1.0), Array(0.0, 0.0, 1.0)))))
    assert(Wkb.decodeRings(mp.dropRight(8)) === null)
  }
}
