package graft.geo

/** Pure computational-geometry kernels (no external native libs — the
  * reference leans on GEOS via sf; here the small set of operations it
  * actually uses is implemented directly, SURVEY.md §2.7 "Geometry" and
  * §2.10 K1):
  *
  *   - ray-casting point-in-polygon (`st_join` J11,
  *     `check_observed_habitat_type.Rmd:148`)
  *   - shoelace polygon area (`st_area`)
  *   - exact circle-polygon intersection area via Green's theorem
  *     (`st_buffer(9) + st_intersection + st_area`,
  *     `calc_plot_segment_area.Rmd:59-72`)
  *   - Lambert-72 (EPSG:31370) <-> WGS84 via the published LCC 2SP
  *     formulas and EPSG parameters (`st_transform`,
  *     `data_questions.Rmd:157-158`)
  *
  * Rings are (x, y) vertex arrays, closed implicitly (last->first edge).
  */
object GeoKernels {

  /** Ray casting, even-odd rule; boundary points count as inside-ish
    * (matches GEOS covers semantics closely enough for the reference's
    * point-vs-habitat-map overlays; documented deviation for exact
    * boundary hits). */
  def pointInRing(xs: Array[Double], ys: Array[Double], px: Double, py: Double): Boolean = {
    var inside = false
    val n = xs.length
    var i = 0
    var j = n - 1
    while (i < n) {
      val xi = xs(i); val yi = ys(i)
      val xj = xs(j); val yj = ys(j)
      if ((yi > py) != (yj > py) &&
          px < (xj - xi) * (py - yi) / (yj - yi) + xi) inside = !inside
      j = i
      i += 1
    }
    inside
  }

  /** Even-odd containment over a ring SET (polygon with holes /
    * multipolygon): a point is inside iff it crosses an odd number of
    * ring boundaries — inside the exterior but also inside a hole means
    * two odd parities that cancel (outside), and disjoint multipolygon
    * parts contribute even (zero) parity unless the point is in one.
    * Ring orientation is irrelevant, matching WKB which does not
    * mandate winding. */
  def pointInRings(xss: Array[Array[Double]], yss: Array[Array[Double]],
                   px: Double, py: Double): Boolean = {
    var inside = false
    var r = 0
    while (r < xss.length) {
      if (pointInRing(xss(r), yss(r), px, py)) inside = !inside
      r += 1
    }
    inside
  }

  /** Area of the even-odd region of a ring set. Each ring's unsigned
    * area is added or subtracted by its nesting depth (how many OTHER
    * rings contain its first vertex): depth 0 = exterior (+), depth 1 =
    * hole (-), depth 2 = island in a hole (+), ... Orientation-free,
    * valid for the non-crossing rings WKB (multi)polygons guarantee. */
  def ringsArea(xss: Array[Array[Double]], yss: Array[Array[Double]]): Double = {
    var total = 0.0
    var r = 0
    while (r < xss.length) {
      if (xss(r).length >= 3) {
        var depth = 0
        var o = 0
        while (o < xss.length) {
          if (o != r && pointInRing(xss(o), yss(o), xss(r)(0), yss(r)(0))) depth += 1
          o += 1
        }
        val a = area(xss(r), yss(r))
        total += (if (depth % 2 == 0) a else -a)
      }
      r += 1
    }
    math.max(total, 0.0)
  }

  /** Signed shoelace area (positive for counter-clockwise rings). */
  def signedArea(xs: Array[Double], ys: Array[Double]): Double = {
    var s = 0.0
    val n = xs.length
    var i = 0
    var j = n - 1
    while (i < n) { s += (xs(j) + xs(i)) * (ys(i) - ys(j)); j = i; i += 1 }
    s / 2.0
  }

  def area(xs: Array[Double], ys: Array[Double]): Double = math.abs(signedArea(xs, ys))

  /** Area of intersection between a polygon ring and a disc centered at
    * (cx, cy) with radius r. Green's-theorem decomposition: sum the
    * signed contribution of each polygon edge clipped to the disc,
    * replacing outside portions with circular arcs (classic exact
    * algorithm; see e.g. the well-known "area of circle-polygon
    * intersection" derivation). Sign follows ring orientation; the
    * absolute value is returned. */
  def circleIntersectionArea(xs: Array[Double], ys: Array[Double],
                             cx: Double, cy: Double, r: Double): Double = {
    val n = xs.length
    var total = 0.0
    var i = 0
    while (i < n) {
      val j = (i + 1) % n
      total += segmentContribution(xs(i) - cx, ys(i) - cy, xs(j) - cx, ys(j) - cy, r)
      i += 1
    }
    math.abs(total)
  }

  /** Signed contribution of edge (x1,y1)->(x2,y2) (circle at origin). */
  private def segmentContribution(x1: Double, y1: Double, x2: Double, y2: Double,
                                  r: Double): Double = {
    val r2 = r * r
    def cross(ax: Double, ay: Double, bx: Double, by: Double) = ax * by - ay * bx
    def triangleArea = cross(x1, y1, x2, y2) / 2.0
    def sectorArea(ax: Double, ay: Double, bx: Double, by: Double): Double = {
      // signed circular sector from A to B (shorter way, sign of cross)
      val ang = math.atan2(cross(ax, ay, bx, by), ax * bx + ay * by)
      0.5 * r2 * ang
    }
    val in1 = x1 * x1 + y1 * y1 <= r2 + 1e-12
    val in2 = x2 * x2 + y2 * y2 <= r2 + 1e-12

    // intersections of segment with circle: solve |P1 + t(P2-P1)|^2 = r^2
    val dx = x2 - x1; val dy = y2 - y1
    val a = dx * dx + dy * dy
    if (a < 1e-24) return 0.0
    val b = 2 * (x1 * dx + y1 * dy)
    val c = x1 * x1 + y1 * y1 - r2
    val disc = b * b - 4 * a * c
    if (in1 && in2) return triangleArea
    if (disc <= 0) return sectorArea(x1, y1, x2, y2) // fully outside, no crossing
    val sq = math.sqrt(disc)
    val t1 = (-b - sq) / (2 * a)
    val t2 = (-b + sq) / (2 * a)
    def pt(t: Double) = (x1 + t * dx, y1 + t * dy)
    if (in1 && !in2) {
      // exits at t2' = first valid crossing in (0,1)
      val t = if (t1 > 0 && t1 < 1) t1 else t2
      val (ix, iy) = pt(t)
      cross(x1, y1, ix, iy) / 2.0 + sectorArea(ix, iy, x2, y2)
    } else if (!in1 && in2) {
      val t = if (t2 > 0 && t2 < 1) t2 else t1
      val (ix, iy) = pt(t)
      sectorArea(x1, y1, ix, iy) + cross(ix, iy, x2, y2) / 2.0
    } else {
      // both outside: possibly crossing through the disc
      if (t1 > 0 && t1 < 1 && t2 > 0 && t2 < 1 && t2 > t1) {
        val (ax, ay) = pt(t1)
        val (bx, by) = pt(t2)
        sectorArea(x1, y1, ax, ay) + cross(ax, ay, bx, by) / 2.0 + sectorArea(bx, by, x2, y2)
      } else sectorArea(x1, y1, x2, y2)
    }
  }

  // ---- EPSG:31370 (Belgian Lambert 72) <-> EPSG:4326 ----
  // Lambert Conformal Conic 2SP on the International 1924 ellipsoid,
  // parameters from the EPSG registry; datum shift Belgian Datum 72 ->
  // WGS84 via the published 7-parameter Helmert transform
  // (EPSG:15929, coordinate frame rotation).
  private val aInt = 6378388.0                 // International 1924
  private val fInt = 1.0 / 297.0
  private val e2Int = 2 * fInt - fInt * fInt
  private val eInt = math.sqrt(e2Int)
  private val aWgs = 6378137.0
  private val fWgs = 1.0 / 298.257223563
  private val e2Wgs = 2 * fWgs - fWgs * fWgs

  private val phi1 = math.toRadians(49.0 + 50.0 / 60 + 0.00204 / 3600)   // 49°50'00.00204"N
  private val phi2 = math.toRadians(51.0 + 10.0 / 60 + 0.00204 / 3600)   // 51°10'00.00204"N
  private val phi0 = math.toRadians(90.0)
  private val lam0 = math.toRadians(4.0 + 22.0 / 60 + 2.952 / 3600)      // 4°22'02.952"E
  private val x0 = 150000.013
  private val y0 = 5400088.438

  private def mFn(phi: Double) =
    math.cos(phi) / math.sqrt(1 - e2Int * math.sin(phi) * math.sin(phi))
  private def tFn(phi: Double) = {
    val es = eInt * math.sin(phi)
    math.tan(math.Pi / 4 - phi / 2) / math.pow((1 - es) / (1 + es), eInt / 2)
  }
  private val nLcc = (math.log(mFn(phi1)) - math.log(mFn(phi2))) /
    (math.log(tFn(phi1)) - math.log(tFn(phi2)))
  private val fLcc = mFn(phi1) / (nLcc * math.pow(tFn(phi1), nLcc))
  private val rho0 = { val t0 = tFn(phi0); if (t0 <= 0) 0.0 else aInt * fLcc * math.pow(t0, nLcc) }

  /** Lambert-72 (x east, y north) -> Belgian Datum 72 geographic (rad). */
  private def lccInverse(x: Double, y: Double): (Double, Double) = {
    val dx = x - x0
    val dy = rho0 - (y - y0)
    val rho = math.signum(nLcc) * math.sqrt(dx * dx + dy * dy)
    val theta = math.atan2(dx, dy)
    val t = math.pow(rho / (aInt * fLcc), 1 / nLcc)
    var phi = math.Pi / 2 - 2 * math.atan(t)
    var k = 0
    while (k < 16) {
      val es = eInt * math.sin(phi)
      phi = math.Pi / 2 - 2 * math.atan(t * math.pow((1 - es) / (1 + es), eInt / 2))
      k += 1
    }
    (phi, theta / nLcc + lam0)
  }

  /** Belgian Datum 72 geographic (rad) -> Lambert-72 (x, y). */
  private def lccForward(phi: Double, lam: Double): (Double, Double) = {
    val rho = aInt * fLcc * math.pow(tFn(phi), nLcc)
    val theta = nLcc * (lam - lam0)
    (x0 + rho * math.sin(theta), y0 + rho0 - rho * math.cos(theta))
  }

  private def geodeticToEcef(phi: Double, lam: Double, a: Double, e2: Double) = {
    val nu = a / math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))
    (nu * math.cos(phi) * math.cos(lam), nu * math.cos(phi) * math.sin(lam),
      nu * (1 - e2) * math.sin(phi))
  }

  private def ecefToGeodetic(x: Double, y: Double, z: Double, a: Double, e2: Double) = {
    val lam = math.atan2(y, x)
    val p = math.sqrt(x * x + y * y)
    var phi = math.atan2(z, p * (1 - e2))
    var k = 0
    while (k < 20) {
      val nu = a / math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))
      phi = math.atan2(z + e2 * nu * math.sin(phi), p)
      k += 1
    }
    (phi, lam)
  }

  // BD72 -> WGS84 Helmert (coordinate frame rotation), EPSG standard values:
  private val tx = -106.8686; private val ty = 52.2978; private val tz = -103.7239
  private val rx = math.toRadians(-0.3366 / 3600)
  private val ry = math.toRadians(0.457 / 3600)
  private val rz = math.toRadians(-1.8422 / 3600)
  private val ds = -1.2747e-6

  private def helmert(x: Double, y: Double, z: Double, sign: Int) = {
    val s = 1 + ds // forward scale; the inverse divides by it
    if (sign > 0)
      (tx + s * (x + rz * y - ry * z), ty + s * (-rz * x + y + rx * z),
        tz + s * (ry * x - rx * y + z))
    else {
      val xs = (x - tx) / s; val ys = (y - ty) / s; val zs = (z - tz) / s
      (xs - rz * ys + ry * zs, rz * xs + ys - rx * zs, -ry * xs + rx * ys + zs)
    }
  }

  /** EPSG:31370 (x, y) -> (lon_deg, lat_deg) WGS84. */
  def lambert72ToWgs84(x: Double, y: Double): (Double, Double) = {
    val (phi, lam) = lccInverse(x, y)
    val (ex, ey, ez) = geodeticToEcef(phi, lam, aInt, e2Int)
    val (wx, wy, wz) = helmert(ex, ey, ez, +1)
    val (phiW, lamW) = ecefToGeodetic(wx, wy, wz, aWgs, e2Wgs)
    (math.toDegrees(lamW), math.toDegrees(phiW))
  }

  /** WGS84 (lon_deg, lat_deg) -> EPSG:31370 (x, y). */
  def wgs84ToLambert72(lon: Double, lat: Double): (Double, Double) = {
    val (ex, ey, ez) = geodeticToEcef(math.toRadians(lat), math.toRadians(lon), aWgs, e2Wgs)
    val (bx, by, bz) = helmert(ex, ey, ez, -1)
    val (phi, lam) = ecefToGeodetic(bx, by, bz, aInt, e2Int)
    lccForward(phi, lam)
  }
}
