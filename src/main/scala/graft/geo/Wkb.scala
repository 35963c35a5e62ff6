package graft.geo

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** WKB (well-known binary) decoding — SURVEY.md §1.2: geometry rides as
  * a `binary` WKB column (how shapefile/GeoPackage extracts S6/S7 land
  * in parquet), decoded to the engine's native ring encodings by an
  * expression.
  *
  * Supported: POINT (1), POLYGON (3) with interior rings (holes), and
  * MULTIPOLYGON (6) — the shape of the reference's habitat map
  * (`read_habitatmap_terr()`, check_observed_habitat_type.Rmd:99,381),
  * which is a multipolygon layer with holes. Both byte orders, EWKB SRID
  * flag. Malformed or unsupported input -> NULL (filterable, never a
  * task failure); every ring's vertex count is bounds-checked and the
  * buffer must be consumed exactly, so a corrupted count can never
  * decode garbage coordinates from a later ring's data.
  */
object Wkb {

  /** Parse WKB into (geometryType, rings); each ring is (xs, ys).
    * POLYGON rings are ordered exterior-first; MULTIPOLYGON concatenates
    * each part's rings in order. Null for malformed/unsupported. */
  def decodeTyped(bytes: Array[Byte]): (Int, Array[(Array[Double], Array[Double])]) = {
    try {
      if (bytes == null || bytes.length < 5) return null
      val buf = ByteBuffer.wrap(bytes)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Array[Double], Array[Double])]
      val tpe = readGeometry(buf, out, allowMulti = true)
      if (tpe < 0 || buf.remaining() != 0) null else (tpe, out.toArray)
    } catch { case _: Exception => null }
  }

  /** All rings of a POINT / POLYGON (incl. holes) / MULTIPOLYGON. */
  def decodeRings(bytes: Array[Byte]): Array[(Array[Double], Array[Double])] = {
    val t = decodeTyped(bytes)
    if (t == null) null else t._2
  }

  /** Parse WKB into (xs, ys) of the point / exterior ring, else null.
    * POINT and single-part POLYGON only — the legacy single-ring
    * contract; multipolygons and holes need [[decodeRings]] (using the
    * exterior ring alone would compute wrong containment). */
  def decode(bytes: Array[Byte]): (Array[Double], Array[Double]) = {
    decodeTyped(bytes) match {
      case (1, rings)                       => rings.head
      case (3, rings) if rings.length == 1  => rings.head
      case _                                => null
    }
  }

  /** Reads one geometry (with its own byte-order byte) appending its
    * rings to `out`; returns the geometry type or -1 on malformed. */
  private def readGeometry(buf: ByteBuffer,
                           out: scala.collection.mutable.ArrayBuffer[(Array[Double], Array[Double])],
                           allowMulti: Boolean): Int = {
    if (buf.remaining() < 5) return -1
    buf.order(if (buf.get() == 1) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    val rawType = buf.getInt()
    // EWKB flag bits: Z (0x80000000) / M (0x40000000) geometries carry
    // extra coordinates we do not model -> NULL, never misparse. The
    // SRID flag (0x20000000) prefixes a 4-byte SRID we skip. ISO WKB
    // encodes Z/M as type+1000/2000/3000 -> falls through to -1 below.
    if ((rawType & 0xC0000000) != 0) return -1
    if ((rawType & 0x20000000) != 0) {
      if (buf.remaining() < 4) return -1
      buf.getInt() // skip SRID
    }
    rawType & 0x1FFFFFFF match {
      case 1 => // point -> single-vertex ring
        if (buf.remaining() < 16) return -1
        val x = buf.getDouble(); val y = buf.getDouble()
        out += ((Array(x), Array(y)))
        1
      case 2 => // linestring: one open vertex chain
        if (buf.remaining() < 4) return -1
        val n = buf.getInt()
        if (n < 0 || n > buf.remaining() / 16) return -1
        val xs = new Array[Double](n); val ys = new Array[Double](n)
        var i = 0
        while (i < n) { xs(i) = buf.getDouble(); ys(i) = buf.getDouble(); i += 1 }
        out += ((xs, ys))
        2
      case 3 => // polygon: exterior + interior rings, all bounds-checked
        if (readPolygonRings(buf, out)) 3 else -1
      case 5 if allowMulti => // multilinestring: parts are full WKB linestrings
        if (buf.remaining() < 4) return -1
        val nParts = buf.getInt()
        if (nParts < 0 || nParts > buf.remaining() / 9) return -1
        var p = 0
        while (p < nParts) {
          if (readGeometry(buf, out, allowMulti = false) != 2) return -1
          p += 1
        }
        5
      case 6 if allowMulti => // multipolygon: parts are full WKB polygons
        if (buf.remaining() < 4) return -1
        val nParts = buf.getInt()
        if (nParts < 0 || nParts > buf.remaining() / 9) return -1
        var p = 0
        while (p < nParts) {
          if (readGeometry(buf, out, allowMulti = false) != 3) return -1
          p += 1
        }
        6
      case _ => -1
    }
  }

  private def readPolygonRings(buf: ByteBuffer,
                               out: scala.collection.mutable.ArrayBuffer[(Array[Double], Array[Double])]): Boolean = {
    if (buf.remaining() < 4) return false
    val nRings = buf.getInt()
    if (nRings < 1 || nRings > buf.remaining() / 4) return false
    var r = 0
    while (r < nRings) {
      if (buf.remaining() < 4) return false
      val n = buf.getInt()
      if (n < 0 || n > buf.remaining() / 16) return false
      val xs = new Array[Double](n)
      val ys = new Array[Double](n)
      var i = 0
      while (i < n) { xs(i) = buf.getDouble(); ys(i) = buf.getDouble(); i += 1 }
      out += ((xs, ys))
      r += 1
    }
    true
  }

  /** Encode a polygon (exterior ring + optional holes) to little-endian
    * WKB (tests, round-trips). */
  def encodePolygonRings(rings: Seq[(Array[Double], Array[Double])]): Array[Byte] = {
    val nVerts = rings.map(_._1.length).sum
    val buf = ByteBuffer.allocate(1 + 4 + 4 + rings.length * 4 + nVerts * 16)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put(1.toByte).putInt(3).putInt(rings.length)
    rings.foreach { case (xs, ys) =>
      buf.putInt(xs.length)
      var i = 0
      while (i < xs.length) { buf.putDouble(xs(i)); buf.putDouble(ys(i)); i += 1 }
    }
    buf.array()
  }

  /** Encode a single-ring polygon back to little-endian WKB. */
  def encodePolygon(xs: Array[Double], ys: Array[Double]): Array[Byte] =
    encodePolygonRings(Seq((xs, ys)))

  /** Encode a multipolygon: each part = exterior ring + holes. */
  def encodeMultiPolygon(parts: Seq[Seq[(Array[Double], Array[Double])]]): Array[Byte] = {
    val partBytes = parts.map(encodePolygonRings)
    val buf = ByteBuffer.allocate(1 + 4 + 4 + partBytes.map(_.length).sum)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put(1.toByte).putInt(6).putInt(parts.length)
    partBytes.foreach(buf.put)
    buf.array()
  }

  /** Encode an open vertex chain to little-endian WKB LINESTRING. */
  def encodeLineString(xs: Array[Double], ys: Array[Double]): Array[Byte] = {
    val buf = ByteBuffer.allocate(1 + 4 + 4 + xs.length * 16)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put(1.toByte).putInt(2).putInt(xs.length)
    var i = 0
    while (i < xs.length) { buf.putDouble(xs(i)); buf.putDouble(ys(i)); i += 1 }
    buf.array()
  }

  /** Encode parts to little-endian WKB MULTILINESTRING. */
  def encodeMultiLineString(parts: Seq[(Array[Double], Array[Double])]): Array[Byte] = {
    val partBytes = parts.map { case (xs, ys) => encodeLineString(xs, ys) }
    val buf = ByteBuffer.allocate(1 + 4 + 4 + partBytes.map(_.length).sum)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put(1.toByte).putInt(5).putInt(parts.length)
    partBytes.foreach(buf.put)
    buf.array()
  }

  def encodePoint(x: Double, y: Double): Array[Byte] = {
    val buf = ByteBuffer.allocate(21).order(ByteOrder.LITTLE_ENDIAN)
    buf.put(1.toByte).putInt(1).putDouble(x).putDouble(y)
    buf.array()
  }

  // static entry points for generated code (null = malformed input)
  def ringData(bytes: Array[Byte]): ArrayData = {
    val decoded = decode(bytes)
    if (decoded == null) null
    else {
      val (xs, ys) = decoded
      new GenericArrayData(xs.indices.map(i => InternalRow(xs(i), ys(i))).toArray[Any])
    }
  }

  def ringsData(bytes: Array[Byte]): ArrayData = {
    val rings = decodeRings(bytes)
    if (rings == null) null
    else new GenericArrayData(rings.map { case (xs, ys) =>
      new GenericArrayData(xs.indices.map(i => InternalRow(xs(i), ys(i))).toArray[Any])
    }.toArray[Any])
  }

  /** Envelope (xmin, ymin, xmax, ymax) over every vertex of every
    * chain/ring of the geometry — computed from the COORDINATES, never
    * a stored header bbox, so it is definitionally consistent with the
    * decoded vertices (the `st_bbox` idiom the data-question overlays
    * use to turn a stream segment into a rectangular ROI). Null for
    * malformed/empty. */
  def envelopeRow(bytes: Array[Byte]): InternalRow = {
    val rings = decodeRings(bytes)
    if (rings == null || rings.isEmpty) return null
    var xmin = Double.PositiveInfinity; var ymin = Double.PositiveInfinity
    var xmax = Double.NegativeInfinity; var ymax = Double.NegativeInfinity
    var r = 0
    while (r < rings.length) {
      val (xs, ys) = rings(r)
      var i = 0
      while (i < xs.length) {
        if (xs(i) < xmin) xmin = xs(i)
        if (xs(i) > xmax) xmax = xs(i)
        if (ys(i) < ymin) ymin = ys(i)
        if (ys(i) > ymax) ymax = ys(i)
        i += 1
      }
      r += 1
    }
    if (xmin > xmax) null else InternalRow(xmin, ymin, xmax, ymax)
  }
}

/** wkb_to_ring(binary) -> array<struct<x double, y double>> or NULL. */
case class WkbToRing(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("x", DoubleType), StructField("y", DoubleType))))
  override def nullable: Boolean = true
  override def prettyName: String = "wkb_to_ring"

  override def nullSafeEval(v: Any): Any =
    Wkb.ringData(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.geo.Wkb.ringData($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")

  override protected def withNewChildInternal(c: Expression): WkbToRing = copy(child = c)
}

/** wkb_to_rings(binary) -> array<array<struct<x double, y double>>> or
  * NULL. All rings of a POINT / POLYGON-with-holes / MULTIPOLYGON, the
  * input shape for even-odd containment ([[PointInRings]]) and
  * hole-aware area ([[RingsArea]]). */
case class WkbToRings(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(ArrayType(
    StructType(Seq(StructField("x", DoubleType), StructField("y", DoubleType)))))
  override def nullable: Boolean = true
  override def prettyName: String = "wkb_to_rings"

  override def nullSafeEval(v: Any): Any =
    Wkb.ringsData(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.geo.Wkb.ringsData($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")

  override protected def withNewChildInternal(c: Expression): WkbToRings = copy(child = c)
}

/** wkb_envelope(binary) -> struct<xmin,ymin,xmax,ymax double> or NULL —
  * vertex-derived bbox of any supported geometry (POINT / LINESTRING /
  * POLYGON / MULTILINESTRING / MULTIPOLYGON); the data-question ROI
  * rectangles come from this over the stream-segment polylines. */
case class WkbEnvelope(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("xmin", DoubleType), StructField("ymin", DoubleType),
    StructField("xmax", DoubleType), StructField("ymax", DoubleType)))
  override def nullable: Boolean = true
  override def prettyName: String = "wkb_envelope"

  override def nullSafeEval(v: Any): Any =
    Wkb.envelopeRow(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.geo.Wkb.envelopeRow($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")

  override protected def withNewChildInternal(c: Expression): WkbEnvelope = copy(child = c)
}

object WkbFunctions {
  def wkbToRing(c: Column): Column =
    GraftBridge.column(WkbToRing(GraftBridge.expression(c)))

  def wkbToRings(c: Column): Column =
    GraftBridge.column(WkbToRings(GraftBridge.expression(c)))

  def wkbEnvelope(c: Column): Column =
    GraftBridge.column(WkbEnvelope(GraftBridge.expression(c)))
}
