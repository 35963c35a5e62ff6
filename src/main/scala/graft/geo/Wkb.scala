package graft.geo

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** WKB (well-known binary) decoding — SURVEY.md §1.2: geometry rides as
  * a `binary` WKB column (how shapefile/GeoPackage extracts S6/S7 land
  * in parquet), decoded to the engine's native
  * `array<struct<x double, y double>>` ring encoding by an expression.
  *
  * Supported: POINT (1) -> single-vertex ring; POLYGON (3) -> exterior
  * ring (interior holes are not represented in the reference's habitat
  * map usage; documented limitation). Both byte orders. Malformed or
  * unsupported input -> NULL (filterable, never a task failure).
  */
object Wkb {

  /** Parse WKB into (xs, ys) of the point / exterior ring, else null. */
  def decode(bytes: Array[Byte]): (Array[Double], Array[Double]) = {
    try {
      if (bytes == null || bytes.length < 5) return null
      val buf = ByteBuffer.wrap(bytes)
      buf.order(if (buf.get() == 1) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
      val rawType = buf.getInt()
      // EWKB flag bits: Z (0x80000000) / M (0x40000000) geometries carry
      // extra coordinates we do not model -> NULL, never misparse. The
      // SRID flag (0x20000000) prefixes a 4-byte SRID we skip. ISO WKB
      // encodes Z/M as type+1000/2000/3000 -> falls through to NULL below.
      if ((rawType & 0xC0000000) != 0) return null
      if ((rawType & 0x20000000) != 0) buf.getInt() // skip SRID
      rawType & 0x1FFFFFFF match {
        case 1 => // point
          val x = buf.getDouble(); val y = buf.getDouble()
          (Array(x), Array(y))
        case 3 => // polygon: first (exterior) ring
          val nRings = buf.getInt()
          if (nRings < 1) return null
          val n = buf.getInt()
          if (n < 0 || n > buf.remaining() / 16) return null
          val xs = new Array[Double](n)
          val ys = new Array[Double](n)
          var i = 0
          while (i < n) { xs(i) = buf.getDouble(); ys(i) = buf.getDouble(); i += 1 }
          (xs, ys)
        case _ => null
      }
    } catch { case _: Exception => null }
  }

  /** Encode a ring/point back to little-endian WKB (tests, round-trips). */
  def encodePolygon(xs: Array[Double], ys: Array[Double]): Array[Byte] = {
    val buf = ByteBuffer.allocate(1 + 4 + 4 + 4 + xs.length * 16)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put(1.toByte).putInt(3).putInt(1).putInt(xs.length)
    var i = 0
    while (i < xs.length) { buf.putDouble(xs(i)); buf.putDouble(ys(i)); i += 1 }
    buf.array()
  }

  def encodePoint(x: Double, y: Double): Array[Byte] = {
    val buf = ByteBuffer.allocate(21).order(ByteOrder.LITTLE_ENDIAN)
    buf.put(1.toByte).putInt(1).putDouble(x).putDouble(y)
    buf.array()
  }
}

/** wkb_to_ring(binary) -> array<struct<x double, y double>> or NULL. */
case class WkbToRing(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("x", DoubleType), StructField("y", DoubleType))))
  override def nullable: Boolean = true
  override def prettyName: String = "wkb_to_ring"

  override def nullSafeEval(v: Any): Any = {
    val decoded = Wkb.decode(v.asInstanceOf[Array[Byte]])
    if (decoded == null) null
    else {
      val (xs, ys) = decoded
      new GenericArrayData(xs.indices.map(i => InternalRow(xs(i), ys(i))).toArray[Any])
    }
  }

  override protected def withNewChildInternal(c: Expression): WkbToRing = copy(child = c)
}

object WkbFunctions {
  def wkbToRing(c: Column): Column =
    GraftBridge.column(WkbToRing(GraftBridge.expression(c)))
}
