package graft.geo

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** S6: pure-Scala ESRI shapefile ingestion (`st_read` of the per-plot
  * segment layers, `/root/reference/src/export_from_fieldmap/
  * calc_plot_segment_area.Rmd:50-52`) — no GDAL in this stack, and the
  * format is a published spec (ESRI shapefile technical description +
  * dBase III).
  *
  * `read` returns a DataFrame of the .dbf attribute columns
  * (lowercased, per the reference's post-read normalization) plus a
  * `geometry` WKB binary column feeding the existing decode path
  * ([[WkbToRings]] / [[GeoJoin]]).
  *
  * Geometry mapping: shapefile POLYGON records hold rings
  * distinguished only by winding (clockwise = outer, counter-clockwise
  * = hole); consecutive holes attach to the preceding outer ring, and
  * multiple outers become a WKB MULTIPOLYGON. Files with no winding
  * information (all rings CCW) fall back to one polygon per ring.
  *
  * Scale stance: the reference reads one tiny shapefile per plot, so
  * parsing is driver-side; at scale the parsed WKB lands in parquet
  * once (write-time conversion) and everything downstream is columnar.
  */
object Shapefile {

  final case class Field(name: String, typ: Char, length: Int, decimals: Int) {
    def dataType: DataType = typ match {
      case 'N' | 'F' => if (decimals == 0) LongType else DoubleType
      case 'L' => BooleanType
      case _ => StringType // C (char), D (yyyymmdd date) stay strings
    }
  }

  /** Read `base`.shp (+ `base`.dbf when present). */
  def read(spark: SparkSession, base: String): DataFrame = {
    val geoms = readShp(Files.readAllBytes(Paths.get(base + ".shp")))
    val dbfPath = Paths.get(base + ".dbf")
    val (fields, rows) =
      if (Files.exists(dbfPath)) readDbf(Files.readAllBytes(dbfPath))
      else (Seq.empty[Field], geoms.map(_ => Seq.empty[Any]))
    require(rows.length == geoms.length,
      s"dbf has ${rows.length} records but shp has ${geoms.length}")
    val schema = StructType(
      fields.map(f => StructField(f.name.toLowerCase, f.dataType)) :+
        StructField("geometry", BinaryType))
    val data = rows.zip(geoms).map { case (attrs, g) => Row.fromSeq(attrs :+ g) }
    spark.createDataFrame(data.asJava, schema)
  }

  /** WKB per .shp record (null for null shapes / unsupported types). */
  def readShp(bytes: Array[Byte]): Seq[Array[Byte]] = {
    require(bytes.length >= 100 &&
      ByteBuffer.wrap(bytes, 0, 4).order(ByteOrder.BIG_ENDIAN).getInt == 9994,
      "not a shapefile (bad magic)")
    val out = Seq.newBuilder[Array[Byte]]
    var pos = 100
    while (pos + 8 <= bytes.length) {
      val contentWords =
        ByteBuffer.wrap(bytes, pos + 4, 4).order(ByteOrder.BIG_ENDIAN).getInt
      val content = ByteBuffer.wrap(bytes, pos + 8, contentWords * 2)
        .order(ByteOrder.LITTLE_ENDIAN)
      out += recordToWkb(content)
      pos += 8 + contentWords * 2
    }
    out.result()
  }

  private def recordToWkb(b: ByteBuffer): Array[Byte] = b.getInt() match {
    case 0 => null // null shape
    case 1 => Wkb.encodePoint(b.getDouble(), b.getDouble())
    case 3 => // polyline: same layout as polygon, parts are open chains
      b.position(b.position() + 32)
      val nParts = b.getInt()
      val nPoints = b.getInt()
      // a corrupt record with no parts/points would leave sliding(2)
      // a single-element window below — degrade like a null shape
      if (nParts <= 0 || nPoints <= 0) return null
      val parts = Array.fill(nParts)(b.getInt())
      val xs = new Array[Double](nPoints)
      val ys = new Array[Double](nPoints)
      var i = 0
      while (i < nPoints) { xs(i) = b.getDouble(); ys(i) = b.getDouble(); i += 1 }
      val bounds = parts.toSeq :+ nPoints
      val chains = bounds.sliding(2).map { case Seq(from, until) =>
        (xs.slice(from, until), ys.slice(from, until))
      }.toSeq
      if (chains.length == 1)
        Wkb.encodeLineString(chains.head._1, chains.head._2)
      else Wkb.encodeMultiLineString(chains)
    case 5 => // polygon: bbox, nParts, nPoints, part offsets, points
      b.position(b.position() + 32)
      val nParts = b.getInt()
      val nPoints = b.getInt()
      if (nParts <= 0 || nPoints <= 0) return null
      val parts = Array.fill(nParts)(b.getInt())
      val xs = new Array[Double](nPoints)
      val ys = new Array[Double](nPoints)
      var i = 0
      while (i < nPoints) { xs(i) = b.getDouble(); ys(i) = b.getDouble(); i += 1 }
      val bounds = parts.toSeq :+ nPoints
      val rings = bounds.sliding(2).map { case Seq(from, until) =>
        (xs.slice(from, until), ys.slice(from, until))
      }.toSeq
      ringsToWkb(rings)
    case _ => null
  }

  /** Winding-based ring grouping: CW (negative shoelace) opens a new
    * polygon part, CCW rings are its holes. */
  private def ringsToWkb(rings: Seq[(Array[Double], Array[Double])]): Array[Byte] = {
    val isOuter = rings.map { case (xs, ys) => GeoKernels.signedArea(xs, ys) < 0 }
    val parts: Seq[Seq[(Array[Double], Array[Double])]] =
      if (!isOuter.contains(true)) rings.map(Seq(_)) // no winding info
      else {
        val acc = Seq.newBuilder[Seq[(Array[Double], Array[Double])]]
        var cur = List.empty[(Array[Double], Array[Double])]
        rings.zip(isOuter).foreach { case (r, outer) =>
          if (outer || cur.isEmpty) {
            if (cur.nonEmpty) acc += cur.reverse
            cur = List(r)
          } else cur = r :: cur
        }
        if (cur.nonEmpty) acc += cur.reverse
        acc.result()
      }
    if (parts.length == 1) Wkb.encodePolygonRings(parts.head)
    else Wkb.encodeMultiPolygon(parts)
  }

  /** dBase III attribute table -> (fields, typed rows). */
  def readDbf(bytes: Array[Byte]): (Seq[Field], Seq[Seq[Any]]) = {
    val head = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val nRec = head.getInt(4)
    val headerSize = head.getShort(8) & 0xFFFF
    val recSize = head.getShort(10) & 0xFFFF
    val fb = Seq.newBuilder[Field]
    var off = 32
    while (off < headerSize - 1 && bytes(off) != 0x0D) {
      val name = new String(bytes, off, 11, "ASCII").takeWhile(_ != 0).trim
      fb += Field(name, bytes(off + 11).toChar, bytes(off + 16) & 0xFF, bytes(off + 17) & 0xFF)
      off += 32
    }
    val fields = fb.result()
    val rows = (0 until nRec).map { r =>
      var o = headerSize + r * recSize + 1 // +1: deletion flag
      fields.map { f =>
        val t = new String(bytes, o, f.length, "ISO-8859-1").trim
        o += f.length
        (f.typ: @unchecked) match {
          case 'N' | 'F' =>
            if (t.isEmpty || t == "*") null
            else if (f.decimals == 0) java.lang.Long.valueOf(t.toLong)
            else java.lang.Double.valueOf(t.toDouble)
          case 'L' => t.headOption match {
            case Some(c) if "TtYy".contains(c) => java.lang.Boolean.TRUE
            case Some(c) if "FfNn".contains(c) => java.lang.Boolean.FALSE
            case _ => null
          }
          case _ => if (t.isEmpty) null else t
        }
      }
    }
    (fields, rows)
  }
}
