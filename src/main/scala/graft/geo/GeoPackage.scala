package graft.geo

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

/** S7: pure-Scala GeoPackage ingestion (`st_read` of the habitat-map
  * `.gpkg` layers, `/root/reference/src/export_from_vbidwh/
  * check_observed_habitat_type.Rmd:99`) — no GDAL in this stack; a
  * GeoPackage is a SQLite database (both formats are published specs:
  * OGC 12-128r18 + the SQLite file format), so the reader walks the
  * table B-trees directly.
  *
  * `read` returns the feature table's attribute columns plus its
  * geometry as a standard WKB binary column (the GPKG envelope header
  * is stripped), feeding the existing decode path ([[WkbToRings]] /
  * [[GeoJoin]]).
  *
  * Scale stance: same as [[Shapefile]] — reference layers are small
  * dimension tables parsed once driver-side; the WKB lands in parquet
  * at write time and everything downstream is columnar. Fact-scale
  * geometry never goes through this path.
  */
object GeoPackage {

  // ---- public API --------------------------------------------------------

  /** Feature/attribute tables registered in `gpkg_contents`:
    * (table_name, data_type). */
  def tables(path: String): Seq[(String, String)] = {
    val db = new Sqlite(Files.readAllBytes(Paths.get(path)))
    db.readTable("gpkg_contents").map(r =>
      (r("table_name").asInstanceOf[String], r("data_type").asInstanceOf[String]))
  }

  /** Read one feature (or attribute) table as a DataFrame. */
  def read(spark: SparkSession, path: String, table: String): DataFrame = {
    val db = new Sqlite(Files.readAllBytes(Paths.get(path)))
    val geomCol = db.readTable("gpkg_geometry_columns")
      .find(_("table_name") == table).map(_("column_name").asInstanceOf[String])
    val cols = db.columnsOf(table)
    val schema = StructType(cols.map { c =>
      val t = c.declaredType.toUpperCase
      val dt =
        if (geomCol.contains(c.name)) BinaryType
        else if (t.contains("INT") || t.contains("BOOL")) LongType
        else if (t.contains("REAL") || t.contains("FLOA") || t.contains("DOUB")) DoubleType
        else if (t.contains("BLOB") || t.isEmpty) BinaryType
        else StringType
      StructField(c.name, dt)
    })
    val rows = db.readTable(table).map { rec =>
      Row.fromSeq(cols.zip(schema.fields).map { case (c, f) =>
        coerce(rec.getOrElse(c.name, null), f.dataType, geomCol.contains(c.name))
      })
    }
    spark.createDataFrame(rows.asJava, schema)
  }

  private def coerce(v: Any, dt: DataType, isGeom: Boolean): Any = v match {
    case null => null
    case b: Array[Byte] if isGeom => stripGpkgHeader(b)
    case n: Long => dt match {
      case DoubleType => n.toDouble
      case StringType => n.toString
      case _ => n
    }
    case d: Double if dt == LongType => d.toLong
    case other => other
  }

  /** GPKG geometry blob = "GP" magic, version, flags (byte order +
    * envelope shape + empty/extended bits, OGC 12-128 §2.1.3), SRID,
    * optional envelope, then standard WKB. */
  def stripGpkgHeader(b: Array[Byte]): Array[Byte] = {
    if (b.length < 8 || b(0) != 'G' || b(1) != 'P') return b // already bare WKB
    val flags = b(3)
    val envelopeBytes = ((flags >> 1) & 0x7) match {
      case 0 => 0
      case 1 => 32
      case 2 | 3 => 48
      case 4 => 64
      case _ => return null // invalid indicator
    }
    if ((flags & 0x10) != 0) return null // bit 4: empty geometry
    if ((flags & 0x20) != 0) return null // bit 5: ExtendedGeoPackageBinary (not standard WKB)
    java.util.Arrays.copyOfRange(b, 8 + envelopeBytes, b.length)
  }

  // ---- SQLite file walker ------------------------------------------------

  final case class ColumnDef(name: String, declaredType: String, rowidAlias: Boolean)

  /** Minimal read-only SQLite table-B-tree walker (file format spec at
    * sqlite.org/fileformat2): enough for GPKG feature tables — table
    * b-trees with overflow chains; no indexes, WAL, or freelists. */
  final class Sqlite(bytes: Array[Byte]) {
    require(bytes.length > 100 &&
      new String(bytes, 0, 15, "ASCII") == "SQLite format 3", "not a SQLite file")
    private val pageSize = {
      val raw = ((bytes(16) & 0xFF) << 8) | (bytes(17) & 0xFF)
      if (raw == 1) 65536 else raw
    }
    private val usable = pageSize - (bytes(20) & 0xFF)

    /** sqlite_master rows: (type, name, tbl_name, rootpage, sql). */
    private lazy val master: Seq[Seq[Any]] = walk(1).map(_._2)

    private def masterRow(table: String): Seq[Any] =
      master.find(r => r(0) == "table" && r(1) == table)
        .getOrElse(throw new IllegalArgumentException(
          s"no table '$table'; has: ${master.filter(_(0) == "table").map(_(1)).mkString(", ")}"))

    /** Column defs parsed from the stored CREATE TABLE statement. */
    def columnsOf(table: String): Seq[ColumnDef] = {
      val sql = masterRow(table)(4).asInstanceOf[String]
      val body = sql.substring(sql.indexOf('(') + 1, sql.lastIndexOf(')'))
      // split on top-level commas only (types like DECIMAL(10,2) nest)
      val defs = ArrayBuffer.empty[String]
      var depth = 0; val cur = new StringBuilder
      body.foreach {
        case ',' if depth == 0 => defs += cur.toString; cur.clear()
        case c =>
          if (c == '(') depth += 1 else if (c == ')') depth -= 1
          cur += c
      }
      defs += cur.toString
      val constraint = Set("PRIMARY", "FOREIGN", "UNIQUE", "CHECK", "CONSTRAINT")
      defs.iterator.map(_.trim).filter(_.nonEmpty)
        .filterNot(d => constraint.contains(d.split("\\s+")(0).toUpperCase))
        .map { d =>
          // quoted identifiers ("name" / `name` / [name]) end at the
          // matching close quote — GDAL quotes every column, so the
          // type token follows the CLOSING quote, not the bare name
          val (name, rest) =
            if (d.head == '"' || d.head == '`' || d.head == '[') {
              val close = if (d.head == '[') ']' else d.head
              // a doubled close char is an escaped literal ("a""b",
              // [a]]b]); a def with NO matching close is malformed —
              // degrade to the bare-token path instead of throwing
              var i = 1; var end = -1
              while (end < 0 && i < d.length) {
                if (d(i) == close) {
                  if (i + 1 < d.length && d(i + 1) == close) i += 2
                  else end = i
                } else i += 1
              }
              if (end < 0) {
                val t = d.split("\\s+")(0)
                (t, d.drop(t.length))
              } else
                (d.substring(1, end).replace(s"$close$close", close.toString),
                  d.substring(end + 1))
            } else {
              val t = d.split("\\s+")(0)
              (t, d.drop(t.length))
            }
          val typ = rest.trim.split("\\s+").headOption.getOrElse("")
          val upper = d.toUpperCase
          ColumnDef(name, typ,
            upper.contains("INTEGER") && upper.contains("PRIMARY KEY"))
        }.toSeq
    }

    /** All rows of `table` as name->value maps (rowid aliases filled). */
    def readTable(table: String): Seq[Map[String, Any]] = {
      val cols = columnsOf(table)
      val root = masterRow(table)(3).asInstanceOf[Long].toInt
      walk(root).map { case (rowid, vals) =>
        cols.zipWithIndex.map { case (c, i) =>
          val v = if (i < vals.length) vals(i) else null
          c.name -> (if (v == null && c.rowidAlias) rowid else v)
        }.toMap
      }
    }

    /** Depth-first table-b-tree traversal from `page`. */
    private def walk(page: Int): Seq[(Long, Seq[Any])] = {
      val base = (page - 1) * pageSize
      val hdr = base + (if (page == 1) 100 else 0)
      val out = ArrayBuffer.empty[(Long, Seq[Any])]
      val pageType = bytes(hdr) & 0xFF
      val nCells = u16(hdr + 3)
      val cellPtrs = (0 until nCells).map(i =>
        base + u16(hdr + (if (pageType == 5) 12 else 8) + 2 * i))
      pageType match {
        case 5 => // interior: left children + rightmost pointer
          cellPtrs.foreach(p => out ++= walk(u32(p)))
          out ++= walk(u32(hdr + 8))
        case 13 => // leaf
          cellPtrs.foreach { p =>
            val (payloadLen, p1) = varint(p)
            val (rowid, p2) = varint(p1)
            out += ((rowid, decodeRecord(payload(p2, payloadLen.toInt))))
          }
        case t => throw new IllegalStateException(s"unexpected page type $t")
      }
      out.toSeq
    }

    /** Inline payload + overflow chain reassembly (spec §B-tree Pages). */
    private def payload(at: Int, p: Int): Array[Byte] = {
      val x = usable - 35
      if (p <= x) return java.util.Arrays.copyOfRange(bytes, at, at + p)
      val m = (usable - 12) * 32 / 255 - 23
      val k = m + (p - m) % (usable - 4)
      val inline = if (k <= x) k else m
      val buf = ByteBuffer.allocate(p)
      buf.put(bytes, at, inline)
      var page = u32(at + inline)
      while (page != 0 && buf.hasRemaining) {
        val off = (page - 1) * pageSize
        val take = math.min(usable - 4, buf.remaining())
        buf.put(bytes, off + 4, take)
        page = u32(off)
      }
      buf.array()
    }

    /** SQLite record: header of serial types, then big-endian values. */
    private def decodeRecord(rec: Array[Byte]): Seq[Any] = {
      val (hdrLen, afterLen) = varintArr(rec, 0)
      val types = ArrayBuffer.empty[Long]
      var p = afterLen
      while (p < hdrLen) { val (t, np) = varintArr(rec, p); types += t; p = np }
      val buf = ByteBuffer.wrap(rec).order(ByteOrder.BIG_ENDIAN)
      buf.position(hdrLen.toInt)
      types.iterator.map { t =>
        t match {
          case 0 => null
          case 1 => buf.get().toLong
          case 2 => buf.getShort().toLong
          case 3 => ((buf.get().toLong << 16) | (buf.getShort() & 0xFFFFL)) << 40 >> 40
          case 4 => buf.getInt().toLong
          case 5 => ((buf.getShort().toLong << 32) | (buf.getInt() & 0xFFFFFFFFL)) << 16 >> 16
          case 6 => buf.getLong()
          case 7 => buf.getDouble()
          case 8 => 0L
          case 9 => 1L
          case n if n >= 12 && n % 2 == 0 =>
            val b = new Array[Byte]((n - 12).toInt / 2); buf.get(b); b
          case n if n >= 13 =>
            val b = new Array[Byte]((n - 13).toInt / 2); buf.get(b)
            new String(b, "UTF-8")
          case n => throw new IllegalStateException(s"reserved serial type $n")
        }
      }.toSeq
    }

    private def u16(at: Int): Int =
      ((bytes(at) & 0xFF) << 8) | (bytes(at + 1) & 0xFF)
    private def u32(at: Int): Int =
      ((bytes(at) & 0xFF) << 24) | ((bytes(at + 1) & 0xFF) << 16) |
        ((bytes(at + 2) & 0xFF) << 8) | (bytes(at + 3) & 0xFF)

    private def varint(at: Int): (Long, Int) = varintArr(bytes, at) match {
      case (v, n) => (v, n)
    }
    private def varintArr(a: Array[Byte], at: Int): (Long, Int) = {
      var v = 0L; var i = 0
      while (i < 8) {
        val b = a(at + i)
        if ((b & 0x80) == 0) return ((v << 7) | b, at + i + 1)
        v = (v << 7) | (b & 0x7F)
        i += 1
      }
      ((v << 8) | (a(at + 8) & 0xFF), at + 9)
    }
  }
}
