package graft

import graft.geo.{GeoKernels, Wkb}
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based invariants for the geometry layer.
  *
  * The bbox-cells property is the soundness condition of
  * [[graft.rules.SpatialJoinRewrite]]: containment implies the point's
  * packed grid cell is among the polygon's exploded bbox cells, so the
  * injected cell-equality conjunct can never drop a true match. */
class GeoPropertySpec extends SparkSuite {

  private def passes(prop: Prop, n: Int = 300): Boolean =
    SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop).passed

  private val coord = Gen.chooseNum(-1000.0, 1000.0)

  private val genRing: Gen[(Array[Double], Array[Double])] = for {
    cx <- coord; cy <- coord
    n <- Gen.chooseNum(3, 12)
    radii <- Gen.listOfN(n, Gen.chooseNum(0.5, 60.0))
  } yield {
    // star polygon around (cx, cy): always simple, never degenerate
    val pts = radii.zipWithIndex.map { case (r, i) =>
      val a = 2 * math.Pi * i / n
      (cx + r * math.cos(a), cy + r * math.sin(a))
    }
    (pts.map(_._1).toArray, pts.map(_._2).toArray)
  }

  private val genRings: Gen[Seq[(Array[Double], Array[Double])]] =
    Gen.chooseNum(1, 4).flatMap(k => Gen.listOfN(k, genRing).map(_.toSeq))

  test("WKB polygon-with-rings roundtrip preserves type and vertices") {
    val prop = Prop.forAll(genRings) { rings =>
      val (typ, got) = Wkb.decodeTyped(Wkb.encodePolygonRings(rings))
      typ == 3 && got.length == rings.length &&
        got.zip(rings).forall { case ((gx, gy), (x, y)) =>
          gx.sameElements(x) && gy.sameElements(y)
        }
    }
    assert(passes(prop))
  }

  test("WKB multipolygon roundtrip concatenates part rings in order") {
    val genParts = Gen.chooseNum(1, 3).flatMap(k =>
      Gen.listOfN(k, genRings).map(_.toSeq))
    val prop = Prop.forAll(genParts) { parts =>
      val (typ, got) = Wkb.decodeTyped(Wkb.encodeMultiPolygon(parts))
      val flat = parts.flatten
      typ == 6 && got.length == flat.length &&
        got.zip(flat).forall { case ((gx, gy), (x, y)) =>
          gx.sameElements(x) && gy.sameElements(y)
        }
    }
    assert(passes(prop))
  }

  test("containment implies the point's packed cell is in bbox_cells") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.catalyst.InternalRow
    def toArrayData(rings: Seq[(Array[Double], Array[Double])]): ArrayData =
      ArrayData.toArrayData(rings.map { case (xs, ys) =>
        ArrayData.toArrayData(xs.zip(ys).map { case (x, y) =>
          InternalRow(x, y)
        })
      }.toArray)

    // cell >= 4.0: ring centers span +-1000, so the combined bbox can
    // reach ~2100 units; finer cells would trip bboxCells' explicit
    // 2^22-cell guard (which has its own test below)
    val gen = for {
      rings <- genRings
      cell <- Gen.oneOf(4.0, 16.0, 128.0)
      px <- coord; py <- coord
    } yield (rings, cell, px, py)
    val prop = Prop.forAll(gen) { case (rings, cellSize, px, py) =>
      val xss = rings.map(_._1).toArray
      val yss = rings.map(_._2).toArray
      val inside = GeoKernels.pointInRings(xss, yss, px, py)
      if (!inside) true // invariant only constrains contained points
      else {
        val packed = (math.floor(px / cellSize).toLong << 32) |
          (math.floor(py / cellSize).toLong & 0xFFFFFFFFL)
        val cells = graft.geo.Rings.bboxCells(toArrayData(rings), cellSize)
        (0 until cells.numElements()).exists(i => cells.getLong(i) == packed)
      }
    }
    assert(passes(prop))

    // the cell-count guard: a bbox dwarfing the cell size fails fast
    // with an actionable message, never an overflow or huge allocation
    val huge = Seq((Array(0.0, 1e9, 1e9, 0.0), Array(0.0, 0.0, 1e9, 1e9)))
    val e = intercept[IllegalArgumentException] {
      graft.geo.Rings.bboxCells(toArrayData(huge), 1.0)
    }
    assert(e.getMessage.contains("cellSize"))
  }
}
