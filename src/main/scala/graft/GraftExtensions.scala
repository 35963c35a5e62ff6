package graft

import graft.functions.{CosineSimilarity, HyperplaneLsh, MinHashSignature, SimHash64, WinnowFingerprint}
import graft.geo.{CrsTransform, PointInRing, RingArea, WkbToRing}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** SQL surface for the engine's custom expressions: registered through
  * `SparkSessionExtensions` (spark.sql.extensions=graft.GraftExtensions)
  * or onto a live session via `GraftExtensions.register(spark)`, so
  * `spark.sql("SELECT cosine_similarity(a, b) ...")` works exactly like
  * the Column API. All functions plan to the same native expressions —
  * no UDF wrapping, full codegen where the expression provides it.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.builders.foreach { case (name, builder) =>
      e.injectFunction((new FunctionIdentifier(name),
        new ExpressionInfo("graft", name), builder))
    }
    e.injectOptimizerRule(_ => graft.rules.JaccardLengthPruning)
    e.injectOptimizerRule(_ => graft.rules.SpatialJoinRewrite)
  }
}

object GraftExtensions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def doubleArg(e: Expression, what: String): Double = e match {
    case Literal(v: Double, _) => v
    case Literal(v: Int, _) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"$what must be a numeric literal, got $other")
  }

  private def stringArg(e: Expression, what: String): String = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) => v.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_similarity" -> (es => CosineSimilarity(es(0), es(1))),
    "simhash64" -> (es => SimHash64(es(0))),
    "minhash_signature" -> (es => MinHashSignature(es(0), intArg(es(1), "k"))),
    "winnow_fingerprint" -> (es => WinnowFingerprint(es(0),
      intArg(es(1), "k"), intArg(es(2), "t"))),
    "hyperplane_lsh" -> (es => HyperplaneLsh(es(0), intArg(es(1), "bits"))),
    "point_in_ring" -> (es => PointInRing(es(0), es(1), es(2))),
    "point_in_rings" -> (es => graft.geo.PointInRings(es(0), es(1), es(2))),
    "wkb_to_ring" -> (es => WkbToRing(es(0))),
    "wkb_to_rings" -> (es => graft.geo.WkbToRings(es(0))),
    "ring_area" -> (es => RingArea(es(0))),
    "rings_area" -> (es => graft.geo.RingsArea(es(0))),
    "bbox_cells" -> (es => graft.geo.RingsBboxCells(es(0), doubleArg(es(1), "cellSize"))),
    "lambert72_to_wgs84" -> (es => CrsTransform(es(0), es(1), toWgs84 = true)),
    "wgs84_to_lambert72" -> (es => CrsTransform(es(0), es(1), toWgs84 = false)),
    "pcm_windows" -> (es => graft.functions.PcmWindowFeatures(es(0),
      intArg(es(1), "window"))),
    "long_dot" -> (es => graft.functions.LongDot(es(0), es(1))),
    "double_dot" -> (es => graft.functions.DoubleDot(es(0), es(1))),
    "long_intersect_count" -> (es => graft.functions.LongIntersectCount(es(0), es(1))),
    "squared_l2_micros" -> (es => graft.functions.SquaredL2Micros(es(0), es(1))),
    "vec_sub" -> (es => graft.functions.VecSub(es(0), es(1))),
    "word_spans" -> (es => graft.functions.WordSpans(es(0), intArg(es(1), "w"))),
    "winnow_picks_md5" -> (es => graft.functions.WinnowPicksMd5(es(0),
      intArg(es(1), "k"), intArg(es(2), "t"))),
    "md5_simhash32" -> (es => graft.functions.Md5SimHash32(es(0))),
    "md5_minhash_sig" -> (es => graft.functions.Md5MinhashSig(es(0),
      intArg(es(1), "k"))),
    "int_counts" -> (es => graft.functions.IntCounts(es(0), intArg(es(1), "k"))),
    "sign_bits" -> (es => graft.functions.SignBits(es(0))),
    "bpe_apply_merge" -> (es => graft.text.BpeApplyMerge(es(0),
      stringArg(es(1), "left"), stringArg(es(2), "right"))),
    "gray_png" -> (es => graft.functions.GrayPngExpr(es(0), es(1), es(2))),
    "image_meta" -> (es => graft.functions.ImageMetaExpr(es(0))))

  /** Register on an already-built session (tests, notebooks). */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
