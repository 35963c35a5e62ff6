package graft

import graft.ml.Spectral
import org.apache.spark.sql.functions._

/** Behavior gates for the power-iteration dominant direction (q152's
  * engine): the oracle pins cross-engine hash parity; these pin that
  * two steps actually FIND the dominant axis of a corpus with a wide
  * eigengap and that the result is run-to-run deterministic. */
class SpectralSpec extends SparkSuite {
  import spark.implicits._

  // points spread along the (1, 2, 0, 0) axis with small off-axis
  // noise: the top principal direction is unambiguous and projections
  // must recover the position ordering
  private def line = (-10 to 10).map { t =>
    ((t + 10).toLong, math.abs(t) % 3,
      Array(t.toFloat, 2.0f * t, 0.01f * (t % 3), 0.02f * (t % 2)))
  }.toDF("vec_id", "label", "embedding")

  test("q152 power iteration recovers the planted dominant axis") {
    val got = Spectral.dominantProjection(line, "embedding", "vec_id", "label",
        iters = 2)
      .select(col("vec_id").cast("long"), col("proj_micros").cast("long"))
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(got.length === 21)
    val projs = got.map(_._2)
    // strictly monotone in the planted position (ids are ordered by t)
    assert(projs.zip(projs.tail).forall { case (a, b) => a < b },
      s"projections lost the axis ordering: ${projs.mkString(",")}")
    // mean-centering: the symmetric corpus projects symmetrically
    // (t = 0 sits at id 10, its projection is ~0 on the unit axis)
    assert(math.abs(projs(10)) < 50000, s"center drifted: ${projs(10)}")
    // the axis is real: extremes reach ~|t|·sqrt(5) ~ 22.36
    assert(projs.last > 22000000L && projs.head < -22000000L,
      s"projection magnitude collapsed: ${projs.head} .. ${projs.last}")
  }

  test("a degenerate corpus yields NULL projections, not NaN or fake zeros") {
    // all documents identical -> centered vectors all zero -> the
    // power iteration's direction collapses to zero; the projection
    // must surface as NULL (a NaN would crash the long cast under
    // ANSI mode and read as a real 0 otherwise)
    val flat = (0 until 6).map(i => (i.toLong, 0, Array(0.25f, -0.5f, 0.75f, 0.125f)))
      .toDF("vec_id", "label", "embedding")
    val got = Spectral.dominantProjection(flat, "embedding", "vec_id", "label",
        iters = 2)
      .select(col("proj_micros")).collect()
    assert(got.length === 6)
    assert(got.forall(_.isNullAt(0)), s"expected all-NULL projections: ${got.toSeq}")
  }

  test("the direction is deterministic under repartitioning") {
    def run() = Spectral
      .dominantProjection(line.repartition(5), "embedding", "vec_id", "label",
        iters = 2)
      .select(col("vec_id").cast("long"), col("proj_micros").cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(run() === run())
  }
}
