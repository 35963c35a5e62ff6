package graft

import graft.ml.LinearProbe
import org.apache.spark.sql.functions._

/** Behavior gates for the distributed linear quality probe (q149's
  * engine): the oracle pins cross-engine hash parity; these pin that
  * the training loop actually LEARNS (a sign-separable corpus is
  * classified perfectly within a few steps) and that the trajectory is
  * run-to-run deterministic (fixed-point gradients leave nothing to
  * accumulation order or partitioning).
  */
class LinearProbeSpec extends SparkSuite {
  import spark.implicits._

  private def blobs = (0 until 20).map { i =>
    val sign = if (i % 2 == 1) 1.0f else -1.0f
    (i.toLong, i % 2, Array.tabulate(4)(d => sign * (0.4f + 0.01f * ((i + d) % 5))))
  }.toDF("vec_id", "label", "embedding")

  test("a sign-separable corpus is perfectly classified after 3 steps") {
    val got = LinearProbe.scored(blobs, "embedding", "vec_id", "label",
        iters = 3, lr = 4.0)
      .select(col("vec_id").cast("long"), col("label").cast("int"),
        col("score_micros").cast("long"), col("pred"))
      .as[(Long, Int, Long, Boolean)].collect()
    assert(got.length === 20)
    assert(got.forall(r => r._4 == (r._2 % 2 == 1)),
      s"misclassified: ${got.filterNot(r => r._4 == (r._2 % 2 == 1)).mkString(",")}")
    // scores separate: every positive doc scores above every negative
    val pos = got.filter(_._2 % 2 == 1).map(_._3).min
    val neg = got.filter(_._2 % 2 == 0).map(_._3).max
    assert(pos > neg, s"score margin collapsed: min-pos $pos <= max-neg $neg")
  }

  test("training is run-to-run deterministic (fixed-point gradients)") {
    def run() = LinearProbe
      .scored(blobs.repartition(7), "embedding", "vec_id", "label",
        iters = 2, lr = 4.0)
      .select(col("vec_id").cast("long"), col("score_micros").cast("long"))
      .as[(Long, Long)].collect().toMap
    val a = run()
    val b = run()
    assert(a === b, "scores differ across runs")
  }
}
