package graft

import graft.ops.Temporal
import org.apache.spark.sql.functions._

/** Temporal joins (as-of, interval) against brute-force references, and
  * accuracy bounds for the sketch twins (q93). */
class TemporalSketchSpec extends SparkSuite {
  import spark.implicits._

  private def referenceAsof(left: Seq[(Long, Long, Long)],
                            right: Seq[(Long, Long, Double)])
      : Map[Long, Option[(Long, Double)]] =
    left.map { case (id, k, t) =>
      val cands = right.filter { case (rk, rt, _) => rk == k && rt <= t }
      id -> (if (cands.isEmpty) None
             else Some(cands.map { case (_, rt, v) => (rt, v) }.max))
    }.toMap

  test("asofJoinBackward matches the brute-force latest-at-or-before pick") {
    // keys 1..3; right times interleaved, duplicates at the same time
    val left = Seq((1L, 1L, 10L), (2L, 1L, 25L), (3L, 2L, 5L), (4L, 2L, 40L),
      (5L, 3L, 100L))
    val right = Seq((1L, 5L, 0.5), (1L, 10L, 1.5), (1L, 20L, 2.5),
      (2L, 6L, 3.5), (2L, 40L, 4.5), (2L, 40L, 9.5), (3L, 101L, 7.5))
    val got = Temporal.asofJoinBackward(
        left.toDF("event_id", "user_id", "t"),
        right.toDF("user_id", "t", "value"),
        keys = Seq("user_id"), timeCol = "t", payload = Seq("value"))
      .select("event_id", "t_right", "value_right")
      .as[(Long, Option[Long], Option[Double])].collect()
      .map(r => r._1 -> r._2.zip(r._3).headOption).toMap
    val want = referenceAsof(left, right)
    assert(got.keySet === want.keySet)
    want.foreach { case (id, m) => assert(got(id) === m, s"left row $id") }
    // row 1: equal time matches (inclusive); row 4: tie at t=40 picks
    // the larger payload; row 5: nothing at-or-before -> null
    assert(got(1L) === Some((10L, 1.5)))
    assert(got(4L) === Some((40L, 9.5)))
    assert(got(5L) === None)
  }

  test("asofJoinBackward tolerance nulls out stale matches only") {
    val left = Seq((1L, 1L, java.sql.Timestamp.from(
        java.time.Instant.parse("2024-01-01T00:10:00Z"))),
      (2L, 1L, java.sql.Timestamp.from(
        java.time.Instant.parse("2024-01-01T09:00:00Z"))))
      .toDF("event_id", "user_id", "ts")
    val right = Seq((1L, java.sql.Timestamp.from(
        java.time.Instant.parse("2024-01-01T00:00:00Z")), 7.0))
      .toDF("user_id", "ts", "value")
    val got = Temporal.asofJoinBackward(left, right,
        keys = Seq("user_id"), timeCol = "ts", payload = Seq("value"),
        toleranceUs = Some(3600L * 1000000L)) // 1 hour
      .select("event_id", "value_right").as[(Long, Option[Double])]
      .collect().toMap
    assert(got(1L) === Some(7.0))  // 10 min old: kept
    assert(got(2L) === None)       // 9 h old: discarded
  }

  test("intervalJoin equals the naive range predicate, overlaps included") {
    val points = (0L until 200L).map(i => (i, i * 7L)).toDF("pid", "ts_us")
    val intervals = Seq((10L, 0L, 100L), (11L, 50L, 400L), (12L, 390L, 391L),
      (13L, 600L, 600L), (14L, 700L, 650L)) // 13/14 empty -> match nothing
      .toDF("window_id", "start_us", "end_us")
    val got = Temporal.intervalJoin(points, "ts_us",
        intervals, "start_us", "end_us", cellUs = 64L)
      .select("pid", "window_id").as[(Long, Long)].collect().sorted.toSeq
    val want = (for {
      (pid, t) <- (0L until 200L).map(i => (i, i * 7L))
      (w, s, e) <- Seq((10L, 0L, 100L), (11L, 50L, 400L), (12L, 390L, 391L))
      if t >= s && t < e
    } yield (pid, w)).sorted
    assert(got === want)
    assert(want.exists(_._2 == 11L) && want.exists(_._2 == 10L))
  }

  test("intervalJoin fails fast on an interval exploding past the cell cap") {
    val points = Seq((1L, 5L)).toDF("pid", "ts_us")
    val intervals = Seq((1L, 0L, 10000000L)).toDF("window_id", "start_us", "end_us")
    val ex = intercept[Exception] {
      Temporal.intervalJoin(points, "ts_us", intervals,
        "start_us", "end_us", cellUs = 10L, maxCellsPerInterval = 100).count()
    }
    assert(ex.getMessage.toLowerCase.contains("cells") ||
      ex.getCause != null && ex.getCause.getMessage.toLowerCase.contains("cells"))
  }

  test("q93 sketch twins stay within documented error of their exact twins") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.core.Tables.load(spark, dir, "documents")
    val toks = docs.select(col("source"),
      explode(graft.text.Text.tokens(col("text"))).as("term"), col("n_chars"))
    val exact = toks.groupBy("source").agg(
        count_distinct(col("term")).as("vocab"),
        expr("percentile(n_chars, 0.5)").as("p50"))
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val approx = SparkEntry.queries("q93_sketch_stats")(spark, dir)
      .select("source", "approx_vocab", "approx_p50")
      .as[(String, Long, Long)].collect()
    assert(approx.nonEmpty)
    approx.foreach { case (src, av, ap50) =>
      val (ev, ep50) = exact(src)
      assert(math.abs(av - ev).toDouble / ev <= 0.05,
        s"$src HLL vocab $av vs exact $ev drifted > 5%")
      assert(math.abs(ap50 - ep50) / ep50 <= 0.05,
        s"$src approx p50 $ap50 vs exact $ep50 drifted > 5%")
    }
  }
}
