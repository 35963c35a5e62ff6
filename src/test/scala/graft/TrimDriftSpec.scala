package graft

import org.apache.spark.sql.functions._

import graft.curation.Curate
import graft.ops.Drift

/** Histogram-CDF exact percentile trim (q199) and PSI drift gate
  * (q200). */
class TrimDriftSpec extends SparkSuite {
  import spark.implicits._

  test("quantile trim: hand fixture matches quantile_disc semantics") {
    // group a: values 1..10 once each, N=10: lo = min v with cum*20>=N
    // -> cum>=0.5 -> v=1; hi = min v with cum*20>=19*10=190 -> cum>=9.5
    // -> cum=10 -> v=10 (nothing trimmed at N=10, p5/p95).
    // group b: 1 appears 18x, 100 and 200 once each, N=20:
    // lo: cum(1)=18, 18*20=360>=20 -> lo=1
    // hi: need cum*20>=380 -> cum>=19 -> v=100; keep drops only 200.
    val df = ((1 to 10).map(v => ("a", v.toLong)) ++
      Seq.fill(18)(("b", 1L)) ++ Seq(("b", 100L), ("b", 200L)))
      .zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v) }
      .toDF("id", "g", "v")
    val out = Curate.histogramQuantileTrim(df, "g", "v", 1, 19, 20)
    val th = out.select("g", "lo", "hi").distinct().orderBy("g").collect()
    assert(th.map(r => (r.getString(0), r.getLong(1), r.getLong(2))) ===
      Array(("a", 1L, 10L), ("b", 1L, 100L)))
    val dropped = out.where(!col("keep")).select("v").as[Long].collect()
    assert(dropped.toSeq === Seq(200L))
  }

  test("quantile trim: randomized property vs sorted-index reference") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 500).map { i =>
      (i.toLong, s"g${i % 3}", rnd.nextInt(40).toLong + 1)
    }
    val df = rows.toDF("id", "g", "v")
    val got = Curate.histogramQuantileTrim(df, "g", "v", 1, 19, 20)
      .select("g", "lo", "hi").distinct().collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

    rows.groupBy(_._2).foreach { case (g, gr) =>
      val sorted = gr.map(_._3).sorted
      val n = sorted.length
      def q(num: Int) = sorted(math.ceil(num.toDouble * n / 20).toInt - 1)
      assert(got(g) === (q(1), q(19)), s"group $g")
    }
  }

  test("psi: A/A split of one distribution scores zero, no drift") {
    val df = (0L until 400L).map(i => (i, s"t${(i / 2) % 4}"))
      .toDF("event_id", "cat")
    val out = Drift.psiReport(df, "cat", col("event_id") % 2 === 0, 200000L)
      .collect()
    assert(out.length === 4)
    assert(out.forall(r => r.getLong(r.fieldIndex("term_micros")) === 0L))
    assert(out.forall(!_.getBoolean(out.head.fieldIndex("drifted"))))
  }

  test("psi: planted category shift alerts; one-sided excluded") {
    // ref: 90% t0 / 10% t1; cur: 10% t0 / 90% t1 -> PSI = 2*0.8*ln(9)
    // ~ 3.52 nats >> 0.2; t2 only in cur -> NULL term, excluded.
    val ref = (0L until 100L).map(i => (i * 2, if (i < 90) "t0" else "t1"))
    val cur = (0L until 100L).map(i =>
      (i * 2 + 1, if (i < 10) "t0" else if (i < 99) "t1" else "t2"))
    val df = (ref ++ cur).toDF("event_id", "cat")
    val out = Drift.psiReport(df, "cat", col("event_id") % 2 === 0, 200000L)
    val rows = out.collect().map(r => r.getString(0) -> r).toMap
    assert(rows("t2").isNullAt(rows("t2").fieldIndex("term_micros")))
    assert(rows("t0").getBoolean(rows("t0").fieldIndex("drifted")))
    val total = rows("t0").getLong(rows("t0").fieldIndex("psi_total_micros"))
    // t0: (0.1-0.9)*ln((10*100)/(90*100)) = -0.8*ln(1/9) = 1.7578...
    assert(total > 3000000L && total < 4000000L)
  }

  test("plans: q199 two scans / histogram-sized shuffles; q200 one scan") {
    def plans(name: String) = {
      val qe = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
        .queryExecution
      (("file:[^\\]\\s]*\\.parquet".r.findAllMatchIn(qe.sparkPlan.toString).size,
        "Exchange".r.findAllIn(qe.executedPlan.toString).size -
          "BroadcastExchange".r.findAllIn(qe.executedPlan.toString).size))
    }
    val (s199, x199) = plans("q199_length_trim")
    assert(s199 <= 2 && x199 <= 3)
    val (s200, x200) = plans("q200_drift_psi")
    assert(s200 <= 1 && x200 <= 3)
  }
}
