package graft

import graft.ml.Eval

/** Rank-sum (Mann–Whitney) ROC-AUC over histogram CDFs (q201). */
class EvalSpec extends SparkSuite {
  import spark.implicits._

  test("perfect separation, inversion, and one-class groups") {
    // group a: all positives score above all negatives -> AUC = 1.
    // group b: all positives BELOW all negatives -> AUC = 0.
    // group c: positives only -> NULL auc.
    val df = (Seq(("a", 10L, true), ("a", 11L, true), ("a", 1L, false),
      ("a", 2L, false), ("b", 1L, true), ("b", 9L, false),
      ("c", 5L, true), ("c", 6L, true)))
      .toDF("g", "s", "y")
    val rows = Eval.rankAuc(df, "g", "s", "y").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows("a").getLong(rows("a").fieldIndex("auc_micros")) === 1000000L)
    assert(rows("b").getLong(rows("b").fieldIndex("auc_micros")) === 0L)
    assert(rows("c").isNullAt(rows("c").fieldIndex("auc_micros")))
    assert(rows("c").getLong(rows("c").fieldIndex("n_neg")) === 0L)
  }

  test("all-tied scores give AUC exactly 1/2 (midrank correctness)") {
    val df = (0 until 10).map(i => ("g", 7L, i % 2 == 0)).toDF("g", "s", "y")
    val out = Eval.rankAuc(df, "g", "s", "y").collect().head
    assert(out.getLong(out.fieldIndex("auc_micros")) === 500000L)
  }

  test("randomized property vs pairwise-comparison definition") {
    // AUC = (#(pos>neg pairs) + 0.5*#(pos==neg pairs)) / (np*nn);
    // the rank formulation must agree exactly in doubled-U units.
    val rnd = new scala.util.Random(31)
    val rows = (0 until 300).map { i =>
      (s"g${i % 3}", rnd.nextInt(12).toLong, rnd.nextBoolean())
    }
    val got = Eval.rankAuc(rows.toDF("g", "s", "y"), "g", "s", "y")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    rows.groupBy(_._1).foreach { case (g, gr) =>
      val pos = gr.filter(_._3).map(_._2)
      val neg = gr.filterNot(_._3).map(_._2)
      val u2 = pos.map(p => neg.map(n =>
        if (p > n) 2L else if (p == n) 1L else 0L).sum).sum
      assert(got(g) === ((pos.size.toLong, neg.size.toLong, u2)), s"group $g")
    }
  }

  test("plan: q201 one scan, histogram-sized shuffles only") {
    val qe = SparkEntry.queries("q201_quality_auc")(
      spark, "/root/testdata/sf0.001").queryExecution
    val scans =
      "file:[^\\]\\s]*\\.parquet".r.findAllMatchIn(qe.sparkPlan.toString).size
    val exchanges = "Exchange".r.findAllIn(qe.executedPlan.toString).size -
      "BroadcastExchange".r.findAllIn(qe.executedPlan.toString).size
    assert(scans <= 1 && exchanges <= 3)
  }
}
