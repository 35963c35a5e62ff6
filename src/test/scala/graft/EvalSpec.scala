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

  test("calibration: a perfectly calibrated score has ECE 0") {
    // bin midpoint confidences with EXACTLY matching positive rates:
    // 4 rows at 250000 with 1 positive, 4 rows at 750000 with 3 —
    // acc == avg_conf in both bins, so every gap and the ECE are 0
    val df = (Seq.tabulate(4)(i => ("g", 250000L, i == 0)) ++
      Seq.tabulate(4)(i => ("g", 750000L, i != 0))).toDF("g", "s", "y")
    val rows = Eval.calibrationReport(df, "g", "s", "y", nBins = 10)
      .collect().map(r => r.getLong(r.fieldIndex("bin")) -> r).toMap
    assert(rows.keySet === Set(2L, 7L))
    for ((_, r) <- rows) {
      assert(r.getLong(r.fieldIndex("gap_micros")) === 0L)
      assert(r.getLong(r.fieldIndex("ece_micros")) === 0L)
    }
  }

  test("calibration: planted over-confidence is measured bin-exactly") {
    // one bin, 5 rows all claiming 900000 but only 1 positive:
    // acc = 200000, gap = 700000, ECE = 700000 (single bin).
    val df = Seq.tabulate(5)(i => ("g", 900000L, i == 0)).toDF("g", "s", "y")
    val r = Eval.calibrationReport(df, "g", "s", "y", nBins = 10)
      .collect().head
    assert(r.getLong(r.fieldIndex("bin")) === 9L)
    assert(r.getLong(r.fieldIndex("acc_micros")) === 200000L)
    assert(r.getLong(r.fieldIndex("avg_conf_micros")) === 900000L)
    assert(r.getLong(r.fieldIndex("gap_micros")) === 700000L)
    assert(r.getLong(r.fieldIndex("ece_micros")) === 700000L)
  }

  test("calibration: top edge folds into the last bin; ECE row-weights") {
    // conf exactly 1e6 must land in bin 9 (not its own bin 10);
    // two bins with different sizes weight the ECE by row count:
    // bin 0: 3 rows, conf 0, 0 pos -> gap 0; bin 9: 1 row, conf 1e6,
    // 0 pos -> gap 1e6; ECE = (3*0 + 1*1e6) div 4 = 250000.
    val df = (Seq.fill(3)(("g", 0L, false)) :+ ("g", 1000000L, false))
      .toDF("g", "s", "y")
    val rows = Eval.calibrationReport(df, "g", "s", "y", nBins = 10)
      .collect().map(r => r.getLong(r.fieldIndex("bin")) -> r).toMap
    assert(rows.keySet === Set(0L, 9L))
    assert(rows(9L).getLong(rows(9L).fieldIndex("gap_micros")) === 1000000L)
    for ((_, r) <- rows)
      assert(r.getLong(r.fieldIndex("ece_micros")) === 250000L)
  }

  test("randomized property: ECE report agrees with a local reference") {
    // every output column re-derived driver-side with plain Scala
    // integer arithmetic (Long / on non-negative values == Spark's
    // div == the floor division the contract specifies) — the
    // rankAuc pairwise-property pattern applied to calibration
    val rnd = new scala.util.Random(43)
    val rows = (0 until 500).map { _ =>
      (s"g${rnd.nextInt(3)}", rnd.nextInt(1000001).toLong, rnd.nextBoolean())
    }
    val got = Eval.calibrationReport(rows.toDF("g", "s", "y"),
        "g", "s", "y", nBins = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7))).toMap
    val expected = rows.groupBy(_._1).flatMap { case (g, gr) =>
      val bins = gr.groupBy(t => math.min(9L, t._2 * 10 / 1000000))
      val local = bins.map { case (b, rs) =>
        val n = rs.size.toLong; val np = rs.count(_._3).toLong
        val avg = rs.map(_._2).sum / n
        val acc = np * 1000000L / n
        b -> (n, np, avg, acc, math.abs(acc - avg))
      }
      val ece = local.values.map(v => v._1 * v._5).sum /
        local.values.map(_._1).sum
      local.map { case (b, (n, np, avg, acc, gap)) =>
        (g, b) -> ((n, np, avg, acc, gap, ece))
      }
    }
    assert(got === expected)
  }

  test("plan: q204 one scan, bin-histogram-sized shuffles only") {
    val qe = SparkEntry.queries("q204_calibration_audit")(
      spark, "/root/testdata/sf0.001").queryExecution
    val scans =
      "file:[^\\]\\s]*\\.parquet".r.findAllMatchIn(qe.sparkPlan.toString).size
    val exchanges = "Exchange".r.findAllIn(qe.executedPlan.toString).size -
      "BroadcastExchange".r.findAllIn(qe.executedPlan.toString).size
    assert(scans <= 1 && exchanges <= 3)
  }

  test("composed ingest audit equals its three component audits") {
    // the fusion contract: ingestAudit's AUC columns must equal
    // rankAuc's, its ECE calibrationReport's, and its PSI the
    // bin-grain psiReport's — on a randomized fixture with planted
    // window skew so the PSI is nonzero and some bins are one-sided
    import org.apache.spark.sql.functions.{col, floor => ffloor, least, lit}
    val rnd = new scala.util.Random(47)
    val rows = (0L until 600L).map { i =>
      // skew: odd ids (current window) score higher in group g0
      val base = rnd.nextInt(900001).toLong
      val s = if (i % 2 == 1 && i % 3 == 0) base + 100000L else base
      (s"g${(i % 3)}", i, s, rnd.nextBoolean())
    }
    val df = rows.toDF("g", "id", "s", "y")
    val isRef = col("id") % 2 === 0
    val got = Eval.ingestAudit(df, "g", "s", "y", isRef, nBins = 10,
        psiThresholdMicros = 200000L)
      .collect().map(r => r.getString(0) -> r).toMap
    val auc = Eval.rankAuc(df, "g", "s", "y").collect()
      .map(r => r.getString(0) -> r).toMap
    val ece = Eval.calibrationReport(df, "g", "s", "y", nBins = 10)
      .collect().map(r => r.getString(0) ->
        r.getLong(r.fieldIndex("ece_micros"))).toMap
    for (g <- Seq("g0", "g1", "g2")) {
      val r = got(g); val a = auc(g)
      assert(r.getLong(r.fieldIndex("n_pos")) ===
        a.getLong(a.fieldIndex("n_pos")), s"$g n_pos")
      assert(r.getLong(r.fieldIndex("n_neg")) ===
        a.getLong(a.fieldIndex("n_neg")), s"$g n_neg")
      assert(r.getLong(r.fieldIndex("u2")) ===
        a.getLong(a.fieldIndex("u2")), s"$g u2")
      assert(r.getLong(r.fieldIndex("auc_micros")) ===
        a.getLong(a.fieldIndex("auc_micros")), s"$g auc")
      assert(r.getLong(r.fieldIndex("ece_micros")) === ece(g), s"$g ece")
      // PSI: the bin-grain drift report over this group's rows alone
      val binned = df.where(col("g") === g)
        .withColumn("bin", least(lit(9L),
          ffloor(col("s") * lit(10L) / lit(1000000.0)).cast("long")))
      val psi = graft.ops.Drift.psiReport(binned, "bin", isRef, 200000L)
        .collect().head
      assert(r.getLong(r.fieldIndex("psi_total_micros")) ===
        psi.getLong(psi.fieldIndex("psi_total_micros")), s"$g psi")
      assert(r.getBoolean(r.fieldIndex("drifted")) ===
        psi.getBoolean(psi.fieldIndex("drifted")), s"$g drifted")
    }
    // the planted skew must register: equality with psiReport would
    // hold trivially if both sides degenerated to zero
    assert(Seq("g0", "g1", "g2").exists { g =>
      got(g).getLong(got(g).fieldIndex("psi_total_micros")) > 0L
    }, "planted window skew produced no PSI signal anywhere")
  }

  test("plan: q208 one scan, one corpus shuffle + one source exchange") {
    val qe = SparkEntry.queries("q208_ingest_audit")(
      spark, "/root/testdata/sf0.001").queryExecution
    val scans =
      "file:[^\\]\\s]*\\.parquet".r.findAllMatchIn(qe.sparkPlan.toString).size
    val exchanges = "Exchange".r.findAllIn(qe.executedPlan.toString).size -
      "BroadcastExchange".r.findAllIn(qe.executedPlan.toString).size
    assert(scans <= 1, s"q208 scans: $scans")
    assert(exchanges <= 2, s"q208 shuffles: $exchanges")
  }
}
