package graft

import graft.core.Checks
import graft.ops.{Aggs, Relational, Reshape}
import org.apache.spark.sql.functions._

class OpsSpec extends SparkSuite {
  import spark.implicits._

  test("latestPerKey keeps exactly the newest row per key (W2)") {
    val df = Seq((1, "2020-01-01", "old"), (1, "2021-01-01", "new"),
      (2, "2019-05-05", "only")).toDF("id", "d", "v")
    val got = Relational.latestPerKey(df, Seq("id"), Seq(col("d").desc))
      .select("id", "v").as[(Int, String)].collect().toMap
    assert(got === Map(1 -> "new", 2 -> "only"))
  }

  test("slicePerKeyWithTies keeps ties (W3 / slice_min with_ties)") {
    val df = Seq((1, 5, "a"), (1, 5, "b"), (1, 7, "c")).toDF("id", "rank_v", "v")
    val got = Relational.slicePerKeyWithTies(df, Seq("id"), Seq(col("rank_v").asc))
      .select("v").as[String].collect().toSet
    assert(got === Set("a", "b"))
  }

  test("withGroupCount flags duplicate keys (W1 probe)") {
    val df = Seq((1, "x"), (1, "y"), (2, "z")).toDF("k", "v")
    val dups = Relational.withGroupCount(df, Seq("k")).where(col("n") > 1)
    assert(dups.count() === 2)
  }

  test("fillWithGroupMax fills nulls from group max (W6)") {
    val df = Seq((1, Some(3.0)), (1, None), (2, None)).toDF("k", "v")
    val got = Relational.fillWithGroupMax(df, Seq("k"), "v")
      .orderBy("k").select("v").as[Option[Double]].collect()
    assert(got.toSeq === Seq(Some(3.0), Some(3.0), None))
  }

  test("membership flag = semi-join as boolean (J10)") {
    val df = Seq(1, 2, 3).toDF("id")
    val lookup = Seq(2, 2, 9).toDF("k")
    val got = Relational.withMembershipFlag(df, "id", lookup, "k", "hit")
      .as[(Int, Boolean)].collect().toMap
    assert(got === Map(1 -> false, 2 -> true, 3 -> false))
  }

  test("unionCycles is schema-tolerant and tags cycles (U1)") {
    val a = Seq((1, 10.0)).toDF("id", "price")
    val b = Seq(2).toDF("id")
    val got = Relational.unionCycles(Seq(1 -> a, 2 -> b))
    assert(got.columns.toSet === Set("id", "price", "mon_cycle"))
    val rows = got.orderBy("id").collect()
    assert(rows(1).isNullAt(rows(1).fieldIndex("price")))
    assert(rows(1).getInt(rows(1).fieldIndex("mon_cycle")) === 2)
  }

  test("applyPatches replaces by key and appends unmatched (P9)") {
    val base = Seq((1, "a"), (2, "b")).toDF("id", "v")
    val patch = Seq((2, "B"), (3, "C")).toDF("id", "v")
    val got = Relational.applyPatches(base, patch, Seq("id"))
      .as[(Int, String)].collect().toMap
    assert(got === Map(1 -> "a", 2 -> "B", 3 -> "C"))
  }

  test("melt keeps NA rows like gather (R1)") {
    val df = Seq((1, Some(2.0), None: Option[Double])).toDF("id", "x", "y")
    val got = Reshape.melt(df, Seq("id"), Seq("x", "y"))
    assert(got.count() === 2)
    assert(got.where(col("value").isNull).count() === 1)
  }

  test("pivotWide produces static columns with fill (R2)") {
    val df = Seq((1, "a"), (1, "a"), (2, "b")).toDF("id", "s")
    val got = Reshape.pivotWide(df, Seq("id"), "s", Seq("a", "b", "c"),
      count(lit(1)), fill = Some(lit(0L)), prefix = "n_")
    assert(got.columns.toSeq === Seq("id", "n_a", "n_b", "n_c"))
    val r1 = got.where(col("id") === 1).collect()(0)
    assert((r1.getLong(1), r1.getLong(2), r1.getLong(3)) === ((2L, 0L, 0L)))
  }

  test("separate splits with dplyr NULL semantics (R4)") {
    val df = Seq("a - b", "solo").toDF("s")
    val got = Reshape.separate(df, "s", Seq("p1", "p2"), " - ")
      .select("p1", "p2").as[(String, Option[String])].collect().toSet
    assert(got === Set(("a", Some("b")), ("solo", None)))
  }

  test("complementProduct = 1 - prod(1 - x) incl. zeros (A7)") {
    val df = Seq((1, 0.5), (1, 0.5), (2, 0.0), (3, 1.0), (3, 0.3)).toDF("k", "c")
    val got = df.groupBy("k").agg(round(Aggs.complementProduct(col("c")), 9).as("u"))
      .as[(Int, Double)].collect().toMap
    assert(got(1) === 0.75 && got(2) === 0.0 && got(3) === 1.0)
  }

  test("product: sign/zero/empty handling of the codegen'd form") {
    val df = Seq(
      (1, Some(2.0)), (1, Some(-3.0)),                  // one negative -> -6
      (2, Some(-2.0)), (2, Some(-5.0)),                 // two negatives -> 10
      (3, Some(4.0)), (3, Some(0.0)), (3, Some(-1.0)),  // any zero -> 0
      (4, None), (4, None),                             // all null -> fold zero 1.0
      (5, Some(2.5)), (5, None))                        // nulls ignored
      .toDF("k", "x")
    val got = df.groupBy("k").agg(round(Aggs.product(col("x")), 9).as("p"))
      .as[(Int, Double)].collect().toMap
    assert(got === Map(1 -> -6.0, 2 -> 10.0, 3 -> 0.0, 4 -> 1.0, 5 -> 2.5))
    // the plan stays in whole-stage codegen (no UDAF / ObjectHashAggregate)
    val plan = df.groupBy("k").agg(Aggs.product(col("x")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ObjectHashAggregate"), s"UDAF-style aggregate in:\n$plan")
  }

  test("complementProductSorted agrees with the Aggregator to 1e-12 (A7)") {
    // 40 groups x up to 9 fractional covers; the sorted canonical fold
    // and the merge-order Aggregator may differ in the last double bit,
    // never more
    val rows = for (g <- 1 to 40; i <- 0 to (g % 9)) yield
      (g, ((g * 31 + i * 17) % 97) / 100.0)
    val df = rows.toDF("k", "c")
    val both = df.groupBy("k").agg(
        Aggs.complementProduct(col("c")).as("agg"),
        Aggs.complementProductSorted(col("c")).as("sorted"))
      .as[(Int, Double, Double)].collect()
    both.foreach { case (k, a, s) =>
      assert(math.abs(a - s) < 1e-12, s"group $k: $a vs $s")
    }
  }

  test("stringAggSorted is deterministic (A10)") {
    val df = Seq((1, "b"), (1, "a"), (1, "b")).toDF("k", "v")
    val got = df.groupBy("k").agg(Aggs.stringAggSorted(col("v"), ";").as("s"))
      .as[(Int, String)].collect().head._2
    assert(got === "a;b")
  }

  test("boolAny / boolAll (A5)") {
    val df = Seq((1, true), (1, false), (2, true)).toDF("k", "b")
    val got = df.groupBy("k")
      .agg(Aggs.boolAny(col("b")).as("any"), Aggs.boolAll(col("b")).as("all"))
      .as[(Int, Boolean, Boolean)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got === Map(1 -> ((true, false)), 2 -> ((true, true))))
  }

  test("sumExact is order-independent exact money arithmetic") {
    val vals = (1 to 10000).map(i => (i % 7, i * 0.01))
    val df = vals.toDF("k", "x")
    val got = df.repartition(13).groupBy("k").agg(Aggs.sumExact(col("x"), 2, "s"))
      .as[(Int, Double)].collect().toMap
    val want = vals.groupBy(_._1).view.mapValues(
      v => v.map(x => math.round(x._2 * 100)).sum / 100.0).toMap
    assert(got === want)
  }

  test("Checks.assertUniqueKey throws on dupes and passes on unique") {
    val ok = Seq((1, "a"), (2, "b")).toDF("id", "v")
    Checks.assertUniqueKey(ok, Seq("id"))
    val bad = Seq((1, "a"), (1, "b")).toDF("id", "v")
    intercept[Checks.CheckFailed] { Checks.assertUniqueKey(bad, Seq("id")) }
  }

  test("Checks.overlap finds incremental-update key collisions (S10)") {
    val old = Seq((1, "a"), (2, "b")).toDF("id", "v")
    val incoming = Seq((2, "B"), (3, "C")).toDF("id", "v")
    assert(Checks.overlap(old, incoming, Seq("id")).count() === 1)
  }

  test("snapshotDiff classifies added/removed/changed/unchanged (q222)") {
    val old = Seq((1L, Option("a"), 10L), (2L, Option("b"), 20L),
      (3L, Option("c"), 30L), (4L, None, 40L), (5L, Option(""), 50L))
      .toDF("id", "v", "w")
    val nw = Seq((2L, Option("b"), 20L), (3L, Option("CHANGED"), 30L),
      (4L, Option(""), 40L), (5L, Option(""), 50L), (6L, Option("f"), 60L))
      .toDF("id", "v", "w")
    val got = Relational.snapshotDiff(old, nw, Seq("id"), Seq("v", "w"))
      .as[(Long, String)].collect().toMap
    assert(got === Map(
      1L -> "removed",   // only in old
      2L -> "unchanged",
      3L -> "changed",
      4L -> "changed",   // NULL -> "" must NOT read as unchanged
      5L -> "unchanged", // "" -> "" stays unchanged
      6L -> "added"))
  }

  test("changeFeed + applyChangeFeed reconstructs version B exactly (q224)") {
    val old = Seq((1L, Option("a"), 10L), (2L, Option("b"), 20L),
      (3L, Option("c"), 30L), (4L, None, 40L)).toDF("id", "v", "w")
    val nw = Seq((2L, Option("b"), 20L), (3L, Option("C2"), 30L),
      (4L, Option(""), 40L), (6L, Option("f"), 60L)).toDF("id", "v", "w")
    val feed = Relational.changeFeed(old, nw, Seq("id"), Seq("v", "w"))
      .as[(Long, String, Option[String], Option[Long])].collect().toSet
    assert(feed === Set(
      (1L, "removed", None, None), // removals carry NULL payloads
      (3L, "changed", Option("C2"), Option(30L)),
      (4L, "changed", Option(""), Option(40L)),
      (6L, "added", Option("f"), Option(60L))))
    val rebuilt = Relational.applyChangeFeed(old,
        Relational.changeFeed(old, nw, Seq("id"), Seq("v", "w")), Seq("id"))
      .as[(Long, Option[String], Long)].collect().toSet
    val want = nw.as[(Long, Option[String], Long)].collect().toSet
    assert(rebuilt === want)
  }
}
