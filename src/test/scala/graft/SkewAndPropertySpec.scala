package graft

import graft.ops.{Aggs, Relational, Skew}
import org.apache.spark.sql.functions._
class SkewAndPropertySpec extends SparkSuite {
  import spark.implicits._

  test("saltedCount equals plain groupBy count on a hot-key distribution") {
    // 90% of rows share one key — the classic reducer hot spot
    val rows = (1 to 20000).map(i => if (i % 10 != 0) ("hot", i) else (s"k${i % 7}", i))
    val df = rows.toDF("k", "v").repartition(16)
    val plain = df.groupBy("k").count().as[(String, Long)].collect().toMap
    val salted = Skew.saltedCount(df, Seq("k")).as[(String, Long)].collect().toMap
    assert(salted === plain)
  }

  test("saltedAggregate sum equals plain sum") {
    val rows = (1 to 5000).map(i => (if (i % 3 == 0) "a" else "b", i.toLong))
    val df = rows.toDF("k", "v").repartition(8)
    val plain = df.groupBy("k").agg(sum("v").as("s")).as[(String, Long)].collect().toMap
    val salted = Skew.saltedAggregate(df, Seq("k"), salts = 16,
        partials = Seq(sum(col("v")).as("__s")),
        finals = Seq(sum(col("__s")).as("s")))
      .as[(String, Long)].collect().toMap
    assert(salted === plain)
  }

  test("saltedJoin equals plain join, inner and left") {
    val big = (1 to 8000).map(i => (if (i % 5 != 0) 1 else i % 50, i)).toDF("k", "v")
    val small = (0 to 30).map(k => (k, s"dim$k")).toDF("k", "name")
    for (jt <- Seq("inner", "left")) {
      val plain = big.join(small, Seq("k"), jt)
        .select("k", "v", "name").as[(Int, Int, Option[String])].collect().sorted
      val salted = Skew.saltedJoin(big, small, Seq("k"), salts = 8, joinType = jt)
        .select("k", "v", "name").as[(Int, Int, Option[String])].collect().sorted
      assert(salted.toSeq === plain.toSeq, s"join type $jt")
    }
  }

  // ---- property-based checks (SURVEY.md §5 plan) ----

  test("property: latestPerKey picks the true max under any input order") {
    val rng = new scala.util.Random(11)
    for (_ <- 1 to 10) {
      val pairs = List.fill(60)((rng.nextInt(5) + 1, rng.nextInt(1000) + 1))
      val df = rng.shuffle(pairs).toDF("k", "v").repartition(7)
      val got = Relational.latestPerKey(df, Seq("k"), Seq(col("v").desc, col("k").desc))
        .as[(Int, Int)].collect().toMap
      val want = pairs.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      assert(got === want)
    }
  }

  test("property: complementProduct stays in [0,1] and dominates any single cover") {
    val rng = new scala.util.Random(23)
    for (_ <- 1 to 10) {
      val covers = List.fill(rng.nextInt(20) + 1)(rng.nextDouble())
      val df = covers.map(("g", _)).toDF("k", "c")
      val u = df.groupBy("k").agg(Aggs.complementProduct(col("c")).as("u"))
        .as[(String, Double)].collect().head._2
      assert(u >= -1e-12 && u <= 1.0 + 1e-12)
      assert(u >= covers.max - 1e-9) // union >= any single cover
    }
  }

  test("property: unionByNameTolerant column set is the union of inputs") {
    val a = Seq((1, "x")).toDF("id", "a")
    val b = Seq((2, 3.5)).toDF("id", "b")
    val c = Seq(4).toDF("id")
    val u = Relational.unionByNameTolerant(Seq(a, b, c))
    assert(u.columns.toSet === Set("id", "a", "b"))
    assert(u.count() === 3)
  }
}
