package graft

import graft.io.Bucketed
import org.apache.spark.sql.functions._

class BucketedSpec extends SparkSuite {
  import spark.implicits._

  test("bucketed co-located join runs without any shuffle exchange") {
    val facts = (1 to 5000).map(i => (i.toLong % 400, i, i * 0.5)).toDF("k", "v", "x")
    val dims = (0L to 399L).map(k => (k, s"dim$k")).toDF("k", "name")
    Bucketed.write(facts, "b_facts", buckets = 8, keys = Seq("k"))
    Bucketed.write(dims, "b_dims", buckets = 8, keys = Seq("k"))

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = Bucketed.table(spark, "b_facts")
        .join(Bucketed.table(spark, "b_dims"), Seq("k"))
      assert(Bucketed.isShuffleFree(joined), joined.queryExecution.executedPlan.toString)
      assert(joined.count() === 5000)

      // contrast: the same join on unbucketed frames DOES shuffle
      val plain = facts.join(dims, Seq("k"))
      assert(!Bucketed.isShuffleFree(plain))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS b_facts")
      spark.sql("DROP TABLE IF EXISTS b_dims")
    }
  }

  test("bucketed groupBy on the bucket key avoids the aggregation shuffle") {
    val facts = (1 to 2000).map(i => (i.toLong % 50, i)).toDF("k", "v")
    Bucketed.write(facts, "b_agg", buckets = 4, keys = Seq("k"))
    try {
      val agg = Bucketed.table(spark, "b_agg").groupBy("k").agg(sum("v"))
      assert(Bucketed.isShuffleFree(agg), agg.queryExecution.executedPlan.toString)
      assert(agg.count() === 50)
    } finally spark.sql("DROP TABLE IF EXISTS b_agg")
  }

  test("partitioned write enables partition pruning on filtered reads") {
    val dir = java.nio.file.Files.createTempDirectory("part").toString + "/t"
    val df = (1 to 2000).map(i => (i, s"type${i % 5}", i * 1.0)).toDF("id", "event_type", "v")
    graft.io.Vc.writePartitioned(df, dir, Seq("event_type"))
    val filtered = spark.read.parquet(dir).where(col("event_type") === "type3")
    assert(graft.io.Vc.prunesPartitions(filtered),
      filtered.queryExecution.executedPlan.toString)
    assert(filtered.count() === 400)
    val unfiltered = spark.read.parquet(dir)
    assert(!graft.io.Vc.prunesPartitions(unfiltered))
  }

  test("writeSharded: disjoint key ranges across shards, sorted within each") {
    val dir = java.nio.file.Files.createTempDirectory("sharded").toString + "/t"
    // 37 is coprime to 1000 -> distinct keys in scrambled order
    val df = spark.range(0, 1000).select((col("id") * 37 % 1000).as("k"), col("id").as("v"))
    graft.io.Vc.writeSharded(df, dir, Seq("k"), shards = 4)
    val back = spark.read.parquet(dir)
    assert(back.count() === 1000)
    val files = back.inputFiles.sorted
    assert(files.length >= 2, s"expected multiple shards, got ${files.length}")
    // within-shard sortedness and cross-shard range disjointness
    val ranges = files.map { f =>
      val ks = spark.read.parquet(f).select("k").as[Long].collect()
      assert(ks.sameElements(ks.sorted), s"shard $f not sorted on k")
      (ks.min, ks.max)
    }
    ranges.sortBy(_._1).sliding(2).foreach {
      case Array((_, aMax), (bMin, _)) =>
        assert(bMin > aMax, s"shard ranges overlap: max $aMax vs next min $bMin")
      case _ => ()
    }
  }
}
