package graft

import graft.core.FactorDomain
import graft.io.Vc
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The partitioned processed-table twin (SURVEY.md §4 adoption note:
  * "partition processed tables by source/mon_cycle"): same sidecar
  * contract as the single-file `Vc.write` (column classes, factor
  * dictionaries, descriptor hash, data digest), hive partition layout,
  * and — the point at 100 TB — a reader filter on the partition column
  * must prune the FILE LISTING, not just evaluate per row. The pruning
  * test asserts the scan's `numFiles` metric, i.e. the actual
  * InMemoryFileIndex selection, with AQE disabled so the physical scan
  * node is directly inspectable.
  */
class VcPartitionedSpec extends SparkSuite {
  import spark.implicits._

  private def sample = Seq(
    (1L, 2010, "oak", Some(1.5)), (2L, 2010, "beech", Some(2.5)),
    (3L, 2013, "oak", Some(0.5)), (4L, 2016, "pine", Some(3.25)),
    (5L, 2016, "oak", Option.empty[Double]))
    .toDF("plot_id", "mon_cycle", "species", "cover")

  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("vc-part").toString + "/tbl"
    Vc.writePartitioned(sample, d, partitionCols = Seq("mon_cycle"),
      sortKeys = Seq("plot_id"),
      factors = Seq(FactorDomain("species", Seq("oak", "beech", "pine"))))
    d
  }

  test("sidecar carries the write contract (classes, partitioning, factor levels)") {
    val yml = java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "_vc.yml"))
    assert(yml.contains("partitioning:\n  - mon_cycle"))
    assert(yml.contains("plot_id:\n  class: integer\n  bits: 64"))
    assert(yml.contains("class: factor"))
    assert(yml.contains("data_hash:"))
  }

  test("verified read restores sidecar order/classes and the data digest") {
    val back = Vc.readPartitioned(spark, dir)
    assert(back.columns.toSeq ===
      Seq("plot_id", "mon_cycle", "species", "cover"))
    assert(back.schema("mon_cycle").dataType === IntegerType)
    assert(back.schema("plot_id").dataType === LongType)
    assert(back.count() === 5)
    assert(back.where(col("cover").isNull).count() === 1)
  }

  test("a tampered partition fails the digest loudly") {
    val d2 = java.nio.file.Files.createTempDirectory("vc-part2").toString + "/tbl"
    Vc.writePartitioned(sample, d2, partitionCols = Seq("mon_cycle"))
    // drop a whole partition directory behind the sidecar's back
    val gone = new java.io.File(s"$d2/mon_cycle=2013")
    gone.listFiles().foreach(_.delete()); gone.delete()
    val e = intercept[IllegalStateException](Vc.readPartitioned(spark, d2))
    assert(e.getMessage.contains("does not match"))
    // unverified read still opens (the documented 100 TB hot path);
    // the deleted 2013 partition held one of the five rows
    assert(Vc.readPartitioned(spark, d2, verify = false).count() === 4)
  }

  test("string partition values survive the round trip (no type inference)") {
    // directory-name inference would turn source=0123 into int 123;
    // the sidecar schema imposed on the read must keep the raw string
    val d3 = java.nio.file.Files.createTempDirectory("vc-part3").toString + "/tbl"
    val df = Seq((1L, "0123", 1.5), (2L, "1e3", 2.5), (3L, "plain", 0.5))
      .toDF("plot_id", "source", "cover")
    Vc.writePartitioned(df, d3, partitionCols = Seq("source"))
    val back = Vc.readPartitioned(spark, d3) // verify=true: digest must agree
    assert(back.schema("source").dataType === StringType)
    assert(back.orderBy("plot_id").select("source").collect().map(_.getString(0))
      .toSeq === Seq("0123", "1e3", "plain"))
  }

  test("a mon_cycle filter prunes the file listing, not just rows") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      def scanFiles(df: org.apache.spark.sql.DataFrame): Long = {
        val plan = df.queryExecution.executedPlan
        plan.execute().count() // run THIS plan object so its metrics populate
        val scan = plan.collectLeaves().collectFirst {
          case s: FileSourceScanExec => s
        }.getOrElse(fail("no FileSourceScanExec leaf"))
        scan.metrics("numFiles").value
      }
      val back = Vc.readPartitioned(spark, dir, verify = false)
      val all = scanFiles(back)
      val pruned = scanFiles(back.where(col("mon_cycle") === 2010))
      assert(all >= 3, s"expected >=3 partition files, saw $all")
      assert(pruned < all, s"filter did not prune: $pruned of $all files")
      assert(Vc.prunesPartitions(back.where(col("mon_cycle") === 2010)))
      assert(!Vc.prunesPartitions(back))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("a dimension filter dynamically prunes partitions through the join") {
    // the 100 TB shape: fact partitioned by mon_cycle joined to a tiny
    // cycles dimension carrying the selective filter — the partition
    // values to keep are only known at RUNTIME from the dim's rows, so
    // static pruning can't help; Spark's dynamic partition pruning must
    // inject the dim-derived subquery into the scan's PartitionFilters
    // and the file listing must shrink to the matching partition
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // KB-sized test partitions fail the size-based benefit estimate
    // that gates DPP on real tables; force the decision through the
    // fallback ratio so the test exercises the MECHANISM, not the
    // planner's cost model
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    spark.conf.set(
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", "1000000")
    try {
      // the dim must be a real source (a LocalRelation constant-folds
      // the filter away and DPP finds no selective predicate to push)
      val dimDir = java.nio.file.Files.createTempDirectory("vc-dim").toString
      Seq((2010, "baseline"), (2013, "repeat"), (2016, "repeat"))
        .toDF("cycle", "phase").write.mode("overwrite").parquet(dimDir)
      val dim = spark.read.parquet(dimDir)
      val fact = Vc.readPartitioned(spark, dir, verify = false)
      val joined = fact.join(broadcast(dim.where(col("phase") === "baseline")),
        fact("mon_cycle") === dim("cycle"))
      val plan = joined.queryExecution.executedPlan
      assert(plan.toString.contains("dynamicpruning"),
        s"no DPP subquery in the scan's partition filters:\n$plan")
      plan.execute().count()
      val scan = plan.collectLeaves().collectFirst {
        case s: FileSourceScanExec => s
      }.getOrElse(fail("no FileSourceScanExec leaf"))
      // the runtime listing must shrink to exactly the files of the one
      // matching partition (2010 may hold several files — one per
      // write task — so compare against the directory, not a constant)
      val files2010 = new java.io.File(s"$dir/mon_cycle=2010")
        .listFiles().count(_.getName.endsWith(".parquet"))
      val total = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(_.toString.endsWith(".parquet")).count()
      assert(scan.metrics("numFiles").value === files2010.toLong,
        s"DPP did not shrink the listing to the 2010 partition: " +
          s"${scan.metrics("numFiles").value} of $total files")
      assert(files2010 < total, "fixture degenerate: only one partition")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prev)
      spark.conf.unset("spark.sql.optimizer.dynamicPartitionPruning.useStats")
      spark.conf.unset(
        "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio")
    }
  }
}
