package graft

import graft.io.{Csv2, Vc}
import graft.pipelines.{Fieldmap, IncrementalUpdate}
import graft.core.Checks
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** End-to-end E1 slice on FIXTURES.md-shaped data: semicolon-CSV
  * dictionary -> melt -> broadcast dictionary join -> checks ->
  * versioned write -> incremental batch append (S10). */
class FieldmapPipelineSpec extends SparkSuite {
  import spark.implicits._

  private lazy val dir = Files.createTempDirectory("fieldmap").toString

  private def coverScalesDf = {
    // metadata/cover_scales.csv shape: semicolon CSV, decimal commas
    Files.writeString(java.nio.file.Paths.get(s"$dir/cover_scales.csv"),
      "coverscale_name;class_id;cover_description;cover_mean\n" +
        "CoverVeglayers;1;<1%;0,5\nCoverVeglayers;2;1-5%;2,5\nCoverVeglayers;3;>5%;10,0\n")
    Csv2.read(spark, s"$dir/cover_scales.csv", StructType(Seq(
      StructField("coverscale_name", StringType), StructField("class_id", IntegerType),
      StructField("cover_description", StringType), StructField("cover_mean", DoubleType))))
  }

  test("§7.2 slice: melt -> cover-scale join -> checks -> vc write") {
    val vegpq = Seq(
      (101, 1, Some(1), Some(2), None: Option[Int]),
      (102, 1, Some(3), None, Some(1))
    ).toDF("plot_id", "segment_id", "herblayer", "shrublayer", "treelayer")

    val long = Fieldmap.meltVegLayers(vegpq,
        ids = Seq("plot_id", "segment_id"),
        layers = Seq("herblayer", "shrublayer", "treelayer"))
      .withColumn("coverscale_name", lit("CoverVeglayers"))
    assert(long.count() === 6) // NAs kept (gather default)

    val joined = Fieldmap.joinCoverScale(long, coverScalesDf)
    val covers = joined.where(col("class_id").isNotNull)
      .select("plot_id", "layer", "cover_mean")
      .as[(Int, String, Double)].collect().toSet
    assert(covers === Set(
      (101, "herblayer", 0.5), (101, "shrublayer", 2.5),
      (102, "herblayer", 10.0), (102, "treelayer", 0.5)))

    val checks = Fieldmap.checkFrames(joined)
    assert(checks("check_duplicate_cover").count() === 0)
    assert(checks("check_unmatched_scale").count() === 0)

    Vc.write(joined.where(col("class_id").isNotNull)
        .select("plot_id", "segment_id", "layer", "cover_description", "cover_mean"),
      s"$dir/cover_veglayers", sortKeys = Seq("plot_id", "layer"))
    val back = Vc.read(spark, s"$dir/cover_veglayers")
    assert(back.count() === 4)
  }

  test("resolveTypeObserved: square wins, circle fallback, mixed flagged") {
    val square = Seq((1, "2130"), (3, "4030")).toDF("plot_id", "type_observed_square")
    val circle = Seq((1, 1, "2190"), (2, 1, "6510"), (2, 2, "6230"))
      .toDF("plot_id", "segment_id", "type_observed_circle")
    val got = Fieldmap.resolveTypeObserved(square, circle)
    val types = got.select("plot_id", "type_observed").distinct()
      .as[(Int, String)].collect().toMap
    assert(types(1) === "2130") // square preferred
    assert(types(3) === "4030") // square-only plot survives the full join
    val mixed = got.where(col("is_mixed")).select("plot_id").distinct()
      .as[Int].collect().toSet
    assert(mixed === Set(2))
  }

  test("S10 incremental update: guarded append, overlap rejection, upsert") {
    val base = s"$dir/status"
    Vc.write(Seq((1, "2021-01-01", "done"), (2, "2021-01-02", "todo"))
        .toDF("plot_id", "date_assessment", "status"),
      base, sortKeys = Seq("plot_id"))

    // clean append
    IncrementalUpdate.applyToVc(spark, base,
      Seq((3, "2022-05-05", "done")).toDF("plot_id", "date_assessment", "status"),
      keys = Seq("plot_id"), sortKeys = Seq("plot_id"))
    assert(Vc.read(spark, base).count() === 3)

    // overlapping batch must be rejected
    intercept[Checks.CheckFailed] {
      IncrementalUpdate.applyToVc(spark, base,
        Seq((2, "2022-06-06", "redone")).toDF("plot_id", "date_assessment", "status"),
        keys = Seq("plot_id"), sortKeys = Seq("plot_id"))
    }

    // deliberate upsert (replace = true) rewrites the overlapping key
    IncrementalUpdate.applyToVc(spark, base,
      Seq((2, "2022-06-06", "redone")).toDF("plot_id", "date_assessment", "status"),
      keys = Seq("plot_id"), sortKeys = Seq("plot_id"), replace = true)
    val after = Vc.read(spark, base).where(col("plot_id") === 2)
      .select("status").as[String].collect()
    assert(after.toSeq === Seq("redone"))
  }
}
