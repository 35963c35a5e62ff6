package graft.tools

import graft.io.{Csv2, Vc}
import graft.pipelines.{Fieldmap, IncrementalUpdate}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Runnable walkthrough of the E1 minimal slice (SURVEY.md §7.2):
  * semicolon-CSV dictionary -> melt -> broadcast cover-scale join ->
  * versioned write -> S10 guarded incremental append.
  *
  *   sbt "runMain graft.tools.FieldmapDemo /tmp/fm_demo"
  */
object FieldmapDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/fm_demo")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/cover_scales.csv"),
      "coverscale_name;class_id;cover_description;cover_mean\n" +
        "CoverVeglayers;1;<1%;0,5\nCoverVeglayers;2;1-5%;2,5\n")
    val dict = Csv2.read(spark, s"$dir/cover_scales.csv", StructType(Seq(
      StructField("coverscale_name", StringType), StructField("class_id", IntegerType),
      StructField("cover_description", StringType), StructField("cover_mean", DoubleType))))

    val vegpq = Seq((101, 1, Some(1), Some(2)), (102, 1, Some(2), Option.empty[Int]))
      .toDF("plot_id", "segment_id", "herblayer", "shrublayer")
    val long = Fieldmap.meltVegLayers(vegpq, Seq("plot_id", "segment_id"),
        Seq("herblayer", "shrublayer"))
      .withColumn("coverscale_name", lit("CoverVeglayers"))
    val joined = Fieldmap.joinCoverScale(long, dict)

    Vc.write(joined.where(col("class_id").isNotNull), s"$dir/covers",
      Seq("plot_id", "layer"))
    println("=== covers.tsv ===")
    print(java.nio.file.Files.readString(java.nio.file.Paths.get(s"$dir/covers.tsv")))

    IncrementalUpdate.applyToVc(spark, s"$dir/covers",
      Seq((103, 1, "herblayer", 1, "CoverVeglayers", "<1%", 0.5))
        .toDF("plot_id", "segment_id", "layer", "class_id",
          "coverscale_name", "cover_description", "cover_mean"),
      keys = Seq("plot_id", "layer"), sortKeys = Seq("plot_id", "layer"))
    println(s"=== after S10 append: ${Vc.read(spark, s"$dir/covers").count()} rows ===")

    try {
      IncrementalUpdate.applyToVc(spark, s"$dir/covers",
        Seq((103, 1, "herblayer", 2, "CoverVeglayers", "1-5%", 2.5))
          .toDF("plot_id", "segment_id", "layer", "class_id",
            "coverscale_name", "cover_description", "cover_mean"),
        keys = Seq("plot_id", "layer"), sortKeys = Seq("plot_id", "layer"))
      println("=== ERROR: overlap was NOT rejected ===")
    } catch {
      case e: Throwable => println(s"=== overlap rejected as expected: ${e.getMessage.take(90)}")
    }
    spark.stop()
  }
}
