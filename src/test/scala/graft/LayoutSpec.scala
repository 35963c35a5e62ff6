package graft

import graft.ops.Layout
import graft.ops.Layout.ZDim
import org.apache.spark.sql.functions._

/** Z-order layout: Morton-code correctness and the data-skipping
  * property the layout exists for (per-file envelopes stay tight on
  * EVERY participating dimension, not just the sort leader). */
class LayoutSpec extends SparkSuite {
  import spark.implicits._

  test("zvalue interleaves bits: known Morton codes on a 4x4 grid") {
    val dims = Seq(ZDim(col("x"), 0, 3), ZDim(col("y"), 0, 3))
    val got = Seq((0, 0), (1, 0), (0, 1), (1, 2), (3, 3))
      .toDF("x", "y")
      .select(col("x"), col("y"), Layout.zvalue(dims, bits = 2).as("z"))
      .as[(Int, Int, Long)].collect().map { case (x, y, z) => (x, y) -> z }.toMap
    // bit b of dim i lands at b*2+i: z(x,y) = interleave(x low, y high)
    assert(got((0, 0)) === 0L)
    assert(got((1, 0)) === 1L) // x bit0 -> pos 0
    assert(got((0, 1)) === 2L) // y bit0 -> pos 1
    assert(got((1, 2)) === 9L) // x bit0 -> pos 0, y bit1 -> pos 3
    assert(got((3, 3)) === 15L)
  }

  test("out-of-domain values clamp into the declared bounds") {
    val dims = Seq(ZDim(col("x"), 0, 3), ZDim(col("y"), 0, 3))
    val z = Seq((-5, 99)).toDF("x", "y")
      .select(Layout.zvalue(dims, bits = 2)).as[Long].collect().head
    assert(z === Seq((0, 3)).toDF("x", "y")
      .select(Layout.zvalue(dims, bits = 2)).as[Long].collect().head)
  }

  test("z-ordered files keep tight envelopes on both dimensions; a linear sort does not") {
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    val grid = spark.range(0, 1024).select(
      (col("id") % 32).cast("int").as("x"),
      (col("id") / 32).cast("int").as("y"))
    val dims = Seq(ZDim(col("x"), 0, 31), ZDim(col("y"), 0, 31))

    Layout.writeZOrdered(grid, s"$dir/z", dims, files = 16, bits = 5)
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.parquet(s"$dir/linear")

    def avgRange(path: String, c: String): Double = {
      val env = Layout.fileEnvelopes(spark.read.parquet(path), Seq("x", "y"))
      env.agg(avg(col(s"${c}_max") - col(s"${c}_min"))).as[Double].collect().head
    }
    // sort leader is tight under both layouts
    assert(avgRange(s"$dir/linear", "x") < 8.0)
    // ...but the linear layout's files each span (almost) all of y,
    // while z-order keeps y compact too — that is the skipping win
    val linearY = avgRange(s"$dir/linear", "y")
    val zY = avgRange(s"$dir/z", "y")
    val zX = avgRange(s"$dir/z", "x")
    assert(linearY > 24.0, s"linear layout unexpectedly tight on y: $linearY")
    assert(zY < linearY / 2, s"z-order y envelope not tight: $zY vs linear $linearY")
    assert(zX < 16.0, s"z-order x envelope not tight: $zX")
  }

  test("resolution hierarchy: a coarse z-grid is an exact prefix of a fine one") {
    // soundness of range pruning on z: the 4-bit cell is the 16-bit
    // cell shifted, so z16 >> 2*(16-4) must equal z4 for EVERY point —
    // a z-range covering a coarse cell covers exactly its refinements
    val pts = spark.range(0, 2000).select(
      (rand(7) * 100.0 - 50.0).as("x"), (rand(13) * 9.0).as("y"))
    val dims = Seq(ZDim(col("x"), -50, 50), ZDim(col("y"), 0, 9))
    val bad = pts.select(
        Layout.zvalue(dims, bits = 16).as("z16"),
        Layout.zvalue(dims, bits = 4).as("z4"))
      .where(shiftright(col("z16"), 2 * 12) =!= col("z4"))
      .count()
    assert(bad === 0L)
  }

  test("three dimensions: corner cells land on the exact interleaved codes") {
    val dims = Seq(ZDim(col("x"), 0, 1), ZDim(col("y"), 0, 1), ZDim(col("z"), 0, 1))
    val got = Seq((0.0, 0.0, 0.0), (1.0, 0.0, 0.0), (1.0, 1.0, 1.0))
      .toDF("x", "y", "z")
      .select(Layout.zvalue(dims, bits = 4)).as[Long].collect().toSeq
    // hi corner on dim 0 only: cell 15 (1111) at positions 0,3,6,9
    assert(got === Seq(0L, 585L, (1L << 12) - 1))
  }

  test("compact rewrites many small files into the byte-sized target count") {
    val dir = java.nio.file.Files.createTempDirectory("compact").toString
    // 20 single-row files — the incremental-ingestion steady state
    spark.range(0, 20).select(col("id"), (col("id") * 7 % 5).as("k"))
      .repartition(20).write.parquet(s"$dir/in")
    val inFiles = spark.read.parquet(s"$dir/in").inputFiles.length
    assert(inFiles >= 10, s"fixture not fragmented enough: $inFiles files")

    val conf = spark.sparkContext.hadoopConfiguration
    val total = spark.read.parquet(s"$dir/in").inputFiles.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      p.getFileSystem(conf).getFileStatus(p).getLen
    }.sum
    // target half the table -> exactly 2 output files
    val n = Layout.compact(spark, s"$dir/in", s"$dir/out",
      targetBytes = (total + 1) / 2, sortKeys = Seq("id"))
    assert(n === 2)
    val out = spark.read.parquet(s"$dir/out")
    assert(out.inputFiles.length === 2)
    assert(out.select("id").as[Long].collect().sorted.toSeq === (0L until 20L))
  }
}
