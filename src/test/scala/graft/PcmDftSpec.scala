package graft

import graft.functions.MediaKernels
import org.apache.spark.sql.functions._

/** Spectral PCM feature (q220): the single-bin DFT kernel, its
  * micro-scaled twiddle tables, window/partial-window semantics, and
  * agreement with a naive double-precision DFT within the snap. */
class PcmDftSpec extends SparkSuite {
  import spark.implicits._

  private def pcmBytes(samples: Seq[Int]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(samples.size * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    samples.foreach(s => bb.putShort(s.toShort))
    bb.array()
  }

  test("twiddle tables: exact landmarks and symmetry") {
    val c = MediaKernels.DftTables.cosMicros(256, 4)
    val s = MediaKernels.DftTables.sinMicros(256, 4)
    assert(c.length === 256 && s.length === 256)
    // k=4 over N=256: period 64 samples
    assert(c(0) === 1000000L && s(0) === 0L)
    assert(c(32) === -1000000L && s(32) === 0L) // half period
    assert(c(16) === 0L && s(16) === 1000000L)  // quarter period
    assert(c(48) === 0L && s(48) === -1000000L)
    // full-period repetition
    (0 until 64).foreach { j => assert(c(j) === c(j + 64) && s(j) === s(j + 64)) }
  }

  test("pure tone at the bin frequency projects onto it; DC does not") {
    // x[n] = round(1000 * cos(2*pi*4*n/256)): all energy in bin 4
    val tone = (0 until 256).map(n =>
      math.round(1000.0 * StrictMath.cos(2 * StrictMath.PI * 4 * n / 256)).toInt)
    val onBin = MediaKernels.pcmDftWindows(pcmBytes(tone), 256, 4)
    val re = onBin.getStruct(0, 3).getLong(1)
    val im = onBin.getStruct(0, 3).getLong(2)
    // Σ cos² = N/2 -> re ≈ 1000 * 128 * 1e6, im ≈ 0
    assert(math.abs(re - 128000000000L) < 300000000L, s"re=$re")
    assert(math.abs(im) < 300000000L, s"im=$im")
    // constant (DC) signal is orthogonal to bin 4
    val dc = MediaKernels.pcmDftWindows(pcmBytes(Seq.fill(256)(1000)), 256, 4)
    assert(math.abs(dc.getStruct(0, 3).getLong(1)) < 1000000L)
    assert(math.abs(dc.getStruct(0, 3).getLong(2)) < 1000000L)
  }

  test("kernel agrees with a naive double DFT within snap tolerance") {
    val rnd = new scala.util.Random(7)
    val samples = Seq.fill(300)(rnd.nextInt(65536) - 32768)
    val out = MediaKernels.pcmDftWindows(pcmBytes(samples), 256, 4)
    assert(out.numElements() === 2) // one full + one partial window
    (0 until 2).foreach { w =>
      val st = out.getStruct(w, 3)
      assert(st.getInt(0) === w)
      val win = samples.slice(w * 256, (w + 1) * 256)
      var re = 0.0; var im = 0.0
      win.zipWithIndex.foreach { case (s, j) =>
        val a = 2 * StrictMath.PI * 4 * j / 256
        re += s * StrictMath.cos(a); im -= s * StrictMath.sin(a)
      }
      // table snap error <= 0.5e-6 per coefficient * |s| per term
      val tol = win.map(s => math.abs(s) * 0.5 + 1.0).sum
      assert(math.abs(st.getLong(1) - re * 1e6) <= tol, s"win $w re")
      assert(math.abs(st.getLong(2) - im * 1e6) <= tol, s"win $w im")
    }
  }

  test("expression path: codegen result matches the kernel; empty payloads vanish") {
    val df = Seq((1L, pcmBytes((0 until 300).map(n => (n * 37) % 2048 - 1024))),
                 (2L, Array.emptyByteArray),
                 (3L, Array[Byte](42))) // under 2 bytes -> zero samples
      .toDF("id", "media")
    val rows = df.select(col("id"),
        explode(graft.functions.MediaFunctions.pcmDftBin(col("media"), 256, 4))
          .as("w"))
      .select(col("id"), col("w.win"), col("w.re_u"), col("w.im_u"))
      .as[(Long, Int, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(rows.map(_._1).toSet === Set(1L)) // ids 2 and 3 vanish
    val direct = MediaKernels.pcmDftWindows(
      pcmBytes((0 until 300).map(n => (n * 37) % 2048 - 1024)), 256, 4)
    assert(rows.length === direct.numElements())
    rows.zipWithIndex.foreach { case ((_, w, re, im), i) =>
      val st = direct.getStruct(i, 3)
      assert(w === st.getInt(0) && re === st.getLong(1) && im === st.getLong(2))
    }
  }
}
