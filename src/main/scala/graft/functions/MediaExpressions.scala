package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Audio kernels: REAL 16-bit PCM decoding as a native Catalyst
  * expression — unlike compressed image/audio codecs, raw PCM is pure
  * integer arithmetic, so the multimodal layer's audio path needs no
  * stub. The per-row loop is fused into whole-stage codegen via a
  * static kernel call (the [[HashKernels]] pattern); at 100 TB the
  * feature pass is map-only and only the small per-window feature
  * structs ever reach a shuffle, never the waveform bytes. */
object MediaKernels {

  /** Decode little-endian signed 16-bit PCM and compute per-window
    * features: RMS in 1e-6 units (floor(x·1e6 + 0.5) of the exact
    * integer-sum RMS), zero crossings (sign changes between
    * consecutive samples, zero counted as non-negative), and the peak
    * |sample|. A trailing odd byte is ignored; the final partial
    * window is emitted (its RMS divides by its own length). */
  def pcmWindows(bytes: Array[Byte], window: Int): ArrayData = {
    val n = bytes.length / 2
    val nWin = (n + window - 1) / window
    val out = new Array[Any](nWin)
    var w = 0
    while (w < nWin) {
      val start = w * window
      val end = math.min(start + window, n)
      var sumSq = 0L
      var zc = 0
      var peak = 0
      var prevNonNeg = true
      var i = start
      while (i < end) {
        val lo = bytes(2 * i) & 0xFF
        val hi = bytes(2 * i + 1).toInt // sign-extends
        val s = (hi << 8) | lo
        sumSq += s.toLong * s
        val a = math.abs(s)
        if (a > peak) peak = a
        val nonNeg = s >= 0
        if (i > start && nonNeg != prevNonNeg) zc += 1
        prevNonNeg = nonNeg
        i += 1
      }
      val cnt = end - start
      val rmsMicros =
        math.floor(math.sqrt(sumSq.toDouble / cnt) * 1e6 + 0.5).toLong
      out(w) = InternalRow(w, rmsMicros, zc, peak)
      w += 1
    }
    new GenericArrayData(out)
  }
}

/** pcm_windows(binary, window) -> array<struct<win int, rms_micros
  * bigint, zero_crossings int, peak int>> over little-endian int16
  * PCM. Empty array for payloads under 2 bytes. */
case class PcmWindowFeatures(child: Expression, window: Int)
    extends UnaryExpression {
  require(window >= 1, s"need window >= 1; got $window")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("win", IntegerType, nullable = false),
    StructField("rms_micros", LongType, nullable = false),
    StructField("zero_crossings", IntegerType, nullable = false),
    StructField("peak", IntegerType, nullable = false))), containsNull = false)
  override def prettyName: String = "pcm_windows"

  override def nullSafeEval(v: Any): Any =
    MediaKernels.pcmWindows(v.asInstanceOf[Array[Byte]], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MediaKernels.pcmWindows($c, $window)")

  override protected def withNewChildInternal(c: Expression): PcmWindowFeatures =
    copy(child = c)
}

object MediaFunctions {
  def pcmWindowFeatures(bin: Column, window: Int): Column =
    GraftBridge.column(PcmWindowFeatures(GraftBridge.expression(bin), window))
}
