package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row repetition statistics over a string array — the fused
  * native form of the sort + run-scan the Gopher repetition filters
  * (Rae et al. 2021, Table A1) need per n-gram order. One kernel call
  * replaces four aggregate/transform HOFs that would each run
  * interpreted and re-evaluate the (expensive, wordSpans-fed) child
  * per element — the q161 `word_spans` lesson applied ahead of time.
  */
object TextKernels {
  /** Sorts a copy of `arr` (binary UTF-8 order — Spark's `array_sort`
    * and DuckDB's default VARCHAR collation agree) and scans runs:
    *   - `top_count`/`top_chars`: occurrence count and CHARACTER
    *     length of the most frequent element; ties break to the
    *     binary-smallest element (the first max run in sorted order),
    *     mirroring SQL's `ORDER BY cnt DESC, elem ASC`.
    *   - `dup_elems`/`dup_chars`: total occurrences and
    *     count×length character mass of elements occurring ≥ 2 times
    *     (the type-count formulation of "characters in duplicated
    *     n-grams" — overlaps between distinct types are NOT
    *     de-overlapped, exactly as the oracle groups them).
    * Empty input -> all zeros. Null elements -> null result. */
  def runStats(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    if (n == 0) return InternalRow(0, 0, 0L, 0L)
    val ts = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      ts(i) = arr.getUTF8String(i)
      i += 1
    }
    java.util.Arrays.sort(ts, (a: UTF8String, b: UTF8String) => a.compareTo(b))
    var topCount = 0
    var topChars = 0
    var dupElems = 0L
    var dupChars = 0L
    var runStart = 0
    i = 1
    while (i <= n) {
      if (i == n || !ts(i).equals(ts(runStart))) {
        val run = i - runStart
        val chars = ts(runStart).numChars()
        if (run > topCount) { topCount = run; topChars = chars }
        if (run >= 2) {
          dupElems += run
          dupChars += run.toLong * chars
        }
        runStart = i
      }
      i += 1
    }
    InternalRow(topCount, topChars, dupElems, dupChars)
  }

  /** Shannon entropy of the non-whitespace character distribution —
    * the classic gibberish / low-diversity signal (CCNet-adjacent
    * pipelines gate on it next to the LM perplexity): per distinct
    * codepoint, contribution −p·ln(p) snapped to integer
    * 1e-6 micros, SUMMED AS EXACT INTEGERS so the total is
    * order-independent and cross-engine exact up to the snapped ln
    * (the q92 rounded-ln house pattern; the oracle mirrors
    * `floor(−(p·ln p)·1e6 + 0.5)` token-for-token). Whitespace =
    * regex `\s` ([ \t\n\f\r]), matching the oracle's RE2 strip.
    * Returns (n_chars, distinct_chars, entropy_micros); the all-
    * whitespace row returns zeros (callers filter n_chars > 0). */
  def charEntropy(s: UTF8String): InternalRow = {
    val str = s.toString
    val counts = scala.collection.mutable.HashMap.empty[Int, Int]
    var total = 0
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val ws = cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B ||
        cp == '\f' || cp == '\r'
      if (!ws) {
        counts.update(cp, counts.getOrElse(cp, 0) + 1)
        total += 1
      }
      i += Character.charCount(cp)
    }
    if (total == 0) return InternalRow(0, 0, 0L)
    var micros = 0L
    counts.valuesIterator.foreach { cnt =>
      val p = cnt.toDouble / total
      micros += math.floor(-(p * math.log(p)) * 1e6 + 0.5).toLong
    }
    InternalRow(total, counts.size, micros)
  }
}

/** char_entropy(string) ->
  * struct<n_chars:int, distinct_chars:int, entropy_micros:bigint>. */
case class CharEntropy(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("distinct_chars", IntegerType, nullable = false),
    StructField("entropy_micros", LongType, nullable = false)))
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "char_entropy"

  override def nullSafeEval(v: Any): Any =
    TextKernels.charEntropy(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.charEntropy($c)")

  override protected def withNewChildInternal(c: Expression): CharEntropy =
    copy(child = c)
}

/** run_stats(array<string>) ->
  * struct<top_count:int, top_chars:int, dup_elems:bigint, dup_chars:bigint>. */
case class RunStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("top_count", IntegerType, nullable = false),
    StructField("top_chars", IntegerType, nullable = false),
    StructField("dup_elems", LongType, nullable = false),
    StructField("dup_chars", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "run_stats"

  override def nullSafeEval(v: Any): Any =
    TextKernels.runStats(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.TextKernels.runStats($c);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildInternal(c: Expression): RunStats =
    copy(child = c)
}

object TextFunctions {
  def runStats(arr: Column): Column =
    GraftBridge.column(RunStats(GraftBridge.expression(arr)))

  def charEntropy(s: Column): Column =
    GraftBridge.column(CharEntropy(GraftBridge.expression(s)))
}
