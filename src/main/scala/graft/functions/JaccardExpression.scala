package graft.functions

import java.util.Arrays
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

/** Set Jaccard similarity of two `array<string>` token/shingle columns:
  * |A ∩ B| / |A ∪ B| over the DISTINCT elements of each side.
  *
  * Native fused kernel: xxhash64 each element, sort, dedupe, merge-count
  * — O((m+n) log(m+n)) with two primitive arrays and zero string
  * comparisons after hashing. Replaces `array_intersect` +
  * `array_union`, which build catalyst-map structures per row and
  * dominate verify cost on candidate-pair sets. Equality is by 64-bit
  * content hash (collision probability ~n^2 * 2^-64 — negligible
  * against the reference semantics of exact string equality).
  */
case class JaccardSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "jaccard_similarity"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaccardSimilarity.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaccardSimilarity.jaccard($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object JaccardSimilarity {

  private def hashedDistinct(arr: ArrayData): Array[Long] = {
    val n = arr.numElements()
    val hs = new Array[Long](n)
    var i = 0
    var m = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        hs(m) = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        m += 1
      }
      i += 1
    }
    val trimmed = if (m == n) hs else Arrays.copyOf(hs, m)
    Arrays.sort(trimmed)
    // in-place dedupe of the sorted hashes
    var w = 0
    var r = 0
    while (r < m) {
      if (w == 0 || trimmed(r) != trimmed(w - 1)) { trimmed(w) = trimmed(r); w += 1 }
      r += 1
    }
    if (w == m) trimmed else Arrays.copyOf(trimmed, w)
  }

  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val x = hashedDistinct(a)
    val y = hashedDistinct(b)
    if (x.length == 0 && y.length == 0) return 0.0
    var i = 0
    var j = 0
    var inter = 0
    while (i < x.length && j < y.length) {
      if (x(i) == y(j)) { inter += 1; i += 1; j += 1 }
      else if (x(i) < y(j)) i += 1
      else j += 1
    }
    val union = x.length + y.length - inter
    inter.toDouble / union
  }
}

/** Intersection SIZE of two `array<long>` columns (e.g. fingerprint
  * sets) — sort-merge count without materializing the intersection
  * array that `size(array_intersect(...))` builds per row; the winnow
  * canonical verify's hot predicate. NULL-safe: null elements are
  * skipped, null arrays propagate NULL. NOTE this INTENTIONALLY
  * diverges from `size(array_intersect(l, r))`, which counts a null
  * present on both sides as one common element — fingerprint arrays
  * (this kernel's contract) cannot contain nulls, so reuse against
  * null-bearing arrays must account for the difference. */
case class LongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "long_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Integer.valueOf(LongIntersectCount.count(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.LongIntersectCount.count($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object LongIntersectCount {

  private def sortedDistinct(arr: ArrayData): Array[Long] = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    var m = 0
    while (i < n) {
      if (!arr.isNullAt(i)) { out(m) = arr.getLong(i); m += 1 }
      i += 1
    }
    val trimmed = if (m == n) out else Arrays.copyOf(out, m)
    Arrays.sort(trimmed)
    var w = 0
    var r = 0
    while (r < m) {
      if (w == 0 || trimmed(r) != trimmed(w - 1)) { trimmed(w) = trimmed(r); w += 1 }
      r += 1
    }
    if (w == m) trimmed else Arrays.copyOf(trimmed, w)
  }

  def count(a: ArrayData, b: ArrayData): Int = {
    val x = sortedDistinct(a)
    val y = sortedDistinct(b)
    var i = 0
    var j = 0
    var inter = 0
    while (i < x.length && j < y.length) {
      if (x(i) == y(j)) { inter += 1; i += 1; j += 1 }
      else if (x(i) < y(j)) i += 1
      else j += 1
    }
    inter
  }
}

object JaccardFunctions {
  def jaccardSim(a: Column, b: Column): Column =
    GraftBridge.column(JaccardSimilarity(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  def longIntersectCount(a: Column, b: Column): Column =
    GraftBridge.column(LongIntersectCount(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
