package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hash kernels for large-scale dedup: SimHash and MinHash signatures,
  * as native Catalyst expressions (fused per-row loops over the token
  * array, xxHash64 on the raw UTF-8 bytes — zero string copies, zero
  * boxing). Both are embarrassingly parallel scans: at 100 TB the
  * signature pass is map-only and shuffles only (bucket_key, doc_id)
  * pairs, never the text.
  */
object HashKernels {
  /** SimHash64 of a token multiset: per token, xxhash64 of its UTF-8
    * bytes; bit j of the result is the sign of sum(+1/-1) votes. */
  def simhash64(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val s = tokens.getUTF8String(t)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      t += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  /** MinHash signature: sig(s) = min over tokens of xxhash64(token, seed=s). */
  def minhash(tokens: ArrayData, k: Int): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val str = tokens.getUTF8String(t)
        var s = 0
        while (s < k) {
          val h = XXH64.hashUnsafeBytes(str.getBaseObject, str.getBaseOffset, str.numBytes, s.toLong)
          if (h < sig(s)) sig(s) = h
          s += 1
        }
      }
      t += 1
    }
    sig
  }

  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}

/** simhash64(array<string>) -> bigint. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(v: Any): Any =
    HashKernels.simhash64(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.simhash64($c)")

  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}

/** minhash_signature(array<string>, k) -> array<bigint> (k signatures). */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression {
  require(k > 0 && k <= 512, "minhash k must be in (0, 512]")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(HashKernels.minhash(v.asInstanceOf[ArrayData], k))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.HashKernels.minhash($c, $k))")

  override protected def withNewChildInternal(c: Expression): MinHashSignature = copy(child = c)
}

/** Fraction of positions where two bigint signature arrays agree — the
  * MinHash Jaccard estimator. Fused native loop (the `zip_with` +
  * `aggregate` HOF formulation evaluates interpreted per element, which
  * dominates candidate-pair filtering cost). */
case class SignatureAgreement(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "signature_agreement"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (l, r) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    // signatures built with different k are incomparable -> NULL,
    // never a silent prefix-based estimate
    if (l.numElements() != r.numElements()) null
    else SignatureAgreement.agreement(l, r)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      if ($a.numElements() != $b.numElements()) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.SignatureAgreement.agreement($a, $b);
      }""")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object SignatureAgreement {
  /** Fraction of equal components. Signatures built with different k are
    * incomparable — the expression wrapper returns NULL for them before
    * reaching here; direct callers get the same contract loudly instead
    * of a silent prefix-based estimate. */
  def agreement(a: ArrayData, b: ArrayData): Double = {
    require(a.numElements() == b.numElements(),
      s"incomparable signatures: k=${a.numElements()} vs k=${b.numElements()}")
    val n = a.numElements()
    if (n == 0) return 0.0
    var eq = 0
    var i = 0
    while (i < n) { if (a.getLong(i) == b.getLong(i)) eq += 1; i += 1 }
    eq.toDouble / n
  }
}

object HashFunctions {
  def simhash64(tokens: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(tokens)))

  def minhashSignature(tokens: Column, k: Int): Column =
    GraftBridge.column(MinHashSignature(GraftBridge.expression(tokens), k))

  def signatureAgreement(a: Column, b: Column): Column =
    GraftBridge.column(SignatureAgreement(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
