package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Cosine similarity over two `array<float>` embedding columns.
  *
  * Native Catalyst expression with whole-stage codegen: one fused loop
  * accumulating dot product and both norms in double precision,
  * left-to-right (deterministic — required for oracle-exact similarity
  * scores). This replaces the `zip_with + aggregate` higher-order-
  * function formulation, which Catalyst evaluates interpreted per
  * element (lambda variables block codegen) — at 100 TB the fused loop
  * is the difference between a scan-bound and a CPU-bound ANN pass.
  *
  * Semantics: NULL if either side is NULL, lengths differ, or a norm is
  * zero. Float elements are widened to double before multiplication.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null // match zip_with NULL propagation
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val denom = ctx.freshName("denom")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $xi = (double) $a.getFloat($i);
         |    final double $yi = (double) $b.getFloat($i);
         |    $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |  }
         |  if (!${ev.isNull}) {
         |    final double $denom = Math.sqrt($na) * Math.sqrt($nb);
         |    if ($denom == 0.0) { ${ev.isNull} = true; }
         |    else { ${ev.value} = $dot / $denom; }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)
}

/** Exact integer dot product of two `array<long>` columns — the
  * SemDeDup family's hot inner loop (2^-20-snapped dots and squared
  * norms). Replaces the `aggregate(zip_with(...))` higher-order
  * formulation, which Catalyst evaluates interpreted per element with
  * lambda-closure allocation — as a JOIN CONDITION that interpreter
  * ran once per candidate pair (millions of times per cluster join);
  * the fused codegen loop makes the pair verification CPU-bound on
  * the multiply itself. Exact BIGINT sums are order-independent, so
  * the oracle contract is untouched. NULL on length mismatch. */
case class LongDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "long_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null // match zip_with NULL propagation
      dot += x.getLong(i) * y.getLong(i)
      i += 1
    }
    java.lang.Long.valueOf(dot)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $dot = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $dot += $a.getLong($i) * $b.getLong($i);
         |  }
         |  ${ev.value} = $dot;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): LongDot =
    copy(left = l, right = r)
}

/** Sequential-fold dot product of two `array<double>` columns — the
  * training loops' per-row z = x·w. Bit-identical to the
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` formulation it replaces
  * (same left-to-right IEEE op sequence: acc + (a_i·b_i)), which is
  * what the DuckDB oracles' in-order `list_sum` mirrors — the fused
  * codegen loop only removes the per-element lambda interpretation.
  * NULL on length mismatch. */
case class DoubleDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "double_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null // match zip_with NULL propagation
      dot += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(dot)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $dot += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $dot;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DoubleDot =
    copy(left = l, right = r)
}

/** Elementwise difference of two `array<double>` vectors — the
  * residual step of IVF-PQ (vector minus its coarse centroid, Jégou et
  * al. 2011 §V). Bit-identical to the `zip_with(a, b, (x,y) => x-y)`
  * formulation (plain IEEE subtract per element), but codegen'd: the
  * residual runs once per corpus row in the IVF-PQ encode path, so the
  * interpreted higher-order form would put a lambda in the hot loop.
  * NULL on length mismatch or any null element. */
case class VecSub(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "vec_sub"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      out(i) = x.getDouble(i) - y.getDouble(i)
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val arr = ctx.freshName("arr")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  final double[] $arr = new double[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $arr[$i] = $a.getDouble($i) - $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} =
         |      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($arr);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecSub =
    copy(left = l, right = r)
}

/** Squared-L2 distance in 1e-6 fixed point between an `array<double>`
  * vector and a (typically literal) centroid — the Lloyd assignment's
  * hot loop, evaluated k times per row. Bit-identical to the
  * `floor(aggregate(zip_with(v, c, (x,cc) => (x-cc)²), 0.0, _+_)·1e6
  * + 0.5)` formulation it replaces (same left fold, same final floor),
  * so the q147-family oracles are untouched. NULL on length mismatch. */
case class SquaredL2Micros(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "squared_l2_micros"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var d = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null // match zip_with NULL propagation
      val t = x.getDouble(i) - y.getDouble(i)
      d += t * t
      i += 1
    }
    java.lang.Long.valueOf(math.floor(d * 1e6 + 0.5).toLong)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $t = $a.getDouble($i) - $b.getDouble($i);
         |    $d += $t * $t;
         |  }
         |  ${ev.value} = (long) Math.floor($d * 1.0E6 + 0.5);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SquaredL2Micros =
    copy(left = l, right = r)
}

object Sq8Kernels {
  import org.apache.spark.sql.catalyst.InternalRow

  /** Fused SQ8 encode → reconstruct → error pass (see
    * [[graft.similarity.Ann.sq8Stats]] for the quantizer contract):
    * per dimension code = floor((x−mn)/Δ + 0.5) clamped to [0,255]
    * with Δ = (mx−mn)/255, CODED 0 when mn == mx (the same branch
    * predicate as the oracle — NOT a test of the derived Δ for zero,
    * which would diverge on a subnormal-tiny range whose Δ underflows);
    * reconstruction mn + code·Δ; the error is the same left-to-right
    * IEEE fold + final floor as [[SquaredL2Micros]]. Loud-fails on a
    * width mismatch with the trained stats (a ragged corpus is a bug,
    * not a row to null out). */
  def stats(v: ArrayData, mins: Array[Double], maxs: Array[Double]): InternalRow = {
    val n = v.numElements()
    require(n == mins.length,
      s"sq8: vector width $n != trained width ${mins.length}")
    var codeSum = 0L
    var err = 0.0
    var i = 0
    while (i < n) {
      val x = v.getDouble(i)
      val mn = mins(i); val mx = maxs(i)
      val sc = (mx - mn) / 255.0
      val code =
        if (mn == mx) 0L
        else {
          val c = math.floor((x - mn) / sc + 0.5).toLong
          if (c < 0L) 0L else if (c > 255L) 255L else c
        }
      codeSum += code
      val t = x - (mn + code.toDouble * sc)
      err += t * t
      i += 1
    }
    InternalRow(codeSum, math.floor(err * 1e6 + 0.5).toLong)
  }
}

/** sq8_stats(v) -> struct<code_sum bigint, err_micros bigint>: the
  * whole per-vector SQ8 pass in ONE codegen'd loop — the `transform`
  * lambda formulation ran interpreted AND re-evaluated per element
  * (the q161 lesson); the per-dim min/max train state ships once as
  * reference objects. */
case class Sq8StatsExpr(child: Expression, mins: Seq[Double], maxs: Seq[Double])
    extends UnaryExpression {
  require(mins.length == maxs.length,
    s"ragged sq8 stats: ${mins.length} mins vs ${maxs.length} maxs")
  override def dataType: DataType = StructType(Seq(
    StructField("code_sum", LongType, nullable = false),
    StructField("err_micros", LongType, nullable = false)))
  override def prettyName: String = "sq8_stats"

  private lazy val minsArr = mins.toArray
  private lazy val maxsArr = maxs.toArray

  override def nullSafeEval(v: Any): Any =
    Sq8Kernels.stats(v.asInstanceOf[ArrayData], minsArr, maxsArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("sq8Mins", minsArr, "double[]")
    val xRef = ctx.addReferenceObj("sq8Maxs", maxsArr, "double[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Sq8Kernels.stats($c, $mRef, $xRef)")
  }

  override protected def withNewChildInternal(c: Expression): Sq8StatsExpr =
    copy(child = c)
}

/** Random-hyperplane LSH signature of an `array<float>` vector: bit p is
  * the sign of the dot product with a deterministic Rademacher (+-1)
  * hyperplane derived from xxhash64 — no stored plane matrix, so the
  * signature is reproducible on any cluster with zero broadcast state.
  * Cosine-similar vectors collide with probability 1 - theta/pi per bit
  * (Charikar 2002 SimHash for angles).
  */
case class HyperplaneLsh(child: Expression, bits: Int)
    extends UnaryExpression {
  require(bits > 0 && bits <= 64, "bits must be in (0, 64]")
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_lsh"

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    java.lang.Long.valueOf(HyperplaneLsh.signature(x, bits))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HyperplaneLsh.signature($c, $bits)")

  override protected def withNewChildInternal(c: Expression): HyperplaneLsh = copy(child = c)
}

object HyperplaneLsh {
  import org.apache.spark.sql.catalyst.expressions.XXH64

  /** +-1 pseudo-random plane component for (plane p, dim i). */
  @inline private def rademacher(p: Int, i: Int): Double =
    if ((XXH64.hashLong(p.toLong * 1000003L + i, 7L) & 1L) == 1L) 1.0 else -1.0

  // the plane depends only on (p, i) — cache it per (bits, dim) per
  // JVM so the hot loop is a plain multiply-accumulate instead of
  // bits*dim xxhash64 calls PER ROW (the dominant CPU cost of the LSH
  // bucketing pass at scale); determinism is unchanged, the cache is
  // a handful of dim-sized arrays, and no broadcast state is needed
  private val planes =
    new java.util.concurrent.ConcurrentHashMap[Long, Array[Double]]()

  private def plane(bits: Int, n: Int): Array[Double] =
    planes.computeIfAbsent((bits.toLong << 32) | n.toLong, _ => {
      val out = new Array[Double](bits * n)
      var p = 0
      while (p < bits) {
        var i = 0
        while (i < n) { out(p * n + i) = rademacher(p, i); i += 1 }
        p += 1
      }
      out
    })

  def signature(x: ArrayData, bits: Int): Long = {
    val n = x.numElements()
    val pl = plane(bits, n)
    var out = 0L
    var p = 0
    while (p < bits) {
      var dot = 0.0
      var i = 0
      while (i < n) { dot += x.getFloat(i).toDouble * pl(p * n + i); i += 1 }
      if (dot > 0.0) out |= (1L << p)
      p += 1
    }
    out
  }
}

object VectorFunctions {
  /** Column API: cosine similarity of two array<float> columns. */
  def cosineSim(a: Column, b: Column): Column =
    GraftBridge.column(
      CosineSimilarity(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Column API: `bits`-bit hyperplane LSH signature of an array<float>. */
  def hyperplaneLsh(v: Column, bits: Int): Column =
    GraftBridge.column(HyperplaneLsh(GraftBridge.expression(v), bits))

  /** Column API: exact integer dot product of two array<long> columns. */
  def longDot(a: Column, b: Column): Column =
    GraftBridge.column(LongDot(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Column API: sequential-fold dot of two array<double> columns. */
  def doubleDot(a: Column, b: Column): Column =
    GraftBridge.column(DoubleDot(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Column API: squared-L2 distance in 1e-6 fixed point. */
  def squaredL2Micros(a: Column, b: Column): Column =
    GraftBridge.column(SquaredL2Micros(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Column API: elementwise difference of two array<double> columns. */
  def vecSub(a: Column, b: Column): Column =
    GraftBridge.column(VecSub(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Column API: fused SQ8 code-sum + reconstruction-error pass. */
  def sq8Stats(v: Column, mins: Seq[Double], maxs: Seq[Double]): Column =
    GraftBridge.column(Sq8StatsExpr(GraftBridge.expression(v), mins, maxs))
}
