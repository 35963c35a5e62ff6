package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** Training-shard verification kernel: one fused pass over an int32-LE
  * token shard ([[graft.io.TokenShards]]'s layout) computing the three
  * stats that prove the byte layout — count, sum, and a
  * position-weighted polynomial checksum mod 1e9+7 (order-sensitive:
  * Σ (i+1)·(tid+1) detects any transposition a plain sum misses).
  * Native-expression treatment (the [[MediaKernels]] pattern): shard
  * payloads are decoded inside whole-stage codegen and never
  * materialize as an exploded token array — at real shard sizes
  * (~25M tokens / 100 MB) only the 3-field struct leaves the scan. */
object ShardKernels {

  /** The polynomial-checksum modulus; shared verbatim with the DuckDB
    * oracle (`% 1000000007`). */
  val PolyMod = 1000000007L

  def tokenShardStats(bytes: Array[Byte]): InternalRow = {
    val n = bytes.length / 4
    var sum = 0L
    var poly = 0L
    var i = 0
    while (i < n) {
      val v = (bytes(4 * i) & 0xFF) | ((bytes(4 * i + 1) & 0xFF) << 8) |
        ((bytes(4 * i + 2) & 0xFF) << 16) | ((bytes(4 * i + 3) & 0xFF) << 24)
      sum += v
      poly = (poly + (i.toLong + 1L) * (v.toLong + 1L)) % PolyMod
      i += 1
    }
    InternalRow(n.toLong, sum, poly)
  }
}

/** token_shard_stats(binary) -> struct<n_tokens bigint, token_sum
  * bigint, poly_mod bigint> over little-endian int32 tokens. Trailing
  * bytes past the last full int32 are ignored (a well-formed shard has
  * none; the spec pins the truncation behavior). */
case class TokenShardStatsExpr(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[GraftBridge.AbstractType] = Seq(BinaryType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("token_sum", LongType, nullable = false),
    StructField("poly_mod", LongType, nullable = false)))
  override def prettyName: String = "token_shard_stats"

  override def nullSafeEval(v: Any): Any =
    ShardKernels.tokenShardStats(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShardKernels.tokenShardStats($c)")

  override protected def withNewChildInternal(c: Expression): TokenShardStatsExpr =
    copy(child = c)
}

object ShardFunctions {
  def tokenShardStats(bin: Column): Column =
    GraftBridge.column(TokenShardStatsExpr(GraftBridge.expression(bin)))
}
