package graft.ops

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Aggregation kernels — SURVEY.md §2.4 (A5-A10).
  *
  * Money-typed sums use the exact-cents idiom: per-row scale to an
  * integral BIGINT, sum exactly, unscale once at the end. This makes
  * large distributed sums bit-reproducible (no float accumulation-order
  * drift between runs, partitionings, or engines) — required for the
  * reference's golden-hash output contract (SURVEY.md §5.2) and cheap:
  * integer sums codegen tighter than doubles.
  */
object Aggs {

  /** Exact fixed-point sum: round(x * 10^scale) summed as BIGINT. */
  def sumScaled(x: Column, scale: Int): Column =
    sum(round(x * pow(lit(10.0), lit(scale))).cast("long"))

  /** Exact money sum returned as a double (single final division —
    * deterministic given the exact integer numerator). */
  def sumExact(x: Column, scale: Int, as: String): Column =
    (sumScaled(x, scale) / pow(lit(10.0), lit(scale))).as(as)

  /** A7 complement-product cover union `1 - prod(1 - cover/100)`
    * (`export_from_vbidwh.Rmd:88-92`): probabilistic union of layer
    * covers. Needs a true product aggregate — Spark has none, and the
    * `exp(sum(log))` rewrite breaks on zeros — so this is a typed
    * `Aggregator` (partial-aggregating, map-side combinable). */
  val productAgg: Aggregator[java.lang.Double, Double, Double] =
    new Aggregator[java.lang.Double, Double, Double] {
      def zero: Double = 1.0
      def reduce(b: Double, a: java.lang.Double): Double =
        if (a == null) b else b * a.doubleValue()
      def merge(b1: Double, b2: Double): Double = b1 * b2
      def finish(r: Double): Double = r
      def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  /** Column form of the product aggregate — codegen'd built-ins only:
    * exp(sum(log|x|)) with explicit zero and sign handling (the naive
    * exp-sum-log rewrite breaks on zeros and negatives). Whole-stage
    * codegen + map-side partial aggregation, so it is preferred over
    * the UDAF in DataFrame plans; [[productAgg]] stays for the typed
    * Dataset path. Empty / all-null groups yield 1.0 (the fold zero),
    * matching the Aggregator. */
  def product(x: Column): Column = {
    val zeros = count(when(x === 0.0, 1))
    val negs = count(when(x < 0.0, 1))
    val mag = exp(sum(when(x =!= 0.0, log(abs(x)))))
    when(zeros > 0, lit(0.0))
      .otherwise(coalesce(when(negs % 2 === 1, -mag).otherwise(mag), lit(1.0)))
  }

  /** A7: union of fractional covers in [0,1]. */
  def complementProduct(coverFraction: Column): Column =
    lit(1.0) - product(lit(1.0) - coverFraction)

  /** A7, bit-reproducible form: canonical ascending-order left fold.
    * The [[product]] Aggregator multiplies in partition/merge order, so
    * its last double bit depends on the physical split — fine
    * numerically, but not byte-stable across engines or cluster
    * layouts. This form sorts the complements and folds sequentially,
    * giving the same IEEE sequence everywhere (and matching a SQL
    * `product(1 - x ORDER BY 1 - x)`). Use when groups are bounded
    * (collect_list materializes the group); the Aggregator otherwise. */
  def complementProductSorted(coverFraction: Column): Column =
    lit(1.0) - aggregate(
      sort_array(collect_list(lit(1.0) - coverFraction)),
      lit(1.0), (acc, v) => acc * v)

  /** A10 deterministic group-wise string concat
    * (`query_fieldmap.Rmd:1571`): distinct values, sorted, joined —
    * `str_c(sort(unique(x)), collapse = sep)`. */
  def stringAggSorted(x: Column, sep: String): Column =
    array_join(sort_array(collect_set(x)), sep)

  /** A5 boolean any/all over a group. */
  def boolAny(cond: Column): Column = max(cond.cast("int")) === 1
  def boolAll(cond: Column): Column = min(cond.cast("int")) === 1

  /** A9 assert-single-value collapse `summarise(v = unique(v))`
    * (`query_inboveg.Rmd:121-123`): first value + a guard column the
    * caller can assert on (`Checks.assertNone(_, col(as+"_ok") === false)`). */
  def singleValue(x: Column, as: String): Seq[Column] =
    Seq(min(x).as(as), (count_distinct(x) <= 1).as(s"${as}_ok"))
}
