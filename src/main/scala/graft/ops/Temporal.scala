package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins over event data: backward as-of join and
  * point-in-interval (range) join. Spark has no built-in operator for
  * either — the naive SQL formulations (a join with an inequality
  * predicate) degenerate to per-key cross products or a broadcast
  * nested loop, so both are re-expressed here as compositions whose
  * only wide operation is a single equi-shuffle.
  */
object Temporal {

  /** Backward as-of join: every left row picks up the LATEST right row
    * with the same key and right time <= left time (ties on time broken
    * by the largest payload tuple — deterministic for any input),
    * optionally discarded again when the match is older than
    * `toleranceUs` microseconds.
    *
    * Plan shape: there is NO join in the plan. The two sides are
    * unioned, shuffled ONCE on the key, sorted per key on
    * (time, side-tag, payload), and a running
    * `last(payload, ignoreNulls)` window carries the most recent right
    * payload into each left row — the streaming-merge formulation of
    * as-of. A sort-merge join on `l.t >= r.t` would compare every left
    * row against every earlier right row of its key (quadratic in key
    * cardinality skew); this form is one exchange + one sort + a linear
    * scan regardless of how many right rows precede a left row, which
    * is the shape that survives 100 TB event tables. Right rows at the
    * same (key, time) sort BEFORE the left row (tag 0 < 1), so the
    * match is inclusive: right time == left time matches.
    *
    * Output: all left columns, plus `<timeCol>_right` (the matched
    * right row's time, null when nothing precedes the left row) and
    * `<p>_right` for every payload column.
    *
    * @param toleranceUs max age of a usable match, in microseconds;
    *        requires `timeCol` to be a timestamp column.
    */
  def asofJoinBackward(left: DataFrame, right: DataFrame,
                       keys: Seq[String], timeCol: String,
                       payload: Seq[String],
                       toleranceUs: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key column")
    val rvExpr = struct(col(timeCol).as("__rt") +: payload.map(col): _*)
    val rvType = right.select(rvExpr.as("__rv")).schema.head.dataType
    val l = left
      .withColumn("__tag", lit(1))
      .withColumn("__rv", lit(null).cast(rvType))
    val rBase = right.select(
      (keys :+ timeCol).map(col) ++ Seq(lit(0).as("__tag"), rvExpr.as("__rv")): _*)
    // align to the left schema: left-only columns become typed nulls
    val r = l.columns.foldLeft(rBase) { (acc, c) =>
      if (acc.columns.contains(c)) acc
      else acc.withColumn(c, lit(null).cast(l.schema(c).dataType))
    }.select(l.columns.map(col).toIndexedSeq: _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol).asc, col("__tag").asc, col("__rv").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withMatch = l.unionByName(r)
      .withColumn("__m", last(col("__rv"), ignoreNulls = true).over(w))
      .where(col("__tag") === 1)
    val tolerated = toleranceUs match {
      case Some(tol) => withMatch.withColumn("__m",
        when(unix_micros(col(timeCol).cast("timestamp")) -
          unix_micros(col("__m").getField("__rt").cast("timestamp")) > tol,
          lit(null).cast(rvType))
          .otherwise(col("__m")))
      case None => withMatch
    }
    val out = left.columns.map(col) ++
      (col("__m").getField("__rt").as(s"${timeCol}_right") +:
        payload.map(p => col("__m").getField(p).as(s"${p}_right")))
    tolerated.select(out.toIndexedSeq: _*)
  }

  /** Inner join of timestamped points to arbitrary — possibly
    * overlapping, un-keyed — `[start, end)` intervals. The
    * one-dimensional mirror of [[graft.rules.SpatialJoinRewrite]]'s
    * grid trick: every interval explodes into the O(length / cellUs)
    * grid cells it covers, every point computes its single cell
    * map-side, and the only shuffle is the equi-join on the cell id
    * (which Catalyst/AQE turn into a broadcast join whenever the
    * exploded interval side is small). A point's cell intersects each
    * covering interval exactly once, so no post-join dedup is needed —
    * the residual range predicate only FILTERS.
    *
    * `cellUs` should be on the order of the median interval length:
    * much smaller multiplies the interval side by length/cellUs; much
    * larger turns the cell join into a near-cross-join within a cell.
    * Intervals longer than `maxCellsPerInterval * cellUs` fail fast
    * (a single degenerate interval must not explode into millions of
    * rows unnoticed).
    *
    * Output: all point columns followed by all interval columns.
    * Times are microsecond longs; empty intervals (end <= start) match
    * nothing.
    */
  def intervalJoin(points: DataFrame, timeUsCol: String,
                   intervals: DataFrame, startUsCol: String, endUsCol: String,
                   cellUs: Long, maxCellsPerInterval: Int = 1 << 16): DataFrame = {
    require(cellUs > 0, "cellUs must be positive")
    val nCells =
      expr(s"($endUsCol - 1) div ${cellUs}L - $startUsCol div ${cellUs}L + 1")
    val iv = intervals
      .where(col(endUsCol) > col(startUsCol))
      .withColumn("__nc", when(nCells <= maxCellsPerInterval, nCells)
        .otherwise(raise_error(concat(
          lit(s"interval explodes into more than $maxCellsPerInterval cells" +
            s" of $cellUs us; raise cellUs or split the interval: start="),
          col(startUsCol), lit(" end="), col(endUsCol)))))
      // the guard column feeds the sequence bound so it cannot be
      // pruned out of the plan before it fires
      .withColumn("__cell", explode(expr(
        s"sequence($startUsCol div ${cellUs}L, $startUsCol div ${cellUs}L + __nc - 1)")))
      .drop("__nc")
    val pt = points.withColumn("__cell", expr(s"$timeUsCol div ${cellUs}L"))
    pt.join(iv, "__cell")
      .where(col(timeUsCol) >= col(startUsCol) && col(timeUsCol) < col(endUsCol))
      .select((points.columns ++ intervals.columns).map(col).toIndexedSeq: _*)
  }
}
