package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for the 100 TB deployment (SURVEY.md §4 /
  * builder brief "salting for skew, AQE for runtime re-plan").
  *
  * AQE's skew-join split handles sort-merge cases automatically; these
  * helpers cover the two patterns AQE cannot fix:
  *   - a hot-key *aggregation* (one reducer key receives a large share
  *     of all rows) -> two-phase salted aggregation;
  *   - a hot-key *join against a small-but-not-tiny side* -> salt the
  *     big side, replicate the small side per salt.
  *
  * Both are pure plan rewrites: results are identical to the unsalted
  * forms (verified by SkewSpec equivalence tests).
  */
object Skew {

  /** Two-phase salted aggregation: partial aggregate on (keys, salt),
    * then final aggregate on keys. `partials` must be an associative
    * decomposition — e.g. sum -> (sum, sum), count -> (count, sum),
    * min/max -> (min/max, min/max). Callers pass the partial and final
    * column builders explicitly to keep the algebra visible. */
  def saltedAggregate(df: DataFrame, keys: Seq[String], salts: Int,
                      partials: Seq[Column], finals: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(keys.map(col) :+ monotonically_increasing_id(): _*), lit(salts)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partials.head, partials.tail: _*)
    partial.groupBy(keys.map(col): _*).agg(finals.head, finals.tail: _*)
  }

  /** Convenience: salted exact count per key (the classic hot-key
    * probe: `groupBy(key).count()` with one key holding most rows). */
  def saltedCount(df: DataFrame, keys: Seq[String], salts: Int = 32): DataFrame =
    saltedAggregate(df, keys, salts,
      partials = Seq(count(lit(1)).as("__n")),
      finals = Seq(sum(col("__n")).as("n")))

  /** Salted equi-join: the big (skewed) side gets a random salt in
    * [0, salts); the small side is replicated once per salt value, so
    * every hot key spreads over `salts` reducers. Join type limited to
    * inner/left because replication would duplicate unmatched right
    * rows. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 salts: Int, joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left",
      s"saltedJoin supports inner/left, got $joinType")
    val saltedBig = big.withColumn("__salt",
      pmod(hash(keys.map(col) :+ monotonically_increasing_id(): _*), lit(salts)))
    val replicated = small.withColumn("__salt",
      explode(array((0 until salts).map(lit(_)): _*)))
    saltedBig.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }
}
