package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Executable assertion framework — ports the reference's inline invariant
  * probes (SURVEY.md §5.1): duplicate-key detection
  * (`query_fieldmap.Rmd:1370-1374`), missing-plot probes (`:1387-1388`),
  * overlap checks on incremental update
  * (`query_fieldmap_update_fieldwork2022.Rmd:948-953`).
  *
  * All checks are single-pass distributed aggregations (no collect of the
  * full table); only the tiny violation sample is brought to the driver.
  */
object Checks {

  final case class CheckFailed(msg: String) extends RuntimeException(msg)

  /** Rows whose key occurs more than once (W1 probe). */
  def duplicateKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .where(col("n") > 1)

  /** Fail if `keys` is not a unique key of `df`. */
  def assertUniqueKey(df: DataFrame, keys: Seq[String]): Unit = {
    val dupes = duplicateKeys(df, keys).limit(5).collect()
    if (dupes.nonEmpty)
      throw CheckFailed(
        s"duplicate keys on (${keys.mkString(",")}): sample ${dupes.mkString("; ")}")
  }

  /** Fail if any row of `df` matches `predicate` (generic invariant probe). */
  def assertNone(df: DataFrame, predicate: org.apache.spark.sql.Column, what: String): Unit = {
    val bad = df.where(predicate).limit(5).collect()
    if (bad.nonEmpty)
      throw CheckFailed(s"$what: sample ${bad.mkString("; ")}")
  }

  /** Count removed rows between two pipeline stages (per-rule "removed
    * records" reporting, `check_observed_habitat_type.Rmd:186-295`).
    * Two independent actions — fine when the frames have unrelated
    * lineage; when `after` is a FILTER of `before`, use the
    * single-pass [[reportRemoved(before:DataFrame,keep:Column,rule:String)*]]
    * overload instead, which never recomputes the shared input. */
  def reportRemoved(before: DataFrame, after: DataFrame, rule: String): (String, Long) =
    rule -> (before.count() - after.count())

  /** One-pass removal count for a filter rule: rows of `before` NOT
    * matching `keep`. One aggregation over one scan — the shared
    * lineage is never executed twice. */
  def reportRemoved(before: DataFrame, keep: org.apache.spark.sql.Column,
                    rule: String): (String, Long) = {
    val r = before.agg(
      count(lit(1)).as("n"),
      count(when(keep, lit(1))).as("kept")).head()
    rule -> (r.getLong(0) - r.getLong(1))
  }

  /** Per-stage removal report for a SEQUENTIAL filter pipeline (each
    * rule applies to the previous rule's survivors — exactly the
    * reference's removed-records table,
    * `check_observed_habitat_type.Rmd:186-295`) computed in ONE pass:
    * stage i's removals = count(survivors of rules 1..i-1) -
    * count(survivors of rules 1..i), and every cumulative count is an
    * aggregate over the same single scan. At 100 TB this replaces
    * len(rules)+1 full executions of the input lineage with one. */
  def removalReport(df: DataFrame,
                    rules: Seq[(String, org.apache.spark.sql.Column)]): Seq[(String, Long)] = {
    require(rules.nonEmpty, "no rules")
    val cumulative = rules.scanLeft(lit(true)) { case (acc, (_, keep)) => acc && keep }
    val counts = df.agg(
      count(when(cumulative.head, lit(1))).as("c0"),
      cumulative.tail.zipWithIndex.map { case (c, i) =>
        count(when(c, lit(1))).as(s"c${i + 1}")
      }: _*).head()
    rules.indices.map { i =>
      rules(i)._1 -> (counts.getLong(i) - counts.getLong(i + 1))
    }
  }

  /** Overlap between an existing table and an incoming batch on `keys` —
    * the incremental-update precondition (S10). Empty means safe to append. */
  def overlap(existing: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame =
    incoming.join(existing.select(keys.map(col): _*).distinct(), keys, "left_semi")
}

/** Factor-level registry (SURVEY.md §1.2): the reference's factor
  * columns become strings plus a declared level dictionary, validated
  * as a CHECK constraint instead of an encoded type. Level lists ride
  * in table metadata (git2rdata keeps them in the .yml sidecar).
  */
final case class FactorDomain(name: String, levels: Seq[String],
                              ordered: Boolean = false) {
  /** Rows whose value is neither NULL nor a declared level. */
  def violations(df: DataFrame, colName: String): DataFrame =
    df.where(col(colName).isNotNull && !col(colName).isin(levels: _*))

  def assertValid(df: DataFrame, colName: String): Unit =
    Checks.assertNone(df, col(colName).isNotNull && !col(colName).isin(levels: _*),
      s"values outside factor domain '$name' in column $colName")
}

object FactorDomain {
  /** Domains observed in the reference's .yml schemas (e.g.
    * type_observed, `processed/inboveg_mhq_aq/HT31xx_header.yml`). */
  val TypeObserved: FactorDomain = FactorDomain("type_observed",
    Seq("gh", "2190", "2190_a", "3110", "3130_aom", "3130_na", "3140", "3150", "3160"))
  val TargetHabitat: FactorDomain = FactorDomain("targethabitat",
    Seq("ja", "nee", "onbekend"))
}
