package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier-calibration evaluation over corpus-scale score columns.
  *
  * Motivation (the quality-filter bias audit): document-quality
  * classifiers are known to score text from different languages,
  * dialects and sources systematically differently (Gururangan 2022,
  * "Whose Language Counts as High Quality?"), so a curation pipeline
  * audits each cheap filter score against reference labels per slice
  * before trusting its threshold corpus-wide. The standard
  * threshold-free measure is ROC-AUC, which for a binary label equals
  * the normalized Mann–Whitney U statistic — a pure RANK computation,
  * no probability calibration needed.
  *
  * Exactness: ties are handled with midranks (the textbook U with
  * tie correction). All arithmetic stays in integers by carrying
  * DOUBLED ranks: for a distinct score value with `n` rows of which
  * `p` are positive, sitting at running CDF `cum`, every row's
  * doubled midrank is `2·cum − n + 1`, so the positives' doubled
  * rank-sum is Σ p·(2·cum − n + 1). Then U·2 = R2_pos − 2·n_pos·
  * (n_pos+1)/2 = R2_pos − n_pos·(n_pos+1) and AUC = U / (n_pos·n_neg)
  * is emitted as `auc_micros` via one integer division — both engines
  * evaluate the identical integer expressions, no floats anywhere.
  *
  * Scale shape (the q199 histogram-CDF recipe): the corpus collapses
  * to the per-(group, score) HISTOGRAM in one map-side-combined
  * groupBy — the only corpus-scale shuffle, bounded by score
  * cardinality, not row count. The CDF window and the final fold run
  * on that histogram-sized table. A naive percent_rank/row_number
  * ranking would sort every group's full partition instead — the
  * skew trap for a dominant group at 100 TB.
  */
object Eval {

  /** Per-group ROC-AUC of integer `scoreCol` against boolean
    * `labelCol`: (group, n_pos, n_neg, u2, auc_micros). `u2` is the
    * doubled Mann–Whitney U (integer-exact under ties); `auc_micros`
    * = ⌊U·10⁶ / (n_pos·n_neg)⌋, NULL for one-class groups. */
  def rankAuc(df: DataFrame, groupCol: String, scoreCol: String,
              labelCol: String): DataFrame = {
    val hist = df
      .groupBy(col(groupCol), col(scoreCol).cast("long").as("__s"))
      .agg(count(lit(1)).as("__n"),
        sum(when(col(labelCol), 1L).otherwise(0L)).as("__p"))
    val cdf = hist.withColumn("__cum",
      sum("__n").over(Window.partitionBy(col(groupCol)).orderBy(col("__s"))))
    cdf.groupBy(col(groupCol))
      .agg(
        sum(col("__p") * (lit(2L) * col("__cum") - col("__n") + lit(1L)))
          .as("r2_pos"),
        sum("__p").as("n_pos"),
        sum(col("__n") - col("__p")).as("n_neg"))
      .withColumn("u2", col("r2_pos") - col("n_pos") * (col("n_pos") + lit(1L)))
      .withColumn("auc_micros",
        when(col("n_pos") > 0L && col("n_neg") > 0L,
          expr("u2 * 1000000L div (2L * n_pos * n_neg)")))
      .select(col(groupCol), col("n_pos"), col("n_neg"), col("u2"),
        col("auc_micros"))
  }

  /** Equal-width confidence bin over [0, 1e6]; the top edge folds
    * into the last bin so a perfect-confidence row is never its own
    * bin. Column arithmetic on the long-cast conf (not an expr()
    * splice of the raw column name): identifier-safe, and immune to
    * int overflow of conf * nBins. floor(double) here is exact: the
    * numerator is ≤ 1e6·nBins ≪ 2^53 and the quotient sits ≥ 1e-6
    * from any integer while its ulp is ~1e-13. Shared by
    * [[calibrationReport]] and [[ingestAudit]] so the two bin
    * definitions cannot drift. */
  private def confBin(conf: Column, nBins: Int): Column =
    least(lit(nBins - 1L),
      floor(conf * lit(nBins.toLong) / lit(1000000.0)).cast("long"))

  /** Per-group calibration audit — the Expected Calibration Error
    * report (Guo et al. 2017, "On Calibration of Modern Neural
    * Networks", §2): a score used as a probability is CALIBRATED when
    * among rows scored ~p, a fraction ~p is actually positive. The
    * audit bins `confCol` (an integer micro-probability, 0..10⁶) into
    * `nBins` equal-width confidence bins and compares each bin's
    * observed positive rate (`acc_micros`) with its mean claimed
    * confidence (`avg_conf_micros`); ECE is the row-weighted mean
    * absolute gap. The companion to [[rankAuc]]: AUC measures whether
    * the score RANKS positives above negatives, ECE whether its
    * VALUES mean what they claim — a selection threshold is only as
    * meaningful as this gap is small.
    *
    * Determinism: the bin id, both per-bin rates, the gap and the ECE
    * are ALL integer arithmetic (floor divisions of exact counts/
    * sums), so the report is cross-engine exact with no float
    * tolerance anywhere — the q200/q201 audit-family recipe.
    *
    * Scale shape (the q199/q201 histogram recipe): ONE corpus scan
    * collapsing to the per-(group, bin) aggregate — the only
    * corpus-scale shuffle carries ≤ |groups|·nBins rows — then the
    * ECE windows run on bin rows. Never a per-row sort or quantile.
    *
    * Returns one row per non-empty (group, bin): (group, bin, n,
    * n_pos, avg_conf_micros, acc_micros, gap_micros, ece_micros) with
    * the group's ECE repeated per bin (q200's report convention). */
  def calibrationReport(df: DataFrame, groupCol: String, confCol: String,
                        labelCol: String, nBins: Int): DataFrame = {
    require(nBins >= 1, s"need a positive bin count, got $nBins")
    val conf = col(confCol).cast("long")
    val bin = confBin(conf, nBins)
    val w = Window.partitionBy(col(groupCol))
    df.groupBy(col(groupCol), bin.as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(labelCol), 1L).otherwise(0L)).as("n_pos"),
        sum(conf).as("conf_sum"))
      .withColumn("acc_micros", expr("n_pos * 1000000L div n"))
      .withColumn("avg_conf_micros", expr("conf_sum div n"))
      .withColumn("gap_micros", abs(col("acc_micros") - col("avg_conf_micros")))
      .withColumn("__wgap", sum(col("n") * col("gap_micros")).over(w))
      .withColumn("__wn", sum(col("n")).over(w))
      .withColumn("ece_micros", expr("__wgap div __wn"))
      .select(col(groupCol), col("bin"), col("n"), col("n_pos"),
        col("avg_conf_micros"), col("acc_micros"), col("gap_micros"),
        col("ece_micros"))
  }

  /** The composed nightly ingest gate — PSI + rank-AUC + ECE off ONE
    * corpus scan into one per-group report row: the three audits a
    * shard-admission pipeline runs before trusting a quality filter
    * ([[graft.ops.Drift.psiReport]]'s drift check of the score
    * distribution between the `isRef` and current windows,
    * [[rankAuc]]'s ranking power, [[calibrationReport]]'s value
    * calibration), fused so the corpus is read and hashed once
    * instead of three times.
    *
    * All three audits share the q199/q201/q204 histogram-CDF recipe,
    * so the fusion is exact, not approximate: the corpus collapses to
    * the per-(group, conf) histogram in one map-side-combined groupBy
    * — the ONLY corpus-scale shuffle — carrying (n, n_pos, n_ref) per
    * distinct score. One further group-partitioned exchange puts the
    * histogram rows on their group, and from there the CDF window
    * (AUC), the per-bin windows (ECE + PSI categories — a
    * HashPartitioning on `group` already satisfies the (group, bin)
    * clustering, so these are sorts, not shuffles) and the final
    * per-group fold all run without another exchange: 1 scan,
    * 2 shuffles total, pinned in ScanCountSpec.
    *
    * Math is each audit's verbatim: AUC the doubled-midrank integer
    * recipe of [[rankAuc]]; ECE the integer floor-division chain of
    * [[calibrationReport]] (bins via [[confBin]], the shared
    * expression); PSI the fixed-order transcendental term of
    * `Drift.psiFromCounts` applied at bin grain — categories are the
    * ECE's confidence bins, so "drift" means the score DISTRIBUTION
    * moved between windows. One-sided bins get a NULL term and are
    * excluded (the q200 contract). Returns one row per group:
    * (group, n, n_pos, n_neg, u2, auc_micros, ece_micros,
    * psi_total_micros, drifted). */
  def ingestAudit(df: DataFrame, groupCol: String, confCol: String,
                  labelCol: String, isRef: Column, nBins: Int,
                  psiThresholdMicros: Long): DataFrame = {
    require(nBins >= 1, s"need a positive bin count, got $nBins")
    val conf = col(confCol).cast("long")
    val hist = df
      .groupBy(col(groupCol), conf.as("__s"))
      .agg(count(lit(1)).as("__n"),
        sum(when(col(labelCol), 1L).otherwise(0L)).as("__p"),
        sum(when(isRef, 1L).otherwise(0L)).as("__r"))
    val wCdf = Window.partitionBy(col(groupCol)).orderBy(col("__s"))
    val wBin = Window.partitionBy(col(groupCol), col("__b"))
    val wBinOrd = wBin.orderBy(col("__s"))
    val wG = Window.partitionBy(col(groupCol))
    val rows = hist
      .withColumn("__cum", sum("__n").over(wCdf))
      .withColumn("__b", confBin(col("__s"), nBins))
      .withColumn("__bn", sum("__n").over(wBin))
      .withColumn("__bp", sum("__p").over(wBin))
      .withColumn("__bconf", sum(col("__s") * col("__n")).over(wBin))
      .withColumn("__bref", sum("__r").over(wBin))
      .withColumn("__bcur", sum(col("__n") - col("__r")).over(wBin))
      // one representative histogram row per bin carries the bin-level
      // ECE/PSI contributions into the per-group fold
      .withColumn("__rn", row_number().over(wBinOrd))
      .withColumn("__nref", sum("__r").over(wG))
      .withColumn("__ncur", sum(col("__n") - col("__r")).over(wG))
    // per-bin calibration gap — calibrationReport's integer chain
    val gap = abs(expr("__bp * 1000000L div __bn") - expr("__bconf div __bn"))
    // per-bin PSI term — Drift.psiFromCounts' fixed-order double
    // expression snapped to micros, at bin grain. Known residual risk
    // (round-18 advice): the snap assumes JVM Math.log and DuckDB ln
    // agree to the last bit on these inputs — neither is guaranteed
    // correctly rounded, so a term landing within an ulp of a
    // 0.5-micro boundary could one day flip the q211 gate. Accepted
    // under the q92/q200 ln-recipe convention (fixed inputs, fixed op
    // order ⟹ deterministic per build; q208/q211 verified green at
    // sf0.01 AND sf0.1); if it ever flakes, widen the gate tolerance
    // rather than reordering the arithmetic.
    val pRef = col("__bref").cast("double") / col("__nref").cast("double")
    val pCur = col("__bcur").cast("double") / col("__ncur").cast("double")
    val ratio = (col("__bcur").cast("double") * col("__nref").cast("double")) /
      (col("__bref").cast("double") * col("__ncur").cast("double"))
    val term = floor((pCur - pRef) * log(ratio) * lit(1e6) + lit(0.5))
      .cast("long")
    val binRep = col("__rn") === 1
    rows.groupBy(col(groupCol))
      .agg(
        sum("__n").as("n"),
        sum("__p").as("n_pos"),
        sum(col("__p") * (lit(2L) * col("__cum") - col("__n") + lit(1L)))
          .as("__r2"),
        sum(when(binRep, col("__bn") * gap)).as("__gapw"),
        sum(when(binRep && col("__bref") > 0 && col("__bcur") > 0, term))
          .as("__psi"))
      .withColumn("n_neg", col("n") - col("n_pos"))
      .withColumn("u2", col("__r2") - col("n_pos") * (col("n_pos") + lit(1L)))
      .withColumn("auc_micros",
        when(col("n_pos") > 0L && col("n_neg") > 0L,
          expr("u2 * 1000000L div (2L * n_pos * n_neg)")))
      .withColumn("ece_micros", expr("__gapw div n"))
      .withColumn("psi_total_micros", coalesce(col("__psi"), lit(0L)))
      .withColumn("drifted", col("psi_total_micros") >= psiThresholdMicros)
      .select(col(groupCol), col("n"), col("n_pos"), col("n_neg"),
        col("u2"), col("auc_micros"), col("ece_micros"),
        col("psi_total_micros"), col("drifted"))
  }
}
