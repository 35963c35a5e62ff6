package graft.ml

import org.apache.spark.sql.DataFrame
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
    // equal-width bins over [0, 1e6]; the top edge folds into the
    // last bin so a perfect-confidence row is never its own bin.
    // Column arithmetic on the long-cast conf (not an expr() splice of
    // the raw column name): identifier-safe, and immune to int
    // overflow of conf * nBins. floor(double) here is exact: the
    // numerator is ≤ 1e6·nBins ≪ 2^53 and the quotient sits ≥ 1e-6
    // from any integer while its ulp is ~1e-13.
    val bin = least(lit(nBins - 1L),
      floor(conf * lit(nBins.toLong) / lit(1000000.0)).cast("long"))
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
}
