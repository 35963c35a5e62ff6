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
}
