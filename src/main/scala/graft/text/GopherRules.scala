package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher rule-based document quality gate — Rae et al. 2021,
  * "Scaling Language Models: Methods, Analysis & Insights from
  * Training Gopher" (Table A1's repetition-free filter set): a
  * document survives only if it passes ALL of
  *
  *   1. word count within [minWords, maxWords]
  *   2. mean word length within [3, 10]
  *   3. symbol-to-word ratio ('#' and '...') ≤ 0.1
  *   4. ≤ 90% of lines start with a bullet
  *   5. ≤ 30% of lines end with an ellipsis
  *   6. ≥ 80% of words contain an alphabetic character
  *   7. at least 2 distinct hits from the 8-word English stop list
  *
  * Unlike the composite [[Text.qualityScore]] heuristic, this is the
  * published hard-rule set with a per-rule failure bitmask, so a
  * downstream pipeline can report WHY each document fell (the
  * reference-pipeline "removed records per rule" idiom at corpus
  * scale).
  *
  * Scale shape: one map-only projection — tokens and lines are
  * projected ONCE per row before any higher-order lambda touches them
  * (a compute-fed lambda child re-evaluates per element; the q161
  * postmortem), every count is exact integer arithmetic, and each
  * ratio is a single IEEE division rounded to the 1e-6 grid BEFORE
  * its threshold comparison so the oracle decides identically at
  * boundaries. No shuffle, no UDF: the 100 TB gate is a parquet scan
  * wide open to whole-stage codegen.
  */
object GopherRules {

  /** Rae et al. 2021's required-stopword list. */
  val GopherStop: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  private val round6 = (c: Column) => floor(c * lit(1e6) + lit(0.5)) / lit(1e6)

  /** Failure-bit layout, LSB first: wordcount, meanlen, symbol,
    * bullet, ellipsis, alpha, stopword. */
  val RuleBits: Seq[String] = Seq(
    "wordcount", "meanlen", "symbol", "bullet", "ellipsis", "alpha", "stop")

  /** (idCol, n_words, mean_word_len, fail_mask, keep) per document.
    * `stops` defaults to the paper's list; a corpus with a different
    * function-word profile supplies its own (rule 7 is "the document
    * looks like running prose in the target language", not those 8
    * words specifically). */
  def flags(docs: DataFrame, idCol: String, textCol: String,
            minWords: Int, maxWords: Int,
            stops: Seq[String] = GopherStop): DataFrame = {
    require(minWords >= 1 && maxWords >= minWords,
      s"bad word-count band [$minWords, $maxWords]")
    val t = col(textCol)
    val base = docs.select(col(idCol), t.as("__text"),
      Text.tokens(t).as("__toks"), split(t, "\n").as("__lines"))

    val nWords = size(col("__toks"))
    val nLines = size(col("__lines"))
    // non-whitespace chars; mean = chars / words, one division
    val chars = length(regexp_replace(trim(col("__text")), "\\s+", ""))
    val meanLen = when(nWords === 0, lit(0.0))
      .otherwise(round6(chars.cast("double") / nWords.cast("double")))
    // 3·hashes + 3·ellipses over 3·words: a single division off exact
    // integers ('...' count = removed length, already ×3)
    val hashes = length(col("__text")) -
      length(regexp_replace(col("__text"), "#", ""))
    val dots3 = length(col("__text")) -
      length(regexp_replace(col("__text"), "\\.\\.\\.", ""))
    val symbolRatio = when(nWords === 0, lit(0.0))
      .otherwise(round6((hashes * 3 + dots3).cast("double")
        / (nWords * 3).cast("double")))
    val bulletFrac = when(nLines === 0, lit(0.0))
      .otherwise(round6(size(filter(col("__lines"),
        l => l.rlike("^\\s*[-*•]"))).cast("double") / nLines.cast("double")))
    val ellLineFrac = when(nLines === 0, lit(0.0))
      .otherwise(round6(size(filter(col("__lines"),
        l => l.endsWith("..."))).cast("double") / nLines.cast("double")))
    val alphaFrac = when(nWords === 0, lit(0.0))
      .otherwise(round6(size(filter(col("__toks"),
        w => w.rlike("[A-Za-z]"))).cast("double") / nWords.cast("double")))
    val stopHits = size(array_intersect(col("__toks"),
      lit(stops.toArray)))

    val fails = Seq(
      nWords < minWords || nWords > maxWords,
      meanLen < 3.0 || meanLen > 10.0,
      symbolRatio > 0.1,
      bulletFrac > 0.9,
      ellLineFrac > 0.3,
      alphaFrac < 0.8,
      stopHits < 2)
    val mask = fails.zipWithIndex.map { case (f, i) =>
      when(f, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

    base.select(col(idCol), nWords.as("n_words"),
      meanLen.as("mean_word_len"), mask.as("fail_mask"),
      (mask === 0).as("keep"))
  }

  /** Rae et al. 2021 Table A1's REPETITION half (the companion of
    * [[flags]]): per document, the character fraction covered by the
    * most frequent 2/3/4-gram and the count×chars mass of duplicated
    * 5..10-grams (type-count formulation), plus the paper's keep flag
    * at its nine thresholds — top n-gram 20/18/16 %, duplicate n-gram
    * 15/14/13/12/11/10 %.
    *
    * Scale shape: nine fused [[graft.functions.RunStats]] native
    * run-scans over codegen'd `word_spans` n-grams — all per-row, the
    * corpus never shuffles and the per-doc mode never becomes a
    * corpus-wide groupBy. Masses are exact integers and the keep flag
    * compares count·chars·100 ≤ pct·doc_chars in integer arithmetic,
    * so no float boundary can flip a verdict between engines; the
    * reported fractions are single IEEE divisions on the 1e-6 grid
    * (q191's oracle mirrors both). Empty/whitespace-only docs are
    * dropped (no character denominator). */
  def repetitionReport(docs: DataFrame, idCol: String,
                       textCol: String): DataFrame = {
    import graft.functions.{HashFunctions, TextFunctions}
    val base = docs
      .where(length(trim(col(textCol))) > 0)
      .select(col(idCol), Text.tokens(col(textCol)).as("__toks"),
        length(trim(col(textCol))).cast("long").as("__nc"))
    def rs(n: Int) = TextFunctions.runStats(
      HashFunctions.wordSpans(col("__toks"), n)).as(s"__rs$n")
    val st = base.select(
      col(idCol) +: col("__nc") +: (2 to 10).map(rs): _*)
    def mass(n: Int) =
      if (n <= 4) col(s"__rs$n.top_count").cast("long") * col(s"__rs$n.top_chars")
      else col(s"__rs$n.dup_chars")
    def frac(n: Int, name: String) =
      round6(mass(n).cast("double") / col("__nc")).as(name)
    val pct = Map(2 -> 20L, 3 -> 18L, 4 -> 16L, 5 -> 15L, 6 -> 14L,
      7 -> 13L, 8 -> 12L, 9 -> 11L, 10 -> 10L)
    val keep = (2 to 10).map(n =>
      mass(n) * 100L <= lit(pct(n)) * col("__nc")).reduce(_ && _)
    st.select(
      col(idCol) +:
        frac(2, "top_2gram_char_frac") +: frac(3, "top_3gram_char_frac") +:
        frac(4, "top_4gram_char_frac") +:
        (5 to 10).map(n => frac(n, s"dup_${n}gram_char_frac")) :+
        keep.as("keep"): _*)
  }
}
