package graft.curation

import graft.text.Text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection with Importance Resampling (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling",
  * arXiv:2302.03169): select raw-corpus documents that look like a
  * small TARGET distribution by the likelihood ratio of two hashed
  * n-gram bag-of-words models.
  *
  * The paper's estimator, re-expressed Spark-first:
  *   1. featurize every document into hashed bigram buckets (the
  *      fastText hashing trick — md5 prefix mod k, the exact idiom of
  *      [[graft.ml.QualityProbe]] so the DuckDB oracle reproduces
  *      buckets bit-for-bit);
  *   2. fit add-1-smoothed categorical models over the k buckets on
  *      the target slice and on the raw remainder — ONE corpus scan
  *      collapsing to a k-row map-side-combined aggregate;
  *   3. per-bucket log-ratio lambda_b = ln p_hat_target(b) − ln
  *      p_hat_raw(b), each ln snapped to 1e-6 (the q92/q173 recipe
  *      that makes a transcendental cross-engine exact);
  *   4. score log w(doc) = sum_b count_b · lambda_b folded in FIXED
  *      bucket order 0..k-1 (integer counts × snapped doubles, one
  *      shared IEEE op sequence — hash-exact), second corpus scan,
  *      map-side against the broadcast 1-row lambda table;
  *   5. resample: the paper draws Gumbel-noised samples; the gated
  *      variant here takes the deterministic top-n by
  *      (log w DESC, id ASC) — a `TakeOrderedAndProject`, i.e.
  *      per-partition partial top-n, no global sort of the corpus.
  *
  * Scale shape at 100 TB: the model state is k rows however large the
  * corpus (map-side combine does the heavy lifting) — bounded driver
  * trainer state like the k-means/probe trainers, collected eagerly
  * at construction; the lambdas re-enter the scoring scan as
  * LITERALS, so the returned plan is one corpus scan with no model
  * branch and no shuffle before the partial top-n. The corpus is
  * scanned exactly twice across fit+score (DSIR is two-pass by
  * definition) and never shuffled.
  */
object Dsir {

  private def round6(c: Column): Column =
    floor(c * lit(1e6) + lit(0.5)) / lit(1e6)

  /** Hashed-bigram bucket list per document, in bigram position order.
    * The fused [[graft.functions.HashKernels.md5BigramBuckets]] kernel
    * replaces the declarative `transform(bigrams, g => bucket(g, k))`:
    * zip_with AND transform are CodegenFallback, so that form built a
    * bigram String and ran an interpreted md5 + hex render + re-parse
    * per pair — measured as the fit scan's dominant cost (the
    * q161/q172 trap, same move as md5_token_ids). Value-identical. */
  private def bucketMap(textCol: Column, k: Int): Column =
    graft.functions.HashFunctions.md5BigramBuckets(Text.tokens(textCol), k)

  /** Score every document with the DSIR log importance weight and keep
    * the deterministic top `n` by (logw DESC, `idCol` ASC).
    *
    * `targetCol` must be a boolean marking the target slice; both model
    * sides come from the same `docs` frame (the paper's raw side is the
    * complement). Returns (`idCol`, n_bigrams, logw) — `n` rows.
    */
  def selectTopN(docs: DataFrame, textCol: String, idCol: String,
                 targetCol: String, k: Int, n: Int): DataFrame = {
    require(k >= 2, s"need at least 2 hash buckets, got $k")
    require(n >= 1, s"need a positive selection size, got $n")
    val spark = docs.sparkSession

    val feat = docs.select(col(idCol), col(targetCol).as("is_t"),
      bucketMap(col(textCol), k).as("bmap"))

    // Model fit: one corpus scan -> per-bucket target/raw counts. The
    // per-doc histogram (the native IntCounts kernel) is reduced
    // first, so the aggregation explodes k rows per DOCUMENT instead
    // of one row per BIGRAM — the shuffle moves docs×k integer rows
    // (map-side combined to k) rather than the corpus's bigram stream
    // (guide §2.3: aggregate before you shuffle). Right-join a k-row
    // bucket spine so never-hit buckets keep their smoothed
    // probability (count 0 -> +1 smoothing below).
    val spine = spark.range(k).select(col("id").cast("int").as("b"))
    val cnts = feat
      .select(col("is_t"),
        posexplode(graft.functions.HashFunctions.intCounts(col("bmap"), k))
          .as(Seq("b", "c")))
      .groupBy("b")
      .agg(sum(when(col("is_t"), col("c").cast("long")).otherwise(0L)).as("ct"),
        sum(when(col("is_t"), 0L).otherwise(col("c").cast("long"))).as("cr"))
      .join(spine, Seq("b"), "right")
      .select(col("b"), coalesce(col("ct"), lit(0L)).as("ct"),
        coalesce(col("cr"), lit(0L)).as("cr"))

    // The fitted model is k rows of integer counts — the bounded
    // driver "trainer state" pattern (q147/q149/q172): collect it
    // eagerly and ship the snapped log-ratios back as LITERALS, so
    // the returned plan is one scan -> codegen'd projection ->
    // TakeOrderedAndProject with NO model branch. (Deriving totals
    // from `cnts` inside the plan instead re-plans the whole fit
    // subtree per branch — local mode reuses no cross-branch
    // exchanges — which was measured as 3 scans / 4 shuffles.)
    val model = cnts.collect().map(r =>
      (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val tt = model.map(_._2).sum
    val tr = model.map(_._3).sum
    def snap6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val lams: Array[Double] = model.map { case (_, ct, cr) =>
      snap6(math.log((ct + 1L).toDouble / (tt + k.toLong).toDouble)) -
        snap6(math.log((cr + 1L).toDouble / (tr + k.toLong).toDouble))
    }

    // Scoring scan: per-doc bucket counts x literal lambdas, folded
    // in fixed bucket order (left-assoc + chain, mirrored in the
    // oracle SQL term for term). Counts come from the native
    // IntCounts histogram kernel — the earlier transform/filter
    // lambda pair ran interpreted and re-hashed the bigrams once per
    // bucket after projection collapse (the q161/q172 trap).
    val scored = feat
      .withColumn("fv", graft.functions.HashFunctions.intCounts(col("bmap"), k))
    val logw = (0 until k).foldLeft(lit(0.0)) { (acc, b) =>
      acc + element_at(col("fv"), b + 1).cast("double") * lit(lams(b))
    }
    scored
      .select(col(idCol), size(col("bmap")).cast("long").as("n_bigrams"),
        round6(logw).as("logw"))
      .orderBy(col("logw").desc, col(idCol))
      .limit(n)
  }
}
