package graft.curation

import graft.core.Materialize.StableOps
import graft.text.Text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data corpus operations beyond dedup/quality: benchmark
  * decontamination, deterministic dataset splits, mixture (epoch)
  * sampling, and per-domain quotas. These are the operators a
  * large-scale LLM-pretraining pipeline layers on top of the cleaning
  * flow in [[graft.pipelines.Curation]].
  *
  * All of them are defined so results are bit-stable across
  * partitionings and oracle-verifiable in ANSI SQL: randomness is
  * replaced by cryptographic-hash arithmetic on ids (the standard
  * trick for reproducible pipelines — the same document always lands
  * in the same split/copy-count no matter the cluster layout).
  */
object Curate {

  /** Training documents that share at least one token `n`-gram with a
    * benchmark (evaluation) corpus, with the count of distinct
    * overlapping n-grams — the GPT-3-appendix-style n-gram
    * decontamination check (production pipelines use n = 8..13; tests
    * here use a smaller n because the synthetic corpus has no long
    * shared runs).
    *
    * Scale shape: the benchmark side is tiny relative to the training
    * corpus (thousands vs billions of docs), so its distinct shingle
    * set is broadcast; the 100 TB training side explodes shingles
    * map-side, hits the broadcast hash set, and only the matching
    * (id, shingle) pairs — a vanishing fraction — reach the one
    * shuffle (the per-doc count). Text itself never shuffles. If the
    * benchmark side ever outgrows broadcast range, drop the
    * `broadcast` hint and Catalyst falls back to a shuffle hash join
    * on the shingle — the plan stays the same shape.
    */
  def contamination(train: DataFrame, bench: DataFrame, n: Int,
                    idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    // tokenize in its own projection: `shingles` references the token
    // array several times, and CollapseProject keeps the (expensive,
    // multiply-referenced) split() from being inlined into each use
    def shingled(df: DataFrame) =
      df.select(col(idCol), Text.tokens(col(textCol)).as("toks"))
        .select(col(idCol),
          explode(Text.shingles(col("toks"), n)).as("shingle"))
    val benchShingles = broadcast(shingled(bench).select("shingle").distinct())
    shingled(train)
      .join(benchShingles, "shingle")
      .groupBy(col(idCol))
      .agg(count_distinct(col("shingle")).as("n_contaminated_ngrams"))
  }

  /** [[contamination]] with a Bloom-filter prefilter on the training
    * side — the variant for when the benchmark shingle set outgrows an
    * exact broadcast hash set but its BITS still fit (10 bits/element
    * at ~1% false positives vs 8+ bytes/element exact: a 10-billion-
    * shingle eval suite is ~12 GB Bloom vs ~100+ GB exact).
    *
    * Build: bench shingles → k seeded bit POSITIONS (map-side) →
    * distinct → collect. Driver state is bounded by `mBits` (the
    * distinct positions), never by the bench size. Probe: the 100 TB
    * training scan tests each shingle against the broadcast bit array
    * (codegen'd fused loop, [[graft.functions.BloomMightContain]]);
    * only survivors — true overlaps plus the ~fpp false-positive
    * sliver — reach the exact verify join, so the one corpus-side
    * shuffle carries a vanishing fraction of (id, shingle) pairs and
    * the exact bench set is only joined against candidates (shuffle
    * hash join, no broadcast needed). Bloom filters have NO false
    * negatives, so verify restores exactness: output ≡ [[contamination
    * ]] row-for-row (BloomSpec pins the equivalence and the prefilter
    * selectivity; the oracle replays the exact semantics in SQL). */
  def bloomContamination(train: DataFrame, bench: DataFrame, n: Int,
                         mBits: Int, kHashes: Int,
                         idCol: String = "doc_id",
                         textCol: String = "text"): DataFrame = {
    def shingled(df: DataFrame) =
      df.select(col(idCol), Text.tokens(col(textCol)).as("toks"))
        .select(col(idCol),
          explode(Text.shingles(col("toks"), n)).as("shingle"))
    val benchSh = shingled(bench)
    val words = bloomBits(benchSh.select(col("shingle")), mBits, kHashes)
    val candidates = shingled(train).where(
      graft.functions.HashFunctions.bloomMightContain(
        col("shingle"), words.toIndexedSeq, kHashes))
    candidates
      .join(benchSh.select("shingle").distinct(), "shingle")
      .groupBy(col(idCol))
      .agg(count_distinct(col("shingle")).as("n_contaminated_ngrams"))
  }

  /** Driver-built Bloom bit array over a one-column string frame: the
    * elements' k seeded positions distinct-and-collect (bounded by
    * mBits regardless of element count — the build side never
    * materializes driver-side strings), then fold into 64-bit words.
    * Shared by the batch prefilter ([[bloomContamination]]) and its
    * streaming twin ([[graft.streaming.DecontamStream]]). */
  def bloomBits(elems: DataFrame, mBits: Int, kHashes: Int): Array[Long] = {
    val colName = elems.columns.head
    val positions = elems
      .select(explode(graft.functions.HashFunctions.bloomPositions(
        col(colName), kHashes, mBits)).as("p"))
      .distinct()
      .collect() // <= mBits rows — bounded driver state by construction
      .map(_.getInt(0))
    val words = new Array[Long](mBits / 64)
    positions.foreach(p => words(p >>> 6) |= (1L << (p & 63)))
    words
  }

  /** Deterministic train/val/test assignment from the id alone:
    * bucket = first 8 hex digits of md5(id) mod 100, then
    * [0, trainPct) -> train, [trainPct, trainPct+valPct) -> val,
    * rest -> test. Map-only (no shuffle, no RNG state); adding data
    * never reassigns existing documents, which is the property that
    * matters for split stability on a growing corpus. */
  def hashSplit(df: DataFrame, idCol: String = "doc_id",
                trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"bad split percents: train=$trainPct val=$valPct")
    val bucket =
      conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
        .cast("long") % 100
    df.withColumn("bucket", bucket)
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test"))
  }

  /** Mixture (epoch) sampling: replicate each document
    * floor(w) times plus one more with probability frac(w), where `w`
    * is the per-group mixture weight (w > 1 upsamples, w < 1
    * downsamples) and the "probability" is hash arithmetic on the id —
    * so the realized copy count is a pure function of (id, weight) and
    * the realized mixture converges to the target weights exactly as
    * in the Pile/LLaMA-style epoch tables. Output has one row per
    * copy. Map-side only: the weight lookup is a literal CASE (or a
    * broadcast join for big weight tables) and the explode produces at
    * most ceil(w) rows per input row — no shuffle at any size. */
  def mixtureCopies(df: DataFrame, weights: Map[String, Double],
                    groupCol: String = "lang",
                    idCol: String = "doc_id",
                    defaultWeight: Double = 1.0): DataFrame = {
    val w = weights.foldLeft(lit(defaultWeight)) { case (acc, (k, v)) =>
      when(col(groupCol) === k, lit(v)).otherwise(acc)
    }
    bernoulliCopies(df, w, groupCol, idCol, keepWeight = false)
  }

  /** Temperature-flattened mixture (the multilingual sampling of
    * XLM-R/mT5, arXiv:1901.07291 §3.1, arXiv:2010.11934 §3.2): target
    * share q_g ∝ n_g^α pushes probability mass from head to tail
    * groups; realized as deterministic per-doc copy counts with
    * [[mixtureCopies]]' hash-Bernoulli residual, but the weight is
    * derived FROM THE CORPUS ITSELF:
    *   w_g = q_g · N / n_g,  q_g = n_g^α / Σ_h n_h^α
    * so the expected output stays N rows while group g's share moves
    * from n_g/N to q_g.
    *
    * Cross-engine determinism: α is restricted to quarters (1→0.25,
    * 2→0.5, 3→0.75) so n^α is a chain of IEEE sqrt's (each correctly
    * rounded by spec) and at most one multiply — a fixed op sequence
    * any engine reproduces bit-exactly, where a general pow() is NOT
    * correctly rounded and breaks hash parity; the cross-group
    * Σ n^α snaps to 2^-20 fixed point (exact integer sum) per the
    * house recipe.
    *
    * Scale: ONE eager histogram aggregation collects g rows (the
    * group domain — driver state bounded by definition, the trainer
    * pattern of [[graft.similarity.Ann.lloydCluster]]); the weights
    * then ride a literal map into a map-only emit over a single scan
    * (q83's shape) — no shuffle of the corpus at any size.
    * java.lang.Math.sqrt/floor and the fixed multiply/divide order
    * are the same correctly-rounded IEEE ops the engines run, so the
    * driver-computed weights stay bit-identical to the oracle's. */
  def temperatureCopies(df: DataFrame, alphaQuarters: Int,
                        groupCol: String = "lang",
                        idCol: String = "doc_id"): DataFrame = {
    require(alphaQuarters >= 1 && alphaQuarters <= 3,
      s"alphaQuarters must be 1..3 (alpha = 0.25/0.5/0.75), got $alphaQuarters")
    def alphaPow(n: Double): Double = alphaQuarters match {
      case 1 => math.sqrt(math.sqrt(n))
      case 2 => math.sqrt(n)
      case 3 => math.sqrt(n) * math.sqrt(math.sqrt(n))
    }
    val hist = df.groupBy(groupCol).agg(count(lit(1)).as("n"))
      .collect() // g rows — the group domain, bounded driver state
      .map(r => (r.get(0).asInstanceOf[String], r.getLong(1)))
    // a null group would become a null map key, which the typedLit map
    // literal rejects (or element_at silently drops those docs) —
    // unlike mixtureCopies there is no caller-supplied default weight
    // to route nulls through, so fail loudly instead of losing rows
    require(!hist.exists(_._1 == null),
      s"temperatureCopies: null $groupCol values present " +
        s"(${hist.collectFirst { case (null, n) => n }.getOrElse(0L)} rows); " +
        "filter them out or fill a sentinel group before sampling")
    val nn = hist.map(_._2).sum
    val s = hist
      .map(t => math.floor(alphaPow(t._2.toDouble) * 1048576.0 + 0.5).toLong)
      .sum
    val wMap = hist.map { case (g, n) =>
      g -> (nn.toDouble * alphaPow(n.toDouble) * 1048576.0) /
        (n.toDouble * s.toDouble)
    }.toMap
    bernoulliCopies(df.select(col(idCol), col(groupCol)),
      element_at(typedLit(wMap), col(groupCol)), groupCol, idCol,
      keepWeight = true)
  }

  /** Shared hash-Bernoulli copy realization (q83/q165): n_copies =
    * floor(w) + [frac < w - floor(w)] with frac the first 8 md5 hex
    * digits of "id:mix" / 2^32 — the ":mix" salt decorrelates it from
    * hashSplit's bucket for the same id. One output row per copy;
    * `keepWeight` adds round(w, 6) as a `weight` column. */
  private def bernoulliCopies(df: DataFrame, w: Column, groupCol: String,
                              idCol: String, keepWeight: Boolean): DataFrame = {
    val frac =
      conv(substring(md5(concat(col(idCol).cast("string"), lit(":mix"))), 1, 8),
        16, 10).cast("long").cast("double") / lit(4294967296.0)
    val cols = (Seq(col(idCol), col(groupCol)) ++
      (if (keepWeight) Seq(round(col("w"), 6).as("weight")) else Nil)) :+
      explode(sequence(lit(1), col("n_copies"))).as("copy_no")
    df.withColumn("w", w)
      .withColumn("n_copies",
        floor(col("w")).cast("int") +
          when(frac < col("w") - floor(col("w")), 1).otherwise(0))
      .where(col("n_copies") >= 1)
      .select(cols: _*)
  }

  /** Deterministic global shuffle for training order: every row gets
    * the pseudo-random key md5(id ":" seed), and the output is
    * range-partitioned and sorted on it — so the concatenation of
    * output files in partition order IS the shuffled epoch, and a
    * different `seed` gives an independent order for the next epoch.
    *
    * This is the 100 TB form of "ORDER BY random()": a global
    * row_number would funnel everything through one partition, while
    * repartitionByRange samples range boundaries and sorts each
    * partition independently — two narrow passes, no global
    * bottleneck, reproducible because the key is hash arithmetic, not
    * an RNG. */
  def shuffled(df: DataFrame, seed: Long, nPartitions: Int,
               idCol: String = "doc_id"): DataFrame =
    df.withColumn("shuffle_key",
        md5(concat(col(idCol).cast("string"), lit(":" + seed))))
      .repartitionByRange(nPartitions, col("shuffle_key"))
      .sortWithinPartitions("shuffle_key")

  /** [[shuffled]]'s hash key plus a DETERMINISTIC bucket id: the first
    * 8 hex digits of the key, scaled to [0, nBuckets). Hex strings
    * order lexicographically exactly as their numeric value, so the
    * bucket is monotone in the key and bucket boundaries are a pure
    * function of the data. `spark_partition_id()` after a range
    * exchange does NOT have that property: `repartitionByRange`
    * SAMPLES its boundaries with a seed that includes the RDD id, so
    * two actions on the same lineage can draw different boundaries —
    * observed in practice as colliding epoch positions at sf0.1. Any
    * offsets collected in one job and applied in another must key on
    * this column, never on the physical partition id. */
  private def keyBucketed(df: DataFrame, seed: Long, nBuckets: Int,
                          idCol: String): DataFrame =
    df.withColumn("shuffle_key",
        md5(concat(col(idCol).cast("string"), lit(":" + seed))))
      .withColumn("pid",
        shiftright(
          conv(substring(col("shuffle_key"), 1, 8), 16, 10).cast("long") *
            nBuckets, 32).cast("int"))

  /** Per-bucket exclusive prefix totals of `agg` over [[keyBucketed]]
    * data, computed once on the driver (nBuckets values — bytes, never
    * row data) and returned as a broadcastable (pid, colName) frame.
    * Empty buckets contribute 0, so the cumulative sum stays aligned
    * even when small data leaves buckets unpopulated. */
  private def bucketOffsets(keyed: DataFrame, agg: Column, nBuckets: Int,
                            colName: String): DataFrame = {
    val spark = keyed.sparkSession
    import spark.implicits._
    val byPid = keyed.groupBy("pid").agg(agg.cast("long").as("v"))
      .as[(Int, Long)].collect().toMap
    val counts = (0 until nBuckets).map(p => byPid.getOrElse(p, 0L))
    val offsets = (0 until nBuckets).zip(counts.scanLeft(0L)((a, b) => a + b))
    broadcast(offsets.toDF("pid", colName))
  }

  /** Global 0-based epoch position for every document under the
    * [[shuffled]] order, WITHOUT a global single-partition sort. The
    * classic zipWithIndex shape, in DataFrame terms:
    *
    *   1. every row gets a deterministic equal-width key bucket
    *      ([[keyBucketed]] — monotone in the key, so the concatenation
    *      of buckets 0..n-1 is the total order);
    *   2. count rows per bucket and cumulative-sum the counts on the
    *      driver — n bucket counts, bytes, never row data;
    *   3. one bucket-partitioned window: position = bucket offset +
    *      row_number within the bucket's key order.
    *
    * `ORDER BY key` + `row_number() OVER ()` computes the same thing
    * through ONE partition holding all 100 TB; this form never moves
    * more than one bucket's rows through any single task. Output is
    * bit-stable because both the key and the bucket boundaries are
    * hash arithmetic — nothing depends on sampled range boundaries or
    * physical partition layout. */
  def epochPositions(df: DataFrame, seed: Long, nPartitions: Int,
                     idCol: String = "doc_id"): DataFrame = {
    val keyed = keyBucketed(df, seed, nPartitions, idCol)
    val offsetDf = bucketOffsets(keyed, count(lit(1)), nPartitions, "rows_before")
    val w = Window.partitionBy("pid").orderBy("shuffle_key")
    keyed
      .join(offsetDf, "pid")
      .withColumn("pos", col("rows_before") + row_number().over(w) - 1)
      .drop("pid", "rows_before")
  }

  /** Assign every document to a fixed-cost training bin: documents are
    * laid out in the [[shuffled]] hash order and bin i holds the rows
    * whose EXCLUSIVE running cost (sum of `costCol` over all earlier
    * rows in that order) lands in [i*budget, (i+1)*budget) — greedy
    * sequence packing of context windows, with the global running sum
    * computed the same two-pass way as [[epochPositions]]: per-bucket
    * cost totals -> driver cumulative sum -> broadcast offsets -> one
    * bucket-partitioned window. The only data-sized shuffle is the
    * window's re-cluster on the deterministic key bucket; a naive
    * `sum() OVER (ORDER BY key)` would instead serialize 100 TB
    * through a single unpartitioned window. Bin ids use integer
    * division, so they are exact for any budget (no float boundary). */
  def packBudget(df: DataFrame, costCol: String, budget: Long, seed: Long,
                 nPartitions: Int, idCol: String = "doc_id"): DataFrame = {
    require(budget > 0, "budget must be positive")
    // keyed feeds BOTH the eager bucket-totals collect and the offsets
    // window below; without a barrier each evaluation re-runs the whole
    // upstream chain (q168 feeds the full BPE segment pass in here —
    // measured as the two dominant jobs). The checkpoint is bounded by
    // the input's (id, cost) grain — rows per doc, never tokens.
    val keyed = keyBucketed(df, seed, nPartitions, idCol).stable()
    val offsetDf =
      bucketOffsets(keyed, sum(col(costCol)), nPartitions, "cost_before")
    val w = Window.partitionBy("pid").orderBy("shuffle_key")
      .rowsBetween(Window.unboundedPreceding, -1)
    keyed
      .join(offsetDf, "pid")
      .withColumn("cum_before",
        coalesce(sum(col(costCol)).over(w), lit(0L)) + col("cost_before"))
      .withColumn("bin", expr(s"cum_before div ${budget}L"))
      .drop("pid", "cost_before", "cum_before")
  }

  /** Sliding-window document chunking — the context-window splitter of
    * RAG/pretraining prep: every document becomes fixed-size token
    * chunks of `chunkSize` with `overlap` tokens shared between
    * consecutive chunks (stride = chunkSize − overlap). Chunk starts
    * are 0, stride, 2·stride, …; the count is
    * 1 + max(0, ⌈(n − chunkSize)/stride⌉), so the final chunk may be
    * short but is never a pure suffix of its predecessor. Documents
    * with no tokens produce no chunks.
    *
    * Scale shape: ONE corpus scan, map-only — tokenize, a bounded
    * integer `sequence` explode (≈ n/stride rows per doc), and a
    * `slice` per chunk; no shuffle at any size, and the explode factor
    * is the inverse chunk size (a 100 TB corpus at chunkSize 2048
    * emits ~1/2000th of its token count as chunk rows). Deterministic
    * and list-slice-expressible → oracle hash-exact. Returns
    * (id, chunk_idx, n_tokens, chunk_text). */
  def chunkTokens(docs: DataFrame, textCol: String, idCol: String,
                  chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > 0, s"chunkSize must be positive, got $chunkSize")
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap must be in [0, chunkSize), got $overlap of $chunkSize")
    val stride = chunkSize - overlap
    // floor division (matches DuckDB's //; the numerator is exact in a
    // double at any real doc length), clamped at 0 for short docs
    val lastIdx = greatest(lit(0L),
      floor((size(col("ts")) - lit(chunkSize) + lit(stride - 1))
        / lit(stride.toDouble)).cast("long"))
    docs.select(col(idCol), Text.tokens(col(textCol)).as("ts"))
      .where(size(col("ts")) > 0)
      .select(col(idCol), col("ts"),
        explode(sequence(lit(0L), lastIdx)).as("ci"))
      .select(col(idCol), col("ci").cast("int").as("chunk_idx"),
        slice(col("ts"), (col("ci") * stride + 1).cast("int"),
          lit(chunkSize)).as("chunk"))
      .select(col(idCol), col("chunk_idx"),
        size(col("chunk")).cast("long").as("n_tokens"),
        array_join(col("chunk"), " ").as("chunk_text"))
  }

  /** Per-domain quota: keep the `k` best documents per domain by the
    * composite quality score (ties broken by id — fully
    * deterministic). One shuffle on the domain column; with a skewed
    * domain the rank window is still O(domain size log k) per
    * partition, and at real scale the same contract can run as a
    * map-side top-k + merge (see [[graft.similarity.Ann]] for that
    * pattern) — the window form is the Catalyst-native default. */
  def domainQuota(df: DataFrame, k: Int,
                  domainCol: String = "source",
                  idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    val scored = df.select(col(idCol), col(domainCol),
      Text.qualityScore(col(textCol)).as("quality"))
    val byDomain = Window.partitionBy(domainCol)
      .orderBy(col("quality").desc, col(idCol).asc)
    scored
      .withColumn("rk", row_number().over(byDomain))
      .where(col("rk") <= k)
      .select(col(idCol), col(domainCol), col("quality"),
        col("rk").cast("int").as("rk"))
  }

  /** Contrastive-triplet mining for embedding-model training data:
    * positives are SemDeDup's qualifying within-cluster pairs
    * ([[graft.dedup.Dedup.semanticDupPairs]] — the better-ranked doc
    * is the anchor), and the hard-ish negative is the most-central
    * document (rank 1) of the lowest-id OTHER cluster — deterministic,
    * so the whole triplet table is oracle-exact. The negative lookup
    * is driver state (k cluster representatives, the centroid-dictionary
    * stance), applied map-side; nothing new shuffles beyond the pair
    * machinery. Returns (cluster, id_a, id_b, sim_micros, neg_id);
    * with fewer than two non-empty clusters neg_id is null. */
  def contrastiveTriplets(embeddings: DataFrame, vecCol: String, idCol: String,
                          k: Int, iters: Int, tauMicros: Long): DataFrame = {
    val (assigned, pairs) = graft.dedup.Dedup
      .semanticRankedPairs(embeddings, vecCol, idCol, k, iters, tauMicros)
    // id read GENERICALLY (r.get) and re-injected via lit(anyRef):
    // idCol is caller-typed (long in the driver queries, but int or
    // string ids must not ClassCastException here — only the cluster
    // column's int type is this module's own contract)
    val reps = assigned.where(col("rk") === 1)
      .select(col("cluster"), col("vec_id"))
      .collect() // k rows — bounded driver state
      .map(r => (r.getInt(0), r.get(1))).sortBy(_._1)
    val idType = pairs.schema("id_a").dataType
    val negExpr =
      if (reps.length < 2) lit(null).cast(idType)
      else {
        val (c1, rep1) = reps(0)
        val rep2 = reps(1)._2
        when(col("cluster") === c1, lit(rep2).cast(idType))
          .otherwise(lit(rep1).cast(idType))
      }
    pairs.withColumn("neg_id", negExpr)
  }

  /** Leakage-safe dataset split: the split is a function of the
    * EXACT-DEDUP GROUP, not the document — every copy of a duplicated
    * text lands in the same train/val/test bucket, so no evaluation
    * example has a training-set twin (the dedup-aware split hygiene
    * rule; splitting by raw doc id silently leaks duplicates across
    * the boundary). Composes
    * [[graft.dedup.Dedup.exactCanonicalIds]] (one fingerprint-window
    * shuffle) with [[hashSplit]] keyed on the canonical id (map-side
    * hash arithmetic, no further shuffle) — the same growing-corpus
    * stability contract as hashSplit: adding documents never
    * reassigns an existing group. */
  def leakageSafeSplit(df: DataFrame, textCol: String = "text",
                       idCol: String = "doc_id",
                       trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val canon = graft.dedup.Dedup.exactCanonicalIds(df, textCol, idCol)
    hashSplit(canon, "canonical_id", trainPct, valPct)
      .select(col(idCol), col("canonical_id"), col("bucket"), col("split"))
  }

  /** Cluster-balanced coreset selection: the geometry-aware sibling of
    * [[domainQuota]] — strata are LEARNED k-means cells
    * ([[graft.similarity.Ann.lloydCluster]], the q147 deterministic
    * Lloyd), not a metadata column, and the quota keeps the
    * `perCluster` documents CLOSEST to their centroid (ties by id).
    * This is the standard cluster-proportional coreset/diversity
    * sample for training-data curation: every region of embedding
    * space contributes equally, and within a region the most central
    * (prototypical) documents win.
    *
    * Scale shape: lloydCluster's per-iteration dictionary exchange,
    * then ONE shuffle on the cluster id for the rank window; k scales
    * with corpus size so cells stay bounded, and the window is
    * O(cell·log m) per partition. Fully deterministic → oracle-exact
    * (q150 replays the Lloyd CTE + row_number in DuckDB). */
  def coresetSample(embeddings: DataFrame, vecCol: String, idCol: String,
                    k: Int, iters: Int, perCluster: Int): DataFrame = {
    // lloydCluster normalizes the id column's name to vec_id; restore
    // the caller's name on the way out
    val byCluster = Window.partitionBy("cluster")
      .orderBy(col("dist_micros").asc, col("vec_id").asc)
    graft.similarity.Ann.lloydCluster(embeddings, idCol, vecCol, k, iters)
      .withColumn("rk", row_number().over(byCluster))
      .where(col("rk") <= perCluster)
      .select(col("vec_id").as(idCol), col("cluster"), col("dist_micros"),
        col("rk").cast("int").as("rk"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020, "CCNet:
    * Extracting High Quality Monolingual Datasets from Web Crawl
    * Data", LREC): per language, split documents into head/middle/
    * tail terciles of LM perplexity — head feeds pretraining, tail is
    * dropped or down-weighted. The paper cuts at fixed percentiles of
    * a held-out distribution; the deterministic re-expression is
    * ntile(3) per language on the (1e-6-rounded) perplexity proxy
    * with id tiebreaks, which IS the tercile cut of the scored
    * corpus itself.
    *
    * `scored` is any frame carrying (idCol, langCol, pplCol) — the
    * q92 unigram-logprob recipe or the q173 Stupid-Backoff scorer
    * both fit. Scale shape: ONE shuffle on the language key for the
    * rank window; language cardinality is tiny, but each partition
    * only sorts its language's rows and per-language skew is the
    * web-corpus norm English-dominates case — at 100 TB the window
    * becomes a two-pass percentile (sample thresholds, then map-side
    * bucket), which preserves this operator's output contract. */
  def perplexityBuckets(scored: DataFrame, idCol: String, langCol: String,
                        pplCol: String): DataFrame = {
    val byLang = Window.partitionBy(col(langCol))
      .orderBy(col(pplCol).asc, col(idCol).asc)
    scored
      .withColumn("__t", ntile(3).over(byLang))
      .withColumn("bucket",
        when(col("__t") === 1, "head")
          .when(col("__t") === 2, "middle").otherwise("tail"))
      .drop("__t")
  }

  /** Weighted sampling WITHOUT replacement — Efraimidis & Spirakis
    * 2006 ("Weighted random sampling with a reservoir", IPL): item i
    * gets key u_i^(1/w_i) with u_i uniform; the n largest keys are an
    * exact weighted sample without replacement. The distributed
    * one-pass reformulation ranks on ln(u_i)/w_i (monotone in the
    * key), which is THE standard trick for cluster-scale weighted
    * subsampling — a single partial top-n, no sequential reservoir.
    *
    * Determinism: u_i is the house md5-hash uniform on (0, 1] (a pure
    * function of id and seed, partitioning-invariant), ln is snapped
    * to 1e-6 before the one division by the integer weight (the
    * q92/q173 transcendental recipe), ranking ties on id. Weights
    * must be positive integers (clamp upstream).
    *
    * Scale shape: map-side key arithmetic + TakeOrderedAndProject
    * (per-partition partial top-n) — the corpus never sorts or
    * shuffles. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     n: Int, seed: Long): DataFrame = {
    require(n >= 1, s"need a positive sample size, got $n")
    val round6 = (c: Column) => floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
    val h = conv(substring(md5(concat(col(idCol).cast("string"),
      lit(s":es$seed"))), 1, 8), 16, 10).cast("long")
    df.select(col(idCol), col(weightCol).cast("long").as("w"))
      .withColumn("u", (h + lit(1L)).cast("double") / lit(4294967296.0))
      .withColumn("es_key", round6(round6(log(col("u"))) / col("w").cast("double")))
      .orderBy(col("es_key").desc, col(idCol))
      .limit(n)
      .select(col(idCol), col("w"), col("es_key"))
  }

  /** Length-grouped batching with padding-waste accounting — the
    * batch-construction primitive of LLM training/inference: padding
    * every sequence in a batch to the batch max wastes
    * (n·max − Σlen) slots, and grouping similar lengths minimizes it
    * (the "sortish"/LengthGroupedSampler idiom of the major training
    * frameworks).
    *
    * The scalable deterministic shape: documents land in LENGTH
    * BUCKETS of `bucketWidth` (map-side arithmetic, no global sort),
    * and batches of `batchSize` form WITHIN a bucket by (length, id)
    * rank. A single global row_number would serialize the corpus
    * through one window partition; per-bucket windows shard by the
    * bucket key, and each bucket's batch list is independent — the
    * same reason q88's packing buckets by pid.
    *
    * Returns one row per batch: (bucket, batch, n_docs, max_len,
    * sum_len, pad_frac) with pad_frac = (n·max − Σ)/(n·max) — exact
    * integers into one 1e-6-floored division. */
  def lengthGroupedBatches(docs: DataFrame, idCol: String, costCol: String,
                           bucketWidth: Int, batchSize: Int): DataFrame = {
    require(bucketWidth >= 1 && batchSize >= 1,
      s"bad bucketWidth=$bucketWidth / batchSize=$batchSize")
    val round6 = (c: Column) => floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
    docs
      .select(col(idCol), col(costCol).cast("long").as("cost"))
      .withColumn("bucket", expr(s"cost DIV ${bucketWidth}L"))
      .withColumn("batch",
        expr(s"(row_number() OVER (PARTITION BY bucket ORDER BY cost, $idCol) - 1) DIV ${batchSize}L"))
      .groupBy("bucket", "batch")
      .agg(count(lit(1)).as("n_docs"), max("cost").as("max_len"),
        sum("cost").as("sum_len"))
      .select(col("bucket"), col("batch"), col("n_docs"), col("max_len"),
        col("sum_len"),
        when(col("n_docs") * col("max_len") === 0, lit(0.0))
          .otherwise(round6(
            (col("n_docs") * col("max_len") - col("sum_len")).cast("double")
              / (col("n_docs") * col("max_len")).cast("double")))
          .as("pad_frac"))
  }

  /** EXACT per-group percentile trimming of an integer-valued column
    * via a histogram CDF — the length/outlier gate (drop the shortest
    * p% and longest p% of documents per language) done WITHOUT a
    * per-group sort of the corpus.
    *
    * Threshold semantics (both engines evaluate the identical integer
    * inequality — no floating point anywhere): with N = group size
    * and cum(v) = #rows with value ≤ v,
    *   lo = min v such that cum(v)·denom ≥ loNum·N
    *   hi = min v such that cum(v)·denom ≥ hiNum·N
    * (the `quantile_disc` convention: the smallest value whose CDF
    * reaches the target mass); keep = lo ≤ value ≤ hi.
    *
    * Scale shape: the corpus collapses to the per-(group, value)
    * HISTOGRAM in one map-side-combined groupBy — the only
    * corpus-scale shuffle, carrying one row per distinct (group,
    * value), bounded by value cardinality, not corpus size. The CDF
    * window and threshold aggregation run on that tiny table, and the
    * thresholds broadcast back into a second corpus scan. A naive
    * percent_rank() window would instead SORT every group's full
    * partition — the classic 100 TB skew trap for English-dominated
    * corpora. */
  def histogramQuantileTrim(df: DataFrame, groupCol: String, valCol: String,
      loNum: Int, hiNum: Int, denom: Int): DataFrame = {
    require(denom >= 1 && loNum >= 0 && hiNum <= denom && loNum <= hiNum,
      s"bad percentile spec $loNum/$hiNum/$denom")
    val v = col(valCol).cast("long")
    val hist = df.groupBy(col(groupCol), v.as("__v"))
      .agg(count(lit(1)).as("__c"))
    val cdf = hist
      .withColumn("__cum", sum("__c").over(
        Window.partitionBy(col(groupCol)).orderBy(col("__v"))))
      .withColumn("__n", sum("__c").over(Window.partitionBy(col(groupCol))))
    val th = cdf.groupBy(col(groupCol)).agg(
      min(when(col("__cum") * denom >= lit(loNum.toLong) * col("__n"),
        col("__v"))).as("lo"),
      min(when(col("__cum") * denom >= lit(hiNum.toLong) * col("__n"),
        col("__v"))).as("hi"))
    df.join(broadcast(th), Seq(groupCol))
      .withColumn("keep", v.between(col("lo"), col("hi")))
  }

  /** FUZZY benchmark decontamination (the GPT-3 appendix-C /
    * Dolma-style near-duplicate gate, complementing the EXACT n-gram
    * overlap of [[bloomContamination]]): flag training documents whose
    * shingle-set Jaccard similarity with any eval document reaches
    * `tauMicros`, found via MinHash-LSH banding so the corpus never
    * self-joins.
    *
    * Determinism & oracle parity: the MinHash "permutations" are the
    * md5-slice arithmetic of the q45 signature family (permutation i
    * reads hex digits 8·(i%4)+1..+8 of md5(shingle || ':' || i/4) —
    * [[graft.dedup.Dedup.md5Slice]]; one digest drives four
    * permutations) — unlike the xxhash64 signature family, every
    * stage here replays exactly in ANSI SQL: band keys are string
    * concatenations of integer minima, verification is an exact
    * shingle-set intersection, and Jaccard is emitted as one integer
    * division (micros). No floats anywhere.
    *
    * Scale shape: the eval side is a benchmark — tiny by construction
    * — so its band table and shingle sets BROADCAST; the training
    * corpus is never shuffled whole. Pass 1 collapses the corpus to
    * per-doc signatures MAP-SIDE through the fused
    * [[graft.functions.Md5MinhashSig]] kernel (distinct shingles
    * deduped in-row, k minima + the distinct-shingle count in one
    * struct — round 18 removed both the per-permutation digests and
    * the signature aggregation shuffle). The band join then yields
    * candidate pairs — near-dups of eval docs, a sliver — and only
    * candidates' shingles are re-derived in pass 2 (scan pruned by a
    * broadcast semi-join on candidate ids) for exact verification. */
  def fuzzyDecontam(docs: DataFrame, isEval: Column, n: Int = 3,
                    k: Int = 8, bands: Int = 4, tauMicros: Long = 500000L,
                    idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    require(k % bands == 0, s"k=$k must split into bands=$bands")
    require(k % 4 == 0, s"k=$k must split into 32-bit md5 slices")
    val r = k / bands
    // the ONE shingle definition the signature pass and the exact
    // verify share — the Jaccard formula is only sound when both
    // sides shingle identically
    def unitExpr = Text.shingles(Text.tokens(col(textCol)), n)
    def shingled(df: DataFrame) = df
      .select(col(idCol).as("id"), isEval.as("is_eval"),
        explode(array_distinct(unitExpr)).as("shingle"))
    val sh = shingled(docs)
    val sig = docs
      .select(col(idCol).as("id"), isEval.as("is_eval"),
        graft.functions.HashFunctions.md5MinhashSig(unitExpr, k).as("ms"))
      .where(col("ms").isNotNull) // shingle-less docs carry no signature
      .select(col("id"), col("is_eval"), col("ms.n_u").as("n_sh"),
        col("ms.sig").as("sig"))
    val bandCols = (0 until bands).map { b =>
      concat_ws("|",
        lit(b.toString) +: (b * r until (b + 1) * r)
          .map(j => col("sig").getItem(j)): _*)
    }
    val banded = sig
      .select(col("id"), col("is_eval"), col("n_sh"),
        explode(array(bandCols: _*)).as("band"))
    val cand = banded.where(!col("is_eval"))
      .select(col("id").as("train_id"), col("n_sh").as("n_tr"), col("band"))
      .join(broadcast(banded.where(col("is_eval"))
        .select(col("id").as("eval_id"), col("n_sh").as("n_ev"), col("band"))),
        "band")
      .select("train_id", "n_tr", "eval_id", "n_ev").distinct()
      // candidate pairs are the near-dup sliver; checkpoint so the
      // three downstream uses don't each replay the signature pass
      .stable()
    val evalSh = sh.where(col("is_eval"))
      .select(col("id").as("eval_id"), col("shingle"))
    // pass-2 prune BELOW the shingle explode (round 21): Catalyst
    // cannot push a join through a Generate, so joining the exploded
    // stream to the candidate ids still shingled the WHOLE training
    // corpus a second time — the id join commutes with the per-doc
    // explode, so join docs to the candidate sliver first and only
    // re-derive the candidates' shingles (the q45 move). Candidate
    // train ids are non-eval by construction (cand filters !is_eval).
    val trainSh = docs
      .join(broadcast(cand.select(col("train_id").as(idCol)).distinct()),
        Seq(idCol))
      .select(col(idCol).as("train_id"),
        explode(array_distinct(unitExpr)).as("shingle"))
    val inter = trainSh
      .join(broadcast(evalSh), "shingle")
      .groupBy("train_id", "eval_id").agg(count(lit(1)).as("inter"))
    val pairs = cand
      .join(broadcast(inter), Seq("train_id", "eval_id"), "left")
      .na.fill(0L, Seq("inter"))
      .withColumn("jaccard_micros",
        expr("inter * 1000000L div (n_tr + n_ev - inter)"))
    val w = Window.partitionBy(col("train_id"))
    pairs
      .withColumn("rn", row_number().over(
        w.orderBy(col("jaccard_micros").desc, col("eval_id"))))
      .withColumn("n_candidates", count(lit(1)).over(w))
      .where(col("rn") === 1)
      .select(col("train_id"), col("n_candidates"),
        col("eval_id").as("best_eval_id"), col("jaccard_micros"),
        (col("jaccard_micros") >= tauMicros).as("contaminated"))
  }

  /** T5-style SPAN CORRUPTION — the denoising-objective constructor of
    * encoder-decoder pretraining: contiguous token blocks are masked
    * out of the input (each replaced by one `<extra_id_j>` sentinel)
    * and become the target (each span prefixed by its sentinel), so
    * `(input_text, target_text)` is a ready training pair. Block
    * selection is DETERMINISTIC by construction rather than sampled:
    * token block b (of `blockLen` tokens) is masked iff
    * (b + id) % period == 0 — every doc masks ~1/period of its blocks
    * (the T5 15% corruption rate at period 7, blockLen 3 ≈ mean span
    * 3), the masked pattern varies per doc via the id offset, and the
    * sentinel ordinal has the closed form j = (b − b0)/period with
    * b0 = (−id) mod period — no scan, no state, every output byte
    * replayable by another engine. Map-only: one corpus scan, the
    * whole construction is array lambdas inside whole-stage codegen;
    * token-less docs are excluded (no pair to build). */
  def spanCorrupt(docs: DataFrame, idCol: String, textCol: String,
                  blockLen: Int = 3, period: Int = 7): DataFrame = {
    require(blockLen > 0 && period > 1,
      s"need blockLen > 0 and period > 1, got $blockLen/$period")
    val id = col(idCol).cast("long")
    val b0 = (lit(period.toLong) - pmod(id, lit(period.toLong))) % period
    // i is a non-negative int lambda variable: floor-div via double is
    // exact far past any real document length (< 2^53)
    def block(i: Column) = floor(i.cast("long") / blockLen).cast("long")
    def isMasked(i: Column) =
      pmod(block(i) + id, lit(period.toLong)) === 0
    def sentinel(i: Column) =
      concat(lit("<extra_id_"),
        floor((block(i) - b0) / period).cast("long").cast("string"), lit(">"))
    val toks = graft.text.Text.tokens(col(textCol))
    val inputArr = filter(
      transform(toks, (t, i) =>
        when(!isMasked(i), t)
          .when(i % blockLen === 0, sentinel(i))
          .otherwise(lit(null))),
      x => x.isNotNull)
    val targetArr = filter(
      transform(toks, (t, i) =>
        when(isMasked(i) && i % blockLen === 0,
          concat(sentinel(i), lit(" "), t))
          .when(isMasked(i), t)
          .otherwise(lit(null))),
      x => x.isNotNull)
    val nMasked = size(filter(
      transform(toks, (t, i) => when(isMasked(i), t).otherwise(lit(null))),
      x => x.isNotNull))
    docs.where(size(graft.text.Text.tokens(col(textCol))) > 0)
      .select(id.as("doc_id"),
        nMasked.cast("long").as("n_masked"),
        array_join(inputArr, " ").as("input_text"),
        array_join(targetArr, " ").as("target_text"))
  }

  /** PREFERENCE-PAIR construction — the DPO/reward-model data shape:
    * within each group (a prompt cluster; here any grouping column
    * set), the highest-quality document becomes `chosen` and the
    * lowest `rejected`, with the quality margin carried for filtering.
    * Ranking follows the repo's determinism convention — micro-scaled
    * ROUNDED score with the unique id as tiebreak — so the pick is
    * bit-stable and oracle-replayable (arg-pick via the same
    * score-then-id key on both engines). Groups with fewer than two
    * documents produce no pair; a group whose best and worst tie on
    * the rounded score still emits (margin 0) — the caller's filter
    * decides. One shuffle on the group key; each group reduces to two
    * arg-picks, never a sort of the whole corpus. */
  def preferencePairs(docs: DataFrame, groupCols: Seq[String],
                      idCol: String, textCol: String): DataFrame = {
    require(groupCols.nonEmpty, "preferencePairs needs grouping columns")
    val score = round(graft.text.Text.qualityScore(col(textCol)) * lit(1e6), 0)
      .cast("long")
    // composite arg-pick key: score·10¹² + (10¹²−1 − id) — max picks
    // (best score, then SMALLEST id), min picks (worst score, then
    // LARGEST id); the identical integer expression replays in the
    // oracle, with score ≤ 10⁶ micros the key stays well inside int64.
    // The key arithmetic is only an arg-pick when 0 ≤ id ≤ M and
    // score ≥ 0 — an id outside the domain would wrap into the score
    // digits and silently corrupt chosen/rejected/margin, so both are
    // CHECKED per row (raise_error, stays in codegen) like this
    // function's other preconditions.
    val M = 999999999999L
    val rawId = col(idCol).cast("long")
    val checkedId = when(rawId.isNull || rawId < 0 || rawId > M,
      raise_error(concat(
        lit(s"preferencePairs: $idCol outside [0, $M]: "),
        coalesce(rawId.cast("string"), lit("null")))).cast("long"))
      .otherwise(rawId)
    val checkedScore = when(score.isNull || score < 0,
      raise_error(concat(lit("preferencePairs: negative/null quality score: "),
        coalesce(score.cast("string"), lit("null")))).cast("long"))
      .otherwise(score)
    val scored = docs.select(
      groupCols.map(col) ++ Seq(
        (checkedScore * lit(1000000000000L) +
          (lit(M) - checkedId)).as("__k")): _*)
    scored.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        max(col("__k")).as("__kmax"), min(col("__k")).as("__kmin"))
      .where(col("n_docs") >= 2)
      .select(groupCols.map(col) ++ Seq(
        col("n_docs"),
        (lit(M) - pmod(col("__kmax"), lit(1000000000000L))).as("chosen_id"),
        (lit(M) - pmod(col("__kmin"), lit(1000000000000L))).as("rejected_id"),
        (expr("__kmax div 1000000000000L") -
          expr("__kmin div 1000000000000L")).as("margin_micros")): _*)
  }

  /** FILL-IN-THE-MIDDLE transform — the decoder-model sibling of
    * [[spanCorrupt]] (OpenAI FIM / StarCoder PSM format): the document
    * is cut at the deterministic third-boundaries p1 = ⌊n/3⌋,
    * p2 = ⌊2n/3⌋ and re-serialized as
    * `<fim_prefix> P <fim_suffix> S <fim_middle> M`, so the model
    * learns to produce the middle conditioned on both sides. Fixed
    * boundaries instead of sampled ones keep every output byte
    * oracle-replayable (list slices on both engines); docs under 3
    * tokens have no non-empty three-way cut and are excluded. Map-only
    * — one scan, array slices in codegen, zero exchanges. */
  def fimTransform(docs: DataFrame, idCol: String,
                   textCol: String): DataFrame = {
    val toks = graft.text.Text.tokens(col(textCol))
    val n = size(toks)
    // n is a non-negative int: floor-div via double is exact here
    val p1 = floor(n / 3.0).cast("int")
    val p2 = floor(n * 2.0 / 3.0).cast("int")
    docs.where(size(graft.text.Text.tokens(col(textCol))) >= 3)
      .select(col(idCol).cast("long").as("doc_id"),
        n.cast("long").as("n_tokens"),
        concat_ws(" ",
          lit("<fim_prefix>"), array_join(slice(toks, lit(1), p1), " "),
          lit("<fim_suffix>"),
          array_join(slice(toks, p2 + 1, n - p2), " "),
          lit("<fim_middle>"),
          array_join(slice(toks, p1 + 1, p2 - p1), " ")).as("fim_text"))
  }
}
