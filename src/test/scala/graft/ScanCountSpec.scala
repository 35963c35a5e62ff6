package graft

/** Plan-reuse regression gate: pins the number of parquet scans each
  * optimization-sensitive query plans. The LSVI globaal family and the
  * paired trend shapes were rewritten to single-chain aggregations
  * (round 9) precisely to stop Spark re-planning a shared subtree 2-3x
  * (no cross-branch exchange reuse in local mode); a refactor that
  * reintroduces a self-join or a second aggregation branch over the
  * same upstream shows up here as an extra scan of the base table.
  * Bounds are the measured post-rewrite counts — equality is not
  * required (an optimizer improvement may drop a scan), exceeding them
  * is the regression.
  */
class ScanCountSpec extends SparkSuite {
  private def scanCount(name: String): Int = {
    val plan = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      .queryExecution.sparkPlan.toString
    "file:[^\\]\\s]*/(\\w+)\\.parquet".r.findAllMatchIn(plan).size
  }

  /** Shuffle (non-broadcast) exchanges in the executed plan. */
  private def shuffleCount(name: String): Int = {
    val plan = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    "Exchange".r.findAllIn(plan).size -
      "BroadcastExchange".r.findAllIn(plan).size
  }

  test("single-chain globaal family plans a bounded number of scans") {
    assert(scanCount("q103_lsvi_forest_globaal") <= 2)
    assert(scanCount("q107_lsvi_heath_globaal") <= 2)
    assert(scanCount("q112_lsvi_streams_globaal") <= 3)
    // q78: the one globaal query on the *Versie3* ruleset — flagged
    // unpinned in r12 when its bench figure rode the ambient shift
    // (r13 bisect: 1.49s run alone vs r11's 1.54s, no code
    // regression). The plan audit DID find waste: prepareVoorwaarden's
    // num/cls union re-planned the habitat-join subtree twice (6 base
    // scans); the r13 single-chain rewrite brings it to 4 — one per
    // logical input stream (habitat twice: voorwaarden + sleutelsoort
    // branches), which is the reference's own table topology.
    assert(scanCount("q78_lsvi_v3_globaal") <= 4)
    assert(shuffleCount("q78_lsvi_v3_globaal") <= 4)
  }

  test("status/trend shapes stay single-chain") {
    assert(scanCount("q113_status_indicatoren") <= 2)
    assert(scanCount("q115_mc_nemar") <= 1)
    // r11 single-chain tail: aandeel + verschil from ONE explode over
    // the level-2 aggregate (was 4 scans / 8 shuffles as a union)
    assert(scanCount("q116_trend_indicatoren") <= 2)
    assert(shuffleCount("q116_trend_indicatoren") <= 4)
    assert(scanCount("q117_status_habitat") <= 1)
    assert(scanCount("q119_trend_index_hq") <= 1)
    assert(scanCount("q120_trend_index_ind") <= 2)
    assert(scanCount("q121_trend_habitat") <= 1)
    assert(scanCount("q122_status_beheer") <= 1)
  }

  test("the k-means final assignment plans one scan and one shuffle") {
    // q147: the iteration updates run eagerly at construction (bounded
    // k×dim collects); the RETURNED plan is one embeddings scan with
    // the broadcast-centroid argmin fused in, plus the stats groupBy
    assert(scanCount("q147_kmeans_clusters") <= 1)
    assert(shuffleCount("q147_kmeans_clusters") <= 1)
    // q148 SemDeDup rides q147's assignment three ways (flag-join left
    // side + both pair-join sides), each with its own cluster-keyed
    // exchange; the pair generation must stay an equi-join on the
    // cluster id — an all-pairs rewrite would explode the scan or
    // shuffle count (and PlanGuardSpec rejects the cartesian)
    assert(scanCount("q148_semantic_dedup") <= 3)
    assert(shuffleCount("q148_semantic_dedup") <= 6)
    // q149 linear probe: the GD iterations run eagerly at construction
    // (dim+1 bounded collects, one corpus scan each); the RETURNED
    // plan is one embeddings scan scored with broadcast weights plus
    // the per-label groupBy
    assert(scanCount("q149_linear_probe") <= 1)
    assert(shuffleCount("q149_linear_probe") <= 1)
    // q150 coreset sample: the assignment scan plus one cluster-keyed
    // exchange for the rank window
    assert(scanCount("q150_coreset_sample") <= 1)
    assert(shuffleCount("q150_coreset_sample") <= 2)
    // q152 dominant direction: the mean/power collects run eagerly at
    // construction; the returned plan projects with broadcast
    // direction state — one scan, one per-label groupBy exchange
    assert(scanCount("q152_dominant_direction") <= 1)
    assert(shuffleCount("q152_dominant_direction") <= 1)
    // q153 PCM features: map-only decode + explode, one per-doc groupBy
    assert(scanCount("q153_pcm_features") <= 1)
    assert(shuffleCount("q153_pcm_features") <= 1)
    // q155 curation funnel: q148's three embeddings scans + docs twice
    // (canon window broadcast side + the funnel probe side); a rewrite
    // that re-plans the SemDeDup subtree again would show here
    assert(scanCount("q155_curation_funnel") <= 5)
    assert(shuffleCount("q155_curation_funnel") <= 8)
    // q156 triplets: the pair join's two assignment sides (the reps
    // collect runs eagerly at construction); neg pick is a literal
    assert(scanCount("q156_contrastive_triplets") <= 3)
    assert(shuffleCount("q156_contrastive_triplets") <= 6)
    // q159 PQ codes: the training iterations run eagerly at
    // construction (one scan + one k×dim exchange each); the RETURNED
    // per-vector plan is map-only — broadcast codebooks fused into m
    // argmins, ZERO shuffles
    assert(scanCount("q159_pq_codes") <= 1)
    assert(shuffleCount("q159_pq_codes") === 0)
    // q160 ADC search: corpus scan + broadcast queries scan; the
    // scored cross-product never shuffles — only the partial top-k
    // aggregate and the global rank window exchange
    assert(scanCount("q160_pq_search") <= 2)
    assert(shuffleCount("q160_pq_search") <= 3)
    // q161 dup spans: ONE corpus scan (the exploded span set is never
    // recomputed or joined back); exchanges = (key,id) group with
    // map-side combine + key window + per-doc rollup
    assert(scanCount("q161_dup_spans") <= 1)
    assert(shuffleCount("q161_dup_spans") <= 3)
    // q162 IVFADC: training eager at construction; the returned plan
    // is corpus scan + queries scan, coarse assign/residual/PQ codes
    // all map-side, probed queries BROADCAST into the cell join —
    // shuffles are only the partial top-k + global rank (q160's tail)
    assert(scanCount("q162_ivfpq_search") <= 2)
    assert(shuffleCount("q162_ivfpq_search") <= 3)
    // q164 rerank: q162's two scans + one extra CORPUS scan and one
    // extra (tiny) QUERIES scan for the exact pass — deliberately NOT
    // threading qv through the ADC candidate set, which would widen
    // the one genuinely large intermediate by dim doubles per row;
    // shortlist and queries broadcast into the corpus scan, so the
    // corpus still never shuffles; exchanges = partial top-k +
    // shortlist rank + final rank windows
    assert(scanCount("q164_ivfpq_rerank") <= 4)
    assert(shuffleCount("q164_ivfpq_rerank") <= 3)
    // q165 temperature mixture: the histogram collects eagerly at
    // construction (g rows); the returned plan is q83's — one scan,
    // literal weight map, map-only explode, ZERO shuffles
    assert(scanCount("q165_temperature_mixture") <= 1)
    assert(shuffleCount("q165_temperature_mixture") === 0)
    // q166 SQ8: min/max train eager at construction (dim rows);
    // returned plan is map-only off broadcast literals
    assert(scanCount("q166_sq8_quantize") <= 1)
    assert(shuffleCount("q166_sq8_quantize") === 0)
    // q167 retrieval E2E: q164's plan + the documents scan the tiny
    // hit set broadcasts into — no new shuffles
    assert(scanCount("q167_retrieval_e2e") <= 5)
    assert(shuffleCount("q167_retrieval_e2e") <= 3)
    // q168 tokenizer E2E: merge learning + the bucketOffsets collect
    // run eagerly at construction; the RETURNED plan is one documents
    // scan through the fused segment kernel, the per-doc count
    // exchange, and the pid-bucketed packing window (offsets
    // broadcast) — a regression to the per-merge projection fold or a
    // global-sort packing window would show as extra depth here
    assert(scanCount("q168_tokenizer_e2e") <= 2)
    assert(shuffleCount("q168_tokenizer_e2e") <= 3)
    // q170 typo canonical: the corpus is scanned ONCE (eagerly, into
    // the vocab localCheckpoint); every plan branch reads the
    // dictionary-sized vocab RDD — a parquet scan reappearing here
    // means a branch re-planned the corpus tokenize
    assert(scanCount("q170_typo_canonical") === 0)
    // q171 chunking: one scan, map-only (explode + slice), no shuffle
    assert(scanCount("q171_doc_chunking") <= 1)
    assert(shuffleCount("q171_doc_chunking") === 0)
    // q172 quality probe: GD iterations run eagerly (k+1-row collects);
    // the returned scoring plan is scan + broadcast weights, no shuffle
    assert(scanCount("q172_quality_probe") <= 2)
    assert(shuffleCount("q172_quality_probe") === 0)
    // q175 unimax: corpus collapses to the checkpointed L-row
    // aggregate; everything after is dictionary-sized window math
    assert(scanCount("q175_unimax_alloc") === 0)
    // q176 bitext: two directional scoring passes (each corpus scan +
    // broadcast queries = 2 scans), f_sum rides the rank window's own
    // partitioning — a groupBy+join formulation re-planned the forward
    // pass to 6 scans
    assert(scanCount("q176_bitext_margin") <= 4)
    // q177 gopher: one map-only projection
    assert(scanCount("q177_gopher_rules") <= 1)
    assert(shuffleCount("q177_gopher_rules") === 0)
    // q178 ccnet: the tf inverted-index intermediate checkpoints once;
    // vocab/total derive from it (was 3 corpus scans)
    assert(scanCount("q178_ccnet_buckets") === 0)
    assert(shuffleCount("q178_ccnet_buckets") <= 4)
    // q179 fertility: segmentation scan + word-count scan, both
    // collapsing map-side to language-sized aggregates
    assert(scanCount("q179_tokenizer_fertility") <= 2)
    assert(shuffleCount("q179_tokenizer_fertility") <= 3)
    // q180 length batches: map-side bucket arithmetic, one bucket-key
    // exchange for the per-bucket rank windows + batch aggregate
    assert(scanCount("q180_length_batches") <= 1)
    assert(shuffleCount("q180_length_batches") <= 1)
    // q184 incremental dedup: base fp aggregate + delta window + join
    assert(scanCount("q184_incremental_dedup") <= 2)
    assert(shuffleCount("q184_incremental_dedup") <= 3)
    // q185 hamming: q50's scaffold on two longs per vector
    assert(scanCount("q185_hamming_topk") <= 2)
    assert(shuffleCount("q185_hamming_topk") <= 2)
    // q186 PMI: both count tables checkpoint; broadcast joins +
    // partial top-n leave NOTHING to shuffle
    assert(scanCount("q186_pmi_collocations") === 0)
    assert(shuffleCount("q186_pmi_collocations") === 0)
    // q188 BM25: inverted index checkpoints once; scoring is joins
    // over it + one (query, doc) aggregation + rank
    assert(scanCount("q188_bm25_search") === 0)
    assert(shuffleCount("q188_bm25_search") <= 5)
    // q189 RRF: two fused systems' scans only; fusion layer is
    // top-k-list-sized
    assert(scanCount("q189_rrf_fusion") <= 4)
    assert(shuffleCount("q189_rrf_fusion") <= 4)
    // q190 bloom decontam: train scan + bench scan (the bloom build
    // side collected eagerly at construction); the corpus-side
    // shuffle carries only bloom survivors into the exact verify join
    // + the per-doc count-distinct
    assert(scanCount("q190_bloom_decontam") <= 3)
    assert(shuffleCount("q190_bloom_decontam") <= 4)
    // q191 repetition rules: nine fused run-scans in ONE map-only
    // projection — any shuffle here means the per-doc mode regressed
    // to a corpus-wide groupBy
    assert(scanCount("q191_repetition_rules") <= 1)
    assert(shuffleCount("q191_repetition_rules") === 0)
    // q193 span removal: THREE documents scans — span totals, the
    // dup-span join-back, and the token reassembly (the Lee et al.
    // multi-pass topology; each pass is map-side span/position work,
    // and checkpointing the corpus-scale span set would cost more
    // than the re-scan). Shuffles carry (span|id, pos) tuples + the
    // final per-doc rebuild.
    assert(scanCount("q193_dup_span_removal") <= 3)
    assert(shuffleCount("q193_dup_span_removal") <= 6)
    // q194 char entropy: one kernel projection, map-only
    assert(scanCount("q194_char_entropy") <= 1)
    assert(shuffleCount("q194_char_entropy") === 0)
  }

  test("gate/audit/bitext queries (q198-q203) keep bounded scans and shuffles") {
    // q198 blocklist: ONE map-only Aho–Corasick kernel projection —
    // the phrase list ships as a single codegen reference object, so
    // plan size, scan count and shuffle count are all independent of
    // the list size (a contains() disjunction rewrite would still be
    // 1 scan but the m-probe cost regression shows in bench, and any
    // groupBy rewrite shows here)
    assert(scanCount("q198_blocklist_filter") <= 1)
    assert(shuffleCount("q198_blocklist_filter") === 0)
    // q199 length trim: histogram groupBy (one row per distinct
    // (lang, n_chars) — the ONLY corpus-scale shuffle) + its CDF
    // window on histogram rows; thresholds BROADCAST back onto the
    // second documents scan. A percent_rank rewrite would sort every
    // language's full partition (the dominant-language skew trap) and
    // show as an extra corpus-keyed shuffle.
    assert(scanCount("q199_length_trim") <= 2)
    assert(shuffleCount("q199_length_trim") <= 2)
    // q200 PSI: one events scan collapsing to the category-sized
    // conditional aggregate (2-phase) + the grand-total window over
    // category rows only
    assert(scanCount("q200_drift_psi") <= 1)
    assert(shuffleCount("q200_drift_psi") <= 2)
    // q201 rank AUC: q199's histogram-CDF recipe — the corpus shuffle
    // carries one row per distinct (source, score_micros), then the
    // CDF window + final fold run on histogram rows
    assert(scanCount("q201_quality_auc") <= 1)
    assert(shuffleCount("q201_quality_auc") <= 2)
    // q202 fuzzy decontam: the signature pass + the candidate
    // re-shingle pass (pruned by a broadcast semi-join on candidate
    // ids) — the eval side broadcasts at every step and the corpus
    // NEVER self-joins; the checkpointed candidate sliver keeps the
    // three downstream uses from replaying the signature pass
    assert(scanCount("q202_fuzzy_decontam") <= 2)
    assert(shuffleCount("q202_fuzzy_decontam") <= 3)
    // q204 calibration audit: q201's histogram recipe — one scan,
    // the corpus shuffle carries <= sources x nBins rows, the ECE
    // windows run on bin rows
    assert(scanCount("q204_calibration_audit") <= 1)
    assert(shuffleCount("q204_calibration_audit") <= 2)
    // q205 streaming drift: the REPORT plan scans events parquet once
    // (the reference profile); the streamed side reads the memory
    // sink; shuffles are the reference count, the profile join and
    // the category-sized windows
    assert(scanCount("q205_drift_stream") <= 1)
    assert(shuffleCount("q205_drift_stream") <= 3)
    // q203 bounded-probe bitext: per direction one coded-corpus scan,
    // one probe scan and two raw-vector rerank scans (8 total);
    // shuffles are rankTopK's partial/global pairs + the margin
    // layer, all shortlist-sized. The defining property vs q176: the
    // brute-force cross term never plans (no corpus×corpus cosine).
    assert(scanCount("q203_bitext_margin_ivf") <= 8)
    assert(shuffleCount("q203_bitext_margin_ivf") <= 8)
    // q206 indexed bitext: the coded scans move to the written
    // cell-partitioned indexes (pruned by the probed-cell IN filter,
    // not counted by the parquet-file regex), leaving 6 raw-vector
    // scans (probe + two rerank sides per direction); shuffles stay
    // q203's shortlist-sized set
    assert(scanCount("q206_bitext_indexed") <= 6)
    assert(shuffleCount("q206_bitext_indexed") <= 8)
    // q207 full-train bitext E2E: q203's topology with BOTH
    // directions' coarse+PQ trainings in-query — training collects are
    // bounded (kc×dim / m×k×dsub) and run eagerly at construction, so
    // the plannable tail is exactly q203's serving shape
    assert(scanCount("q207_bitext_train_e2e") <= 8)
    assert(shuffleCount("q207_bitext_train_e2e") <= 8)
  }

  test("the group-any window plans one scan and one shuffle") {
    // q146: per-customer window (1 exchange), deterministic row-subset
    // filter applied after it — a rewrite through a join or a second
    // aggregation would show here
    assert(scanCount("q146_group_any_flag") <= 1)
    assert(shuffleCount("q146_group_any_flag") <= 1)
  }

  test("new shape/pipeline queries keep bounded shuffle counts") {
    // q121: pairing agg (countDistinct = 2-phase) + strata agg;
    // q122: latest agg + beheer agg + window; q123: only the final
    // distinct shuffles (PIP + dictionaries broadcast); q124: one
    // 2-phase countDistinct aggregation
    assert(shuffleCount("q121_trend_habitat") <= 3)
    assert(shuffleCount("q122_status_beheer") <= 3)
    assert(shuffleCount("q123_extra_vars_msa") <= 1)
    assert(shuffleCount("q124_coord_paired_check") <= 2)
  }

  test("census/continuous shapes keep bounded scans and shuffles") {
    // q125/q126: ONE scan — the roll-up rides the per-subtype
    // aggregate as an exploded shard instead of a second branch
    // (a union re-plans the whole chain per branch); q128: one scan
    // per cycle — the campaign year rides the census aggregation.
    assert(scanCount("q125_status_continuous") <= 1)
    assert(shuffleCount("q125_status_continuous") <= 4)
    assert(scanCount("q126_trend_continuous") <= 1)
    assert(shuffleCount("q126_trend_continuous") <= 5)
    assert(scanCount("q127_status_area_census") <= 1)
    assert(shuffleCount("q127_status_area_census") <= 1)
    assert(scanCount("q128_trend_area_census") <= 2)
    assert(shuffleCount("q128_trend_area_census") <= 4)
    // q129: two scans by design — assignCycles re-scans the base for
    // the stratum-start dictionary and broadcasts it, which at scale
    // beats the alternative (a full-data window shuffle on subtype);
    // pairing countDistinct(cycle) is the only 2-phase aggregation
    assert(scanCount("q129_trend_habitat_cycles") <= 2)
    assert(shuffleCount("q129_trend_habitat_cycles") <= 4)
  }

  test("dedup family keeps bounded scans and shuffles") {
    // Bounds are the measured shapes of the ROUND-17 md5-arithmetic
    // forms (the r12 comments described the xxhash64 forms these
    // queries no longer execute):
    //   q38 winnow picks: one documents scan through the native
    //     winnow_picks_md5 generator (map-only), then the per-doc
    //     stats aggregation — 2 shuffles (partial/final);
    //   q44 signatures: ONE map-only documents scan since round 19 —
    //     both fused kernels (Md5SimHash32 + Md5MinhashSig) compute
    //     side by side in a single projection, so the r18 join of two
    //     scans (PLANS.md called its second scan "the price of
    //     emitting BOTH families") is gone entirely;
    //   q45 minhash: one documents scan to MAP-SIDE md5 signatures
    //     (the fused Md5MinhashSig kernel — no signature aggregation
    //     shuffle) + band explode; candidates checkpoint at
    //     construction and the verify joins broadcast, CC edges
    //     resolve driver-side below the 2^20 cap — no shuffle
    //     exchange in the final plan;
    //   q46 blocked jaccard: shingle-set build + length-block self-join
    //     (broadcast) + exact-verify;
    //   q47 simhash: one documents scan to 32-bit md5 signatures;
    //     4×8-bit band edges + Hamming verify resolve like q45's CC —
    //     no shuffle exchange in the final plan;
    //   q105 winnow canonical: fingerprint scan + broadcast doc->rep
    //     resolve, no shuffle;
    //   q106 dedup stream: batch tail only (the streaming replay runs
    //     before this plan exists) — the cross-band min resolve over
    //     the memory sink is pinned by shuffle count, scans are 0.
    for ((q, s, sh) <- Seq(
        ("q38_docs_winnow", 1, 2),
        ("q44_docs_signatures", 1, 0),
        ("q45_minhash_neardups", 1, 0),
        ("q46_blocked_jaccard", 4, 0),
        ("q47_simhash_neardups", 1, 0),
        ("q105_winnow_canonical", 1, 0))) {
      assert(scanCount(q) <= s, s"$q scans")
      assert(shuffleCount(q) <= sh, s"$q shuffles")
    }
    info("dedup plan counts: " + Seq("q38_docs_winnow",
      "q44_docs_signatures", "q45_minhash_neardups",
      "q46_blocked_jaccard", "q47_simhash_neardups",
      "q105_winnow_canonical")
      .map(q => s"$q=${scanCount(q)}/${shuffleCount(q)}").mkString(", "))
    // q106 invoked ONCE (its construction replays the stream); only the
    // batch resolve tail is plannable here
    val plan106 = SparkEntry.queries("q106_dedup_stream")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    val sh106 = "Exchange".r.findAllIn(plan106).size -
      "BroadcastExchange".r.findAllIn(plan106).size
    assert(sh106 <= 2, s"q106 resolve-tail shuffles: $sh106")
  }

  /** Scans of a given file-source format in the (pre-AQE) spark plan —
    * the q209/q210/q212 sources read json/orc, which the parquet-file
    * regex of [[scanCount]] cannot see. */
  private def formatScanCount(name: String, fmt: String): Int = {
    val plan = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      .queryExecution.sparkPlan.toString
    s"FileScan $fmt".r.findAllIn(plan).size
  }

  test("interchange round trips and the ingest-audit twins keep their pinned plans") {
    // q209/q210: the returned plan is ONE scan of the round-tripped
    // shards collapsing to the per-(lang, source) report — a second
    // scan or a second exchange means the checksum aggregate regressed
    // to a join or a re-read
    assert(formatScanCount("q209_jsonl_ingest", "json") <= 1)
    assert(shuffleCount("q209_jsonl_ingest") <= 1)
    assert(formatScanCount("q210_orc_roundtrip", "orc") <= 1)
    assert(shuffleCount("q210_orc_roundtrip") <= 1)
    // q211 is q208's plan with different split/score columns — the
    // fused 1-scan/2-shuffle audit (EvalSpec pins q208's counts and
    // the standalone-audit equality); pin the claimed plan IDENTITY
    // directly: same physical node sequence, same counts
    def nodeShape(name: String): Seq[String] =
      SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
        .queryExecution.sparkPlan.collect { case p => p.nodeName }
    assert(nodeShape("q211_ingest_audit_drift") === nodeShape("q208_ingest_audit"))
    assert(scanCount("q211_ingest_audit_drift") <= 1)
    assert(shuffleCount("q211_ingest_audit_drift") <= 2)
    // q218 (round 19): the container frame-sample + resize chain is
    // map-only — generate, per-frame decode, explode, filter and the
    // typed resize pass all ride one documents scan, no exchange
    assert(scanCount("q218_gif_frame_sample") <= 1)
    assert(shuffleCount("q218_gif_frame_sample") === 0)
    // q215/q216 (round 19): same one-scan contract for the raw-text
    // and audited-CSV round trips
    assert(formatScanCount("q215_rawtext_ingest", "text") <= 1)
    assert(shuffleCount("q215_rawtext_ingest") <= 1)
    assert(formatScanCount("q216_csv2_audit", "csv") <= 1)
    assert(shuffleCount("q216_csv2_audit") <= 1)
    // q212: the JSONL-fed admission E2E — the delivery is read by the
    // audit aggregate plus twice by the admission chain (the fresh
    // subtree re-plans for both its uses, q100's own topology); the
    // corpus parquet feeds the fingerprint projection, the union head
    // and the bench shingle sides. A jump here means a subtree
    // re-planned again or the audit regressed to extra passes.
    assert(formatScanCount("q212_jsonl_corpus_e2e", "json") <= 3)
    assert(scanCount("q212_jsonl_corpus_e2e") <= 4)
    assert(shuffleCount("q212_jsonl_corpus_e2e") <= 8)
  }

  test("token-shard export and the spectral kernel keep their pinned plans") {
    // q219: pack/write run eagerly at construction (their documented
    // cost is the two-exchange repack: offsets join + shard exchange);
    // the RETURNED plan re-reads the written shards only — one
    // binaryFile scan through the fused token_shard_stats kernel with
    // the bounded manifest broadcast-joined in, zero parquet scans,
    // zero shuffles. A parquet scan or exchange here means the
    // verification pass regressed to re-deriving from the corpus.
    assert(formatScanCount("q219_token_shards", "binaryFile") <= 1)
    assert(scanCount("q219_token_shards") === 0)
    assert(shuffleCount("q219_token_shards") === 0)
    // q232: the whole release (gates → mixture → pack → write →
    // verifyManifest gate) runs eagerly at construction — the
    // RETURNED plan is q219's shape: one binaryFile scan through the
    // stats kernel, zero parquet scans, zero shuffles. The
    // construction-side shape (gates cached once, text planned twice)
    // is pinned structurally in PretrainReleaseSpec.
    assert(formatScanCount("q232_pretrain_release", "binaryFile") <= 1)
    assert(scanCount("q232_pretrain_release") === 0)
    assert(shuffleCount("q232_pretrain_release") === 0)
    // q235: both drops' packs/writes run eagerly; the returned plan is
    // the union of the two read-backs — two binaryFile scans, zero
    // parquet scans, zero shuffles
    assert(formatScanCount("q235_release_delta", "binaryFile") <= 2)
    assert(scanCount("q235_release_delta") === 0)
    assert(shuffleCount("q235_release_delta") === 0)
    // q236: the sequence count is one eager bounded scalar; the
    // RETURNED manifest plan is a parallel range — zero parquet scans,
    // one window re-cluster per epoch
    assert(scanCount("q236_release_epoch_order") === 0)
    assert(shuffleCount("q236_release_epoch_order") <= 2)
    // q237: the funnel counts run eagerly as ids-only aggregates; the
    // returned one-row frame is local
    assert(scanCount("q237_release_funnel") === 0)
    assert(shuffleCount("q237_release_funnel") === 0)
    // q234: the lazy card plan — the gate chain's three logical corpus
    // inputs (gated projection, contamination train side, bench
    // shingles) plus the cost projection; exchanges are the fp window,
    // the shingle/anti joins, the copies join and the group aggregate.
    // More scans/exchanges means a gate subtree re-planned.
    assert(scanCount("q234_release_data_card") <= 4)
    assert(shuffleCount("q234_release_data_card") <= 6)
    // q213 (convention-completeness, r19 judge ask): the compaction
    // runs eagerly; the returned probe plan reads the compacted index
    // parquet once and spends its two exchanges on the ADC shortlist +
    // top-k — a third exchange or second scan means the probe
    // regressed to re-deriving from the corpus
    assert(scanCount("q213_ivfpq_index_compact") <= 1)
    assert(shuffleCount("q213_ivfpq_index_compact") <= 2)
    // q214/q218 (same ask): the GIF container decode and the
    // frame-sample/resize E2E are ONE documents scan through the fused
    // media kernels, map-only — any exchange means frame rasters
    // started travelling
    assert(scanCount("q214_gif_container_decode") <= 1)
    assert(shuffleCount("q214_gif_container_decode") === 0)
    assert(scanCount("q218_gif_frame_sample") <= 1)
    assert(shuffleCount("q218_gif_frame_sample") === 0)
    // q220: the single-bin DFT is map-only (per-window structs, never
    // waveform bytes, reach the aggregate) — one documents scan, one
    // per-media exchange
    assert(scanCount("q220_pcm_spectral") <= 1)
    assert(shuffleCount("q220_pcm_spectral") <= 1)
    // q221: the avro-core parse is an RDD boundary (no spark-avro
    // connector in the jar set), so the returned plan is the ExistingRDD
    // scan + the one report exchange — zero parquet scans (the write
    // runs eagerly), and column pruning happens at PARSE time via the
    // Avro reader schema rather than in Catalyst (AvroSpec pins it)
    assert(scanCount("q221_avro_roundtrip") === 0)
    assert(shuffleCount("q221_avro_roundtrip") <= 1)
    // q222: snapshot diff — each version is its own scan (two, from
    // the same base table here) collapsed map-side to (key, digest);
    // one exchange per side feeds the full outer join. A third scan or
    // extra exchange means a fingerprint subtree re-planned.
    assert(scanCount("q222_snapshot_diff") <= 2)
    assert(shuffleCount("q222_snapshot_diff") <= 2)
    // q224: the feed is materialized at construction (the shipped CDC
    // artifact), so the RETURNED apply plan is old + written feed: one
    // base-table scan, the feed's key anti-join broadcast, one report
    // exchange. The first cut that applied the UNmaterialized feed
    // planned 11 scans — this pin is what keeps that from returning.
    assert(scanCount("q224_cdc_roundtrip") <= 1)
    assert(shuffleCount("q224_cdc_roundtrip") <= 1)
    // q225: the doc-spans sidecar stays at DOC grain — two scans (the
    // ids side + the cost side of the offsets join) and the one
    // doc-grain exchange; a token-grain formulation would show up as
    // extra exchanges of the exploded stream
    assert(scanCount("q225_shard_doc_spans") <= 2)
    assert(shuffleCount("q225_shard_doc_spans") <= 2)
    // q226: span corruption is pure array lambdas — one scan, ZERO
    // exchanges; any shuffle means the construction left codegen
    assert(scanCount("q226_span_corruption") <= 1)
    assert(shuffleCount("q226_span_corruption") === 0)
    // q227: the per-doc audit reads the batch (flags pass), the dedup
    // subtree for contamination, the corpus fingerprints and the bench
    // — 4 scans / 5 exchanges measured; a jump means a gate started
    // re-deriving a subtree per reason
    assert(scanCount("q227_ingest_rejection_audit") <= 4)
    assert(shuffleCount("q227_ingest_rejection_audit") <= 5)
    // q228: FIM is array slices — one scan, zero exchanges
    assert(scanCount("q228_fim_transform") <= 1)
    assert(shuffleCount("q228_fim_transform") === 0)
    // q230: transcripts ride one events scan and one (user, session)
    // exchange chain — sessionize, truncate window and the final
    // group share the user partitioning
    assert(scanCount("q230_sft_transcripts") <= 1)
    assert(shuffleCount("q230_sft_transcripts") <= 2)
    // q231: preference pairs collapse to max/min of one composite key
    // — one scan, one group exchange, never a corpus sort
    assert(scanCount("q231_preference_pairs") <= 1)
    assert(shuffleCount("q231_preference_pairs") <= 1)
  }

  test("weighted estimators plan like their unweighted siblings") {
    // the weighted overloads swap counts for Σw aggregates in the SAME
    // single-chain shape — still one scan, latest-per-point + stratum
    // aggregation (+ the window-free closed-form interval)
    assert(scanCount("q130_status_habitat_weighted") <= 1)
    assert(shuffleCount("q130_status_habitat_weighted") <= 2)
    assert(scanCount("q131_index_hq_weighted") <= 1)
    assert(shuffleCount("q131_index_hq_weighted") <= 2)
    // q132-q135 (round 11): same contract for the remaining weighted
    // overloads — identical pairing/join shapes to q121/q113/q118/q116
    // with Σw/Σw² riding the same aggregations, so the same bounds hold
    assert(scanCount("q132_trend_habitat_weighted") <= 1)
    assert(shuffleCount("q132_trend_habitat_weighted") <= 3)
    assert(scanCount("q133_status_indicatoren_weighted") <= 2)
    assert(shuffleCount("q133_status_indicatoren_weighted") <= 3)
    assert(scanCount("q134_index_ind_weighted") <= 2)
    assert(shuffleCount("q134_index_ind_weighted") <= 3)
    // q135 mirrors q116's r11 single-chain tail: 2 scans / 4 shuffles
    // (was 4/8 as a two-branch union re-planning the pairing subtree)
    assert(scanCount("q135_trend_indicatoren_weighted") <= 2)
    assert(shuffleCount("q135_trend_indicatoren_weighted") <= 4)
    // q136/q137: single-chain cycle pivots like q119/q120 — the
    // weighted sums ride the same pairing aggregation
    assert(scanCount("q136_trend_index_hq_weighted") <= 1)
    assert(shuffleCount("q136_trend_index_hq_weighted") <= 3)
    assert(scanCount("q137_trend_index_ind_weighted") <= 2)
    assert(shuffleCount("q137_trend_index_ind_weighted") <= 4)
    // q138 composes assignCycles (q129's 2-scan broadcast-dictionary
    // trade) with the weighted pairing — same bounds as q129
    assert(scanCount("q138_trend_habitat_cycles_weighted") <= 2)
    assert(shuffleCount("q138_trend_habitat_cycles_weighted") <= 4)
    // q140/q141 (r12): the weighted continuous overloads keep the
    // q125/q126 single-chain shape — Σw moments ride the same
    // latest/pair aggregation and the same exploded roll-up
    assert(scanCount("q140_status_continuous_weighted") <= 1)
    assert(shuffleCount("q140_status_continuous_weighted") <= 4)
    assert(scanCount("q141_trend_continuous_weighted") <= 1)
    assert(shuffleCount("q141_trend_continuous_weighted") <= 5)
  }
}
