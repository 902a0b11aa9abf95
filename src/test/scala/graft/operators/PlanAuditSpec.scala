package graft.operators

import graft.{SparkSpec, SparkSuite}

/** Pins the plan shapes the round-3 review flagged and round 4 fixed — a
  * regression here is a silent 5-10× slowdown at scale, invisible to the
  * row-level oracle. */
class PlanAuditSpec extends SparkSuite {

  test("d_agg_approx: no Expand (mixed distinct aggregates must not replicate the scan)") {
    val plan = FormatOps.dAggApprox(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"),
      s"exact+approx count-distinct regressed to an Expand plan:\n$plan")
  }

  test("d_agg_approx: scan is pruned to the key column") {
    val plan = FormatOps.dAggApprox(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_partkey") && !readSchema.contains("l_quantity"),
      s"scan must read only l_partkey:\n$readSchema")
  }

  test("g_kpl_roundtrip: no whole-group materialization (collect_list) in the plan") {
    val df = PipelineQueries.gKplRoundtrip(spark, SparkSpec.sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("collect_list"),
      s"packing regressed to whole-group collect_list (unbounded memory at scale):\n$plan")
    assert(plan.contains("MapPartitions") || plan.contains("mapPartitions"),
      s"expected the streaming per-partition fold:\n$plan")
    assert(df.collect().map(_.getLong(1)).sum > 0)
  }

  test("h_lang_heuristic: text is tokenized once per row, not once per HOF") {
    val plan = LlmOps.hLangHeuristic(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    val splits = "split\\(".r.findAllIn(plan).length
    assert(splits <= 1, s"split(text) appears $splits times — tokenize-once hoist regressed:\n$plan")
  }

  test("h_neardup_embedding: banded equi-join, and dimension filters push to the parquet scan") {
    val df = LlmOps.hNeardupEmbedding(spark, SparkSpec.sf0001)
    val plan = df.queryExecution.executedPlan.toString
    // the candidate join must be a hash/merge equi-join on band keys
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("h_ann_ivf: centroid assignment is scan-local (no Exchange keyed on vec_id)") {
    // round 4 assigned centroids via row_number() over the n×16 cross —
    // two full exchanges keyed on vec_id; the array_sort form does it
    // map-side. Only the 16-row centroid collect and the final per-query
    // window may shuffle.
    val plan = LlmOps.hAnnIvf(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning(vec_id"),
      s"IVF assignment regressed to a vec_id-keyed shuffle:\n$plan")
  }

  test("h_ivfpq_codes: residual coding is scan-local end-to-end (no vec_id exchange)") {
    // the composed index must keep both stages map-side: coarse assignment
    // broadcasts the centroid row, PQ coding broadcasts the 8 codebook
    // rows; only the tiny collects and the 128-key histogram may shuffle
    val plan = LlmOps.hIvfPqCodes(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning(vec_id"),
      s"IVF-PQ regressed to a vec_id-keyed shuffle:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"IVF-PQ must broadcast the codebooks, not cartesian:\n$plan")
  }

  test("a_dpp_prune: the fact scan carries a dynamic partition-pruning subquery") {
    // the dim filter is only knowable at runtime, so the fact scan's
    // PartitionFilters must include a dynamicpruningexpression fed from
    // the broadcast dim — without it a 100 TB partitioned fact is read in
    // full and filtered after IO
    val plan = FormatOps.aDppPrune(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected a dynamic partition-pruning subquery on the fact scan:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"the dim side must broadcast:\n$plan")
  }

  test("h_dedup_incremental: candidates via band equi-joins only (batch-scaled, never history²)") {
    // the incremental contract: history pairs only with batch through the
    // band index — a cartesian/BNLJ anywhere here means the batch dedup
    // degenerated to the all-pairs scan the operator exists to avoid
    val plan = LlmOps.hDedupIncremental(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"incremental dedup must join on band keys, not cross:\n$plan")
  }

  test("h_tokenize_ids: the vocab apply-join broadcasts (tokenization is scan-local)") {
    // the trained vocab is tiny; if the apply pass ever shuffles the
    // exploded token stream to meet the vocab, tokenizing 100 TB costs a
    // corpus-sized exchange instead of none
    val plan = LlmOps.hTokenizeIds(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftOuter"),
      s"vocab must broadcast to the token stream:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the apply join must not shuffle the token stream:\n$plan")
  }

  test("a_zorder_layout: clustering key is a scan-local projection (no sort, no window)") {
    // the Morton key must be derived as arithmetic on the scan against the
    // broadcast 1-row extremes — a global sort or window here would be a
    // full-corpus exchange that the layout operator exists to avoid (file
    // assignment is by z-RANGE, not by rank)
    val df = FormatOps.aZorderLayout(spark, SparkSpec.sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"z-bucketing must not need a window:\n$plan")
    assert(plan.contains("zorder2"), s"expected the codegen zorder2 projection:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"the 1-row extremes must broadcast:\n$plan")
    // exactly one row-bearing shuffle: the 64-key bucket aggregate (the
    // extremes agg exchanges 1 row; the tail range-partition sorts 64)
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_partkey") && !readSchema.contains("l_quantity"),
      s"scan must be pruned to the two layout keys:\n$readSchema")
  }

  test("h_ivfpq_search: ADC ranking joins broadcast LUTs, corpus stays scan-local") {
    // query-time contract: db coding is scan-local against broadcast
    // centroid/codebook collects, the 20 LUT rows broadcast to the
    // candidate join on the coarse list id — the corpus must never hash
    // on vec_id or cross-join anything its own size
    val plan = LlmOps.hIvfPqSearch(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    graft.operators.Checkpoints.releaseAll()
    assert(!plan.contains("hashpartitioning(vec_id"),
      s"IVF-PQ search regressed to a vec_id-keyed shuffle:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"IVF-PQ search must broadcast LUTs/codebooks, not cartesian:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"expected the LUT-side broadcast candidate join:\n$plan")
    // round 17: the code build is the checkpointed ivfpq_db; the returned
    // plan reads embeddings only for the 10-row query panel
    val scans = plan.split("embeddings.parquet").length - 1
    assert(scans <= 1,
      s"expected only the vec_id<10 panel scan, got $scans corpus reads:\n$plan")
  }

  test("g_session_window: exactly one hash Exchange (user_id), reused downstream") {
    // the islands form must shuffle once on user_id and reuse that layout
    // for the lag window, the running-sum window, and the final aggregate —
    // a second user_id exchange means the windows stopped sharing layout
    val plan = PipelineQueries.gSessionWindow(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(user_id"),
      s"sessionization must partition by user_id:\n$plan")
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashExchanges == 1,
      s"expected exactly 1 hash Exchange (user_id, reused), got $hashExchanges:\n$plan")
  }

  test("g_interval_join: equi-join on user_id with residual range, never a cross product") {
    val plan = PipelineQueries.gIntervalJoin(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"interval join fell back to an O(n^2) physical plan:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"),
      s"expected a hash/merge equi-join on user_id:\n$plan")
  }

  test("c_join_asof: union-and-carry plans one user_id exchange and NO join operator") {
    // the naive as-of formulation is a theta-join (p.ts <= c.ts) that
    // degenerates to per-key quadratic work; the carry form must stay a
    // single partition-sort-window pipeline
    val plan = ScaleOps.cJoinAsof(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    assert(plan.contains("Window"), s"expected the carry-forward window:\n$plan")
    val userExchanges = "Exchange hashpartitioning\\(user_id".r.findAllIn(plan).length
    assert(userExchanges == 1,
      s"expected exactly 1 user_id Exchange (shared by union+window), got $userExchanges:\n$plan")
  }

  test("c_join_bloom: bloom filter prunes the fact side BELOW the shuffle join") {
    val plan = ScaleOps.cJoinBloom(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"merge hint must force SMJ:\n$plan")
    val lines = plan.linesIterator.toVector
    val joinAt = lines.indexWhere(_.contains("SortMergeJoin"))
    val probeAt = lines.indexWhere(l => l.contains("Filter") && l.contains("might_contain"))
    assert(joinAt >= 0 && probeAt > joinAt,
      s"bloom probe filter must sit in the join's input (fact pruned pre-shuffle):\n$plan")
    // the probe must be the native codegen'd expression, not a Scala UDF
    // (a UDF is a codegen barrier on exactly the scan the filter thins)
    assert(!lines.exists(l => l.contains("Filter") && l.contains("UDF")),
      s"fact-side probe must not be a Scala UDF:\n$plan")
  }

  test("c_join_right: the shipdate filter reaches the fact scan below the outer join") {
    // right-preservation must not block pushdown on the non-preserved side:
    // the lineitem predicate belongs in the parquet scan, not above the join
    val plan = RelationalQueries.cJoinRight(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate"),
      s"l_shipdate filter must push into the lineitem scan:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"right join must stay an equi-join:\n$plan")
  }

  test("h_dedup_spans: both gaps-and-islands windows share ONE doc_id exchange") {
    // is_start (max-over-preceding) and span_no (running sum) both partition
    // by doc_id order by i — a second Exchange would mean the window specs
    // diverged and the marked stream shuffles twice
    val plan = TrainingOps.hDedupSpans(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    val docExchanges = "Exchange hashpartitioning\\(doc_id".r.findAllIn(plan).length
    assert(docExchanges == 1,
      s"expected exactly 1 doc_id Exchange shared by both windows, got $docExchanges:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"span marking must stay a gram-keyed equi-join:\n$plan")
  }

  test("q3_shipping: top-10 runs as TakeOrderedAndProject, not global sort") {
    val plan = RelationalQueries.q3Shipping(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"ORDER BY + LIMIT 10 must plan per-partition top-k:\n$plan")
  }

  test("c_join_inner: both dimension tables broadcast") {
    val plan = RelationalQueries.cJoinInner(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(broadcasts >= 2,
      s"expected ≥2 BroadcastHashJoin (customer, nation dims), got $broadcasts:\n$plan")
  }

  test("a_partitioned_prune: the partition filter resolves at planning time") {
    // a 100 TB corpus partitioned by source/date must touch only matching
    // directories — the predicate belongs in PartitionFilters (pruned
    // before any file is opened), not in a post-scan Filter
    val plan = FormatOps.aPartitionedPrune(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("event_type"),
      s"event_type must prune as a PartitionFilter:\n$plan")
    assert(!plan.contains("PushedFilters: [IsNotNull(event_type)"),
      s"partition predicate leaked into data filters:\n$plan")
  }

  test("b_subquery: correlated subqueries decorrelate (no per-row re-scan shapes)") {
    val plan = RelationalQueries.bSubquery(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"correlated subquery fell back to an O(n^2) physical plan:\n$plan")
    assert(plan.contains("LeftSemi"), s"EXISTS must plan as a semi join:\n$plan")
  }

  test("q18_top: semi join against the aggregated filter set, top-100 as TakeOrderedAndProject") {
    val plan = RelationalQueries.q18Top(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"),
      s"the big-order filter must stay a semi join (carries one bigint column):\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"ORDER BY + LIMIT 100 must plan per-partition top-k:\n$plan")
  }

  test("h_semdedup: assignment is scan-local; the only corpus shuffle keys on c_id") {
    // SemDeDup's whole point is bounding pair volume to Σ|cluster|²: the
    // corpus must never cross-join itself or hash on vec_id — centroids
    // broadcast as one collected row, and the within-cluster self-join is
    // the single c_id-keyed exchange
    val plan = LlmOps.hSemDedup(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"corpus-sized cartesian in the semantic dedup:\n$plan")
    assert(!plan.contains("hashpartitioning(vec_id"),
      s"assignment must not exchange on vec_id:\n$plan")
    assert(plan.contains("hashpartitioning(c_id"),
      s"expected the within-cluster self-join keyed on c_id:\n$plan")
  }

  test("h_dedup_bloom: the probe is a scan-local filter, never a join against history") {
    // the operator's whole value is that the batch classifies against a
    // broadcast-sized sketch: the flagged column must come from a
    // BloomFilterMightContain filter/projection on the batch scan — the
    // only join in the plan is the exact-truth side on the 64-bit key
    val plan = LlmOps.hDedupBloom(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"expected the codegen bloom probe in the batch scan stage:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"bloom pass must not cross-join:\n$plan")
  }

  test("h_corpus_diff: one doc_id-keyed full outer join, text never joins") {
    val plan = TrainingOps.hCorpusDiff(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("FullOuter"), s"snapshot diff needs the full outer join:\n$plan")
    // classification compares 64-bit hashes computed below the join —
    // the join itself must key on doc_id only
    assert(plan.linesIterator.filter(_.contains("SortMergeJoin")).forall(_.contains("doc_id")),
      s"the diff join must key on doc_id:\n$plan")
  }

  test("g_event_funnel: stage scans are type-pruned and every join keys on user_id") {
    val plan = AnalyticsOps.gEventFunnel(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.linesIterator.exists(l => l.contains("PushedFilters") && l.contains("event_type")),
      s"the per-stage event_type filter must reach the parquet scan:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"funnel stages must stay equi-joins on user_id:\n$plan")
  }

  test("g_gap_fill: dense axis generated, sparse side pre-aggregated below the join") {
    val plan = AnalyticsOps.gGapFill(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Generate explode"),
      s"the hour axis must come from sequence+explode, not a self-join:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"gap fill must not cross-join the axis:\n$plan")
  }

  test("d_regression: one aggregate pass, scan pruned to the three used columns") {
    val plan = AnalyticsOps.dRegression(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"),
      s"the six-moment reduction must stay a single-pass aggregate:\n$plan")
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_quantity") && readSchema.contains("l_extendedprice") &&
      !readSchema.contains("l_orderkey"),
      s"scan must read exactly the regression columns:\n$readSchema")
  }

  test("a_compaction_bins: the cumulative-sum window partitions by month (no global sort)") {
    val plan = AnalyticsOps.aCompactionBins(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    val windowLines = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windowLines.nonEmpty && windowLines.forall(_.contains("month")),
      s"bin assignment must stay per-month parallel:\n$plan")
  }

  test("h_inverted_index: partial-aggregated, top-50 as TakeOrderedAndProject, lists never materialize") {
    val plan = AnalyticsOps.hInvertedIndex(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-50 must plan per-partition top-k, not a global sort:\n$plan")
    assert(!plan.contains("collect_list"),
      s"posting lists must stay distributed:\n$plan")
  }

  test("h_corpus_merge: one doc_id-keyed full outer join resolves the merge") {
    val plan = AnalyticsOps.hCorpusMerge(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("FullOuter"), s"merge needs the full outer join:\n$plan")
    assert(plan.linesIterator.filter(_.contains("SortMergeJoin")).forall(_.contains("doc_id")),
      s"the merge join must key on doc_id:\n$plan")
  }

  test("h_stratified_sample: rank filter plans as WindowGroupLimit (map-side top-k per stratum)") {
    val plan = TrainingOps.hStratifiedSample(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    // rn <= 10 must push a partial group-limit below the window exchange:
    // each map task forwards only its local top-10 per (lang, source), so
    // the shuffle carries O(k·strata·tasks), never the corpus
    assert(plan.contains("WindowGroupLimit"),
      s"the rank filter must plan as WindowGroupLimit, not a full stratum sort:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("h_token_budget_mix: running sum is bucket-local, never a bare-lang corpus window") {
    val plan = TrainingOps.hTokenBudgetMix(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    // The skewed-key scale killer is `SUM(toks) OVER (PARTITION BY lang
    // ORDER BY draw, ...)`: one task sorts the dominant language's entire
    // corpus. The two-pass plan must window the corpus only over
    // (lang, bkt) — so every window spec that orders by `draw` has to
    // carry `bkt` in its partition key. (The tiny per-bucket offset
    // window partitions by lang alone but orders by bkt, not draw.)
    val draws = plan.linesIterator
      .filter(l => l.contains("windowspecdefinition") && l.contains("draw")).toSeq
    assert(draws.nonEmpty, s"expected the bucket-local running-sum window:\n$plan")
    assert(draws.forall(_.contains("bkt")),
      s"corpus running sum regressed to a bare-lang window partition:\n$plan")
    // offsets and budgets must come back as broadcasts, not corpus shuffles
    assert(plan.contains("BroadcastHashJoin"),
      s"offset/budget tables must broadcast-join back to the corpus:\n$plan")
  }

  test("h_minhash_calibration: block equi-joins only, no per-pair array_intersect") {
    val df = TrainingOps.hMinhashCalibration(spark, SparkSpec.sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"pair generation must ride the (lang, blk) equi-join:\n$plan")
    assert(!plan.contains("array_intersect"),
      s"the exact intersection must come from the gram co-occurrence join:\n$plan")
  }

  test("h_chunking: embarrassingly parallel — no join/window, exchanges only for the lang aggregate") {
    val plan = TrainingOps.hChunking(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Window"),
      s"chunking must stay a scan-local explode + slice:\n$plan")
    val shuffles = plan.linesIterator.filter(_.contains("hashpartitioning(")).toSeq
    assert(shuffles.forall(_.contains("lang")),
      s"every exchange must belong to the per-lang accounting aggregate:\n$plan")
  }

  test("h_bm25: top-k windows plan as WindowGroupLimit, corpus explodes at most twice") {
    val plan = CorpusOps.hBm25(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    // both rn <= k filters (query-term pick, per-lang doc ranking) must
    // push a partial group-limit below their window exchange — without it
    // the doc ranking sorts every scoring doc of the dominant language in
    // one task
    assert(plan.linesIterator.count(_.contains("WindowGroupLimit")) >= 2,
      s"both rank filters must plan as WindowGroupLimit top-k:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"scoring must ride (lang, term) equi-joins:\n$plan")
    // dl folds into the tf aggregate and the lang stats scan is
    // explode-free: the corpus may expand through Generate at most twice
    // (df pass + scoring pass) — a third means a CTE re-inlined
    val generates = plan.linesIterator.count(_.trim.startsWith("Generate"))
    assert(generates <= 2, s"corpus exploded $generates times (budget 2):\n$plan")
  }

  test("h_quality_ensemble: scan-local gates — no join/window, one lang-keyed aggregate") {
    val plan = CorpusOps.hQualityEnsemble(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Window"),
      s"the gate cascade must stay scan-local:\n$plan")
    val shuffles = plan.linesIterator.filter(_.contains("hashpartitioning(")).toSeq
    assert(shuffles.forall(_.contains("lang")),
      s"every exchange must belong to the (lang, verdict) aggregate:\n$plan")
  }

  test("g_attribution: union-and-carry — no join operator, exchanges only on user_id/day") {
    val plan = AnalyticsOps.gAttribution(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"),
      s"attribution must stay a carry window, never an event-pair join:\n$plan")
    val shuffles = plan.linesIterator.filter(_.contains("hashpartitioning(")).toSeq
    // the day key plans as an unnamed grouping expression (tus DIV 86.4e9)
    assert(shuffles.forall(l =>
        l.contains("user_id") || l.contains("day") || l.contains("_groupingexpression")),
      s"exchanges must be the user timeline and the day rollup only:\n$plan")
  }

  test("h_shard_rebalance: the 9x weight blow-up collapses map-side — no join, no window") {
    val plan = CorpusOps.hShardRebalance(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Window"),
      s"both shard argmaxes must ride the one doc-keyed aggregate:\n$plan")
    // partial aggregation must sit between the explode and the exchange,
    // so the shuffle carries one row per doc, not nine
    assert(plan.contains("partial_"),
      s"expected map-side partial aggregation under the explode:\n$plan")
  }

  test("h_hard_negatives: query side broadcasts; ranking is WindowGroupLimit top-k") {
    val plan = CorpusOps.hHardNegatives(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"the 10-row query set must broadcast onto the base scan:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"scoring must never plan a cartesian:\n$plan")
    assert(plan.contains("WindowGroupLimit"),
      s"the rn <= 3 filter must plan as a group limit:\n$plan")
  }

  test("h_tokenizer_compat: both vocab rankings are WindowGroupLimit over the checkpointed frequency table") {
    val df = CorpusOps.hTokenizerCompat(spark, SparkSpec.sf0001)
    try {
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.linesIterator.count(_.contains("WindowGroupLimit")) >= 2,
        s"both rn <= 64 filters must plan as map-side top-k:\n$plan")
      // the frequency table is checkpointed: the scoring query may explode
      // the corpus once, but the two ranking windows must read ExistingRDD
      val generates = plan.linesIterator.count(_.trim.startsWith("Generate"))
      assert(generates <= 1, s"vocab build re-expanded the corpus:\n$plan")
      assert(plan.contains("ExistingRDD"),
        s"expected the checkpointed frequency table:\n$plan")
    } finally Checkpoints.releaseAll()
  }

  test("h_cosine_calibration: pair sweep reads the checkpointed signature table, block equi-join only") {
    val df = CorpusOps.hCosineCalibration(spark, SparkSpec.sf0001)
    try {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
        s"pair generation must ride the blk equi-join:\n$plan")
      // the projection pipeline ran once at checkpoint build: the pair
      // query itself must not re-explode anything
      assert(!plan.linesIterator.exists(_.trim.startsWith("Generate")),
        s"pair sweep re-expanded the projection pipeline:\n$plan")
      assert(plan.contains("ExistingRDD"),
        s"expected the checkpointed signature table:\n$plan")
    } finally Checkpoints.releaseAll()
  }

  test("h_repeat_epochs: corpus is scanned once — the allocation runs on the checkpointed lang table") {
    val df = CorpusOps.hRepeatEpochs(spark, SparkSpec.sf0001)
    try {
      val plan = df.queryExecution.executedPlan.toString
      // the four CTE consumers (weights, totals, first pass, pool) must
      // all read the langs-row checkpoint, never re-expand the corpus scan
      assert(!plan.contains("Scan parquet"),
        s"allocation re-expanded into a corpus rescan:\n$plan")
      assert(plan.contains("ExistingRDD"),
        s"expected the checkpointed per-lang table:\n$plan")
    } finally Checkpoints.releaseAll()
  }

  test("h_dataset_card: top-lang rank is WindowGroupLimit; card join broadcasts") {
    val plan = ProfileOps.hDatasetCard(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"the rn = 1 top-lang filter must plan as a map-side group limit:\n$plan")
    assert(plan.contains("BroadcastHashJoin") && !plan.contains("SortMergeJoin"),
      s"the source-keyed card join must broadcast (both sides are |sources|-row):\n$plan")
  }

  test("h_embedding_drift: pure aggregation cascade — no window, one explode") {
    val plan = ProfileOps.hEmbeddingDrift(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"drift must ride (label, half, dim)-keyed aggregates, not a window:\n$plan")
    val generates = plan.linesIterator.count(_.contains("Generate "))
    assert(generates <= 1,
      s"the dim explode ran $generates times — centroid path re-expanded:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"no pairwise work belongs in a centroid audit:\n$plan")
  }

  test("h_embed_outliers: median is histogram-selection, not a corpus window sort") {
    val plan = ProfileOps.hEmbedOutliers(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    // the cumulative window must consume the (label, nrm2) histogram
    // aggregate — a row_number over the raw vectors would single-task-sort
    // the dominant label at scale (the h_token_budget_mix failure mode)
    assert(plan.linesIterator.exists(l =>
        l.contains("HashAggregate(keys=[label") && l.contains("nrm2")),
      s"expected the (label, nrm2) histogram under the selection window:\n$plan")
    assert(!plan.contains("row_number"),
      s"median regressed to a per-vector rank sort:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"the |labels|-row median table must broadcast onto the flag scan:\n$plan")
  }

  test("h_lsh_balance: plane projection is scan-local constant dot products; no join, no explode") {
    val plan = ProfileOps.hLshBalance(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    // round 20: the 8x64 sign matrix folded to constant plane literals —
    // the bucket id is 8 codegen dot_products in the scan projection, so
    // NO join of any kind and no dim explode may appear
    assert(!plan.contains("Join") && !plan.contains("CartesianProduct"),
      s"bucket census must not join anything (planes are constants):\n$plan")
    assert(!plan.linesIterator.exists(_.trim.startsWith("Generate")),
      s"the dim explode must be gone (projection is per-row):\n$plan")
    assert(plan.contains("dot_product"),
      s"expected constant-plane dot products in the scan projection:\n$plan")
  }

  test("g_top_paths: rn <= 4 plans as WindowGroupLimit; top-20 is TakeOrdered over the census") {
    val plan = AnalyticsOps.gTopPaths(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"the per-user rn <= 4 filter must forward <=4 rows per user map-side:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"the global top-20 must be TakeOrdered over the bounded path census, not a full sort:\n$plan")
  }

  test("g_bot_regularity: one per-user window, then pure aggregation") {
    val plan = AnalyticsOps.gBotRegularity(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    val windows = plan.linesIterator.count(_.contains("Window ["))
    assert(windows == 1,
      s"expected exactly the per-user lag window, got $windows:\n$plan")
    assert(!plan.contains("Join"),
      s"the CV census must ride user-keyed aggregation, no joins:\n$plan")
  }

  test("h_dim_variance: dim-keyed aggregation; the share window runs over the 64-row dim table") {
    val df = ProfileOps.hDimVariance(spark, SparkSpec.sf0001)
    val plan = df.queryExecution.executedPlan.toString
    val generates = plan.linesIterator.count(_.contains("Generate "))
    assert(generates == 1, s"expected one dim explode, got $generates:\n$plan")
    assert(plan.linesIterator.exists(l =>
        l.contains("HashAggregate(keys=[dim") || l.contains("HashAggregate(keys=[i")),
      s"expected the (dim)-keyed sum aggregate under the share window:\n$plan")
  }

  test("h_ann_recall: assignment/scoring stay broadcast; no corpus self-join") {
    val plan = LlmOps.hAnnRecall(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      s"every join must broadcast (centroids, probes, the 20-query panel):\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"the brute arm must be a broadcast nested loop over the panel, not a cartesian:\n$plan")
  }

  test("a_zonemap_skip: zone probe is aggregation-shaped — no window, bounded explodes") {
    val plan = FormatOps.aZonemapSkip(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"zone maps and match counts must be plain aggregates:\n$plan")
    val generates = plan.linesIterator.count(_.contains("Generate "))
    assert(generates <= 2,
      s"expected the layout tag + year axis explodes only, got $generates:\n$plan")
  }

  test("g_funnel_timing: quantiles are histogram selection over (stage, lag_min), not a rank sort") {
    val plan = AnalyticsOps.gFunnelTiming(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
        l.contains("HashAggregate(keys=[stage") && l.contains("lag_min")),
      s"expected the (stage, lag_min) histogram under the selection window:\n$plan")
    assert(!plan.contains("row_number"),
      s"quantiles regressed to a per-user rank sort:\n$plan")
  }

  test("h_source_overlap: final reshape consumes the checkpointed pair table — no corpus re-expansion") {
    try {
      val plan = CorpusOps.hSourceOverlap(spark, SparkSpec.sf0001)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Generate "),
        s"the gram explode leaked past the checkpoint (the 4-pass re-inline bug):\n$plan")
      assert(!plan.contains("CartesianProduct"),
        s"the pair reshape must be equi-joins on the tiny table:\n$plan")
    } finally Checkpoints.releaseAll()
  }

  test("h_sampling_bias: stratified rank is WindowGroupLimit; one conditional count pass") {
    val plan = ProfileOps.hSamplingBias(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"the rn <= 10 stratified filter must forward map-side top-k:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"all post-aggregate joins are domain-sized and must broadcast:\n$plan")
  }

  test("h_class_margin: scoring consumes the checkpointed centroid table — no explode in the final plan") {
    try {
      val plan = ProfileOps.hClassMargin(spark, SparkSpec.sf0001)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Generate "),
        s"the centroid dim explode leaked past the checkpoint:\n$plan")
      assert(!plan.contains("SortMergeJoin"),
        s"the labels-row centroid join must broadcast:\n$plan")
    } finally Checkpoints.releaseAll()
  }

  test("g_changepoint: all windows run over the (type, day) histogram aggregate") {
    val plan = AnalyticsOps.gChangepoint(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
        l.contains("HashAggregate(keys=[event_type") && l.contains("day")),
      s"expected the (event_type, day) histogram under the CUSUM windows:\n$plan")
    assert(!plan.contains("Join"),
      s"the detector is one scan + windows over the histogram, no joins:\n$plan")
  }

  test("h_cluster_purity: assignment is broadcast-argmin; no vector-keyed shuffle joins") {
    val plan = LlmOps.hClusterPurity(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      s"every join must broadcast (centroid collects, rank tables):\n$plan")
  }

  test("h_padding_waste: pure map-reduce — one explode, no window, no join") {
    val plan = TrainingOps.hPaddingWaste(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.contains("Join"),
      s"the waste curve is one conditional aggregate:\n$plan")
    val generates = plan.linesIterator.count(_.contains("Generate "))
    assert(generates == 1, s"expected only the 4-element ctx axis explode, got $generates:\n$plan")
  }

  test("g_active_users: recency fold — no joins, one bounded explode over the user-day table") {
    val plan = AnalyticsOps.gActiveUsers(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"),
      s"DAU/WAU/MAU must fall out of one fold, not range self-joins:\n$plan")
    val generates = plan.linesIterator.count(_.contains("Generate "))
    assert(generates == 1,
      s"expected only the x30 membership explode over the DISTINCT user-day table, got $generates:\n$plan")
    assert(!plan.contains("Window"),
      s"no window needed — recency is min(gap) in a hash aggregate:\n$plan")
  }

  test("h_langid_confusion: profile broadcasts onto held-out words; ranks are WindowGroupLimit") {
    val plan = LlmOps.hLangidConfusion(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"the top-50 profile rank and the per-doc argmax must group-limit map-side:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"the <=langs*50-row profile must broadcast onto the held-out scan:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"classification is an equi-join on the word key:\n$plan")
  }

  test("g_markov_transitions: one corpus window; the row total is a window over the tiny count table, not a join") {
    val plan = AnalyticsOps.gMarkovTransitions(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"),
      s"the prev-total must ride a window over cnt, not a re-inlining self-join:\n$plan")
    val windows = plan.linesIterator.count(_.contains("Window ["))
    assert(windows == 2,
      s"expected exactly the per-user lag window + the |types|²-row total window, got $windows:\n$plan")
  }

  test("a_column_stats_approx: the sketch arm is un-Expanded (one Expand total, from the exact arm)") {
    val plan = FormatOps.aColumnStatsApprox(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    // the query's whole argument: HLL sketches are PLAIN aggregates, so
    // the sketch pass must not replicate the scan the way the exact
    // multi-distinct arm does — exactly one Expand in the combined plan
    val expands = plan.linesIterator.count(l => l.trim.stripPrefix("+- ").stripPrefix(": ")
      .dropWhile(c => !c.isLetter).startsWith("Expand"))
    assert(expands == 1,
      s"expected ONE Expand (exact arm only), got $expands:\n$plan")
  }

  test("g_active_users_approx: no window operator; day-sketch explode rides the domain table") {
    val plan = AnalyticsOps.gActiveUsersApprox(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window ["),
      s"all three trailing ranges must fall out of FILTERed union aggregates, not windows:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"exact and sketch arms combine by a day equi-join:\n$plan")
  }

  test("h_pq_recall: both rankings group-limit map-side; no cartesian anywhere") {
    val df = LlmOps.hPqRecall(spark, SparkSpec.sf0001)
    try {
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("WindowGroupLimit"),
        s"the top-3 ranks must push partial group limits below their exchanges:\n$plan")
      assert(!plan.contains("CartesianProduct"),
        s"candidate scoring joins on c_id / vec_id, never all-pairs:\n$plan")
      // the corpus code build lives in the checkpointed ivfpq_db (one
      // pass); the returned plan may read embeddings only for the 10-row
      // query panel — a corpus-wide scan here means the round-16 shape
      // (two re-inlined code builds + an exact-arm corpus join, 6 scans,
      // the suite's heaviest repeated floor) crept back
      val scans = plan.split("embeddings.parquet").length - 1
      assert(scans <= 2,
        s"expected only the vec_id<10 panel scans, got $scans corpus reads:\n$plan")
      assert(plan.contains("Scan ExistingRDD"),
        s"expected the checkpointed code table as the candidate source:\n$plan")
    } finally Checkpoints.releaseAll()
  }

  test("h_ivf_staleness: one posexplode chain, no second corpus pass for the counts") {
    val plan = LlmOps.hIvfStaleness(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"assignment must ride the broadcast centroid array:\n$plan")
    // counts fold into the (c_id, i) dimension-sum aggregate — a second
    // Generate chain over the corpus (beyond the centroid-training one and
    // the dimension explode) would mean the assigned CTE re-inlined
    val generates = plan.linesIterator.count(l => l.trim.stripPrefix("+- ").stripPrefix(": ")
      .dropWhile(c => !c.isLetter).startsWith("Generate"))
    assert(generates <= 2,
      s"expected at most the training posexplode + the dims explode, got $generates:\n$plan")
  }

  test("h_ivf_retrain: the retrain fold adds no corpus pass to the audit plan") {
    val plan = LlmOps.hIvfRetrain(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"assignment must ride the broadcast centroid array:\n$plan")
    // the drift arithmetic folds into the audit's own (c_id, i) aggregate
    // via the 16×64 stale-centroid explode — the corpus-sized dims chain
    // must appear ONCE (the naive flag-subquery formulation re-inlined it:
    // 27 exchanges, multiple corpus Generates). Budget: the training
    // posexplode (×2 — the sample-sized centroid chain is consumed by both
    // assignment and the drift join), the dims explode, and the
    // centroid-explode Generate — all but dims are 16-to-1024-row work.
    val generates = plan.linesIterator.count(l => l.trim.stripPrefix("+- ").stripPrefix(": ")
      .dropWhile(c => !c.isLetter).startsWith("Generate"))
    assert(generates <= 4,
      s"expected sample/centroid explodes + ONE corpus dims explode, got $generates:\n$plan")
    // scan fan-out: 7 at HEAD — the audit's own scans plus two for the
    // duplicated sample chain, all but one carrying the pushed
    // `vec_id < 256` / `< 16` sample filters that row-group pruning
    // bounds; pin so a regression to full re-inlining (the 27-exchange
    // naive form planned corpus-sized scans) fails loudly
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans <= 7, s"unexpected scan fan-out ($scans):\n$plan")
  }

  test("g_scd2_state: one user_id hash Exchange shared by both windows and the interval aggregate") {
    // lag window, running-sum window, (user_id, version) group-by, and the
    // lead window must all ride ONE user_id partitioning — a second hash
    // exchange means the gaps-and-islands chain stopped sharing layout
    val plan = AnalyticsOps.gScd2State(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(user_id"),
      s"SCD2 build must partition by user_id:\n$plan")
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashExchanges == 1,
      s"expected exactly 1 hash Exchange (user_id, reused), got $hashExchanges:\n$plan")
    assert(!plan.contains("Join"), s"islands need no join:\n$plan")
  }

  test("d_histogram_eqdepth: selection rides the checkpointed histogram; all joins broadcast") {
    val plan = RelationalQueries.dHistogramEqdepth(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    try {
      // every consumer must read the materialized cents histogram, never
      // re-derive it from orders — zero parquet scans in the final plan
      assert(!plan.contains("Scan parquet"),
        s"a consumer re-derived the histogram from the orders scan:\n$plan")
      // boundary probes are ≤16-row build sides: broadcast, never shuffled
      // or sorted joins
      assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
        s"boundary joins must broadcast their 16-row side:\n$plan")
      assert(!plan.contains("CartesianProduct"),
        s"the bucket-assignment cross must be a broadcast loop, not a cartesian:\n$plan")
    } finally Checkpoints.releaseAll()
  }

  test("h_pmi_collocations: per-lang rank is WindowGroupLimit; unigram lookups are equi-joins") {
    val plan = CorpusOps.hPmiCollocations(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"top-15 must fold map-side before the exchange:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"unigram lookups must stay (lang, word) equi-joins:\n$plan")
  }

  test("q4_priority: the EXISTS decorrelates to one LeftSemi join, no per-row rescan") {
    val plan = RelationalQueries.q4Priority(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"),
      s"correlated EXISTS must decorrelate to a left-semi join:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"the date residual must ride the orderkey equi-join:\n$plan")
    assert("Scan parquet".r.findAllIn(plan).length == 2,
      s"expected exactly one scan per table (orders, lineitem):\n$plan")
  }

  test("q10_returns: top-20 runs as TakeOrderedAndProject, not global sort") {
    val plan = RelationalQueries.q10Returns(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected a per-partition top-20 fold:\n$plan")
    // the quarter and returnflag cuts must reach their parquet scans
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate")
      || plan.contains("GreaterThanOrEqual(o_orderdate"),
      s"order-date filter did not push to the scan:\n$plan")
    assert(plan.contains("EqualTo(l_returnflag,R)"),
      s"returnflag filter did not push to the scan:\n$plan")
  }

  test("q7_volume: both nation roles broadcast; the cross-half cut is a residual, not a cartesian") {
    val plan = RelationalQueries.q7Volume(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"nation pairing must never expand to all-pairs:\n$plan")
    assert("BroadcastExchange".r.findAllIn(plan).length >= 2,
      s"expected the nation dim broadcast under both aliases:\n$plan")
  }

  test("h_simjoin_prefix: gram-keyed candidates, doc-keyed verification, no cartesian") {
    val plan = TrainingOps.hSimjoinPrefix(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    try {
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
        s"prefix filtering must never expand to all-pairs:\n$plan")
      // the checkpointed shingle/rank tables feed every consumer — the
      // final plan must not re-derive them from the documents scan
      assert(!plan.contains("Scan parquet"),
        s"a consumer re-derived the gram tables from the corpus scan:\n$plan")
    } finally Checkpoints.releaseAll()
  }

  test("q19_disjunct: the OR factors out the partkey equi-join — never a nested loop") {
    val plan = RelationalQueries.q19Disjunct(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"the disjunction must ride the extracted p_partkey = l_partkey key:\n$plan")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      s"expected an equi-join with the OR as residual:\n$plan")
  }

  test("q14_promo: the ship-year filter reaches the lineitem scan below the part join") {
    val plan = RelationalQueries.q14Promo(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(l_shipdate") || plan.contains("l_shipdate >="),
      s"ship-year filter did not push below the join:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"join must key on partkey:\n$plan")
  }

  test("q22_global_sales: scalar AVG pushes to the scan; NOT EXISTS is a LeftAnti join") {
    val plan = RelationalQueries.q22GlobalSales(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"),
      s"NOT EXISTS must decorrelate to a left-anti join on custkey:\n$plan")
    // the 1-row average lands INSIDE the customer scan's pushed filters —
    // the strongest form of the scalar-subquery broadcast
    assert(plan.contains("GreaterThan(c_acctbal,ScalarSubquery"),
      s"the scalar AVG subquery did not push into the scan filter:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no all-pairs shapes:\n$plan")
  }

  test("q15_top_supplier: argmax filter is a scalar subquery over the rollup, never a rescan loop") {
    val plan = RelationalQueries.q15TopSupplier(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"the max() comparison must broadcast as a scalar subquery:\n$plan")
    // both revenue derivations aggregate the QUARTER-pruned scan: the
    // ship-date bounds reach every lineitem scan in the plan
    val scans = plan.linesIterator.filter(_.contains("PushedFilters")).toSeq
      .filter(_.contains("l_shipdate"))
    assert(scans.nonEmpty && scans.forall(_.contains("GreaterThanOrEqual(l_shipdate")),
      s"quarter filter missing from a lineitem scan:\n$plan")
  }

  test("q6_forecast: all three predicates reach the scan; the plan is join-free") {
    // the default 100-char metadata truncation cuts PushedFilters mid-list
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    val plan =
      try RelationalQueries.q6Forecast(spark, SparkSpec.sf0001)
        .queryExecution.executedPlan.toString
      finally spark.conf.unset("spark.sql.maxMetadataStringLength")
    // the whole query is one scan + one agg: any join node means the plan
    // re-derived something it should not have
    assert(!plan.contains("Join"), s"q6 must be join-free:\n$plan")
    val scan = plan.linesIterator.filter(_.contains("PushedFilters")).toSeq
    assert(scan.nonEmpty && scan.forall(l =>
      l.contains("GreaterThanOrEqual(l_shipdate") &&
        l.contains("LessThan(l_shipdate") &&
        l.contains("GreaterThanOrEqual(l_discount") &&
        l.contains("LessThanOrEqual(l_discount") &&
        l.contains("LessThan(l_quantity")),
      s"q6's predicates must all reach the parquet reader:\n$plan")
  }

  test("q12_late_lines: equi-join on orderkey with the lateness predicate post-join") {
    val plan = RelationalQueries.q12LateLines(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    // the non-equi lateness comparison must NOT demote the join to a
    // nested-loop — the orderkey equi-condition drives the join, the
    // 90-day comparison evaluates as a residual on matched rows
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"lateness must be a residual on the orderkey equi-join:\n$plan")
    val li = plan.linesIterator.filter(l =>
      l.contains("PushedFilters") && l.contains("l_shipdate")).toSeq
    assert(li.nonEmpty && li.forall(_.contains("GreaterThanOrEqual(l_shipdate")),
      s"the 1997 ship-year band must prune the lineitem scan:\n$plan")
  }

  test("q13_custdist: the ON-clause exclusion pushes to the orders scan under the outer join") {
    val plan = RelationalQueries.q13CustDist(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    // LEFT JOIN with the predicate in ON: the filter applies to the
    // null-producing side only, so it is pushable into the orders scan —
    // a post-join Filter here would break the zero-order customers
    val orders = plan.linesIterator.filter(l =>
      l.contains("PushedFilters") && l.contains("o_orderpriority")).toSeq
    assert(orders.nonEmpty && orders.forall(_.contains("Not(EqualTo(o_orderpriority")),
      s"exclusion predicate must reach the orders scan:\n$plan")
    assert(plan.contains("LeftOuter"), s"outer join lost:\n$plan")
  }

  test("q17_small_qty: correlated AVG decorrelates; the brand band prunes the part scan") {
    val plan = RelationalQueries.q17SmallQty(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"per-part average must be a decorrelated aggregate join:\n$plan")
    val part = plan.linesIterator.filter(l =>
      l.contains("PushedFilters") && l.contains("p_brand")).toSeq
    assert(part.nonEmpty && part.forall(l => l.contains("In(p_brand") && l.contains("EqualTo(p_type")),
      s"brand/type band must prune the part scan:\n$plan")
  }

  test("q2_min_cost: correlated min decorrelates over the checkpointed offers; EU dim broadcasts") {
    val plan =
      try RelationalQueries.q2MinCost(spark, SparkSpec.sf0001)
        .queryExecution.executedPlan.toString
      finally Checkpoints.releaseAll()
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"the per-part min must be a decorrelated aggregate join:\n$plan")
    // the offer table is checkpointed: the FINAL plan must never rescan
    // lineitem — both the outer offers and the correlated min read the RDD
    assert(!plan.contains("lineitem.parquet"),
      s"final plan re-derived the offer aggregate from lineitem:\n$plan")
    assert(plan.split("Scan ExistingRDD").length - 1 == 2,
      s"expected exactly two readers of the checkpointed offer table:\n$plan")
    // the 3-table EU snowflake is a dim — it must reach the join as a
    // broadcast, never a shuffled SMJ against the offer table
    assert(plan.contains("BroadcastHashJoin [suppkey") || plan.contains("BroadcastHashJoin [o.suppkey") ||
      plan.linesIterator.exists(l => l.contains("BroadcastHashJoin") && l.contains("s_suppkey")),
      s"EU supplier dim must broadcast:\n$plan")
  }

  test("q11_important_stock: ONE totals derivation broadcast back over the rollup") {
    val plan = RelationalQueries.q11ImportantStock(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    // the 1-row totals side joins as a broadcast nested loop (the
    // f_keyset_page pattern: a 1-row boundary broadcast is not a risk)
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"totals must broadcast:\n$plan")
    // vbp has two consumers (outer rows + totals): the region-pruned
    // lineitem join aggregates at most twice — a third derivation means
    // the scalar count/sum split into separate subqueries
    assert(plan.split("lineitem.parquet").length - 1 <= 2,
      s"expected at most two vbp derivations:\n$plan")
  }

  test("q16_supplier_cnt: NOT IN plans as a plain left-anti join, never null-aware nested loop") {
    val plan = RelationalQueries.q16SupplierCnt(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), s"NOT IN must become an anti join:\n$plan")
    // s_suppkey is non-null, so the anti join must be hash/merge — a
    // BroadcastNestedLoopJoin here means the null-aware fallback fired
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"anti join fell back to the null-aware nested loop:\n$plan")
  }

  test("q8_market_share: numerator and denominator ride one aggregate; dims broadcast") {
    val plan = RelationalQueries.q8MarketShare(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"8-table snowflake must stay equi-joined:\n$plan")
    // the share must NOT split into two aggregate passes over volumes —
    // one HashAggregate pair (partial+final) computes both sums
    val finals = plan.linesIterator.count(l =>
      l.contains("HashAggregate") && !l.contains("partial_"))
    assert(finals == 1, s"expected one final aggregate, found $finals:\n$plan")
    // both nation arms + region are dims: at least three broadcast joins
    assert(plan.split("BroadcastHashJoin").length - 1 >= 3,
      s"nation/region dims must broadcast:\n$plan")
  }

  test("q9_profit: name pattern filters post-scan without breaking column pruning") {
    // the LIKE '%gear%' predicate is not pushable (no leading literal),
    // but the scan must still prune to the three part columns used
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    val plan =
      try RelationalQueries.q9Profit(spark, SparkSpec.sf0001)
        .queryExecution.executedPlan.toString
      finally spark.conf.unset("spark.sql.maxMetadataStringLength")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"profit joins must stay equi:\n$plan")
    val partScan = plan.linesIterator.find(l =>
      l.contains("FileScan") && l.contains("part.parquet")).get
    assert(partScan.contains("StringContains(p_name,gear)"),
      s"the contains-pattern should still reach the reader as a pushed string filter:\n$partScan")
    assert(partScan.contains("ReadSchema: struct<p_partkey:bigint,p_name:string,p_retailprice:double>"),
      s"part scan must prune to the three used columns:\n$partScan")
  }

  test("q20_dominant_supplier: inner subquery collapses to a window; EXISTS to a semi join") {
    val plan = RelationalQueries.q20DominantSupplier(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), s"the part-total must be a window, not a self-join:\n$plan")
    assert(plan.contains("LeftSemi"), s"EXISTS must decorrelate to a semi join:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"no nested-loop fallback:\n$plan")
    // exactly one scan of lineitem: the rollup is derived once and the
    // window + distinct + semi join all consume it downstream
    assert(plan.split("lineitem.parquet").length - 1 == 1,
      s"the shipped rollup must derive from one lineitem scan:\n$plan")
  }

  test("h_doc_repetition: one scan, scan-local double explode, no window and no join") {
    val plan = TrainingOps.hDocRepetition(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    // coverage is max(cnt·chars) — a plain aggregate: a Window or any
    // join in this plan means an argmax/self-join crept back in
    assert(!plan.contains("Window"), s"coverage needs no window rank:\n$plan")
    assert(!plan.contains("Join"), s"a per-doc metric must not join:\n$plan")
    // the whole curve derives from ONE documents scan; both explodes
    // (gram sizes × positions) are scan-local Generates
    assert(plan.split("documents.parquet").length - 1 == 1,
      s"expected exactly one documents scan:\n$plan")
    assert(plan.split("Generate").length - 1 <= 2,
      s"expected the two scan-local explodes only:\n$plan")
  }

  test("h_importance_sample: one corpus pass, 1024-row weight table broadcasts, no corpus-wide sort-merge") {
    val plan = TrainingOps.hImportanceSample(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    // round 20: the bigram explode folds ONCE into the checkpointed
    // per-(doc, bucket) count table; both the bucket-stats aggregate and
    // the per-doc score join read that narrow table — the returned plan
    // must contain NO documents scan and NO explode (a scan or Generate
    // here means the two-pass re-inlining came back)
    assert(plan.split("documents.parquet").length - 1 == 0,
      s"expected zero documents scans in the returned plan:\n$plan")
    assert(!plan.contains("Generate"),
      s"the explode belongs in the checkpointed build, not the returned plan:\n$plan")
    // the weight table joins the per-doc counts as a broadcast — a
    // sort-merge here would shuffle the corpus-sized count table on a
    // 1024-value key
    assert(plan.contains("BroadcastHashJoin"),
      s"bucket-weight join must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"no corpus-sized shuffle join belongs in this plan:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
  }

  test("h_rank_convergence: final plan reads only checkpointed vectors — no corpus rescan") {
    val plan = AnalyticsOps.hRankConvergence(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    // 8 rounds of power iteration ran eagerly behind localCheckpoints;
    // the returned plan must derive from those RDDs alone — any parquet
    // scan means the edge build or degree table leaked back in (the
    // orders/lineitem chain would re-derive a 9th time)
    assert(!plan.contains("Scan parquet"),
      s"final plan must not rescan the corpus:\n$plan")
    assert(plan.contains("Scan ExistingRDD"),
      s"expected checkpointed round vectors:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
    // the delta rows join NODE-sized vectors pairwise: 8 rounds, so at
    // most 16 RDD reads — a corpus-sized operator has no business here
    assert(!plan.contains("Window"), s"no window over the vectors:\n$plan")
  }

  test("g_rfm_segments: final plan reads only the three checkpoints — no orders rescan, no cartesian") {
    val plan = AnalyticsOps.gRfmSegments(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    try {
      // the per-customer base, the derived recency base, and the 5-row
      // quintile targets ran eagerly behind localCheckpoints; the
      // returned plan must derive from those RDDs alone — a parquet scan
      // means a boundary chain re-derived the corpus aggregate
      assert(!plan.contains("Scan parquet"),
        s"final plan must not rescan orders:\n$plan")
      assert(plan.contains("Scan ExistingRDD"),
        s"expected the checkpointed RFM base:\n$plan")
      // the 15-row boundary table and 5-row targets join as broadcast
      // nested loops, never a CartesianProduct
      assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
      assert(plan.contains("BroadcastNestedLoopJoin"),
        s"boundary tables must broadcast:\n$plan")
    } finally Checkpoints.releaseAll()
  }

  test("g_day_similarity: calendar-sized tail reads the one checkpointed rollup — no events rescan") {
    val plan = AnalyticsOps.gDaySimilarity(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    // the (day, hour) rollup is the ONLY corpus-sized work and it
    // checkpointed; the profile CTE has three consumers, so any parquet
    // scan here means re-inlining dragged the corpus back in
    assert(!plan.contains("Scan parquet"),
      s"final plan must not rescan events:\n$plan")
    assert(plan.contains("Scan ExistingRDD"),
      s"expected the checkpointed day-hour rollup:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-15 must ride TakeOrderedAndProject:\n$plan")
  }

  test("h_trajectory_search: panel broadcasts into a BNLJ, per-user sort capped by WindowGroupLimit") {
    val plan = AnalyticsOps.hTrajectorySearch(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    // the scoring join is 20-row-panel × users — BroadcastNestedLoop BY
    // INTENT (non-equi); a CartesianProduct here means the broadcast was
    // lost and both sides shuffle
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"panel must broadcast into the scoring join:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
    // the first-12-event trajectory window must plan as WindowGroupLimit:
    // without it every user's FULL event history sorts just to keep 12
    assert(plan.contains("WindowGroupLimit"),
      s"rn <= 12 must push into WindowGroupLimit:\n$plan")
    // corpus + panel arms: exactly two events scans, never more
    assert(plan.split("events.parquet").length - 1 == 2,
      s"expected the corpus and panel arms' two scans only:\n$plan")
  }

  test("h_dedup_bloom_sharded: filter table broadcasts, probe rides the codegen expression") {
    val plan = LlmOps.hDedupBloomSharded(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"the filter-table join must be shard-keyed, never all-pairs:\n$plan")
    // the 16-row filter table must reach the probe as a BROADCAST build
    // side — a shuffled join here would move the batch twice
    assert(plan.contains("BroadcastHashJoin"),
      s"expected the filter table to broadcast into the probe join:\n$plan")
    // the probe is the custom codegen expression, not a Scala UDF (a UDF
    // would both break the codegen span and deserialize per row)
    assert(plan.contains("bloom_probe"), s"probe expression missing:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.toLowerCase.contains("scalaudf"),
      s"the probe must not fall back to a UDF:\n$plan")
  }

  test("g_seasonality: ONE events scan — the dow axis folds from the hour-of-week histogram") {
    val plan = AnalyticsOps.gSeasonality(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    // dow is a pure function of hour-of-week (dow = ((how DIV 24)+4)%7),
    // so a second corpus scan for the dow histogram is pure waste; the
    // ONE scan lives in the checkpointed histogram build — the returned
    // plan must read only the checkpoint, never the parquet
    assert(plan.split("events.parquet").length - 1 == 0,
      s"final plan must read only the checkpointed histogram:\n$plan")
    assert(plan.contains("Scan ExistingRDD"),
      s"expected the checkpointed histogram as the only source:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
    assert(!plan.contains("Generate"), s"no explode belongs in this plan:\n$plan")
  }

  test("h_span_corruption: one scan, one explode, no join and no window — a pure map-reduce") {
    val plan = TrainingOps.hSpanCorruption(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    // the span merge is scan-local boolean algebra over four hash tests —
    // a Window or Join here means the gaps-and-islands form crept back
    assert(plan.split("documents.parquet").length - 1 == 1,
      s"expected exactly one documents scan:\n$plan")
    assert("Generate".r.findAllIn(plan).length == 1,
      s"expected exactly one position explode:\n$plan")
    assert(!plan.contains("Join"), s"no join belongs in this plan:\n$plan")
    assert(!plan.contains("Window"), s"no window belongs in this plan:\n$plan")
  }

  test("h_quality_classifier: weight table broadcasts into the scoring join, no cartesian") {
    val plan = CorpusOps.hQualityClassifier(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    // the 512-row bucket weight table must be the BROADCAST build side of
    // the held-out scoring join — shuffling the exploded test tokens onto
    // the bucket key would move the corpus for a dictionary lookup
    assert(plan.contains("BroadcastHashJoin"),
      s"expected the weight table to broadcast into the scoring join:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"the 1-row normalizer/prior sides must broadcast, never cartesian:\n$plan")
    // train + test exploded once each (the b CTE re-inlines into its two
    // aggregating consumers) — more Generates mean a third corpus explode
    assert("Generate".r.findAllIn(plan).length <= 2,
      s"expected at most two corpus explodes (train + test):\n$plan")
  }

  test("h_rag_context_pack: panel broadcasts, rank cut caps as WindowGroupLimit") {
    val plan = CorpusOps.hRagContextPack(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"panel must broadcast into the cosine join:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
    assert(plan.contains("WindowGroupLimit"),
      s"rn <= 20 must push into WindowGroupLimit:\n$plan")
  }

  test("g_funnel_ab: the report reads only the checkpointed stage tables") {
    val plan = AnalyticsOps.gFunnelAb(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    // the three stage scans live in the sequential checkpoint builds
    // (one events scan each); the returned report must read only the
    // checkpoints — a parquet scan here means the naive CTE chain
    // (measured 14 events scans) crept back
    assert(plan.split("events.parquet").length - 1 == 0,
      s"report must read only the checkpointed stage tables:\n$plan")
    assert(plan.contains("Scan ExistingRDD"),
      s"expected the checkpointed stage tables as sources:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"the 2-row gap join must broadcast, never cartesian:\n$plan")
  }

  test("g_market_basket: all three consumers read the checkpointed basket table") {
    val plan = AnalyticsOps.gMarketBasket(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    // the basket CTE (orderkey -> sorted distinct parts) has three
    // consumers (pairs, supports, order count); un-checkpointed, Spark
    // re-inlined it into FOUR lineitem scans (the round-16 shipped
    // plan). The single fact scan lives in the checkpoint build; the
    // returned plan must read only the checkpoint
    assert(plan.split("lineitem.parquet").length - 1 == 0,
      s"report must read only the checkpointed basket table:\n$plan")
    assert(plan.contains("Scan ExistingRDD"),
      s"expected the checkpointed basket table as source:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"the global top-20 must plan as TakeOrderedAndProject:\n$plan")
  }

  test("h_ann_filtered: the label filter folds into the broadcast candidate join") {
    val plan = LlmOps.hAnnFiltered(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    // exactly the hAnnIvf contract: scan-local coarse assignment against
    // broadcast centroid collects, probes broadcast to the candidate
    // join with the label equality as a join key — never a post-rank
    // filter, never a corpus-keyed shuffle for the filter
    assert(!plan.contains("hashpartitioning(vec_id"),
      s"filtered search regressed to a vec_id-keyed shuffle:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"expected the probe-side broadcast candidate join:\n$plan")
    assert(plan.contains("qlabel") && plan.contains("label"),
      s"the label predicate must appear in the candidate join:\n$plan")
  }

  test("h_zipf_audit: rank and total windows share one lang exchange") {
    val plan = graft.operators.CorpusOps.hZipfAudit(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    // both windows and the per-lang moment aggregate ride ONE single-key
    // lang hash exchange over the vocabulary-sized count table (subset
    // clustering); the only other hash exchange is the (lang, term)
    // count aggregate's own key
    assert("hashpartitioning\\(lang#\\d+, \\d+\\)".r.findAllIn(plan).length == 1,
      s"expected exactly one single-key lang exchange:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
  }

  test("g_forecast_baseline: lag joins read only the checkpointed histogram") {
    val plan = AnalyticsOps.gForecastBaseline(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    // the (type, day) histogram has three consumers (actuals + both lag
    // sides); the checkpoint keeps the corpus collapse to ONE pass — a
    // parquet scan here means the re-inline crept back
    assert(plan.split("events.parquet").length - 1 == 0,
      s"lag joins must read only the checkpointed histogram:\n$plan")
    assert(plan.contains("Scan ExistingRDD"),
      s"expected the checkpointed histogram as source:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
  }

  test("h_knn_classify: seed panel broadcasts; vote is scan-local (no corpus window/exchange)") {
    val plan = graft.operators.ProfileOps.hKnnClassify(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    // the 256-seed panel collects to ONE row and broadcasts; scoring,
    // top-5, and the majority vote all run inside the scan — the only
    // exchange is the <=|labels|^2 confusion census
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"the 1-row seed panel must broadcast into the scan:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
    assert(!plan.contains("hashpartitioning(vec_id"),
      s"the vote must be scan-local, never a per-vector exchange:\n$plan")
    assert(!plan.contains("Window"),
      s"no window belongs in this plan (array-sort top-5, array vote):\n$plan")
  }

  test("h_percentile_norm: one lang exchange shared by rank window and report aggregate") {
    val plan = graft.operators.CorpusOps.hPercentileNorm(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    // the per-lang rank window and the per-lang report ride ONE lang
    // hash exchange (subset clustering); the global p80 threshold is a
    // histogram census + 1-row broadcast, never a global corpus sort
    assert("hashpartitioning\\(lang".r.findAllIn(plan).length == 1,
      s"expected exactly one lang exchange:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"the 1-row threshold must broadcast:\n$plan")
    assert(plan.split("documents.parquet").length - 1 <= 2,
      s"corpus reads: one for the histogram, one for the rank window:\n$plan")
  }

  test("g_audience_overlap: both censuses read the checkpointed user-type sets") {
    val plan = AnalyticsOps.gAudienceOverlap(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    // singles and pairs both consume the per-user type-set table; the
    // checkpoint keeps the events aggregate to ONE pass (the
    // g_market_basket convention) — a parquet scan here means re-inline
    assert(plan.split("events.parquet").length - 1 == 0,
      s"report must read only the checkpointed set table:\n$plan")
    assert(plan.contains("Scan ExistingRDD"),
      s"expected the checkpointed set table as source:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
  }

  test("g_sessionize: both windows and the session aggregate share one user_id exchange") {
    val df = AnalyticsOps.gSessionize(spark, SparkSpec.sf0001)
    val plan = df.queryExecution.executedPlan.toString
    // lag window, island-sum window, and the (user_id, sid) aggregate all
    // ride ONE HashPartitioning(user_id) by subset clustering (the
    // g_scd2_state trick) — a second user exchange means the aggregate
    // stopped reusing the window partitioning; the only other shuffles
    // are the ≤|types|-row census and the final sort
    assert("hashpartitioning\\(user_id".r.findAllIn(plan).length == 1,
      s"expected exactly one user_id exchange:\n$plan")
    val shuffles = plan.linesIterator.count { l =>
      val t = l.dropWhile(c => !c.isLetter); t.startsWith("Exchange ")
    }
    assert(shuffles <= 3, s"expected <= 3 shuffle exchanges, got $shuffles:\n$plan")
    assert(!plan.contains("Join"), s"no join belongs in this plan:\n$plan")
  }

  test("h_mmr_diversify: five greedy rounds read only the checkpointed control tables") {
    val plan = CorpusOps.hMmrDiversify(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    // the ONLY corpus-sized work is the checkpointed candidate build; a
    // parquet scan in the returned plan means a greedy round re-inlined
    // the corpus chain (the h_bpe_train lesson: 5 rounds -> 5 scans)
    assert(plan.split("embeddings.parquet").length - 1 == 0,
      s"greedy rounds must read only the checkpoints:\n$plan")
    assert(plan.contains("Scan ExistingRDD"),
      s"expected the checkpointed candidate/sim tables as sources:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
  }

  test("h_rrf_fusion: semantic arm broadcasts the panel, ranks cap as WindowGroupLimit") {
    val plan = CorpusOps.hRrfFusion(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    // the cosine arm is the hAnnBrute shape: 10-row panel broadcast into
    // a non-equi BNLJ over one corpus scan — a CartesianProduct means the
    // broadcast was lost and both sides shuffle
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"panel must broadcast into the cosine join:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
    // all three rn <= k windows (per-arm top-20, fused top-5) must cap
    // map-side — without WindowGroupLimit the candidate tables sort whole
    assert(plan.contains("WindowGroupLimit"),
      s"rank windows must plan as WindowGroupLimit:\n$plan")
  }

  test("g_revenue_concentration: one segment exchange shared by rank window and moment aggregate") {
    val plan = AnalyticsOps.gRevenueConcentration(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    // the Lorenz window and the final Gini/top-decile aggregate ride ONE
    // segment exchange over the per-customer rollup (subset clustering);
    // both facts scan exactly once — the rollup join is the only
    // fact-table work
    assert("hashpartitioning\\(segment".r.findAllIn(plan).length == 1,
      s"expected exactly one segment exchange:\n$plan")
    assert(plan.split("orders.parquet").length - 1 == 1,
      s"orders must scan exactly once:\n$plan")
    assert(plan.split("customer.parquet").length - 1 == 1,
      s"customer must scan exactly once:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
  }

  test("h_ctfidf_topics: all three consumers read the checkpointed class-vocab table") {
    val plan = CorpusOps.hCtfidfTopics(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    // the (source, term) count table feeds the class-df rollup, the
    // class count, and the score join; the checkpoint keeps the corpus
    // explode to ONE pass — a parquet scan here means re-inline crept in
    assert(plan.split("documents.parquet").length - 1 == 0,
      s"report must read only the checkpointed class-vocab table:\n$plan")
    assert(plan.contains("Scan ExistingRDD"),
      s"expected the checkpointed class-vocab table as source:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"the 1-row class count must broadcast:\n$plan")
    assert(plan.contains("WindowGroupLimit"),
      s"the top-3 window must cap map-side as WindowGroupLimit:\n$plan")
  }

  test("h_prefix_cache: the prefix is a scan-local slice — no explode anywhere in the plan") {
    val plan = graft.operators.TrainingOps.hPrefixCache(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    // the whole op is projection → (lang, prefix) aggregate → lang
    // rollup: a Generate here means someone exploded the token array the
    // slice was designed to avoid
    assert(!plan.contains("Generate"),
      s"prefix projection must not explode the token array:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("Join"),
      s"no join belongs in this plan:\n$plan")
    assert(plan.split("documents.parquet").length - 1 == 1,
      s"one corpus scan:\n$plan")
  }

  test("g_repeat_purchase: all censuses read the checkpointed day arrays") {
    val plan = AnalyticsOps.gRepeatPurchase(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    // the per-customer sorted day array has three consumers (repeater
    // census, gap histogram, mean aggregate); the checkpoint keeps the
    // orders⋈customer collapse to ONE pass — a parquet scan here means
    // re-inline crept back
    assert(plan.split("orders.parquet").length - 1 == 0 &&
      plan.split("customer.parquet").length - 1 == 0,
      s"report must read only the checkpointed day arrays:\n$plan")
    assert(plan.contains("Scan ExistingRDD"),
      s"expected the checkpointed day arrays as source:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
  }

  test("h_dedup_impact: both censuses read the checkpointed flag table") {
    val plan = LlmOps.hDedupImpact(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    // the survivor-flagged corpus feeds the doc census and the term
    // census; the checkpoint keeps the body-keyed survivor join to ONE
    // pass — a parquet scan here means re-inline crept back
    assert(plan.split("documents.parquet").length - 1 == 0,
      s"report must read only the checkpointed flag table:\n$plan")
    assert(plan.contains("Scan ExistingRDD"),
      s"expected the checkpointed flag table as source:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
  }

  test("h_minhash_band_design: all fifteen band projections read the checkpointed signatures") {
    val plan = graft.operators.TrainingOps.hMinhashBandDesign(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    // the 8-column signature table feeds 15 band projections, the bucket
    // census, and both planted self-join sides; the checkpoint keeps the
    // corpus shingle explode to ONE pass — a parquet scan here means
    // re-inline crept back (it would mean 17 corpus explodes)
    assert(plan.split("documents.parquet").length - 1 == 0,
      s"design table must read only the checkpointed signatures:\n$plan")
    assert(plan.contains("Scan ExistingRDD"),
      s"expected the checkpointed signatures as source:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"the 4-row rung and 1-row hits tables must broadcast:\n$plan")
  }

  test("h_oov_curve: rank window and rung rollup share one lang exchange") {
    val plan = LlmOps.hOovCurve(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    // (lang, k) grouping is a subset cluster of the lang window
    // partitioning, so both ride ONE lang hash exchange over the
    // vocabulary-sized count table; the 3-row rung table broadcasts
    assert("hashpartitioning\\(lang#\\d+, \\d+\\)".r.findAllIn(plan).length == 1,
      s"expected exactly one single-key lang exchange:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"the 3-row rung table must broadcast:\n$plan")
    assert(plan.split("documents.parquet").length - 1 == 1,
      s"one corpus scan:\n$plan")
  }

  test("g_decayed_popularity: one corpus collapse, windows only on the histogram") {
    val plan = AnalyticsOps.gDecayedPopularity(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    // the corpus collapses map-side into the (type, day) histogram; the
    // anchor and share windows run single-partition over that control
    // table ONLY (the gGapFill posture) — 2 exchanges total, censused
    assert(plan.split("events.parquet").length - 1 == 1,
      s"one corpus scan:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
    assert(graft.tools.ExchangeBudget.countShuffles(plan) <= 2,
      s"the histogram fold must be the only corpus exchange:\n$plan")
  }

  test("h_knn_graph: edge and cell censuses read only the checkpointed tables") {
    val plan = LlmOps.hKnnGraph(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    // the assignment table feeds both self-join sides + the cell census,
    // and the edge list feeds the mutual probe twice; both are
    // checkpointed, so the final plan reads ZERO parquet — the kNN is
    // cell-bucketed (c_id equi-join), never all-pairs
    assert(plan.split("embeddings.parquet").length - 1 == 0,
      s"report must read only the checkpointed assignment/edge tables:\n$plan")
    assert(plan.contains("Scan ExistingRDD"),
      s"expected checkpointed tables as sources:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
  }
}
