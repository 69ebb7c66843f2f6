package graft

import org.apache.spark.sql.DataFrame

/** Asserted plan invariants for the catalog — the properties `PlanCheck`
  * prints for eyeballing, pinned as tests so a regression (lost pushdown,
  * un-broadcast dim, accidental cartesian, de-decorrelated lateral) fails
  * CI instead of surfacing at 100 TB.
  */
class PlanAuditSpec extends SparkTestBase {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, Sf0001).queryExecution.executedPlan.toString


  /** Count true shuffle-Exchange nodes: plan lines render nested
    * operators as "+- Exchange ..."/":- Exchange ...", so a
    * trim.startsWith("Exchange") count is ALWAYS ZERO — the r12 exchange
    * caps were vacuous (r13 review find). Token-match like PlanGoldenSpec:
    * strip the tree prefix, take the leading identifier, require exact
    * equality (keeps ReusedExchange/BroadcastExchange out).
    */
  private def exchangeCount(p: String): Int =
    p.linesIterator.map(l =>
      l.dropWhile(c => !c.isLetter).takeWhile(_.isLetterOrDigit))
      .count(_ == "Exchange")

  private def optimized(name: String): String =
    SparkEntry.queries(name)(spark, Sf0001).queryExecution.optimizedPlan.toString

  test("q_scan_project prunes the parquet read to the referenced columns") {
    val p = plan("q_scan_project")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("l_orderkey") && read.contains("l_shipdate"))
    assert(!read.contains("l_extendedprice") && !read.contains("l_comment"),
      s"scan reads unreferenced columns: $read")
  }

  test("q_range_filter pushes every predicate to the scan (incl. timestamp)") {
    val p = plan("q_range_filter")
    val pushed = p.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(pushed.contains("l_quantity") && pushed.contains("l_discount") &&
      pushed.contains("l_shipdate"), s"missing pushdown: $pushed")
  }

  test("dim joins broadcast; no sort-merge for broadcast-hinted dims") {
    val p = plan("q_broadcast_join")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q_sort_limit plans as TakeOrderedAndProject (never a full sort)") {
    assert(plan("q_sort_limit").contains("TakeOrderedAndProject"))
  }

  test("no cartesian products anywhere in the band/LSH/interval join family") {
    Seq("q_minhash_lsh", "q_range_join", "q_interval_join", "q_approx_dedup",
      "q_embed_neardup").foreach { n =>
      val p = plan(n)
      assert(!p.contains("CartesianProduct"), s"$n plans a cartesian:\n$p")
      // BroadcastNestedLoopJoin with a non-trivial condition is the other
      // quadratic shape; the probe-row broadcasts (1-row frames) are fine
      assert(!p.contains("BroadcastNestedLoopJoin Inner"),
        s"$n plans a nested-loop join:\n$p")
    }
  }

  test("q_salted_join actually joins on the widened (key, salt) pair") {
    val p = plan("q_salted_join")
    assert(p.contains("__salt"), s"salt column missing from the join:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_asof_curve is served by the custom AsOfJoin physical operator") {
    assert(plan("q_asof_curve").contains("AsOfJoin"))
  }

  test("q_lateral_join decorrelates to an aggregate + join (no per-row subquery)") {
    val o = optimized("q_lateral_join")
    assert(o.contains("Aggregate"), o)
    assert(o.contains("Join"), o)
    val p = plan("q_lateral_join")
    assert(!p.contains("CartesianProduct"), s"lateral stayed correlated:\n$p")
  }

  test("IVF Lloyd round is one map-combined Exchange (no posexplode blow-up)") {
    val emb = Tables.embeddings(spark, Sf0001)
    val model = ops.IvfIndex.build(emb, nlist = 8, iters = 1)
    val round = ops.IvfIndex.trainRound(emb, model.centroids)
    val p = round.queryExecution.executedPlan.toString
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 1, s"Lloyd round must shuffle at most once:\n$p")
    assert(!p.contains("Generate"), s"Lloyd round must not explode dims:\n$p")
    // partial aggregation before the shuffle = only nlist×dim doubles move
    assert(p.contains("partial_vecmeanagg") || p.toLowerCase.contains("partial"),
      s"centroid update must map-side combine:\n$p")
  }

  test("batch ANN search never shuffles the corpus by cell") {
    // the IVF search contract at 100 TB: the inverted file is joined to
    // the probed-cell list by BROADCAST (the cell list is dim-bounded) —
    // the only corpus-sized Exchange is the per-probe top-k window on
    // probe_id. A hashpartitioning(cell) Exchange would mean the whole
    // corpus reshuffles per probe batch.
    val emb = Tables.embeddings(spark, Sf0001)
    val model = ops.IvfIndex.build(emb, nlist = 8, iters = 1)
    val p = ops.IvfIndex.searchTopKBatch(model, Seq(0L, 1L), k = 5, nprobe = 4)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning(cell"),
      s"corpus must not reshuffle on cell:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"cell join must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian in search:\n$p")
  }

  test("q_decontaminate broadcasts the benchmark shingle set (linear, never pairwise)") {
    val p = plan("q_decontaminate")
    assert(p.contains("BroadcastHashJoin"),
      s"benchmark side must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"decontamination must stay an equi-join:\n$p")
  }

  test("q_stopword_scrub is one narrow map pass — no Generate, no join, no agg") {
    val p = plan("q_stopword_scrub")
    assert(!p.contains("Generate"), s"scrub must not explode tokens:\n$p")
    assert(!p.contains("Join"), s"scrub must not join:\n$p")
    assert(!p.contains("Aggregate"), s"scrub must not aggregate:\n$p")
    // the ONLY exchange is the contract-mandated terminal sort
    val exchanges = p.linesIterator.count(_.trim.startsWith("+- Exchange"))
    assert(exchanges <= 1, s"scrub must not shuffle beyond the output sort:\n$p")
  }

  test("q_pack_sequences never plans a single-partition global window") {
    // the global running sum must be the two-phase prefix sum: a
    // SinglePartition exchange feeding the Window would mean the whole
    // corpus serializes through one task (the anti-pattern Packing
    // exists to avoid)
    val p = plan("q_pack_sequences")
    assert(p.contains("Window"), s"packing must window per partition:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"packing must not serialize through one partition:\n$p")
  }

  test("q_stratified_sample is a pure projection + filter — zero data shuffle") {
    val p = plan("q_stratified_sample")
    assert(!p.contains("Join"), s"sampler must not join:\n$p")
    assert(!p.contains("Aggregate"), s"sampler must not aggregate:\n$p")
    assert(!p.contains("Generate"), s"sampler must not explode:\n$p")
    // the ONLY exchange is the contract-mandated terminal sort
    val exchanges = p.linesIterator.count(_.trim.startsWith("+- Exchange"))
    assert(exchanges <= 1, s"sampler must not shuffle beyond the output sort:\n$p")
  }

  test("q_ann_filtered pushes the metadata predicate to the parquet scan") {
    // filter-then-score: the label range must reach PushedFilters so only
    // eligible rows are ever decoded and scored
    val p = plan("q_ann_filtered")
    val pushed = p.linesIterator.filter(_.contains("PushedFilters"))
      .mkString("\n")
    assert(pushed.contains("label"), s"label predicate not pushed:\n$p")
  }

  test("q_pii_scrub is one narrow map pass — no join, no agg, no Generate") {
    val p = plan("q_pii_scrub")
    assert(!p.contains("Join"), s"redaction must not join:\n$p")
    assert(!p.contains("Aggregate"), s"redaction must not aggregate:\n$p")
    assert(!p.contains("Generate"), s"redaction must not explode:\n$p")
    val exchanges = p.linesIterator.count(_.trim.startsWith("+- Exchange"))
    assert(exchanges <= 1, s"redaction must not shuffle beyond the output sort:\n$p")
  }

  test("q_chunk_overlap is one Generate, no join, no agg") {
    val p = plan("q_chunk_overlap")
    assert(p.contains("Generate"), s"chunking must explode the chunk index:\n$p")
    assert(!p.contains("Join"), s"chunking must not join:\n$p")
    assert(!p.contains("Aggregate"), s"chunking must not aggregate:\n$p")
  }

  test("q_curation_funnel keeps the contamination gate a broadcast equi-join") {
    val p = plan("q_curation_funnel")
    assert(p.contains("BroadcastHashJoin"),
      s"benchmark side must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"funnel must stay linear:\n$p")
  }

  test("q_gopher_rules is one narrow map pass — no Generate, no join, no agg") {
    val p = plan("q_gopher_rules")
    assert(!p.contains("Generate"), s"rule battery must not explode tokens:\n$p")
    assert(!p.contains("Join"), s"rule battery must not join:\n$p")
    assert(!p.contains("Aggregate"), s"rule battery must not aggregate:\n$p")
    val exchanges = p.linesIterator.count(_.trim.startsWith("+- Exchange"))
    assert(exchanges <= 1, s"only the terminal sort may shuffle:\n$p")
  }

  test("q_boilerplate_scrub broadcasts the boilerplate set; the scrub pass never re-shuffles the corpus") {
    val p = plan("q_boilerplate_scrub")
    // the boilerplate list reaches the corpus as a broadcast single row —
    // the scrub side must be a broadcast nested loop (1-row cross), never
    // a hash-partitioned join of the corpus against the chunk table
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"boilerplate set must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"corpus must not sort-merge against the boilerplate set:\n$p")
  }

  test("q_asof_forward is served by the custom AsOfJoin physical operator") {
    val p = plan("q_asof_forward")
    assert(p.contains("AsOfJoin"), s"forward as-of must use AsOfJoinExec:\n$p")
    assert(!p.contains("SortMergeJoin"), s"not a generic join:\n$p")
  }

  test("q_asof_nearest is served by the custom AsOfJoin physical operator") {
    val p = plan("q_asof_nearest")
    assert(p.contains("AsOfJoin"), s"nearest as-of must use AsOfJoinExec:\n$p")
    assert(!p.contains("SortMergeJoin"), s"not a generic join:\n$p")
  }

  test("q_summary_percentiles serves estimates via a broadcast, never re-shuffling facts by estimate") {
    // the fact side pays its one groupBy exchange; the (summary-derived)
    // 9-row estimate table must broadcast into the join — a shuffled join
    // here would mean the serve path re-keyed the corpus on tiny data
    val p = plan("q_summary_percentiles")
    assert(p.contains("BroadcastHashJoin"), s"estimates must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"summary join regressed to SMJ:\n$p")
  }

  test("q_event_funnel stacks its three stage windows on ONE user exchange") {
    // the funnel's scale property: stage r+1's conditional min reads
    // stage r's per-user-constant column, so all three Window passes
    // share a single hashpartitioning(user_id) — a per-stage self-join
    // (or re-shuffle per window) would multiply the corpus shuffles
    val p = plan("q_event_funnel")
    val userExchanges = p.linesIterator
      .count(l => l.contains("Exchange hashpartitioning(user_id"))
    assert(userExchanges === 1,
      s"funnel must shuffle the events ONCE on user_id, saw $userExchanges:\n$p")
    assert(p.linesIterator.count(_.contains("Window [")) === 3, p)
    assert(!p.contains("Join"), s"funnel must not self-join per stage:\n$p")
  }

  test("q_cohort_retention derives cohorts from one user window, no join") {
    val p = plan("q_cohort_retention")
    val userExchanges = p.linesIterator
      .count(l => l.contains("Exchange hashpartitioning(user_id"))
    assert(userExchanges === 1,
      s"cohort assignment must reuse one user_id shuffle:\n$p")
    assert(!p.contains("Join"), s"no join needed for cohorting:\n$p")
  }

  test("q_funnel_rates keeps the one-user-exchange window stack of the funnel") {
    // the rate variant adds only a 4-row stage table + lag on top of the
    // funnel aggregate — the corpus-sized work must still shuffle events
    // exactly once on user_id, and no join may appear anywhere
    val p = plan("q_funnel_rates")
    val userExchanges = p.linesIterator
      .count(l => l.contains("Exchange hashpartitioning(user_id"))
    assert(userExchanges === 1,
      s"rates must reuse the single user_id shuffle, saw $userExchanges:\n$p")
    assert(!p.contains("Join"), s"rates must not join:\n$p")
  }

  test("q_retention_rates normalizes via a cohort window — one corpus shuffle, no join") {
    // the base population comes from a window over the cohort-bounded
    // aggregate: a filter+join-back re-executes the corpus lineage and
    // DOUBLES the user_id shuffle (the first cut of this query did)
    val p = plan("q_retention_rates")
    assert(!p.contains("Join"), s"normalization must not join:\n$p")
    val userExchanges = p.linesIterator
      .count(l => l.contains("Exchange hashpartitioning(user_id"))
    assert(userExchanges === 1,
      s"cohort assignment must reuse one user_id shuffle:\n$p")
  }

  test("q_tokenize_stats is narrow map passes — no join, no agg, no Generate") {
    // serving applies the trained merges per row (BpeMergesF); the only
    // exchange allowed is the contract-mandated terminal sort
    val p = plan("q_tokenize_stats")
    assert(!p.contains("Join"), s"serving must not join:\n$p")
    assert(!p.contains("Aggregate"), s"serving must not aggregate:\n$p")
    assert(!p.contains("Generate"), s"serving must not explode:\n$p")
    val exchanges = p.linesIterator.count(_.trim.startsWith("+- Exchange"))
    assert(exchanges <= 1, s"serving must not shuffle beyond the output sort:\n$p")
    assert(p.contains("graft_bpe_apply") || p.contains("bpemerges"),
      s"serving must run the linear merge expression:\n$p")
  }

  test("q_grouping_id is a single expand + aggregate, one shuffle") {
    val p = plan("q_grouping_id")
    assert(p.contains("Expand"), p)
    // cube = expand then ONE aggregate pair; any extra Exchange beyond the
    // agg + sort means the grouping sets re-shuffled
    val exchanges = exchangeCount(p)
    assert(exchanges <= 3, s"too many exchanges ($exchanges):\n$p")
  }

  test("q_topk_agg contains no Window — bounded partial aggregation replaces the rank sort") {
    val p = plan("q_topk_agg")
    assert(!p.contains("Window"), s"aggregator route regressed to a window:\n$p")
    // two-phase object-hash aggregation: map-side partial top-k before the
    // exchange is the entire point
    assert(p.contains("ObjectHashAggregate"), p)
    assert(p.linesIterator.count(_.contains("ObjectHashAggregate")) >= 2,
      s"partial aggregation missing (no map-side top-k):\n$p")
  }

  test("q_scd2_compact reuses ONE user_id exchange across both windows and the run aggregate") {
    val p = plan("q_scd2_compact")
    // both Window passes and the groupBy(user_id, run_id) are satisfied by
    // the same hashpartitioning(user_id); only the terminal orderBy adds a
    // range exchange — 3+ exchanges would mean the run aggregate stopped
    // reusing the window partitioning (the 100 TB regression to catch)
    val exchanges = exchangeCount(p)
    assert(exchanges <= 2, s"expected <=2 exchanges (user_id hash + terminal sort), got $exchanges:\n$p")
    assert(p.contains("Window"), p)
  }

  test("q_scd2_merge routes both key-set joins through broadcasts — untouched runs and the archive never shuffle for them") {
    val p = plan("q_scd2_merge")
    // the affected-key set joins BROADCAST into the anti (untouched runs
    // pass through scan-local) and the semi (archive read prunes to
    // affected keys); a SortMergeJoin on either would shuffle the 100 TB
    // side for a minutes-sized correction batch
    assert(!p.contains("SortMergeJoin"), s"key-set join regressed to a shuffle join:\n$p")
    val bhj = p.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(bhj == 2, s"expected exactly 2 broadcast key-set joins (anti + semi), got $bhj:\n$p")
    // shuffles: one user_id hash per stateRuns leg (existing + recompute),
    // the affected-distinct agg, and the terminal sort — anything more
    // means a leg stopped reusing its partitioning
    val exchanges = exchangeCount(p)
    assert(exchanges <= 5, s"expected <=5 exchanges, got $exchanges:\n$p")
  }

  test("q_dedup_incremental broadcasts the arrival bands — the stored index never shuffle-joins") {
    val p = plan("q_dedup_incremental")
    // the batch side is the build/broadcast side; a SortMergeJoin here
    // would shuffle the whole stored band index for every ingest batch
    assert(!p.contains("SortMergeJoin"), s"band probe regressed to a shuffle join:\n$p")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q_interval_union stacks windows and both aggregations on ONE user_id exchange") {
    val p = plan("q_interval_union")
    // windows + groupBy(user, grp) + groupBy(user) all reuse
    // hashpartitioning(user_id); only the terminal sort adds an exchange
    val exchanges = exchangeCount(p)
    assert(exchanges <= 2, s"expected <=2 exchanges, got $exchanges:\n$p")
    assert(p.contains("Window"), p)
  }

  test("q_weibull_strength is a projection + one hash aggregate — no window, no join, no extra shuffle") {
    val p = plan("q_weibull_strength")
    assert(!p.contains("Window") && !p.contains("Join"), p)
    // hash agg on 4 buckets: map-side partial rows make the exchange tiny;
    // one agg exchange + the terminal sort exchange
    val exchanges = exchangeCount(p)
    assert(exchanges <= 2, s"expected <=2 exchanges, got $exchanges:\n$p")
    assert(p.contains("HashAggregate"), p)
  }

  test("q_bloom_semi_join probes the bloom in a scan-side Filter before the join") {
    val p = plan("q_bloom_semi_join")
    assert(p.contains("might_contain"), s"bloom prefilter missing:\n$p")
    // the filter must sit BELOW the join: the first might_contain line
    // appears after the join operator line in top-down plan text
    val lines = p.linesIterator.toSeq
    val joinIdx = lines.indexWhere(_.contains("Join"))
    val bloomIdx = lines.indexWhere(_.contains("might_contain"))
    assert(joinIdx >= 0 && bloomIdx > joinIdx,
      s"bloom filter not below the join (join@$joinIdx bloom@$bloomIdx):\n$p")
  }
}
