package graft.operators

import graft.{SparkEntry, SparkSpec}

/** Structural guards on the physical plans of key queries — the plan
  * properties the 100 TB design depends on (pushdown, pruning,
  * broadcast strategy, bounded shuffle counts). A regression here can
  * be invisible in small-scale correctness runs while catastrophic at
  * scale.
  */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  private def countOf(hay: String, needle: String): Int =
    hay.sliding(needle.length).count(_ == needle)

  /** Distinct canonicalized shuffle count — the number of shuffles the
    * RUNTIME pays. A frame feeding several plan branches (e.g. the
    * ranked-bucket frame behind head-pairs AND star-links in
    * pairsFromDigests) prints its Exchange once per branch in the
    * static plan string, but AQE stage reuse (spark.sql.exchange.reuse)
    * executes canonically-equal exchanges once; counting the string
    * over-counts exactly the shared subtrees. */
  private def distinctShuffles(df: org.apache.spark.sql.DataFrame): Int = {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val p0 = df.queryExecution.executedPlan
    // initialPlan, not inputPlan: AQE wraps the plan BEFORE
    // EnsureRequirements runs, so inputPlan contains no Exchange nodes
    // at all and counting it silently returns 0 for every query;
    // initialPlan is the post-preparation static plan with the real
    // exchanges in place
    val p = p0 match { case a: AdaptiveSparkPlanExec => a.initialPlan; case x => x }
    p.collect { case e: ShuffleExchangeLike => e.canonicalized }.distinct.size
  }

  test("q02: filters and projection push to the parquet scan") {
    val p = plan("q02_filter_project")
    // (FileScan metadata strings truncate at ~100 chars — assert on the
    // stable prefix)
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"))
    // pruned read schema — no l_tax/l_returnflag in the scan
    assert(!p.contains("l_tax"))
  }

  test("q03: dimension join is a broadcast hash join, fact side not shuffled pre-join") {
    val p = plan("q03_join_broadcast")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q04: fact-fact join honors the merge hint") {
    assert(plan("q04_join_sortmerge").contains("SortMergeJoin"))
  }

  test("q22: star join broadcasts all dimensions") {
    assert(countOf(plan("q22_multi_join"), "BroadcastHashJoin") >= 3)
  }

  test("q13: window cumsum needs exactly its partition shuffle + final sort") {
    // one Exchange for Window partitioning, one for the global orderBy
    assert(countOf(plan("q13_window_cumsum"), "Exchange") <= 3)
  }

  test("native minhash signature generation adds no shuffle before the band join") {
    // the native-kernel LSH path (q58/q83's candidate stage; q56 itself
    // is the portable-hash variant since round 4)
    val df = DedupOps.minhashPairs(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("minhash_sig"))
    // (band,digest) bucket shuffle + distinct + presentation sort:
    // bounded RUNTIME shuffles (the ranked frame's exchange prints
    // per-branch but executes once — see distinctShuffles)
    assert(distinctShuffles(df) <= 6, s"shuffle explosion:\n$p")
  }

  test("q56: portable LSH keeps the gram explode map-side and bounded shuffles") {
    val df = SparkEntry.queries("q56_minhash_pairs")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    // gram explode + slot mins fold in ONE doc_id aggregation; then the
    // (band, digest) bucket shuffle, distinct, and presentation sort
    assert(distinctShuffles(df) <= 6, s"shuffle explosion:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q66: pair generation joins on the cell key, never a cartesian product") {
    val p = plan("q66_neardup_ivf_blocked")
    // centroid/query sides are broadcast (BroadcastNestedLoopJoin is the
    // tiny-literal cross join); the N×N side must be a keyed join
    assert(!p.contains("CartesianProduct"), s"unexpected cartesian:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"))
  }

  test("q68: five-stage cleaning pipeline keeps a bounded shuffle count") {
    val p = plan("q68_clean_corpus")
    // gates are per-row; dedup, near-dup grouping, the signature-
    // estimate prefilter's two sig joins (three extra small exchanges
    // that remove the multi-KB gram arrays from the wide candidate
    // set), removal joins and the final sort are the only exchanges —
    // the composition must not multiply shuffles beyond its parts
    assert(countOf(p, "Exchange") <= 17, s"shuffle explosion:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q84: gram dataflow reads only (doc_id, text) and keeps one gram-keyed shuffle") {
    val p = plan("q84_dup_gram_ratio")
    // column pruning must reach both scans of documents
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
    assert(!p.contains("lang") && !p.contains("n_chars"), "unpruned scan")
    assert(!p.contains("CartesianProduct"))
  }

  test("q88: the naive interval join is auto-rewritten — no nested-loop join") {
    val p = plan("q88_range_join_auto")
    assert(!p.contains("NestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range-join rewrite did not fire:\n$p")
    assert(p.contains("Generate explode"), p)
  }

  test("q70: the salted join really shuffles on (key, salt)") {
    val p = plan("q70_skew_salted_join")
    // the whole point of salting: the join key seen by the exchange
    // includes the salt column, spreading each hot key over reducers
    assert(p.contains("__salt"), s"salt column missing from plan:\n$p")
  }

  test("q73: candidate re-count joins via broadcast, not a shuffle of the corpus") {
    val p = plan("q73_heavy_hitters")
    // candidates are ≤ k rows — the exact verify pass must broadcast
    // them and keep the big token stream un-shuffled until the groupBy
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast semi-join:\n$p")
  }

  test("q74: chunk explosion is map-only until the presentation sort") {
    val p = plan("q74_chunk_documents")
    // one exchange for the final orderBy and nothing else
    assert(countOf(p, "Exchange") <= 1, s"chunking should not shuffle:\n$p")
  }

  test("q106: TPC-H Q5 broadcasts every dim, pushes the date filter, shuffles once") {
    val p = plan("q106_tpch_q5")
    // customer, supplier, nation, region all broadcast
    assert(countOf(p, "BroadcastHashJoin") >= 4, p)
    // the one fact-fact edge is the only sort-merge join
    assert(countOf(p, "SortMergeJoin") <= 1)
    // the 1996 date range reaches the orders scan
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate)"), p)
  }

  test("q110: correlated scalar subquery decorrelates to one aggregate + join") {
    val df = SparkEntry.queries("q110_scalar_subquery")(spark, sf)
    // no subquery expression survives optimization: the per-part avg is
    // computed ONCE and joined back, not re-run per probe row
    val opt = df.queryExecution.optimizedPlan.toString
    assert(!opt.contains("scalar-subquery"), s"subquery not decorrelated:\n$opt")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Subquery"), s"per-row subquery in physical plan:\n$p")
    assert(p.contains("HashAggregate") &&
      (p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin")), p)
  }

  test("q111: EXISTS decorrelates to a left semi join") {
    val df = SparkEntry.queries("q111_exists_subquery")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("LeftSemi"), s"EXISTS not rewritten to semi join:\n$p")
    assert(!p.contains("Subquery"), p)
    // the quarter predicate pushes into the orders scan
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate)"), p)
  }

  test("q113: NOT EXISTS decorrelates to a left anti join") {
    val df = SparkEntry.queries("q113_not_exists_subquery")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("LeftAnti"), s"NOT EXISTS not rewritten to anti join:\n$p")
    assert(!p.contains("Subquery"), p)
  }

  test("q01: aggregation is two-phase (partial before shuffle)") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("HashAggregate"))
    assert(countOf(p, "HashAggregate") >= 2) // partial + final
  }

  test("q119: fuzzy pairing broadcasts the distinct set — no shuffled join of values") {
    val p = plan("q119_fuzzy_dim_pairs")
    // the inequality pairing must be a broadcast nested loop over the
    // dim-sized distinct sets, never a SortMergeJoin (which would
    // shuffle) or a plain CartesianProduct (which would partition both
    // sides without a broadcast)
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q120: moment aggregation is two-phase and reads only the two columns") {
    val p = plan("q120_stats_profile")
    assert(countOf(p, "HashAggregate") >= 2, p) // partial + final (mergeable moments)
    assert(p.contains("l_quantity") && p.contains("l_extendedprice"), p)
    assert(!p.contains("l_shipdate") && !p.contains("l_orderkey"), p) // column pruning
  }

  test("q121: gap fill keeps bounded shuffles, all keyed on user") {
    // rollup agg + grid agg + grid⋈daily join + fill window + final
    // sort — every exchange keys on user_id/(user_id, day); nothing
    // scales with per-user event volume past the first rollup
    assert(countOf(plan("q121_gap_fill"), "Exchange") <= 7)
  }

  test("q122: recursion executes as a distributed UnionLoop, not a driver loop") {
    val p = plan("q122_recursive_hierarchy")
    assert(p.contains("UnionLoop"), p)
    // the step body filters before recursing (pushdown inside the loop)
    assert(p.contains("UnionLoopRef"), p)
  }

  test("q123: bloom probe filters the fact scan BEFORE the join") {
    val p = plan("q123_bloom_pruned_join")
    assert(p.contains("might_contain"), p)
    assert(p.contains("bloom_filter_agg"), p)
    // the probe must sit on the lineitem (application) side below the
    // join: the Filter line carrying might_contain references l_orderkey
    val probeLine = p.linesIterator.find(l =>
      l.contains("might_contain") && l.contains("l_orderkey"))
    assert(probeLine.isDefined, p)
  }

  test("q125: sliding window is one aggregation shuffle over the exploded windows") {
    // Expand(2 windows/row) → partial agg → exchange → final agg → sort
    val p = plan("q125_sliding_window")
    assert(countOf(p, "Exchange") <= 3, p)
    assert(countOf(p, "HashAggregate") >= 2, p) // partial + final
  }

  test("q126: profiler is a single scan of orders") {
    val p = plan("q126_column_profile")
    assert(countOf(p, "FileScan") == 1, p)
  }

  test("q127: lateral limit decorrelates to a group-limit window, no nested loop") {
    val p = plan("q127_lateral_topk")
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q128: moments aggregate two-phase; probe side joins the broadcast stats") {
    val p = plan("q128_zscore_outliers")
    assert(countOf(p, "HashAggregate") >= 2, p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q129: iteration plan is fully re-grounded — no fact re-scan per round") {
    // the distributed edge build runs once at construction; the 10
    // chained rounds join only the collected dimension-sized local
    // relation, so the returned plan must contain no file scan at all
    val p = plan("q129_pagerank_nations")
    assert(!p.contains("FileScan"), p)
    assert(p.contains("LocalTableScan"), p)
  }

  test("q130: curriculum ntile is one scan and bounded shuffles") {
    val p = plan("q130_curriculum_bins")
    assert(countOf(p, "FileScan") == 1, p)
    assert(countOf(p, "Exchange") <= 3, p)
  }

  test("q132: BM25 consumers share the materialized token rollup — no corpus re-scan") {
    // the corpus is scanned exactly once, at rollup materialization
    // (Checkpoints.truncate) BEFORE this plan; the four derived stats
    // (dl/tf/df/corpus) all read the checkpointed RDD, and every stats
    // side joins in broadcast
    val p = plan("q132_bm25_search")
    assert(!p.contains("FileScan"), p)
    assert(countOf(p, "Scan ExistingRDD") >= 3, p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q133: streaks are user-keyed — one pruned scan, no global window") {
    val p = plan("q133_activity_streaks")
    assert(countOf(p, "FileScan") == 1, p)
    // scan pruned to (ts, user_id) — no value/event_type read
    assert(!p.contains("event_type"), p)
    // the island window is partitioned by user, never empty-PARTITION global
    assert(p.contains("windowspecdefinition(user_id"), p)
    assert(countOf(p, "Exchange") <= 3, p)
  }

  test("q136: double correlation decorrelates to semi + anti joins, no per-row subquery") {
    val df = SparkEntry.queries("q136_lone_returner_suppliers")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("LeftSemi"), s"EXISTS not a semi join:\n$p")
    assert(p.contains("LeftAnti"), s"NOT EXISTS not an anti join:\n$p")
    assert(!p.contains("Subquery"), s"row-at-a-time subquery survived:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q138: nested IN pyramid decorrelates; part prune joins broadcast") {
    val df = SparkEntry.queries("q138_big_volume_suppliers")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("LeftSemi"), s"IN not a semi join:\n$p")
    assert(!p.contains("Subquery"), p)
    // the shipdate predicate pushes into the lineitem scan
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p)
  }

  test("q141: regression sums are two-phase; the customer dim joins broadcast") {
    val p = plan("q141_group_ols_trend")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(countOf(p, "HashAggregate") >= 2, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q142/q143: sequence analytics share one user-keyed window shuffle") {
    for (q <- Seq("q142_markov_transitions", "q143_interevent_gaps")) {
      val p = plan(q)
      assert(p.contains("windowspecdefinition(user_id"), s"$q window not user-keyed:\n$p")
      assert(countOf(p, "Exchange") <= 4, s"$q shuffle explosion:\n$p")
    }
  }

  test("q145: deterministic sample prunes the rank-3 cut inside the window") {
    val p = plan("q145_deterministic_sample")
    // Spark's WindowGroupLimit pushes rn<=3 below the full window sort
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("windowspecdefinition(event_type"), p)
  }

  test("q155: range-EXISTS decorrelates to a user-keyed existence join, no nested loop") {
    val df = SparkEntry.queries("q155_conversion_window")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    // the projected EXISTS becomes an ExistenceJoin riding a hash join
    // equi-keyed on user_id, with the time bounds as residual conditions
    assert(p.contains("ExistenceJoin"), s"EXISTS not an existence join:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    // both scans push the event_type predicate down
    assert(p.contains("EqualTo(event_type,click)") &&
      p.contains("EqualTo(event_type,purchase)"), p)
  }

  test("q139: both MAD stages join the broadcast medians — no fact-side SMJ") {
    val p = plan("q139_mad_outliers")
    assert(countOf(p, "BroadcastHashJoin") >= 2, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q140: contingency is ONE fact scan; windows run over the cell rollup") {
    val p = plan("q140_chisq_weekday")
    assert(countOf(p, "FileScan") == 1, p)
    assert(countOf(p, "HashAggregate") >= 2, p) // partial + final over the fact
  }

  test("q144: attribution rides one user-keyed window — bounded shuffles") {
    val p = plan("q144_last_touch_attribution")
    assert(p.contains("windowspecdefinition(user_id"), p)
    assert(countOf(p, "Exchange") <= 4, p)
  }

  test("q147/q148: calendar rollups are single-scan two-phase aggregates") {
    for (q <- Seq("q147_mom_growth", "q148_time_rollup")) {
      val p = plan(q)
      assert(countOf(p, "FileScan") == 1, s"$q re-scans:\n$p")
      assert(countOf(p, "HashAggregate") >= 2, s"$q not partial-aggregated:\n$p")
    }
    // the rollup plans its 4 hierarchy levels as one Expand, not 4 passes
    assert(plan("q148_time_rollup").contains("Expand"), "rollup not Expand-based")
  }

  test("q151/q152: histogram and HOF kernels partial-aggregate / stay map-side") {
    val h = plan("q151_value_histogram")
    assert(countOf(h, "FileScan") == 1, h)
    assert(countOf(h, "HashAggregate") >= 2, h)
    val a = plan("q152_array_hof")
    assert(countOf(a, "FileScan") == 1, a)
    // per-row lambda work + a top-100 — no aggregation shuffle at all
    assert(a.contains("TakeOrderedAndProject"), a)
  }

  test("q159: trigrams share one user-keyed window; top-20 is a TakeOrdered") {
    val p = plan("q159_event_trigrams")
    assert(p.contains("windowspecdefinition(user_id"), p)
    assert(countOf(p, "windowspecdefinition") <= 2, p) // both leads share the spec
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q146: the FK audit scans lineitem exactly once for its three edges") {
    val p = plan("q146_fk_orphan_audit")
    assert(countOf(p, "lineitem.parquet") == 1, s"lineitem re-scanned:\n$p")
    assert(countOf(p, "BroadcastHashJoin") >= 4, p) // part/supplier/customer/nation keys
  }

  test("q156: Q3 top-10 is a TakeOrdered, customer dim broadcasts") {
    val p = plan("q156_tpch_q3")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q157: Q6 pushes all three range predicates into the scan, no join") {
    val p = plan("q157_tpch_q6")
    assert(countOf(p, "FileScan") == 1, p)
    assert(!p.contains("Join"), p)
    // every predicate reaches the parquet reader (the FileScan metadata
    // string truncates at ~100 chars, so assert the prefix that fits)
    assert(p.contains(
      "PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_discount), IsNotNull(l_quantity), GreaterThan"), p)
    assert(countOf(p, "HashAggregate") >= 2, p) // partial + final
  }

  test("q135: PIT join is an equi-join on the user key — never a nested loop") {
    // the interval-containment conditions must ride the user-key hash
    // join as residual predicates; a nested-loop/cartesian here would be
    // the classic interval-join scale failure
    val p = plan("q135_pit_join")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), p)
  }

  test("q167: edge set is materialized once — triangle legs never re-derive it") {
    // the edge build (ONE lineitem scan + pair HOF + support rollup)
    // runs inside Checkpoints.truncate; the wedge join + closure check
    // must consume the materialized edges three times, not re-plan the
    // build per leg (the unmaterialized form re-scanned the fact 6×,
    // measured)
    val p = plan("q167_triangle_count")
    assert(!p.contains("FileScan"), p)
    assert(countOf(p, "Scan ExistingRDD") == 3, p)
  }

  test("q169-q171: profile/experiment/fusion are all single-scan") {
    for (q <- Seq("q169_melt_profile",
        "q170_ab_welch_t", "q171_rrf_fusion")) {
      val p = plan(q)
      assert(countOf(p, "FileScan") == 1, s"$q re-scans:\n$p")
    }
    // the profile melts via ONE Generate(stack), not per-column passes
    assert(plan("q169_melt_profile").contains("Generate"), "no stack melt")
    // the experiment readout partial-aggregates before its 2-row shuffle
    assert(countOf(plan("q170_ab_welch_t"), "HashAggregate") >= 2)
  }

  test("q168: ranking windows are partition-keyed — never a global one-task sort") {
    // the equi-depth bins rank via the range-partition + local
    // row_number + offset device; a windowspecdefinition with an empty
    // PARTITION BY here would mean the whole fact sorts in one task
    val p = plan("q168_equidepth_histogram")
    assert(p.contains("windowspecdefinition(pid"), p)
    assert(!p.contains("FileScan"), p) // ranged frame materialized once
  }

  test("q173: BFS result consumes only materialized rounds — no re-derivation") {
    // every BFS round is truncated; the final union must read the
    // materialized per-round frames, never re-plan the edge build or
    // earlier waves (which would re-run the whole prefix of the loop)
    val p = plan("q173_bfs_distances")
    assert(!p.contains("FileScan"), p)
  }

  test("q174: per-side disjunctions push to both scans; cross-table OR stays residual") {
    val p = plan("q174_tpch_q19")
    // loose invariants by design — exact nested predicate strings and
    // PushedFilters truncation behavior vary across Spark plan-printing
    // versions. What the 100 TB plan needs: each side's own disjunction
    // support reaches ITS scan's pushed filters (quantity on lineitem,
    // size on part), and the cross-table OR doesn't force a cartesian.
    def pushed(colName: String): Boolean =
      ("PushedFilters: \\[[^\\]\\n]*" + colName).r.findFirstIn(p).isDefined
    assert(pushed("l_quantity"), p)
    assert(pushed("p_size"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q175/q176/q177: argmax subquery, IN→semi, NOT EXISTS→anti all plan as joins") {
    val p15 = plan("q175_tpch_q15")
    // the global max is ONE scalar subquery over the aggregate, and the
    // quarter predicate reaches every lineitem scan
    assert(p15.contains("Subquery"), p15)
    assert(p15.contains("GreaterThanOrEqual(l_shipdate,1996-01-01"), p15)
    assert(!p15.contains("NestedLoopJoin") || p15.contains("BroadcastNestedLoopJoin"), p15)
    assert(plan("q176_tpch_q18").contains("LeftSemi"), "IN not rewritten to semi join")
    val p22 = plan("q177_tpch_q22")
    assert(p22.contains("LeftAnti"), p22)
    // the dormancy cutoff reaches the orders scan; the cohort IN-list
    // reaches the customer scan
    assert(p22.contains("GreaterThanOrEqual(o_orderdate,2000-07-01"), p22)
    assert(p22.contains("In(c_nationkey"), p22)
  }

  test("q172: containment verification is candidate-bounded — never all-pairs") {
    val p = plan("q172_containment_join")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the gram frame is materialized once and fanned to df/prefix/verify
    assert(!p.contains("FileScan"), p)
  }

  test("q178: Q7 broadcasts every dim, ships the date filter to the scan, pair OR stays residual") {
    val p = plan("q178_tpch_q7")
    // supplier, customer, and the two pre-filtered nation arms broadcast
    assert(countOf(p, "BroadcastHashJoin") >= 4, p)
    assert(!p.contains("CartesianProduct"), p)
    // the ship-date window reaches the lineitem scan
    assert(("PushedFilters: \\[[^\\]\\n]*l_shipdate".r).findFirstIn(p).isDefined, p)
    // the cross-arm nation-pair OR survives as a post-join residual —
    // it references both arms, so no scan can absorb it
    assert(p.contains("supp_nation"), p)
  }

  test("q179: Q8's two-level aggregate is ONE aggregation pass; part filter pushes down") {
    val p = plan("q179_tpch_q8")
    // numerator and denominator fold in the same partial+final pair —
    // not two query trees
    assert(countOf(p, "HashAggregate") == 2, p)
    assert(("PushedFilters: \\[[^\\]\\n]*p_type".r).findFirstIn(p).isDefined, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q180: Q10's top-20 is a TakeOrdered, never a global sort; both fact filters push") {
    val p = plan("q180_tpch_q10")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(("PushedFilters: \\[[^\\]\\n]*l_returnflag".r).findFirstIn(p).isDefined, p)
    assert(("PushedFilters: \\[[^\\]\\n]*o_orderdate".r).findFirstIn(p).isDefined, p)
  }

  test("q181: Q12's CASE split is one aggregation pass; lineitem filters push, ship-lag is residual") {
    val p = plan("q181_tpch_q12")
    assert(countOf(p, "HashAggregate") == 2, p)
    assert(("PushedFilters: \\[[^\\]\\n]*l_returnflag".r).findFirstIn(p).isDefined, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q188: Q4's EXISTS is a semi join (no duplicate-then-distinct); date window pushes to orders") {
    val p = plan("q188_tpch_q4")
    assert(p.contains("LeftSemi"), p)
    // an order with many late lines must count once WITHOUT an
    // Aggregate/Distinct repair step after an inner join
    assert(!p.contains("Distinct"), p)
    assert(("PushedFilters: \\[[^\\]\\n]*o_orderdate".r).findFirstIn(p).isDefined, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q189: Q13 aggregates orders BEFORE the left join — the fact crosses its shuffle pre-collapsed") {
    val p = plan("q189_tpch_q13")
    // two aggregations (per-custkey count, then the distribution), each
    // a partial+final pair — and nothing else
    assert(countOf(p, "HashAggregate") == 4, p)
    // the canonical join-then-count would read o_orderkey through the
    // join; aggregate-first needs only custkey + status at the scan
    assert(!p.contains("o_totalprice"), p)
    assert(("PushedFilters: \\[[^\\]\\n]*o_orderstatus".r).findFirstIn(p).isDefined, p)
  }

  test("q190: Q17's correlated avg is one scan + one partkey window — no self-join of lineitem") {
    val p = plan("q190_tpch_q17")
    // exactly two scans: lineitem once, the brand dim once (broadcast)
    assert(countOf(p, "FileScan") == 2, p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("windowspecdefinition(l_partkey"), p)
    assert(("PushedFilters: \\[[^\\]\\n]*p_brand".r).findFirstIn(p).isDefined, p)
  }

  test("q192: chunk first-occurrence is an aggregation, never a window over the chunk key") {
    val p = plan("q192_chunk_dedup")
    // a row_number() PARTITION BY chunk would serialize a boilerplate
    // mega-chunk into one task; min(struct(doc_id, ix)) keeps partial
    // aggregation (map-side combine) in front of the shuffle
    assert(!p.contains("windowspecdefinition"), p)
    assert(p.contains("partial_min"), p)
  }

  test("q191: Q21's three lineitem self-references ride ONE orderkey shuffle") {
    val df = SparkEntry.queries("q191_tpch_q21")(spark, sf)
    // the l⋈o sort-merge join pays one exchange per side; the
    // per-(order,supplier) rollup reuses the orderkey partitioning via
    // the subset-key rule and the per-order window reuses it again —
    // the canonical EXISTS/NOT-EXISTS form would shuffle lineitem three
    // times. The only other exchange is the final (nation, supplier)
    // rollup over already-filtered per-supplier rows (tiny at any
    // scale). TakeOrdered handles the top-100 without a sort exchange;
    // supplier/nation broadcast.
    assert(distinctShuffles(df) == 3, df.queryExecution.executedPlan.toString)
    val p = plan("q191_tpch_q21")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(("PushedFilters: \\[[^\\]\\n]*o_orderstatus".r).findFirstIn(p).isDefined, p)
  }
}
