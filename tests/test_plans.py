"""Physical-plan assertions: the scale properties we claim must be
visible in the plans Catalyst actually produces."""

from __future__ import annotations

import pytest

from statcan_etl_pipeline_spark.registry import QUERIES

_TABLES = (
    "customer", "orders", "lineitem", "part", "supplier",
    "nation", "region", "events", "documents", "embeddings",
)


def _broadcast_scan_tables(spark, name, sf_dir) -> set[str]:
    """Tables whose file scans feed a BroadcastExchange UN-aggregated —
    i.e. the broadcast side is the raw table, not a bounded aggregate
    of it. An Aggregate node between the exchange and the scan resets
    the flag: broadcasting a groupBy(segment) cap table built FROM fact
    scans is the sanctioned pattern; broadcasting the fact table is
    the 8-GB-limit violation. ReusedExchangeExec references are
    resolved to the exchange they alias so an AQE-deduped broadcast
    can't escape detection."""
    root = QUERIES[name](spark, sf_dir)._jdf.queryExecution().executedPlan()
    found: set[str] = set()

    def walk(node, under_bcast: bool) -> None:
        cls = node.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            walk(node.executedPlan(), under_bcast)
            return
        if "QueryStageExec" in cls:
            walk(node.plan(), under_bcast)
            return
        if "ReusedExchange" in cls:
            # ReusedExchangeExec(output, child=the referenced exchange):
            # descend into the original so a deduped broadcast side is
            # still walked with under_bcast=True.
            walk(node.child(), under_bcast)
            return
        if "FileSourceScan" in cls and under_bcast:
            desc = node.toString()
            for t in _TABLES:
                if f"{t}.parquet" in desc:
                    found.add(t)
        under = under_bcast or "BroadcastExchange" in cls
        if "Aggregate" in cls:
            under = False
        ch = node.children()
        for i in range(ch.length()):
            walk(ch.apply(i), under)

    walk(root, False)
    return found


def _plan(spark, name, sf_dir) -> str:
    return (
        QUERIES[name](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


def test_q1_filter_pushed_to_parquet_scan(spark, sf_small):
    plan = _plan(spark, "q1_pricing_summary", sf_small)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_q1_column_pruning(spark, sf_small):
    plan = _plan(spark, "q1_pricing_summary", sf_small)
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read and all("l_orderkey" not in ln for ln in read)  # unused col not read


def test_q5_dim_joins_are_broadcast(spark, sf_small):
    plan = _plan(spark, "q5_local_supplier_volume", sf_small)
    assert plan.count("BroadcastHashJoin") >= 3  # supplier, nation, region
    assert "CartesianProduct" not in plan


def test_topk_uses_take_ordered_not_global_sort(spark, sf_small):
    plan = _plan(spark, "topk_customers_by_revenue", sf_small)
    assert "TakeOrderedAndProject" in plan


def test_q1_partial_aggregation(spark, sf_small):
    plan = _plan(spark, "q1_pricing_summary", sf_small)
    assert "partial_" in plan  # map-side combine before the shuffle


def test_shingle_join_no_cartesian(spark, sf_small):
    plan = _plan(spark, "dedup_ngram_jaccard", sf_small)
    assert "CartesianProduct" not in plan


def test_minhash_single_agg_shuffle(spark, sf_small):
    plan = _plan(spark, "dedup_minhash_lsh", sf_small)
    assert "CartesianProduct" not in plan


def test_asof_join_is_window_not_inequality_join(spark, sf_small):
    plan = _plan(spark, "asof_join_purchase_to_view", sf_small)
    assert "RunningWindowFunction" in plan or "Window" in plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_broadcast_hints_survive_threshold_zero(spark, sf_small):
    """Dimension joins carry explicit broadcast() hints, so the plan
    keeps BroadcastHashJoin even when autoBroadcastJoinThreshold is
    disabled — at 100 TB you can't rely on size estimation alone
    (stats are often missing/stale on fresh parquet)."""
    from statcan_etl_pipeline_spark.registry import QUERIES

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = (
            QUERIES["q5_local_supplier_volume"](spark, sf_small)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bench_headline_queries_all_registered():
    import bench
    from statcan_etl_pipeline_spark.registry import ORACLES, QUERIES

    missing = [n for n in bench.HEADLINE if n not in QUERIES]
    assert not missing, f"bench names drifted from registry: {missing}"
    # headline set stays comparable across rounds: r1 recorded 18
    assert len(bench.HEADLINE) == 18
    # r10: the LLM-pipeline family must stay registered and comparable
    missing_llm = [n for n in bench.LLM_PIPELINE if n not in QUERIES]
    assert not missing_llm, f"llm bench names drifted: {missing_llm}"
    assert len(bench.LLM_PIPELINE) == 6
    # r11 continuation: the graph/iterative family must stay registered
    # and comparable
    missing_g = [n for n in bench.GRAPH_PIPELINE if n not in QUERIES]
    assert not missing_g, f"graph bench names drifted: {missing_g}"
    assert len(bench.GRAPH_PIPELINE) == 4
    assert bench.REPS >= 3  # single-shot timing is a noise instrument
    # r13 (VERDICT r12 item 5): the driver keeps a 2000-char stdout
    # tail — the single stdout JSON line must fit inside it WITH
    # worst-case timing widths, or the totals get truncated again.
    missing_s = [n for n in bench.SIM_PIPELINE if n not in QUERIES]
    assert not missing_s, f"sim bench names drifted: {missing_s}"
    import json

    fat = {n: 9999.999 for n in bench.HEADLINE}
    payload = bench._stdout_payload(
        fat,
        {n: 9999.999 for n in bench.LLM_PIPELINE},
        {n: 9999.999 for n in bench.GRAPH_PIPELINE},
        {n: 9999.999 for n in bench.SIM_PIPELINE},
        [99999.999] * bench.REPS,
        0.1,
    )
    line = json.dumps(payload)
    assert len(line) < 1900, f"bench stdout line would truncate: {len(line)}"
    # the driver keeps the LAST 2000 chars of stdout, so every total
    # must come AFTER the per-query maps — if the line ever outgrows
    # the tail again, the cut lands on a map prefix, not the totals
    # (exactly how BENCH_r12 lost `headline_queries_total`)
    keys = list(payload)
    for total in ("llm_pipeline_total", "graph_pipeline_total",
                  "sim_pipeline_total", "value", "metric"):
        assert keys.index(total) > keys.index("sim_queries"), total
    assert json.loads(line)["metric"] == "headline_queries_total"


def test_bucketed_tables_join_without_shuffle(spark, sf_small):
    """Two tables bucketed on the join key join with ZERO Exchange
    operators — the layout IS the shuffle, paid once at write time.
    This is the 100 TB fact-fact join strategy."""
    from statcan_etl_pipeline_spark.catalog import load_table
    from statcan_etl_pipeline_spark.sinks.writers import write_bucketed_table

    orders = load_table(spark, sf_small, "orders")
    li = load_table(spark, sf_small, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed_table(orders, "b_orders", "o_orderkey", n_buckets=8)
    write_bucketed_table(li, "b_lineitem", "l_orderkey", n_buckets=8)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # at sf0.001 the planner would rather broadcast; disable it to
        # exercise the path a fact-fact join takes at scale
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        bo = spark.table("b_orders")
        bl = spark.table("b_lineitem")
        joined = bo.join(bl, bo.o_orderkey == bl.l_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # the whole point: no shuffle exchange anywhere in the join plan
        assert "Exchange hashpartitioning" not in plan, plan
        assert "Bucketed: true" in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_aqe_splits_skewed_join_partitions(spark):
    """A pathologically hot key must trigger AQE's skew-join split
    (SortMergeJoin(skew=true) in the FINAL adaptive plan) — the runtime
    complement to the explicit salted_join operator. Thresholds are
    lowered so the 200k-row hot partition counts as skewed at test
    scale; at 100 TB the defaults (256MB) do the same job."""
    from pyspark.sql import functions as F

    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        left = spark.range(0, 200000).select(
            F.lit(0).alias("k"), F.col("id").alias("v")
        ).union(
            spark.range(0, 9900).select(
                (F.col("id") % 99 + 1).alias("k"), F.col("id").alias("v")
            )
        )
        right = spark.range(0, 100).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("rv")
        )
        joined = left.join(right, "k")
        rows = joined.collect()  # execute THIS plan so AQE finalizes it
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan
        assert len(rows) == 209900  # skew split must not change results
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_runtime_bloom_filter_prunes_fact_scan(spark, sf_med):
    """With a selective filter on the build side of a shuffle join,
    Catalyst injects a runtime Bloom filter (might_contain on the fact
    side) — rows that can't join are dropped AT THE SCAN instead of
    shuffling 100 TB to discover they have no match. Thresholds lowered
    to trigger at test scale (defaults: 10 GB application side)."""
    from pyspark.sql import functions as F

    from statcan_etl_pipeline_spark.catalog import load_table

    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        li = load_table(spark, sf_med, "lineitem")
        orders = load_table(spark, sf_med, "orders").filter(
            F.col("o_totalprice") > 400000
        )
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan
        # and the filter must not change results vs the bloom-less join
        n_with = joined.count()
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        n_without = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
        assert n_with == n_without > 0
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_sharded_packing_row_window_partitions_by_shard(spark, sf_small):
    """The scale path for greedy packing: the row-level cumulative
    window (the one ordered by doc_id) must partition by
    (source, shard), never by source alone — a source-only partition
    serializes each source through one task."""
    plan = _plan(spark, "doc_greedy_packing_sharded", sf_small)
    wins = [ln for ln in plan.splitlines() if "windowspecdefinition" in ln]
    row_wins = [ln for ln in wins if "doc_id" in ln]
    assert row_wins, plan
    for ln in row_wins:
        assert "shard" in ln, ln


def test_abc_cumulative_window_partitions_by_shard(spark, sf_small):
    """ABC classification's per-part cumulative sum must run inside
    range shards (windowspec partitioned by `shard`), never as one
    global orderBy window — that would drag every part through a
    single task. The only partition-less windows allowed are the ones
    over the tiny K-row shard-totals aggregate (`shard_rev`)."""
    plan = _plan(spark, "abc_part_classification", sf_small)
    wins = [ln for ln in plan.splitlines() if "windowspecdefinition" in ln]
    part_wins = [ln for ln in wins if "rev_c" in ln and "shard_rev" not in ln]
    assert part_wins, plan
    for ln in part_wins:
        assert "windowspecdefinition(shard" in ln, ln


def test_transition_matrix_single_user_shuffle_no_global_window(spark, sf_small):
    """events_user_transitions: the lead() window partitions by
    user_id (never an empty partitionBy), and the from_total join is
    a broadcast — no second full-data shuffle."""
    plan = _plan(spark, "events_user_transitions", sf_small)
    n_windows = plan.count("windowspecdefinition(")
    assert n_windows >= 1
    assert plan.count("windowspecdefinition(user_id#") == n_windows
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_kmeans_assignment_no_join_no_cartesian(spark, sf_small):
    """embedding_kmeans: nearest-centroid assignment is a pure
    projection over broadcast literal centroids — the final plan has
    no join of any kind and aggregates with map-side partials."""
    plan = _plan(spark, "embedding_kmeans", sf_small)
    assert "CartesianProduct" not in plan
    assert "Join" not in plan
    assert "partial_" in plan


def test_range_search_broadcasts_query_set(spark, sf_small):
    plan = _plan(spark, "ann_range_search", sf_small)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_centroids_by_label_partial_aggregation(spark, sf_small):
    """posexplode fan-out aggregates map-side before the single
    (label, pos) shuffle."""
    plan = _plan(spark, "embedding_centroids_by_label", sf_small)
    assert "partial_" in plan
    assert "Exchange" in plan


def test_pagerank_rank_state_is_broadcast_per_iteration(spark, sf_small):
    """graph_pagerank: the O(|V|) rank state joins into the O(|E|)
    contribution side via broadcast — the edge table itself never
    shuffles for a join; aggregations keep map-side partials. r14:
    iterations 1..N-1 are lazily localCheckpoint'ed (plan truncation),
    so the visible plan is the LAST iteration — identical by
    construction to the hidden ones — reading the prior state from
    checkpoint scans, with no lineitem file scan re-derivation."""
    plan = _plan(spark, "graph_pagerank", sf_small)
    assert plan.count("BroadcastHashJoin") >= 1  # the rank join, last iter
    assert "ExistingRDD" in plan  # prior iterations feed in as checkpoints
    assert "CartesianProduct" not in plan
    assert "partial_" in plan
    scans = [ln for ln in plan.splitlines()
             if "FileScan" in ln and "lineitem" in ln]
    assert not scans, "edge build must not be re-derived per iteration"


def test_global_shuffle_rank_window_partitions_by_bucket(spark, sf_small):
    """doc_global_shuffle's per-row rank window must partition by the
    256-value hash bucket; the only partition-less window allowed is
    the exclusive prefix sum over the 256-row bucket-count aggregate."""
    plan = _plan(spark, "doc_global_shuffle", sf_small)
    wins = [ln for ln in plan.splitlines() if "windowspecdefinition" in ln]
    row_wins = [ln for ln in wins if "skey" in ln]
    assert row_wins, plan
    for ln in row_wins:
        assert "windowspecdefinition(bucket" in ln, ln


def test_gini_rank_window_partitions_by_bucket(spark, sf_small):
    """gini_customer_revenue ranks customers inside 256 value-range
    buckets (two-pass prefix sum), never through one global orderBy
    window over the customer table."""
    plan = _plan(spark, "gini_customer_revenue", sf_small)
    wins = [ln for ln in plan.splitlines() if "windowspecdefinition" in ln]
    row_wins = [ln for ln in wins if "o_custkey" in ln]
    assert row_wins, plan
    for ln in row_wins:
        assert "windowspecdefinition(bucket" in ln, ln


def test_unigram_rarity_vocab_join_is_broadcast(spark, sf_small):
    """The vocab (token->freq) side of doc_unigram_rarity's per-token
    join must broadcast — shuffling the exploded token stream on word
    would dominate the query at corpus scale."""
    plan = _plan(spark, "doc_unigram_rarity", sf_small)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_pareto_frontier_windows_partition_by_bucket(spark, sf_small):
    """pareto_frontier_parts computes strict-predecessor max inside 256
    value-range buckets; per-row windows must partition by bucket (the
    only partition-less window is the 256-row cross-bucket prefix max)."""
    plan = _plan(spark, "pareto_frontier_parts", sf_small)
    wins = [ln for ln in plan.splitlines() if "windowspecdefinition" in ln]
    row_wins = [ln for ln in wins if "price_c" in ln and "p_size" in ln]
    assert row_wins, plan
    for ln in row_wins:
        assert "windowspecdefinition(bucket" in ln, ln


def test_triangle_census_no_cartesian(spark, sf_small):
    """Edge build, wedge join, and wedge closing are all equi-joins —
    a CartesianProduct or nested-loop join anywhere means the degree-
    ordered node-iterator degenerated to all-pairs."""
    plan = _plan(spark, "part_copurchase_triangles", sf_small)
    assert "CartesianProduct" not in plan
    # the only BroadcastNestedLoopJoins allowed are the singleton-
    # aggregate crossJoins stitching the final 1-row summary together
    for ln in plan.splitlines():
        if "BroadcastNestedLoopJoin" in ln:
            assert "Cross" in ln, ln


def test_triangle_census_edge_iterator_no_wedge_stream(spark, sf_small):
    """The r14 rewrite counts triangles edge-iterator style: each
    oriented edge intersects the two sorted adjacency arrays
    (array_intersect), so the plan carries NO materialized wedge
    stream — no posexplode'd suffix-slice Generate (the only
    explode(slice(...)) lives inside the checkpointed edge build,
    invisible here) and no LeftSemi close probe (the r11 shape). A
    Generate or LeftSemi reappearing means the C(outdeg, 2) wedge
    expansion regressed back into the shuffle.

    NOTE (r15, ADVICE r14): these are STRING-level assertions over the
    formatted explain output, so they depend on Spark's explain
    rendering AND on the lazy localCheckpoint hiding the edge-build
    Generate behind a Scan ExistingRDD; a Spark version bump or a
    switch to eager checkpointing could flip them without a real
    regression. If they flake after an upgrade, re-assert on the
    analyzed plan's logical operators instead."""
    plan = _plan(spark, "part_copurchase_triangles", sf_small)
    assert "array_intersect" in plan, plan
    assert "LeftSemi" not in plan, plan
    gens = [ln for ln in plan.splitlines() if "Generate explode(slice(" in ln]
    assert not gens, plan


def test_kcore_edge_set_shrinks_not_rejoins(spark, sf_small):
    """The r11 peel iterates on the SHRINKING checkpointed edge set:
    each round's plan must read the prior round's materialized RDD
    (Scan ExistingRDD), not re-derive the original 11M-edge
    co-purchase join. With 12 rounds the executed plan therefore
    carries one checkpoint scan per round-edge/alive pair; the
    original lineitem self-join appears only beneath the FIRST
    checkpoint, so the final stitched plan contains NO lineitem file
    scan at all (every branch hangs off checkpoint scans)."""
    plan = _plan(spark, "part_kcore_decomposition", sf_small)
    assert "ExistingRDD" in plan, plan
    scans = [ln for ln in plan.splitlines()
             if "FileScan" in ln and "lineitem" in ln]
    assert not scans, plan


def test_kcore_removed_set_broadcast_guard(spark):
    """The decrement join's removed-set broadcast is guarded (r15,
    VERDICT r14 item 4a/8): within the guard the frame carries the
    explicit broadcast hint (the common case — gate-SF removed sets are
    O(10^4)); above it the hint is absent so the planner can fall back
    to a shuffle join instead of forcing an over-cap broadcast. The
    count the guard consumes is the one the convergence check already
    pays for — no extra action."""
    from pyspark.sql import functions as F

    from statcan_etl_pipeline_spark.queries.graph import (
        _KCORE_BCAST_MAX_REMOVED,
        _maybe_broadcast,
    )

    df = spark.range(5).select(F.col("id").alias("u"))
    under = _maybe_broadcast(df, _KCORE_BCAST_MAX_REMOVED)
    over = _maybe_broadcast(df, _KCORE_BCAST_MAX_REMOVED + 1)
    assert "broadcast" in under._jdf.queryExecution().analyzed().toString()
    assert "broadcast" not in over._jdf.queryExecution().analyzed().toString()
    # the guard default must clear any gate-SF removal by orders of
    # magnitude so the local plan keeps the broadcast
    assert _KCORE_BCAST_MAX_REMOVED >= 1_000_000


def test_chi2_margin_joins_are_broadcast(spark, sf_small):
    """Row/column margins and the grand total are tiny aggregates of the
    contingency table — they must broadcast back, never shuffle it."""
    plan = _plan(spark, "chi2_segment_priority", sf_small)
    assert plan.count("BroadcastHashJoin") >= 2


def test_strict_funnel_window_partitions_by_user(spark, sf_small):
    """lead() windows run per user — no global event-ordered window."""
    plan = _plan(spark, "events_strict_funnel_pattern", sf_small)
    wins = [ln for ln in plan.splitlines() if "windowspecdefinition" in ln]
    assert wins, plan
    for ln in wins:
        assert "windowspecdefinition(user_id" in ln, ln


def test_supplier_share_rank_window_partitions_by_nation(spark, sf_small):
    """The share/rank window runs per nation — bounded partitions."""
    plan = _plan(spark, "supplier_share_of_nation", sf_small)
    wins = [ln for ln in plan.splitlines() if "windowspecdefinition" in ln]
    assert wins, plan
    for ln in wins:
        assert "windowspecdefinition(n_name" in ln, ln


def test_ltv_cohort_partial_aggregation(spark, sf_small):
    """Both the first-order reduce and the cohort-cell aggregate must
    map-side combine before their shuffles."""
    plan = _plan(spark, "customer_ltv_cohort", sf_small)
    assert "partial_" in plan


def test_udtf_lateral_join_is_python_udtf_node(spark, sf_small):
    """The UDTF surface actually lowers to a Python UDTF evaluation
    node (Arrow-batched when available), not a collect-and-reexplode."""
    plan = _plan(spark, "udtf_token_positions", sf_small)
    assert "UDTF" in plan, plan


def test_weighted_median_windows_partition_by_brand_bucket(spark, sf_small):
    """The per-row cumulative-weight window must partition by
    (brand, price bucket); the only brand-level windows run over the
    ≤256-row bucket summary."""
    plan = _plan(spark, "weighted_median_price_by_brand", sf_small)
    wins = [ln for ln in plan.splitlines() if "windowspecdefinition" in ln]
    row_wins = [ln for ln in wins if "p_partkey" in ln]
    assert row_wins, plan
    for ln in row_wins:
        assert "bucket" in ln.split("windowspecdefinition", 1)[1][:60], ln


def test_copurchase_similarity_no_cartesian_and_no_bnlj(spark, sf_small):
    """The wedge self-join and degree joins must stay equi-joins."""
    plan = _plan(spark, "copurchase_part_similarity", sf_small)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_novelty_is_aggregate_plus_equijoin(spark, sf_small):
    """First-occurrence novelty must not contain any pairwise join —
    one aggregate over the inverted index plus one equi-join back."""
    plan = _plan(spark, "doc_novelty_by_order", sf_small)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "partial_" in plan  # map-side combine on the min(doc_id) agg


def test_ohlc_is_single_aggregation_no_window(spark, sf_small):
    """OHLC bars run as ONE partial-aggregated groupBy (min_by/max_by
    struct keys), never as a fact-table window."""
    plan = _plan(spark, "events_ohlc_hourly", sf_small)
    assert "partial_" in plan
    assert "RunningWindowFunction" not in plan
    # exactly one wide shuffle for the aggregation (+1 for final sort)
    assert plan.count("hashpartitioning") <= 2


def test_interclass_similarity_small_side_broadcasts(spark, sf_small):
    plan = _plan(spark, "embedding_interclass_similarity", sf_small)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_per_doc_outputs_have_no_trailing_global_sort(spark, sf_small):
    """Driver hash is order-insensitive; per-doc/per-pair outputs must
    not end in a global Sort+Exchange (a full shuffle of N corpus rows
    at scale). The final node should be projection/aggregation-shaped."""
    for name in [
        "text_stats",
        "text_quality_score",
        "text_fingerprint",
        "dedup_ngram_jaccard",
        "dedup_minhash_lsh",
        "dedup_connected_groups",
        "doc_unigram_rarity",
        "statcan_latest_revision",
    ]:
        plan = _plan(spark, name, sf_small)
        first_lines = "\n".join(plan.splitlines()[:6])
        # a trailing global sort shows as a rangepartitioning Exchange
        # feeding a Sort at the very top of the plan
        assert "rangepartitioning" not in first_lines, (name, first_lines)


def test_ks_rank_window_partitions_by_bucket(spark, sf_small):
    """ks_order_value_by_priority's cumulative counts rank distinct
    values inside 256 range buckets (two-pass prefix sum); per-value
    windows must partition by bucket — never one global orderBy window
    over the distinct-value set."""
    plan = _plan(spark, "ks_order_value_by_priority", sf_small)
    wins = [ln for ln in plan.splitlines() if "windowspecdefinition" in ln]
    row_wins = [ln for ln in wins if "c1" in ln or "c2" in ln]
    assert row_wins, plan
    for ln in row_wins:
        assert "windowspecdefinition(bucket" in ln, ln


def test_x11_trend_offset_join_no_cartesian(spark, sf_small):
    """statcan_x11_trend's +/-6 month fan-out must be an equi-join on
    (priority, ord+k) over the bounded monthly aggregate — no
    cartesian/nested-loop product anywhere in the plan."""
    plan = _plan(spark, "statcan_x11_trend", sf_small)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_rca_dim_joins_broadcast_no_second_fact_scan(spark, sf_small):
    """nation_type_rca broadcasts all three dimension joins and reads
    the lineitem fact exactly once (margins re-aggregate from cells)."""
    plan = _plan(spark, "nation_type_rca", sf_small)
    assert "CartesianProduct" not in plan
    scans = [
        ln
        for ln in plan.splitlines()
        if "FileScan parquet" in ln and "lineitem" in ln
    ]
    assert len(scans) == 1, plan


def test_raking_margin_joins_broadcast(spark, sf_small):
    """survey_raking_calibration joins per-pass margin sums and targets
    back to the sample as broadcasts (bounded region/segment tables);
    no cartesian product anywhere."""
    plan = _plan(spark, "survey_raking_calibration", sf_small)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_rolling_actives_no_fact_window(spark, sf_small):
    """events_rolling_7d_active_users must contain NO window function at
    all — the rolling distinct is the 7x fan-out + distinct-count
    rewrite, never a window frame over the event stream."""
    plan = _plan(spark, "events_rolling_7d_active_users", sf_small)
    assert "windowspecdefinition" not in plan


def test_spearman_rank_windows_partition_by_bucket(spark, sf_small):
    """spearman_price_acctbal's midranks must come from bucket-partitioned
    windows (two-pass prefix sum) — never one global window over the
    distinct-value sets of either variable."""
    plan = _plan(spark, "spearman_price_acctbal", sf_small)
    wins = [ln for ln in plan.splitlines() if "windowspecdefinition" in ln]
    row_wins = [ln for ln in wins if "c1" in ln or "c2" in ln]
    assert row_wins, plan
    for ln in row_wins:
        assert "windowspecdefinition(bucket" in ln, ln


def test_chained_fisher_no_cartesian(spark, sf_small):
    """price_index_chained_fisher's month-to-month link join must be an
    equi-join on (part, month-1); no nested-loop anywhere."""
    plan = _plan(spark, "price_index_chained_fisher", sf_small)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cooccurrence_no_cartesian(spark, sf_small):
    """events_type_cooccurrence's pair explode is the per-user equi
    self-join on user_id; margins broadcast; no cartesian except the
    1-row totals crossJoin."""
    plan = _plan(spark, "events_type_cooccurrence", sf_small)
    assert "CartesianProduct" not in plan


def test_attribution_banded_join_no_cartesian(spark, sf_small):
    """events_multitouch_attribution's touch lookup must be the banded
    equi-join (user, hour-band) — no fact-by-fact nested loop."""
    plan = _plan(spark, "events_multitouch_attribution", sf_small)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_denton_year_aggregates_broadcast(spark, sf_small):
    """statcan_denton_prorata joins its two yearly benchmark aggregates
    back to the monthly indicator as broadcasts — the monthly side must
    never shuffle for a join against a ~7-row aggregate."""
    plan = _plan(spark, "statcan_denton_prorata", sf_small)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_feature_hash_no_udf_in_plan(spark, sf_small):
    """doc_feature_hash_embedding's hashing trick must stay JVM-side —
    no Python evaluation nodes anywhere."""
    plan = _plan(spark, "doc_feature_hash_embedding", sf_small)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_tax_audit_single_scan(spark, sf_small):
    """lineitem_tax_audit is one aggregation pass — exactly one lineitem
    scan in the executed plan."""
    plan = _plan(spark, "lineitem_tax_audit", sf_small)
    scans = [
        ln for ln in plan.splitlines() if "FileScan parquet" in ln and "lineitem" in ln
    ]
    assert len(scans) == 1, plan


def test_ht_audit_no_fact_broadcast(spark, sf_small):
    """survey_ht_total_audit joins two fact-scale tables (orders x
    customer) — neither side may carry a broadcast hint: at 100 TB a
    fact-side broadcast exceeds Spark's 8 GB broadcast hard limit. With
    autoBroadcastJoinThreshold disabled, any BroadcastHashJoin left in
    the static plan could only come from an explicit hint — so there
    must be none."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = _plan(spark, "survey_ht_total_audit", sf_small)
        assert "BroadcastHashJoin" not in plan, plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


@pytest.mark.parametrize(
    "qname",
    [
        "survey_winsorized_total",
        "survey_jackknife_variance",
        "survey_neyman_allocation",
        "atkinson_inequality_by_nation",
        "statcan_gvf_cv_model",
        "statcan_random_rounding_base5",
    ],
)
def test_survey2_no_fact_side_broadcast(spark, sf_small, qname):
    """The survey2 estimation queries all join orders x customer — both
    fact-scale at 100 TB, so neither may carry an explicit broadcast
    hint (the survey_ht_total_audit discipline). With the auto
    threshold disabled, any scan still under a BroadcastExchange can
    only come from a hint — dims (nation) and bounded aggregates (caps)
    are allowed; customer/orders/lineitem are not."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        bcast = _broadcast_scan_tables(spark, qname, sf_small)
        assert not bcast & {"customer", "orders", "lineitem"}, bcast
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


# Queries sanctioned to broadcast a bounded SUBSET of a fact-scale
# table: the ANN/retrieval family broadcasts its query set, which is
# `filter(vec_id < N_QUERIES)` — a constant row count (5-8 rows) at ANY
# scale factor, bounded by construction rather than by an Aggregate
# node (which is all the plan walker can see). Everything else must
# never put a raw fact scan under a BroadcastExchange.
_BOUNDED_QUERYSET_BCAST = {
    "ann_ivf_cosine",
    "ann_ivfpq_cosine",
    "ann_lsh_cosine",
    "ann_pq_cosine",
    "ann_range_search",
    "ann_sq_cosine",
    "embedding_matryoshka_recall",
    "hard_negative_mining",
    "knn_bruteforce_cosine",
    "knn_label_eval",
}

_FACT_TABLES = {"customer", "orders", "lineitem", "events", "documents", "embeddings"}


@pytest.mark.full
def test_registry_wide_no_fact_scan_broadcast(spark, sf_small):
    """EVERY registered query: no raw fact-table scan may sit under a
    BroadcastExchange (customer/orders/lineitem/events/documents/
    embeddings all grow linearly with scale — at 100 TB a raw-scan
    broadcast exceeds Spark's 8 GB limit). Bounded aggregates built
    FROM fact scans are allowed (the walker resets on Aggregate);
    constant-size query subsets are allowlisted above. With the auto
    threshold disabled, any surviving BroadcastExchange can only come
    from an explicit hint — this sweep is what caught five stray
    customer-side broadcasts in round 9 (analytics8/analytics6/etl/
    stats2/survey) that the per-query tests had missed."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    bad: dict[str, list[str]] = {}
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        for name in sorted(QUERIES):
            if name in _BOUNDED_QUERYSET_BCAST:
                continue
            hits = _broadcast_scan_tables(spark, name, sf_small) & _FACT_TABLES
            if hits:
                bad[name] = sorted(hits)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert not bad, f"raw fact scans broadcast un-aggregated: {bad}"


def _unpartitioned_window_fact_scans(spark, name, sf_dir) -> set[str]:
    """Fact tables whose RAW scans feed a WindowExec with an EMPTY
    partitionSpec (i.e. the whole input is sorted into one partition)
    with no Aggregate/Limit between the window and the scan. A global
    window over a bounded aggregate (band census, 25-nation fold) is
    sanctioned; a global window over the raw fact table is the
    single-partition sort that dies at 100 TB."""
    root = QUERIES[name](spark, sf_dir)._jdf.queryExecution().executedPlan()
    found: set[str] = set()

    def walk(node, under_gwin: bool) -> None:
        cls = node.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            walk(node.executedPlan(), under_gwin)
            return
        if "QueryStageExec" in cls:
            walk(node.plan(), under_gwin)
            return
        if "ReusedExchange" in cls:
            walk(node.child(), under_gwin)
            return
        if "FileSourceScan" in cls and under_gwin:
            desc = node.toString()
            for t in _TABLES:
                if f"{t}.parquet" in desc:
                    found.add(t)
        under = under_gwin
        if cls in ("WindowExec", "WindowGroupLimitExec") and node.partitionSpec().isEmpty():
            under = True
        if "Aggregate" in cls or "Limit" in cls or "TakeOrdered" in cls:
            under = False
        ch = node.children()
        for i in range(ch.length()):
            walk(ch.apply(i), under)

    walk(root, False)
    return found


@pytest.mark.full
def test_registry_wide_plan_audit(spark, sf_small):
    """EVERY registered query, one executed-plan pass, three rules:
    (1) no CartesianProduct node anywhere — the bucketed/banded joins
    must hold registry-wide, not just in the per-query pins; (2) no
    BatchEvalPython node — row-at-a-time Python UDF, the 10-100x-slower
    path (Arrow exec nodes like ArrowEvalPython/MapInArrow/
    FlatMapGroupsInPandas are the sanctioned Python surfaces and are
    not flagged); (3) no unpartitioned window consuming a raw fact scan
    — the single-partition sort that dies at 100 TB (this sweep found
    doc_rrf_quality_fusion's three global row_number ranks in r9; they
    are now two-pass range-banded ranks; windows over bounded
    aggregates reset the flag). One plan build per query keeps the
    audit to one pass over the registry."""
    bad: dict[str, list[str]] = {}
    for name in sorted(QUERIES):
        ps = _plan(spark, name, sf_small)
        flags = []
        if "CartesianProduct" in ps:
            flags.append("cartesian")
        if "BatchEvalPython" in ps:
            flags.append("row_udf")
        # cheap pre-filter: the JVM walk only runs when the string scan
        # shows both a window and a single-partition exchange
        if "Window" in ps and "SinglePartition" in ps:
            hits = (
                _unpartitioned_window_fact_scans(spark, name, sf_small)
                & _FACT_TABLES
            )
            if hits:
                flags.append("singlepart_fact_window:" + ",".join(sorted(hits)))
        if flags:
            bad[name] = flags
    assert not bad, f"executed-plan audit violations: {bad}"


def test_shingle_spectrum_bin_is_integer_derived(spark, sf_small):
    """shingle_df_spectrum's power-of-2 bin must come from integer bit
    length (length(bin(df)) - 1), never floor(log2(df)) — Spark's LOG2
    is ln/ln while DuckDB's is std::log2, and a 1-ulp gap at df = 2^k
    would flip the floor cross-engine."""
    plan = _plan(spark, "shingle_df_spectrum", sf_small)
    assert "LOG" not in plan.upper().replace("CATALOG", ""), plan
    assert "bin(" in plan, plan


def test_column_profile_single_scan(spark, sf_small):
    """orders_column_profile computes every column's stats in ONE
    aggregation pass — exactly one orders scan in the executed plan."""
    plan = _plan(spark, "orders_column_profile", sf_small)
    scans = [
        ln for ln in plan.splitlines() if "FileScan parquet" in ln and "orders" in ln
    ]
    assert len(scans) == 1, plan


def test_stopword_profile_no_explode(spark, sf_small):
    """text_stopword_profile counts stopwords with array HOFs inside
    the row — the token stream must never be exploded (no Generate
    node) and the per-source agg keeps a map-side partial."""
    plan = _plan(spark, "text_stopword_profile", sf_small)
    assert "Generate" not in plan, plan
    assert "partial_" in plan


def test_hour_of_week_total_is_broadcast(spark, sf_small):
    """events_hour_of_week_profile's corpus total joins as a broadcast
    1-row aggregate — the bucketed aggregate must not shuffle again
    for it."""
    plan = _plan(spark, "events_hour_of_week_profile", sf_small)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
