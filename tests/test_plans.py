"""Physical-plan assertions (SURVEY.md §4): the at-scale properties —
pushdown, pruning, broadcast, map-side partial aggregation, top-k
without global sort — must hold in the plan, not just in folklore.
These tests fail if a refactor silently degrades the plan shape."""

from __future__ import annotations

import pytest

from ukis_kafka_spark import api

from .conftest import SF_SMOKE


def _formatted_plan(spark, name: str) -> str:
    df = api.queries()[name](spark, SF_SMOKE)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_scan_pruned_pushes_filters_and_columns(spark):
    plan = _formatted_plan(spark, "q_scan_pruned")
    assert "PushedFilters" in plan
    assert "LessThan(l_shipdate" in plan, "shipdate predicate did not reach the parquet reader"
    assert "LessThan(l_quantity" in plan
    # column pruning: the scan must read only the 4 referenced columns
    read_schema = [l for l in plan.splitlines() if l.startswith("ReadSchema")][0]
    struct = read_schema.split("struct<", 1)[1]
    assert struct.count(":") == 4, f"scan reads too many columns: {read_schema}"


def test_broadcast_join_is_broadcast(spark):
    plan = _formatted_plan(spark, "q_join_broadcast")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_small_dim_joins_auto_broadcast(spark):
    # even without the hint, a customer-sized dim must broadcast at
    # this scale (autoBroadcastJoinThreshold)
    plan = _formatted_plan(spark, "q_join_inner")
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" not in plan


def test_flagship_agg_is_partial_then_final(spark):
    plan = _formatted_plan(spark, "q_agg_groupby")
    assert "partial_sum" in plan, "no map-side partial aggregation"
    assert plan.count("Exchange") <= 2, "flagship aggregate shuffles more than once"
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_topk_avoids_global_sort(spark):
    plan = _formatted_plan(spark, "q_topk")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan, "top-k should not shuffle"


def test_theta_band_join_broadcasts_tiny_side(spark):
    plan = _formatted_plan(spark, "q_join_theta_range")
    assert "BroadcastNestedLoopJoin" in plan


def test_shuffle_hash_hint_pins_strategy(spark):
    plan = _formatted_plan(spark, "q_join_shuffle_hash")
    assert "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" not in plan


def test_no_python_udf_in_relational_core(spark):
    """The q_* relational queries must stay JVM-side: no Python eval
    nodes (BatchEvalPython/ArrowEvalPython) anywhere in their plans."""
    names = [n for n in api.queries() if n.startswith("q_")]
    for name in names:
        plan = _formatted_plan(spark, name)
        assert "EvalPython" not in plan, f"{name} crosses the Python boundary"


# AQE-wrapped plans only show codegen ids after execution, so this
# asserts on the non-adaptive (scan-shaped) queries.
@pytest.mark.parametrize("name", ["q_scan_pruned", "q_filter_basic"])
def test_whole_stage_codegen_active(spark, name):
    plan = _formatted_plan(spark, name)
    assert "codegen id" in plan, f"{name} runs without whole-stage codegen"


def test_zorder_key_is_pure_projection(spark):
    """The Morton-key derivation must stay a shuffle-free, UDF-free
    projection — it is the thing you compute on 100 TB before
    re-clustering, so any Exchange or Python eval here is a bug."""
    plan = _formatted_plan(spark, "g_zorder_key")
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_nearest_hub_uses_window_group_limit(spark):
    """The per-point argmin must run as WindowGroupLimit (rank pushed
    into the sort, only rank-1 rows survive each partition) — a full
    window materialization would sort 6n rows to keep n."""
    plan = _formatted_plan(spark, "g_nearest_hub")
    assert "WindowGroupLimit" in plan
    assert "BroadcastNestedLoopJoin" in plan  # 6-row hub side broadcasts


def test_vocab_coverage_broadcasts_vocab(spark):
    """The token→vocab membership join must broadcast the bounded top-K
    side; a sort-merge join would shuffle the entire exploded token
    stream by token."""
    plan = _formatted_plan(spark, "m_vocab_coverage")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_partitioned_source_prunes_directories(spark):
    """The lang filter must become PartitionFilters on the partitioned
    scan (directory pruning — skipped I/O), not a row-level Filter over
    all partitions."""
    plan = _formatted_plan(spark, "src_partitioned_prune")
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and "lang" in pf[0], "lang predicate did not become a partition filter"


def test_range_binned_join_is_equi_hash_join(spark):
    """The binned rewrite must plan as a hash-partitionable equi join
    on the bin key — a BroadcastNestedLoopJoin here means the rewrite
    regressed to the O(n·m) theta form."""
    plan = _formatted_plan(spark, "q_join_range_binned")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_sql_q19_derives_single_side_predicates(spark):
    """Q19's OR-of-ANDs must contribute per-side implications: the
    brand/size disjunction must reach the part scan and the quantity
    disjunction the lineitem scan as pushed filters, not survive only
    as a post-join residual."""
    plan = _formatted_plan(spark, "q_sql_q19")
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    part_side = [l for l in pushed if "p_brand" in l]
    line_side = [l for l in pushed if "l_quantity" in l]
    assert part_side and "EqualTo(p_brand,Brand#12)" in part_side[0], (
        "brand disjunction not pushed to part scan"
    )
    assert line_side and "GreaterThanOrEqual(l_quantity" in line_side[0], (
        "quantity disjunction not pushed to lineitem scan"
    )


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Both sides bucketed on the join key ⇒ SortMergeJoin with zero
    Exchange — the co-located-join strategy for repeated fact⋈fact
    joins at scale (broadcast disabled to force the comparison)."""
    import os

    from pyspark.sql import functions as F

    from ukis_kafka_spark.sources import load_table

    from .conftest import SF_SMOKE

    load_table(spark, SF_SMOKE, "orders").write.bucketBy(8, "o_custkey").sortBy(
        "o_custkey"
    ).mode("overwrite").format("parquet").option(
        "path", os.path.join(str(tmp_path), "ob")
    ).saveAsTable("ob_plan_test")
    load_table(spark, SF_SMOKE, "customer").write.bucketBy(8, "c_custkey").sortBy(
        "c_custkey"
    ).mode("overwrite").format("parquet").option(
        "path", os.path.join(str(tmp_path), "cb")
    ).saveAsTable("cb_plan_test")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.table("ob_plan_test")
        c = spark.table("cb_plan_test")
        plan = (
            o.join(c, o.o_custkey == c.c_custkey)
            .select("o_orderkey", "c_mktsegment")
            ._jdf.queryExecution()
            .explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
            )
        )
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
        assert "Exchange" not in plan, "bucketed join still shuffles"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS ob_plan_test")
        spark.sql("DROP TABLE IF EXISTS cb_plan_test")


def test_exists_subquery_decorrelates_to_semi_join(spark):
    plan = _formatted_plan(spark, "q_exists_subquery")
    assert "LeftSemi" in plan, "EXISTS did not decorrelate to a semi join"
    assert "BroadcastHashJoin" in plan


def test_not_exists_subquery_decorrelates_to_anti_join(spark):
    plan = _formatted_plan(spark, "q_not_exists_subquery")
    assert "LeftAnti" in plan, "NOT EXISTS did not decorrelate to an anti join"
    assert "BroadcastHashJoin" in plan


def test_q6_pushes_every_predicate(spark):
    plan = _formatted_plan(spark, "q_sql_q6")
    for pushed in (
        "GreaterThanOrEqual(l_shipdate",
        "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount",
        "LessThanOrEqual(l_discount",
        "LessThan(l_quantity",
    ):
        assert pushed in plan, f"{pushed} not pushed to the parquet scan"
    import re

    # formatted mode lists each node twice (tree + detail); count detail headers
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_exchanges <= 1, "global agg needs only the single-partition exchange"


@pytest.mark.parametrize("name", ["q_distinct_on", "q_topk_per_group"])
def test_per_group_topk_uses_window_group_limit(spark, name):
    # rank<=k filters must prune per-partition *before* the shuffle
    # (WindowGroupLimit partial), not sort whole groups post-exchange
    plan = _formatted_plan(spark, name)
    assert "WindowGroupLimit" in plan, f"{name} shuffles unpruned groups"


def test_lateral_limit_decorrelates_to_window_topk(spark):
    # LATERAL ... ORDER BY ... LIMIT k must become a window top-k over
    # one join — not a per-outer-row re-scan
    plan = _formatted_plan(spark, "q_lateral_topn")
    assert "WindowGroupLimit" in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_salted_graph_join_shape_and_identity(spark):
    """The graph propagation joins salt hub keys: the edge side carries
    a deterministic pmod salt, the per-node side is replicated across
    all salts, and the joined rows are identical to the unsalted join
    (replicas of non-hub nodes drop out). Pin both the multiplicity
    invariant and — with the broadcast hint off, as at over-budget
    scale — the (key, salt) shuffle-join shape."""
    from pyspark.sql import functions as F

    from ukis_kafka_spark.ml.graph import _N_SALT, _replicate_salts, _salt_edges

    # hub node 1 with 8 neighbors, non-hub chain 2-3
    rows = [(1, d) for d in range(10, 18)] + [(2, 3)]
    edges = spark.createDataFrame(rows, "src long, dst long")
    sym = edges.unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    hubs = spark.createDataFrame([(1,)], "node long")
    per_node = sym.select(F.col("src").alias("node")).distinct().withColumn(
        "val", F.col("node") * 10
    )

    salted = _salt_edges(sym, "src", "dst", hubs)
    # hub edges spread over >1 salt, non-hub edges all salt 0
    hub_salts = {r.salt for r in salted.where(F.col("src") == 1).collect()}
    assert len(hub_salts) > 1
    assert {r.salt for r in salted.where(F.col("src") != 1).collect()} == {0}

    joined = salted.join(_replicate_salts(per_node, "src", small=False), ["src", "salt"])
    plain = sym.join(per_node.withColumnRenamed("node", "src"), "src")
    assert sorted(map(tuple, joined.select("src", "dst", "val").collect())) == sorted(
        map(tuple, plain.select("src", "dst", "val").collect())
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "salt" in plan and "pmod" in plan.lower()


def test_unpivot_is_single_expand_not_union(spark):
    """q_unpivot must plan as one Expand over one scan — the UNION ALL
    formulation its oracle spells out would scan lineitem once per
    measure column."""
    import re

    plan = _formatted_plan(spark, "q_unpivot")
    # formatted mode lists each node twice (tree + detail); count detail headers
    assert len(re.findall(r"^\(\d+\) Expand", plan, re.M)) == 1
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1


def test_rollup_time_is_single_scan(spark):
    """The hypertable-style rollup must maintain all three granularity
    levels from ONE scan (Expand), not one aggregate job per level."""
    import re

    plan = _formatted_plan(spark, "q_rollup_time")
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1
    assert "Expand" in plan


def test_q16_distinct_collapses_before_dim_join(spark):
    """q_sql_q16's (partkey, suppkey) distinct must run before the part
    join — joining 6M raw lines against the dim and deduping after
    would shuffle the whole fact table with its payload."""
    import re

    plan = _formatted_plan(spark, "q_sql_q16")
    # detail headers are numbered in bottom-up execution order: the
    # distinct's aggregate must carry a lower number than the dim join
    aggs = [int(m) for m in re.findall(r"^\((\d+)\) HashAggregate", plan, re.M)]
    joins = [int(m) for m in re.findall(r"^\((\d+)\) BroadcastHashJoin", plan, re.M)]
    assert aggs and joins and min(aggs) < min(joins), "distinct did not collapse pre-join"


def test_asof_nearest_single_window_exchange(spark):
    """Both frame directions of the nearest as-of join must ride ONE
    (user_id, event_id, is_probe) sort: exactly one shuffle on
    user_id and one Window exec carrying all four values — a second
    Exchange/sort means the shared-window optimization regressed."""
    plan = _formatted_plan(spark, "q_join_asof_nearest")
    n_window = plan.count("Window (")
    win_exchanges = [
        l for l in plan.splitlines() if l.strip().startswith("Exchange hashpartitioning(user_id")
    ]
    assert n_window <= 1, f"window split into {n_window} execs:\n{plan}"
    assert len(win_exchanges) <= 1, f"extra user_id shuffle:\n{plan}"


def test_bloom_probe_is_broadcast_anti_join(spark):
    """The bloom probe must be a broadcast anti-join against the
    position set — a shuffle join here means the bit set (the thing
    that exists to be broadcast) got shuffled instead."""
    plan = _formatted_plan(spark, "m_bloom_membership")
    assert "BroadcastHashJoin LeftAnti" in plan.replace("\n", " ") or (
        "LeftAnti, BuildRight" in plan
    ), f"anti-join not broadcast:\n{plan}"
    assert "SortMergeJoin LeftAnti" not in plan


def test_label_outliers_broadcasts_centroids(spark):
    """The |labels|x64 centroid table must broadcast back onto the
    exploded vector table; TakeOrderedAndProject must cap the output
    without a global sort."""
    plan = _formatted_plan(spark, "m_label_outliers")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_recursive_cte_uses_union_loop(spark):
    """q_recursive_cte must run through Spark 4's native recursion
    operator (UnionLoop) — not a hand-unrolled union."""
    plan = _formatted_plan(spark, "q_recursive_cte")
    assert "UnionLoop" in plan, f"no UnionLoop node:\n{plan}"


def test_importance_resample_broadcasts_scores(spark):
    """m_importance_resample's 64-row bucket-score table must
    broadcast onto the token stream (shuffling the token stream by
    bucket would be the 100 TB bottleneck), and the whole scoring
    pipeline stays JVM-side."""
    plan = _formatted_plan(spark, "m_importance_resample")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan


def test_semdedup_pairs_are_cluster_local_kernel(spark):
    """m_semdedup's pair stage must be the per-cluster Arrow kernel
    (FlatMapGroupsInPandas) with no sort-merge join anywhere — the
    keeper resolution joins tiny pair/keeper tables."""
    plan = _formatted_plan(spark, "m_semdedup")
    assert "FlatMapGroupsInPandas" in plan
    assert "SortMergeJoin" not in plan


def test_radius_neighbors_joins_on_cells_not_cartesian(spark):
    """The 3x3 probe explode must turn the radius join into an
    equality join on cell keys — a nested-loop/cartesian here is the
    quadratic plan the grid exists to avoid."""
    plan = _formatted_plan(spark, "g_radius_neighbors")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "kx" in plan and "ky" in plan


def test_bitmap_distinct_has_no_expand(spark):
    """The bitmap rollup replaces COUNT(DISTINCT): the plan must be
    plain hash aggregates over bit_or words — an Expand node would
    mean Spark fell back to the distinct-rewrite this operator
    bypasses."""
    plan = _formatted_plan(spark, "q_bitmap_distinct")
    assert "Expand" not in plan
    assert "bit_or" in plan and "bit_count" in plan


def test_graph_modularity_broadcasts_part_dim(spark):
    plan = _formatted_plan(spark, "m_graph_modularity")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_mmr_greedy_rounds_stay_broadcast(spark):
    """Each unrolled MMR round joins the 24-vector pool against
    one-row selections — every join must broadcast; a sort-merge here
    means the tiny-side statistics were lost."""
    plan = _formatted_plan(spark, "m_mmr_select")
    assert "SortMergeJoin" not in plan


def test_suffstats_partials_combine_map_side(spark):
    plan = _formatted_plan(spark, "q_parallel_variance")
    assert "partial_sum" in plan or "partial_count" in plan
    assert plan.count("+- Exchange") <= 2


def test_ohlc_is_single_exchange_objhash_agg(spark):
    # min_by/max_by partials merge map-side: one exchange, no sort
    plan = _formatted_plan(spark, "q_ohlc")
    assert "partial_min_by" in plan, "open/close extremum must combine map-side"
    assert "partial_max_by" in plan
    assert "EvalPython" not in plan


def test_filter_sweep_aggregates_before_theta_join(spark):
    # the threshold dim theta-joins the per-length SUMMARY (broadcast
    # nested loop), never the raw corpus
    plan = _formatted_plan(spark, "m_filter_sweep")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_weighted_median_windows_aggregated_prices(spark):
    # facts collapse to (flag, price) partials before the cumulative
    # window: the window input must come from a HashAggregate
    plan = _formatted_plan(spark, "q_weighted_median")
    assert "partial_sum" in plan, "no map-side combine before the window"
    assert "EvalPython" not in plan


def test_reward_pairs_kxk_join_is_broadcast(spark):
    plan = _formatted_plan(spark, "m_reward_pairs")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_adaboost_rounds_reuse_histogram_not_rescan(spark):
    # both boosting rounds run on the 32-cell histogram: the fact
    # table is scanned once per cells-CTE evaluation, and no Python
    # UDF enters the loop
    plan = _formatted_plan(spark, "m_adaboost_round")
    assert "EvalPython" not in plan


def test_neyman_single_corpus_aggregate(spark):
    plan = _formatted_plan(spark, "m_neyman_allocation")
    assert "partial_sum" in plan
    assert "EvalPython" not in plan


def test_sliding_distinct_bitmaps_combine_map_side(spark):
    plan = _formatted_plan(spark, "q_sliding_distinct")
    assert "partial_bit_or" in plan, "bitmap masks must partial-combine"
    assert "EvalPython" not in plan


def test_capped_running_sum_single_exchange(spark):
    # both stacked windows must share ONE user-hash exchange
    plan = _formatted_plan(spark, "q_capped_running_sum")
    tree_exchanges = [
        l for l in plan.splitlines() if l.strip().startswith("+- Exchange")
    ]
    assert len(tree_exchanges) == 1, tree_exchanges
    assert "EvalPython" not in plan


def test_rand_projection_broadcasts_sign_matrix(spark):
    plan = _formatted_plan(spark, "m_rand_projection")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_morans_adjacency_is_hash_equi_join(spark):
    # rook adjacency must be shifted-key equi joins, not an OR-condition
    # nested loop over cells x cells
    plan = _formatted_plan(spark, "g_morans_i")
    assert "BroadcastNestedLoopJoin BuildRight, Inner" not in plan
    assert "EvalPython" not in plan


def test_with_global_order_plan_shape(spark):
    """Pins functions.ranks' physical shape after the round-6
    hardening: the stamped frame is MATERIALIZED (checkpoint_df → the
    plan reads an ExistingRDD scan) so BOTH consumers — the rows and
    the per-partition totals — read one pinned partition map. Two
    declaratively re-planned branches are NOT safe: column pruning
    defeats exchange canonicalization and the independently executed
    range shuffles can coalesce/sample to different partition maps
    (code-review r6 finding — the pid join then drops rows at scale).
    Local ranks still come from monotonically_increasing_id, so NO
    Window appears over the data for rank/ntile-only calls; every
    Window must be the offsets branch's one-row-per-partition
    cumulation (its __go_pid spec), and offsets join back broadcast."""
    from pyspark.sql import functions as F

    from ukis_kafka_spark.functions.ranks import with_global_order

    df = spark.range(1000).select("id", (F.col("id") % 7).alias("v"))
    order = [F.col("v").asc(), F.col("id").asc()]

    rank_only = with_global_order(df, order, rank_col="rn", ntile=("t", 4))
    plan = rank_only._jdf.queryExecution().executedPlan().toString()
    # the materialization guard: both branches must read the pinned
    # checkpointed frame, never re-plan the range exchange
    assert "ExistingRDD" in plan or "Scan ExistingRDD" in plan
    assert "rangepartitioning" not in plan, "re-planned range exchange"
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    win_lines = [l for l in plan.splitlines() if "Window [" in l]
    assert win_lines, "offsets cumulation window missing"
    bad = [l for l in win_lines if "__go_pid" not in l]
    assert not bad, f"data-path Window crept back in: {bad}"

    # cumsum still needs an ordered frame — but only ever partitioned
    # by the pid, never partition-less over the data
    with_sum = with_global_order(df, order, cumsum={"cv": F.col("v")})
    plan2 = with_sum._jdf.queryExecution().executedPlan().toString()
    bad2 = [
        l for l in plan2.splitlines() if "Window [" in l and "__go_pid" not in l
    ]
    assert not bad2, f"partition-less Window over data: {bad2}"


def test_global_window_allowlist_only_shrinks():
    """Ratchet on plan_audit's GLOBAL_WINDOW_ALLOWLIST (VERDICT r6
    item 7): the round-6 cleanup took 48 partition-less-window sites
    down to 17 bounded-by-construction exceptions.  Pin that set so it
    can only SHRINK silently — any addition must edit THIS test too,
    which forces the justified-bounded review (post-limit stamp /
    fixed grid / calendar grain / value-domain support) to happen in
    the same diff.  Every entry must also carry a non-trivial
    justification string and point at a live registered query."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    from plan_audit import GLOBAL_WINDOW_ALLOWLIST

    from ukis_kafka_spark.registry import QUERIES

    PINNED = {
        "m_adaboost_round", "m_ann_recall_eval", "m_decile_lift",
        "m_decision_stump", "m_importance_resample", "m_neyman_allocation",
        "m_rank_fusion", "q_changepoint", "q_cumulative_distinct",
        "q_lorenz_deciles", "q_mom_growth", "q_quantile_hist",
        "q_rolling_corr", "q_rolling_variance", "q_sort_multi",
        "q_subseq_search", "q_subseq_znorm",
    }
    grown = set(GLOBAL_WINDOW_ALLOWLIST) - PINNED
    assert not grown, (
        f"GLOBAL_WINDOW_ALLOWLIST grew by {sorted(grown)} — a new "
        "partition-less window must be individually justified as bounded "
        "by construction AND added to PINNED here in the same commit"
    )
    for name, why in GLOBAL_WINDOW_ALLOWLIST.items():
        assert name in QUERIES, f"stale allowlist entry: {name}"
        assert isinstance(why, str) and len(why) >= 20, (
            f"allowlist entry {name} needs a real justification, got {why!r}"
        )


def test_hash_walks_argmin_is_partial_aggregate(spark):
    """The per-walker argmin must be a map-side-combined min(struct),
    never a window over an unbounded neighbor group (a hub's adjacency
    would otherwise funnel into one task at 100 TB) — and the hash
    derivation stays JVM-side."""
    plan = _formatted_plan(spark, "m_hash_walks")
    assert "partial_min" in plan
    assert "Window" not in plan
    assert "EvalPython" not in plan


def test_image_ahash_kernel_then_partitioned_windows(spark):
    """One Arrow kernel for the codec+hash, then the two collision
    counts must be HASH-PARTITIONED window counts (they distribute);
    no global window, no cartesian."""
    plan = _formatted_plan(spark, "m_image_ahash")
    assert plan.count("ArrowEvalPython") + plan.count("MapInPandas") >= 1
    assert "CartesianProduct" not in plan
    for line in plan.splitlines():
        if "Window [" in line:
            # every window spec must carry a partition column
            assert "ahash" in line, f"unpartitioned window: {line}"


def test_matryoshka_both_metrics_one_aggregation(spark):
    """d2_full and the d<=16 prefix partial must come out of ONE
    aggregation over the dim-exploded join (partial_sum twice in the
    same HashAggregate), with the 20-query block broadcast."""
    plan = _formatted_plan(spark, "m_matryoshka_recall")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    agg_lines = [l for l in plan.splitlines() if "partial_sum" in l]
    assert any(l.count("partial_sum") >= 2 for l in agg_lines), (
        "full+truncated sums must share one aggregate pass"
    )


def test_epoch_cap_loop_reads_checkpointed_state(spark):
    """The waterfill loop must read the CHECKPOINTED 5-row state
    (ExistingRDD) — re-planned chained CTEs inline exponentially on
    Spark (3^5 subtree executions, measured 13.4 s; the round-7 fix)."""
    plan = _formatted_plan(spark, "m_epoch_cap_mix")
    assert "ExistingRDD" in plan
    assert "documents" not in plan.lower() or plan.lower().count("parquet") == 0, (
        "final plan must not re-scan the corpus — rounds read the "
        "checkpointed lang state"
    )


def test_backoff_lm_ngram_joins_not_forced_broadcast(spark):
    """The corpus-growing n-gram count tables (c3/c2p/c2b — distinct
    trigrams MEASURED still growing 9,964->26,893 across a 10x
    scale-up) must NOT carry a compile-time broadcast hint: AQE
    converts those joins to broadcast at runtime only when the built
    side is actually small, and degrades to a shuffle join at 100x
    where a forced broadcast would OOM the driver.  Only the
    vocabulary-sized c1/c1f and the scalar nv keep hints (r7 verdict
    "what's wrong" #1)."""
    df = api.queries()["m_backoff_lm"](spark, SF_SMOKE)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    join_lines = [l for l in opt.splitlines() if "Join " in l]
    hinted = [l for l in join_lines if "strategy=broadcast" in l]
    assert len(hinted) == 3, (
        f"expected exactly 3 hinted joins (c1/c1f/nv), got {len(hinted)}: "
        f"{hinted}"
    )
    # the trigram join (3-key equi join) and both 2-key n-gram joins
    # must be hint-free
    for l in join_lines:
        if l.count(" = ") >= 2:  # multi-key joins = the n-gram tables
            assert "Hint" not in l, f"n-gram count join carries a hint: {l}"


def test_broadcast_hint_allowlist_only_shrinks():
    """Ratchet on plan_audit's BROADCAST_HINT_ALLOWLIST (VERDICT r7
    item 4): the round-8 broadcast-lineage sweep found 48 flagged
    query plans, de-hinted 18 of them (corpus-growing dims: part/
    supplier/customer TPC-H sides, user cohort maps, candidate-pair
    dims, the modularity node dim — AQE re-broadcasts them at runtime
    while they are actually small), and justified the remaining 17 as
    bounded (vocabulary/Heaps, value-domain supports, pin-joins to
    literal seed lists, the sanctioned exact-GEMM baselines).  Pin
    the set so it only SHRINKS silently — any new compile-time
    F.broadcast over corpus lineage must be justified here in the
    same diff."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    from plan_audit import BROADCAST_HINT_ALLOWLIST

    from ukis_kafka_spark.registry import QUERIES

    PINNED = {
        "m_backoff_lm", "m_naive_bayes", "m_collocations",
        "m_lm_cross_entropy", "m_ccnet_buckets", "m_position_bias",
        "m_tok_fertility", "m_bpe_apply", "q_sliding_distinct",
        "m_cosine_topk", "m_embed_dup", "m_ivf_balance",
        "m_ann_recall_eval", "m_filter_sweep", "q_null_routed_join",
        "q_scd2_merge", "m_bradley_terry",
    }
    grown = set(BROADCAST_HINT_ALLOWLIST) - PINNED
    assert not grown, (
        f"BROADCAST_HINT_ALLOWLIST grew by {sorted(grown)} — a new "
        "forced broadcast over corpus lineage must be individually "
        "justified as bounded AND added to PINNED here in the same commit"
    )
    for name, why in BROADCAST_HINT_ALLOWLIST.items():
        assert name in QUERIES, f"stale allowlist entry: {name}"
        assert isinstance(why, str) and len(why) >= 20, (
            f"allowlist entry {name} needs a real justification, got {why!r}"
        )


def test_broadcast_lineage_detector_self_check(spark):
    """The detector that backs the sweep must keep catching the bug
    class it was built for (the r7 m_backoff_lm finding): a forced
    broadcast of a corpus-grain aggregate, a vocabulary table, and a
    whole-table projection FLAG; a bounded-domain aggregate, a scalar
    aggregate, a LIMIT, and a literal-bounded id filter PASS."""
    import sys
    from pathlib import Path

    from pyspark.sql import functions as F

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    from plan_audit import broadcast_hint_findings

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")

    def findings(df):
        return broadcast_hint_findings(
            df._jdf.queryExecution().analyzed().toString()
        )

    agg = docs.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    assert findings(docs.join(F.broadcast(agg), "doc_id")), "doc-grain agg"
    toks = docs.select(F.explode(F.split("text", " ")).alias("tok"))
    assert findings(toks.join(F.broadcast(toks.groupBy("tok").count()), "tok")), "vocab"
    assert findings(docs.join(F.broadcast(docs.select("doc_id", "lang")), "doc_id")), "full table"

    by_lang = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    assert not findings(docs.join(F.broadcast(by_lang), "lang")), "lang agg"
    scalar = docs.agg(F.max("doc_id").alias("mx"))
    assert not findings(docs.crossJoin(F.broadcast(scalar))), "scalar agg"
    top = docs.orderBy("doc_id").limit(10)
    assert not findings(docs.join(F.broadcast(top.select("doc_id")), "doc_id")), "limit"
    seed = docs.where(F.col("doc_id") < 20).select("doc_id")
    assert not findings(docs.join(F.broadcast(seed), "doc_id")), "id filter"


def test_rfm_branches_read_pinned_frames(spark):
    """q_rfm's round-8 restructure: three INDEPENDENT narrow ntile
    branches over one checkpointed customer aggregate, re-joined on
    custkey. The final plan must read only pinned frames (ExistingRDD
    — the input pre-checkpoint plus each branch's with_global_order
    pin) with ZERO re-planned range exchanges (the round-6
    divergent-map hazard) and no partition-less data window."""
    df = api.queries()["q_rfm"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") >= 4, plan.count("Scan ExistingRDD")
    assert "rangepartitioning" not in plan.lower(), "re-planned range exchange"
    bad = [
        l for l in plan.splitlines() if "Window [" in l and "__go_pid" not in l
    ]
    assert not bad, f"partition-less data window: {bad}"


def test_pointer_jump_cc_final_plan_reads_pinned_labels(spark):
    """The converged-labels frame must be the ONLY data source of the
    final plan: both consumers (label rows + the size rollup) scan the
    same checkpointed ExistingRDD and no corpus parquet scan survives
    the loop (the m_epoch_cap_mix lineage rule — an unpinned loop
    re-plans the whole iteration at the final job)."""
    plan = _formatted_plan(spark, "m_cc_pointer_jump")
    assert "ExistingRDD" in plan
    assert plan.lower().count("scan parquet") == 0, (
        "final pointer-jump plan re-scans the corpus — the loop's "
        "checkpoint discipline regressed"
    )


def test_split_leakage_membership_joins_not_forced_broadcast(spark):
    """All three train-side membership sets (exact text / prefix-16 /
    12-gram digests) grow with corpus mass — no compile-time broadcast
    hint may appear anywhere in the plan (AQE may still choose
    broadcast at runtime from measured sizes, which is the point)."""
    df = api.queries()["m_split_leakage"](spark, SF_SMOKE)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert "strategy=broadcast" not in opt, (
        "a corpus-growing membership set carries a broadcast hint"
    )
    assert "LeftSemi" in opt  # the gram-membership probe stays a semi-join


def test_theta_intersect_sketches_are_top_k_not_sorts(spark):
    """Every bottom-64 sketch must plan as TakeOrderedAndProject
    (per-partition heads merged on the driver) — a global Sort for a
    64-row head would be the classic single-task-window regression."""
    plan = _formatted_plan(spark, "m_theta_intersect")
    assert "TakeOrderedAndProject" in plan
