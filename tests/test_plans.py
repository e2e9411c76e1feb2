"""Plan-shape regression tests: the scale properties that make these
queries viable at 100 TB, pinned so a refactor can't silently lose
them (a wrong-but-correct plan passes value tests; these catch it)."""

from __future__ import annotations

import pytest

from confluent_example_firehose_spark.plans.inspect import executed_plan
from confluent_example_firehose_spark.registry import query_fns


def plan_of(df) -> str:
    return executed_plan(df)


@pytest.fixture(scope="module")
def fns():
    return query_fns()


def test_lookup_enrich_broadcasts_dims(spark, sf_dir, fns):
    plan = plan_of(fns["q_lookup_enrich"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # dims must never shuffle the fact


def test_scan_parquet_prunes_columns(spark, sf_dir, fns):
    plan = plan_of(fns["q_scan_parquet"](spark, sf_dir))
    read = plan[plan.index("ReadSchema") :].splitlines()[0]
    assert "l_quantity" in read
    # untouched wide columns must not be read
    assert "l_returnflag" not in read and "l_shipdate" not in read


def test_filter_project_pushes_predicates(spark, sf_dir, fns):
    plan = plan_of(fns["q_filter_project"](spark, sf_dir))
    pushed = plan[plan.index("PushedFilters") :].splitlines()[0]
    assert "l_shipdate" in pushed and "l_discount" in pushed


def test_topk_uses_take_ordered(spark, sf_dir, fns):
    plan = plan_of(fns["q_topk"](spark, sf_dir))
    # global sort+limit must plan as TakeOrdered (no full sort/shuffle)
    assert "TakeOrderedAndProject" in plan


def test_agg_basic_partial_final(spark, sf_dir, fns):
    plan = plan_of(fns["q_agg_basic"](spark, sf_dir))
    # map-side combine: two HashAggregate levels around one Exchange
    assert plan.count("HashAggregate") >= 2
    assert plan.count("Exchange") == 1


def test_dedup_near_no_cross_join(spark, sf_dir, fns):
    plan = plan_of(fns["q_dedup_near"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dedup_simhash_no_cross_join(spark, sf_dir, fns):
    plan = plan_of(fns["q_dedup_simhash"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dedup_jaccard_no_cross_join(spark, sf_dir, fns):
    """The bounded all-pairs demo generates pairs via a narrow map over
    spark.range + broadcast EQUI-joins — a refactor back to an
    `id_a < id_b` join condition would silently reintroduce the BNLJ."""
    plan = plan_of(fns["q_dedup_jaccard"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_dedup_embed_no_cross_join(spark, sf_dir, fns):
    plan = plan_of(fns["q_dedup_embed"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_tpch_q15_parallel_global_max(spark, sf_dir, fns):
    """Global max must be a 1-row aggregate broadcast back onto the
    revenue aggregate — NOT an unpartitioned window, which funnels the
    whole per-supplier aggregate through one task (ADVICE r1). The
    revenue shuffle dedupes via AQE stage reuse at runtime."""
    df = fns["q_tpch_q15"](spark, sf_dir)
    plan = plan_of(df)
    assert "Window" not in plan
    df.collect()
    final = df._jdf.queryExecution().toString()
    assert "ReusedExchange" in final  # lineitem scanned/shuffled once


def test_join_asof_no_forced_fact_broadcast(spark, sf_dir, fns):
    """q_join_asof joins events against full `orders` — a fact table. A
    forced F.broadcast(orders) is a driver OOM at 100 TB (VERDICT r2 #2);
    the strategy choice belongs to AQE. Also pin the shuffle-reuse trick:
    grouping by (join key, _lid) lets the max_by agg reuse the SMJ's hash
    partitioning, so with broadcast disabled the agg adds NO exchange."""
    df = fns["q_join_asof"](spark, sf_dir)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed  # no forced broadcast anywhere
    # Pin the no-second-shuffle property with broadcast off: the only
    # exchanges are the two join-input shuffles (events, orders).
    orig = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = plan_of(fns["q_join_asof"](spark, sf_dir))
        assert "SortMergeJoin" in plan
        import re

        assert len(re.findall(r"Exchange hashpartitioning", plan)) == 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", orig)


def test_tpch_q5_broadcasts_nation_region(spark, sf_dir, fns):
    plan = plan_of(fns["q_tpch_q5"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_bucketed_join_no_shuffle_before_join(spark, sf_dir, fns):
    df = fns["q_bucketed_join"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    # bucketing co-locates both sides: the ONLY exchange is the
    # post-join aggregation's — nothing shuffles into the join
    join_part = plan[: plan.index("SortMergeJoin")]
    assert "Exchange" not in join_part or plan.count("Exchange") == 1


def test_chunk_documents_no_shuffle(spark, sf_dir, fns):
    """Chunking is a pure 1->n map stage — any Exchange means a refactor
    accidentally introduced a shuffle into the tokenizer feed path."""
    plan = plan_of(fns["q_chunk_documents"](spark, sf_dir))
    assert "Exchange" not in plan


def test_sample_stratified_no_shuffle(spark, sf_dir, fns):
    """Hash-threshold sampling must stay a narrow filter (the whole
    point vs exact-k sampling: no per-stratum sort, no count pass)."""
    plan = plan_of(fns["q_sample_stratified"](spark, sf_dir))
    assert "Exchange" not in plan


def test_pii_redact_no_shuffle_no_python(spark, sf_dir, fns):
    plan = plan_of(fns["q_pii_redact"](spark, sf_dir))
    assert "Exchange" not in plan
    assert "Python" not in plan  # regex ops stay JVM-side


def test_contamination_broadcasts_benchmark(spark, sf_dir, fns):
    """The eval-set side must broadcast (it is small by construction);
    the corpus explode side must never sort-merge against it."""
    plan = plan_of(fns["q_contamination"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dpp_join_prunes_fact_partitions(spark, sf_dir, fns):
    """The fact scan must carry a dynamicpruningexpression in its
    PartitionFilters — i.e., the dim filter prunes fact partitions at
    runtime, not after the scan."""
    df = fns["q_dpp_join"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()


def test_zorder_no_global_window(spark, sf_dir, fns, lazy_caching):
    """The layout rewrite must never rank through an unpartitioned
    window (single-reducer, r3 VERDICT): bucketing is range-partition +
    local offsets + closed-form ntile math. Pin: no WindowExec at all,
    and the one big shuffle is a rangepartitioning Exchange."""
    plan = plan_of(fns["q_zorder_layout"](spark, sf_dir))
    assert "Window" not in plan
    assert "rangepartitioning" in plan.lower()


def test_bm25_limits_before_ranking(spark, sf_dir, fns):
    """Top-k must plan as TakeOrderedAndProject with the rank window
    applied ABOVE it (i.e. over the k-row result), never a global-sort
    window over the full candidate set (r3 VERDICT)."""
    plan = plan_of(fns["q_text_bm25"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    # the executed plan prints top-down: Window must sit above (= run
    # after) the TakeOrdered, so it only ever sees BM25_TOP rows
    assert plan.index("Window") < plan.index("TakeOrderedAndProject")


def test_tfidf_construction_is_lazy(spark, sf_dir, fns):
    """Building the DataFrame must not launch a job (r3 ADVICE: an
    eager d.count() during construction). Pin via plan-only access on a
    fresh DataFrame — if construction collects, this still passes, so
    also pin the shape: n_docs arrives via a broadcast join, not a
    literal baked in at build time."""
    plan = plan_of(fns["q_text_tfidf"](spark, sf_dir))
    assert plan.count("BroadcastExchange") >= 2  # df stats + n_docs


def test_profile_table_single_scan(spark, sf_dir, fns):
    """All column stats must come from ONE pass over the fact (Expand +
    multi-distinct aggregate), never one scan per column like the
    oracle's UNION ALL formulation."""
    plan = plan_of(fns["q_profile_table"](spark, sf_dir))
    assert plan.count("FileScan") == 1
    assert "Expand" in plan
