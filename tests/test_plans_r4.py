"""Plan-shape pins for the round-4 operators: the scale properties the
docstrings claim, asserted mechanically so a refactor can't silently
lose them (same charter as tests/test_plans.py)."""

from __future__ import annotations

import pytest

from confluent_example_firehose_spark.plans.inspect import executed_plan
from confluent_example_firehose_spark.registry import query_fns


@pytest.fixture(scope="module")
def fns():
    return query_fns()


def _plan(fns, name, spark, sf_dir):
    return executed_plan(fns[name](spark, sf_dir))


def test_pack_bins_single_partitioned_window(spark, sf_dir, fns):
    plan = _plan(fns, "q_pack_bins", spark, sf_dir)
    # running token sum partitions by shard — never an empty spec
    assert "Window" in plan
    assert "partitionby: []" not in plan.lower().replace(" ", "")
    # no Python stage: the closed-form variant is pure codegen
    assert "Python" not in plan


def test_pack_firstfit_single_python_stage(spark, sf_dir, fns):
    plan = _plan(fns, "q_pack_firstfit", spark, sf_dir)
    # exactly one Arrow kernel (the carry loop), nothing else in Python
    assert plan.count("FlatMapGroupsInPandas") == 1


def test_quality_repetition_no_join_blowup(spark, sf_dir, fns):
    plan = _plan(fns, "q_quality_repetition", spark, sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # r6 zero-shuffle pin: per-doc stats are row-local — one Arrow
    # kernel, no Exchange, no join anywhere in the plan
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert plan.count("ArrowEvalPython") == 1


def test_quality_domain_mix_broadcasts_total(spark, sf_dir, fns):
    plan = _plan(fns, "q_quality_domain_mix", spark, sf_dir)
    # the corpus total joins back as a broadcast one-row frame, never a
    # shuffle or an empty-partition window
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "partitionby: []" not in plan.lower().replace(" ", "")


def test_inverted_index_no_unbounded_collect(spark, sf_dir, fns):
    plan = _plan(fns, "q_inverted_index", spark, sf_dir)
    # posting heads are rank-filtered before collect_list: the plan
    # must contain the term-partitioned window feeding the collect
    assert "row_number" in plan.lower()
    assert "collect_list" in plan.lower()


def test_funnel_no_cartesian_between_steps(spark, sf_dir, fns):
    plan = _plan(fns, "q_funnel", spark, sf_dir)
    assert "CartesianProduct" not in plan
    # the three scalar counts combine via broadcast nested loop (1-row
    # frames) — the only BNLJ allowed here
    assert plan.count("SortMergeJoin") <= 2


def test_cohort_retention_broadcasts_sizes(spark, sf_dir, fns):
    plan = _plan(fns, "q_cohort_retention", spark, sf_dir)
    assert "BroadcastHashJoin" in plan


def test_lm_commonness_joins_tf_not_instances(spark, sf_dir, fns):
    plan = _plan(fns, "q_lm_commonness", spark, sf_dir)
    # both join inputs are aggregates (tf and corpus): at least three
    # HashAggregate pairs (tf, corpus, per-doc) and no generate node
    # ABOVE a join (the explode runs once, below the tf aggregate)
    assert plan.count("HashAggregate") >= 6
    assert "CartesianProduct" not in plan


def test_mixture_and_group_sample_windows_partitioned(spark, sf_dir, fns):
    for name in ("q_mixture_sample", "q_group_sample", "q_scd2_merge"):
        plan = _plan(fns, name, spark, sf_dir)
        assert "Window" in plan, name
        assert "partitionby: []" not in plan.lower().replace(" ", ""), name


def test_trend_and_corr_single_aggregate_pass(spark, sf_dir, fns):
    for name in ("q_trend_fit", "q_corr_stats"):
        plan = _plan(fns, name, spark, sf_dir)
        # co-moment sums: partial+final agg, no window, no extra join
        # beyond the broadcast scalar (trend's min-ts)
        assert "Window" not in plan, name
        assert "SortMergeJoin" not in plan, name


def test_zorder_envelopes_skip_better_than_linear(spark, sf_dir, fns):
    """Quantified data-skipping benefit: for a 2-D range predicate, the
    Z-order layout's per-bucket (x, y) envelopes must let MORE buckets
    be skipped than a single-column (date-sorted) layout of the same
    data into the same bucket count — the property the Morton key
    exists to provide."""
    from pyspark.sql import Window as W

    from confluent_example_firehose_spark.catalog import load_table
    from confluent_example_firehose_spark.operators.curation_queries import (
        Z_BITS,
        Z_BUCKETS,
        _Z_EPOCH,
    )
    from pyspark.sql import functions as F

    z_env = [
        (r["x_min"], r["x_max"], r["y_min"], r["y_max"])
        for r in fns["q_zorder_layout"](spark, sf_dir).collect()
    ]
    # linear layout: same rows, date-sorted, same bucket count (window
    # ntile is fine HERE: test-only, sf0.001)
    o = load_table(spark, sf_dir, "orders").select(
        (F.col("o_custkey") % (1 << Z_BITS)).alias("x"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit(_Z_EPOCH).cast("date")
        ).alias("y"),
        "o_orderkey",
    )
    lin = o.withColumn(
        "bucket", F.ntile(Z_BUCKETS).over(W.orderBy("y", "o_orderkey"))
    )
    lin_env = [
        (r["x_min"], r["x_max"], r["y_min"], r["y_max"])
        for r in lin.groupBy("bucket")
        .agg(
            F.min("x").alias("x_min"),
            F.max("x").alias("x_max"),
            F.min("y").alias("y_min"),
            F.max("y").alias("y_max"),
        )
        .collect()
    ]
    x_lo = min(x for x, _, _, _ in z_env)
    x_hi = max(x for _, x, _, _ in z_env)
    y_lo = min(y for _, _, y, _ in z_env)
    y_hi = max(y for _, _, _, y in z_env)
    # a predicate narrow in BOTH dims relative to the OBSERVED ranges:
    # bottom 1/8 of the custkey range, middle quarter of the date range
    qx = (x_lo, x_lo + (x_hi - x_lo) // 8)
    span = y_hi - y_lo
    qy = (y_lo + span * 3 // 8, y_lo + span * 5 // 8)

    def hits(env):
        return sum(
            1
            for x0, x1, y0, y1 in env
            if x1 >= qx[0] and x0 <= qx[1] and y1 >= qy[0] and y0 <= qy[1]
        )

    z_hits, lin_hits = hits(z_env), hits(lin_env)
    # the date-sorted layout cannot prune on x at all; Z-order must
    # scan strictly fewer buckets for the 2-D predicate
    assert z_hits < lin_hits, (z_hits, lin_hits)
