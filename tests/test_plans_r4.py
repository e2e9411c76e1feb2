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
