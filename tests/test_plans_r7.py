"""Plan-shape pins for the round-7 operators (same charter as
tests/test_plans.py: the scale properties the docstrings claim,
asserted mechanically)."""

from __future__ import annotations

import pytest

from confluent_example_firehose_spark.plans.inspect import executed_plan
from confluent_example_firehose_spark.registry import query_fns


@pytest.fixture(scope="module")
def fns():
    return query_fns()


def _plan(fns, name, spark, sf_dir):
    return executed_plan(fns[name](spark, sf_dir))


def test_text_derep_zero_shuffle_row_local(spark, sf_dir, fns):
    plan = _plan(fns, "q_text_derep", spark, sf_dir)
    # the docstring's whole claim: row-local Catalyst projection —
    # no exchange, no join, no Python, anywhere
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "Python" not in plan


def test_text_boilerplate_text_never_shuffles(spark, sf_dir, fns):
    plan = _plan(fns, "q_text_boilerplate", spark, sf_dir)
    # census + anti-join ride 60-bit hashes (chunk_h); a raw chunk
    # TEXT column must never be an exchange partitioning key
    assert "CartesianProduct" not in plan
    ex = _exchange_schemas(plan)
    assert "chunk_h#" in ex and "chunk#" not in ex


def test_hybrid_rrf_dense_side_is_takeordered(spark, sf_dir, fns):
    plan = _plan(fns, "q_hybrid_rrf", spark, sf_dir)
    # dense top-k must be TakeOrdered (no corpus-wide global Sort)
    # and the one query vector must broadcast, never shuffle
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_dsir_censuses_broadcast(spark, sf_dir, fns, lazy_caching):
    plan = _plan(fns, "q_dsir_sample", spark, sf_dir)
    # bucket-weight table (<= 512 rows) joins back by broadcast; the
    # top-N is TakeOrdered, not a global sort
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    # single-corpus-scan pin: every census branch reads the persisted
    # doc-level census, not its own filtered re-scan (without the
    # persist, filter pushdown through the aggregate made five
    # differently-filtered parquet scans)
    assert "InMemoryTableScan" in plan


def _exchange_schemas(plan: str) -> str:
    """Concatenated text of the Exchange nodes' argument lines."""
    return "\n".join(
        line for line in plan.splitlines() if "Exchange" in line
    )


def test_bloom_probe_filter_stays_relation_sized(spark, sf_dir, fns):
    plan = _plan(fns, "q_bloom_probe", spark, sf_dir)
    # probe sides broadcast into the membership joins; no cartesian
    # anywhere; the per-source bit census partial-aggregates (map-side
    # combine) below its exchange
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert plan.count("Exchange") >= 1
