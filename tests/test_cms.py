"""Count-Min sketch + blocklist operator pins (r8): the mergeability
and never-underestimate laws the CMS docstring claims, and the
zero-exchange plan shape the blocklist docstring claims."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from confluent_example_firehose_spark.catalog import load_table
from confluent_example_firehose_spark.operators.cms_queries import (
    cms_sketch,
)
from confluent_example_firehose_spark.operators.dedup import words
from confluent_example_firehose_spark.plans.inspect import executed_plan
from confluent_example_firehose_spark.registry import query_fns


@pytest.fixture(scope="module")
def fns():
    return query_fns()


def _census(df, *keys):
    return df.select(
        *keys, F.explode(words("text")).alias("term")
    ).groupBy(*keys, "term").agg(F.count("*").alias("cnt"))


def test_cms_merge_equals_global(spark, sf_dir):
    """Merge law: summing per-source sketches cell-wise equals the
    sketch of the whole corpus — CMS's Bloom-union analogue."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    global_cells = {
        (r["r"], r["pos"]): r["c"]
        for r in cms_sketch(_census(d)).collect()
    }
    per_source = _census(d, "source")
    merged = (
        cms_sketch_by_source(per_source)
        .groupBy("r", "pos")
        .agg(F.sum("c").alias("c"))
    )
    merged_cells = {
        (r["r"], r["pos"]): r["c"] for r in merged.collect()
    }
    assert merged_cells == global_cells


def cms_sketch_by_source(census_by_source):
    """Per-source sketches: same cells keyed by source."""
    from confluent_example_firehose_spark.operators.cms_queries import (
        _cms_cells,
    )

    return (
        census_by_source.select(
            "source", "cnt", F.explode(_cms_cells(F.col("term"))).alias("rp")
        )
        .groupBy("source", "rp.r", "rp.pos")
        .agg(F.sum("cnt").alias("c"))
    )


def test_cms_never_underestimates_any_term(spark, sf_dir):
    """est >= exact for EVERY term, not just the reported top-K:
    collisions only add counts to a cell."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    from confluent_example_firehose_spark.operators.cms_queries import (
        _cms_cells,
    )

    census = _census(d).persist()
    try:
        sketch = cms_sketch(census)
        cells = census.select(
            "term", "cnt", F.explode(_cms_cells(F.col("term"))).alias("rp")
        ).select("term", "cnt", "rp.r", "rp.pos")
        bad = (
            cells.join(F.broadcast(sketch), ["r", "pos"])
            .groupBy("term", "cnt")
            .agg(F.min("c").alias("est"))
            .filter(F.col("est") < F.col("cnt"))
            .count()
        )
        assert bad == 0
    finally:
        census.unpersist()


def test_cms_topk_plan_shape(spark, sf_dir, fns, lazy_caching):
    plan = executed_plan(fns["q_cms_topk"](spark, sf_dir))
    # bounded sketch broadcasts into the estimate join; top-K is
    # TakeOrdered; the census persist feeds both branches (no second
    # corpus tokenization)
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "InMemoryTableScan" in plan


def test_blocklist_zero_exchange_row_local(spark, sf_dir, fns):
    plan = executed_plan(fns["q_text_blocklist"](spark, sf_dir))
    # the docstring's whole claim: pure narrow map over the scan
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "Python" not in plan


def test_blocklist_flag_boundary(spark, fns, tmp_path):
    """Integer cross-multiply boundary: ratio == NUM/DEN is NOT
    flagged (strict >); empty-token docs get ratio 0.0, not NULL."""
    rows = [
        (1, "slow " + "x " * 9, "en", "s", 0),   # 1/10 == tau -> not flagged
        (2, "slow slow " + "x " * 8, "en", "s", 0),  # 2/10 > tau -> flagged
        (3, "   ", "en", "s", 0),                # whitespace-only: 0 tokens
        (4, None, "en", "s", 0),                 # null text: excluded
    ]
    df = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    p = str(tmp_path / "documents.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(p)
    out = {
        r["doc_id"]: r
        for r in fns["q_text_blocklist"](spark, str(tmp_path)).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1]["flagged"] == 0 and out[1]["n_blocked"] == 1
    assert out[2]["flagged"] == 1 and out[2]["n_blocked"] == 2
    assert out[3]["n_tokens"] == 0 and out[3]["blocked_ratio"] == 0.0
