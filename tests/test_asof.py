"""As-of join semantics: both implementations agree with the hand
answer (backward match, last-match-wins, unmatched-left preserved)."""

from __future__ import annotations

from confluent_example_firehose_spark.operators.asof import (
    asof_join_agg,
    asof_join_merge,
)

LEFT = [(1, 10, "l1"), (1, 25, "l2"), (2, 5, "l3")]
RIGHT = [(1, 10, 100.0, 1), (1, 20, 200.0, 2), (1, 20, 250.0, 3), (3, 1, 9.0, 4)]
# key=1 t=10 -> right t=10 (100.0); key=1 t=25 -> t=20 tiebreak max rid=3
# (250.0); key=2 -> no match (null)
EXPECTED = {("l1", 100.0), ("l2", 250.0), ("l3", None)}


def _frames(spark):
    left = spark.createDataFrame(LEFT, ["k", "t", "tag"])
    right = spark.createDataFrame(RIGHT, ["k2", "t2", "px", "rid"])
    return left, right


def test_asof_agg(spark):
    left, right = _frames(spark)
    out = asof_join_agg(
        left, right, "k", "k2", "t", "t2", ["px"], "rid"
    ).collect()
    assert {(r["tag"], r["px"]) for r in out} == EXPECTED


def test_asof_merge_matches_agg(spark):
    left, right = _frames(spark)
    out = asof_join_merge(
        left, right, "k", "k2", "t", "t2", ["px"], "rid"
    ).collect()
    got = {(r["tag"], r["px"]) for r in out}
    # cogroup drops left keys with no right group only if pandas path
    # mishandles them — it must NOT: l3 stays with null px
    assert got == EXPECTED


def test_asof_preserves_duplicate_left_rows(spark):
    """Duplicate left rows (same key and time, no unique column) must
    each produce an output row — left-join cardinality."""
    left = spark.createDataFrame([(1, 10), (1, 10), (2, 7)], ["k", "t"])
    right = spark.createDataFrame(
        [(1, 5, 42.0, 1)], "k2 long, t2 long, px double, rid long"
    )
    out = asof_join_agg(left, right, "k", "k2", "t", "t2", ["px"], "rid").collect()
    assert len(out) == 3
    assert sorted((r["k"], r["px"]) for r in out) == [
        (1, 42.0), (1, 42.0), (2, None)
    ]
