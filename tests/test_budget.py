"""UniMax water-filling pins (r8): exact agreement with an
independent pure-Python water-filler, plus the allocation laws."""

from __future__ import annotations

import pytest

from confluent_example_firehose_spark.operators.budget_queries import (
    BUDGET_DIV,
)
from confluent_example_firehose_spark.registry import query_fns


def _python_waterfill(avail: dict[str, int], budget: int):
    """Independent model: saturate smallest-first, split the rest into
    equal integer shares, remainder to the first sources in
    (avail, source) order."""
    order = sorted(avail, key=lambda s: (avail[s], s))
    alloc = {}
    remaining, left = budget, len(order)
    for i, src in enumerate(order):
        if avail[src] * left <= remaining:
            alloc[src] = (avail[src], 1)
            remaining -= avail[src]
            left -= 1
        else:
            base, rem = divmod(remaining, left)
            for j, other in enumerate(order[i:]):
                alloc[other] = (base + 1 if j < rem else base, 0)
            break
    return alloc


@pytest.fixture(scope="module")
def fns():
    return query_fns()


CASES = [
    {"a": 100, "b": 100, "c": 100, "d": 100},  # uniform: nobody saturates
    {"a": 1, "b": 2, "c": 1000},               # tiny sources saturate
    {"a": 7, "b": 13, "c": 29, "d": 101, "e": 997},  # odd shares + remainder
    {"a": 5},                                  # single source
    {"a": 3, "b": 3, "c": 3, "d": 1000},       # ties in availability
]


@pytest.mark.parametrize("avail", CASES)
def test_waterfill_matches_python_model(spark, fns, tmp_path, avail):
    rows = [
        (i, "x " * n, "en", src, 0)
        for i, (src, n) in enumerate(sorted(avail.items()))
    ]
    df = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    out_dir = tmp_path / f"c{len(avail)}_{sum(avail.values())}"
    out_dir.mkdir()
    df.coalesce(1).write.mode("overwrite").parquet(
        str(out_dir / "documents.parquet")
    )
    got = {
        r["source"]: (r["allocated"], r["saturated"], r["available"])
        for r in fns["q_unimax_budget"](spark, str(out_dir)).collect()
    }
    budget = sum(avail.values()) // BUDGET_DIV
    want = _python_waterfill(avail, budget)
    assert {s: v[2] for s, v in got.items()} == avail
    for s in avail:
        assert got[s][0] == want[s][0], (s, got, want)
        assert got[s][1] == want[s][1], (s, got, want)
    # the laws: exact budget sum, no over-allocation, equal shares
    assert sum(v[0] for v in got.values()) == budget
    assert all(v[0] <= v[2] for v in got.values())
    unsat = sorted(v[0] for v in got.values() if v[1] == 0)
    assert not unsat or unsat[-1] - unsat[0] <= 1
