"""ANN recall-audit pins (r8): the quality ordering the multiprobe
design claims, and the audit's bounds."""

from __future__ import annotations

import pytest

from confluent_example_firehose_spark.operators.similarity_queries import (
    TOP_K,
)
from confluent_example_firehose_spark.registry import query_fns


@pytest.fixture(scope="module")
def fns():
    return query_fns()


def test_multiprobe_dominates_plain_lsh(spark, sf_dir, fns):
    """Multiprobe LSH probes the bucket plus all 1-bit-flip buckets,
    a strict superset of the plain probe — its candidate set contains
    plain LSH's, so per query: n_hits(mp) >= n_hits(lsh), and both
    audits are bounded by TOP_K."""
    rows = fns["q_ann_recall"](spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], {})[r["method"]] = r
    assert by_q, "no audit rows"
    for q, m in by_q.items():
        assert set(m) == {"lsh", "lsh_multiprobe"}
        for r in m.values():
            assert 0 <= r["n_hits"] <= min(r["n_ann"], TOP_K)
            assert r["recall_at_k"] == pytest.approx(
                r["n_hits"] / TOP_K, abs=1e-9
            )
        assert (
            m["lsh_multiprobe"]["n_hits"] >= m["lsh"]["n_hits"]
        ), (q, m)
