"""Multi-probe LSH: measured recall against the exact top-k, pinned to
dominate single-probe (the property that justifies the 9x candidate
cost)."""

from __future__ import annotations

from confluent_example_firehose_spark.operators.similarity_queries import (
    q_similarity_lsh,
    q_similarity_lsh_multiprobe,
    q_similarity_topk,
)


def _neighbor_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def test_multiprobe_recall_dominates_single_probe(spark, sf_dir):
    exact = _neighbor_sets(q_similarity_topk(spark, sf_dir))
    single = _neighbor_sets(q_similarity_lsh(spark, sf_dir))
    multi = _neighbor_sets(q_similarity_lsh_multiprobe(spark, sf_dir))

    def recall(approx):
        num = sum(len(approx.get(q, set()) & ex) for q, ex in exact.items())
        den = sum(len(ex) for ex in exact.values())
        return num / den

    r1, r9 = recall(single), recall(multi)
    # multi-probe candidates are a superset: recall can only improve
    assert r9 >= r1
    for q in single:
        assert single[q] <= multi.get(q, set()) | single[q]
    # and it must find something for every query
    assert set(multi) == set(exact)
