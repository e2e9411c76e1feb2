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
    # Per-query exact-hit dominance (ADVICE r4 replaced a tautology):
    # an exact-top-k member is beaten by fewer than k vectors globally,
    # so it survives the (total-order) rank in ANY candidate pool that
    # contains it — multi's pool contains single's, hence every exact
    # hit single finds, multi must find too. This is provable on the
    # top-k OUTPUTS, unlike raw top-k set containment (ties aside, a
    # better candidate pool may push non-exact filler out of the k).
    for q, ex in exact.items():
        assert (single.get(q, set()) & ex) <= (multi.get(q, set()) & ex)
    # and it must find something for every query
    assert set(multi) == set(exact)
