"""q_dedup_near_stream law pins (r10): the ingest-time LSH index
detects exactly the cross-epoch subset of the batch near-dup pairs."""

from __future__ import annotations

import pytest

from confluent_example_firehose_spark.operators.sketch_stream_queries import (
    SK_BATCHES,
)
from confluent_example_firehose_spark.registry import query_fns


@pytest.fixture(scope="module")
def fns():
    return query_fns()


def test_stream_equals_cross_batch_subset_of_batch_dedup(
    spark, sf_dir, fns
):
    """The emitted (doc_id, dup_of, jac) set equals q_dedup_near's
    pair set restricted to pairs whose docs land in DIFFERENT
    doc_id-residue epochs — the batch job and the ingest index agree
    on every detectable pair (same shingles, same verify kernel, same
    threshold), and the stream's strictly-earlier semantics exclude
    exactly the same-epoch pairs."""
    streamed = {
        (min(r["doc_id"], r["dup_of"]), max(r["doc_id"], r["dup_of"])): r[
            "jac"
        ]
        for r in fns["q_dedup_near_stream"](spark, sf_dir).collect()
    }
    batch = {
        (r["id_a"], r["id_b"]): r["jac"]
        for r in fns["q_dedup_near"](spark, sf_dir).collect()
        if r["id_a"] % SK_BATCHES != r["id_b"] % SK_BATCHES
    }
    assert streamed == batch


def test_index_state_laws(spark, sf_dir, fns):
    """r11 contracted-index state laws: the member map is LINEAR in
    the ingested corpus (one 3-column row per shingleable doc — never
    text, never pair-sized), while the HEAVY relations scale with
    CONTENT DIVERSITY — one shingle-set row and NEAR_STREAM_BANDS
    posting rows per DISTINCT content, so exact-duplicate mass adds
    zero index weight (the r10 probe measured the per-doc form at
    4,000,000 band rows on a 100x clone; the contracted form stores
    40,000)."""
    from pyspark.sql import functions as F

    from confluent_example_firehose_spark.catalog import load_table
    from confluent_example_firehose_spark.operators.dedup_stream_queries import (
        NEAR_STREAM_BANDS,
    )
    from confluent_example_firehose_spark.operators.sketch_stream_queries import (
        LAST_STATE_ROWS,
    )

    out = fns["q_dedup_near_stream"](spark, sf_dir).collect()
    shingleable = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .filter(F.size(F.split(F.trim("text"), r"\s+")) >= 3)
    )
    eligible = shingleable.count()
    distinct_contents = (
        shingleable.select(F.md5("text")).distinct().count()
    )
    assert LAST_STATE_ROWS["q_dedup_near_stream_members"] == eligible
    assert (
        LAST_STATE_ROWS["q_dedup_near_stream_classes"]
        == distinct_contents
    )
    assert (
        LAST_STATE_ROWS["q_dedup_near_stream_shingles"]
        == distinct_contents
    )
    assert (
        LAST_STATE_ROWS["q_dedup_near_stream_bands"]
        == NEAR_STREAM_BANDS * distinct_contents
    )
    # Class-pair state, the REAL law (ADVICE r11 — the old % 2 check
    # passed on an empty or single-orientation relation): exactly both
    # orientations of each verified pair, every row at or above the
    # verify threshold, and every cross-class emission of the run maps
    # into the relation.
    from pyspark.sql import functions as F2

    from confluent_example_firehose_spark.operators.dedup_stream_queries import (  # noqa: E501
        LAST_CLASS_PAIRS,
        NEAR_STREAM_JAC,
    )

    pairs = {(a, b): j for a, b, j in LAST_CLASS_PAIRS}
    assert len(pairs) == len(LAST_CLASS_PAIRS)  # no duplicate rows
    for (a, b), j in pairs.items():
        assert pairs.get((b, a)) == j  # both orientations, same jac
        assert j >= NEAR_STREAM_JAC
    assert (
        LAST_STATE_ROWS["q_dedup_near_stream_class_pairs"] == len(pairs)
    )
    fp_of = {
        r["doc_id"]: r["fp"]
        for r in shingleable.select(
            "doc_id", F2.md5("text").alias("fp")
        ).collect()
    }
    for r in out:
        fa, fb = fp_of[r["doc_id"]], fp_of[r["dup_of"]]
        if fa != fb:  # cross-class emission must come from the relation
            assert (fa, fb) in pairs


def test_stream_orientation_and_threshold(spark, sf_dir, fns):
    """Every emitted row points a NEW doc at a strictly earlier
    arrival (dup_of's epoch < doc's epoch == batch_id) and clears the
    verify threshold."""
    rows = fns["q_dedup_near_stream"](spark, sf_dir).collect()
    assert rows, "corpus has cross-epoch near-dups by construction"
    for r in rows:
        assert r["doc_id"] % SK_BATCHES == r["batch_id"]
        assert r["dup_of"] % SK_BATCHES < r["batch_id"]
        assert r["jac"] >= 0.2


def test_curation_stream_ledger_laws(spark, sf_dir, fns):
    """Admission-ledger identities: every arrival is accounted for
    exactly once (arrived == quality_fail + dup_dropped + admitted),
    the cumulative corpus is the running sum of admissions, and the
    maintained state holds exactly one fingerprint per admitted
    content (LAST_STATE_ROWS == final n_corpus_cum)."""
    from confluent_example_firehose_spark.operators.sketch_stream_queries import (
        LAST_STATE_ROWS,
    )

    rows = sorted(
        fns["q_curation_stream"](spark, sf_dir).collect(),
        key=lambda r: r["batch_id"],
    )
    assert rows
    cum = 0
    for r in rows:
        assert (
            r["n_arrived"]
            == r["n_quality_fail"] + r["n_dup_dropped"] + r["n_admitted"]
        )
        cum += r["n_admitted"]
        assert r["n_corpus_cum"] == cum
    assert LAST_STATE_ROWS["q_curation_stream"] == rows[-1]["n_corpus_cum"]


def test_curation_stream_admits_what_batch_curation_keeps(
    spark, sf_dir, fns
):
    """Cross-operator law: the stream's total admissions equal the
    batch q_corpus_curation's deduped survivor count — same gates,
    same fingerprint, so admission control at ingest converges to
    exactly the corpus the one-shot curation would keep."""
    total_admitted = sum(
        r["n_admitted"]
        for r in fns["q_curation_stream"](spark, sf_dir).collect()
    )
    batch_kept = sum(
        r["n_docs"]
        for r in fns["q_corpus_curation"](spark, sf_dir).collect()
    )
    assert total_admitted == batch_kept


def test_cluster_stream_final_state_equals_batch_cc(spark, sf_dir, fns):
    """Cross-operator law: after all epochs, the maintained union-find
    root map equals q_dedup_clusters' batch connected components —
    incremental root-contracted merging converges to exactly the
    one-shot transitive closure (same window, same edge predicate)."""
    from confluent_example_firehose_spark.operators.dedup_stream_queries import (  # noqa: E501
        LAST_CLUSTER_STATE,
    )

    fns["q_cluster_stream"](spark, sf_dir).collect()
    streamed = dict(LAST_CLUSTER_STATE)
    batch = {
        r["doc_id"]: r["cluster_id"]
        for r in fns["q_dedup_clusters"](spark, sf_dir).collect()
    }
    assert streamed == batch


def test_cluster_stream_state_linear_and_at_arrival(spark, sf_dir, fns):
    """State law: the root map and word-set state hold exactly one row
    per ingested window doc (corpus-linear, never pair-sized). Output
    law: an at-arrival assignment can only point at an already-arrived
    doc — cluster_id <= doc_id (the doc itself is in its component)
    and the cluster head's arrival epoch never exceeds the doc's."""
    from pyspark.sql import functions as F

    from confluent_example_firehose_spark.catalog import load_table
    from confluent_example_firehose_spark.operators.dedup_queries import (
        PAIR_CAP,
    )
    from confluent_example_firehose_spark.operators.sketch_stream_queries import (  # noqa: E501
        LAST_STATE_ROWS,
    )

    rows = fns["q_cluster_stream"](spark, sf_dir).collect()
    window_docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < PAIR_CAP)
        .count()
    )
    assert LAST_STATE_ROWS["q_cluster_stream_roots"] == window_docs
    assert LAST_STATE_ROWS["q_cluster_stream_ws"] == window_docs
    assert len(rows) == window_docs
    for r in rows:
        assert r["cluster_id"] <= r["doc_id"]
        assert r["cluster_id"] % SK_BATCHES <= r["batch_id"]


def test_cluster_stream_giant_cluster_skew(spark, tmp_path):
    """Duplicate-skew shape for the ingest clusterer: a window that is
    ONE giant near-dup cluster (every doc identical) arriving across
    all epochs. Every arrival must resolve to cluster 0 at arrival
    (epoch 0 seeds it; later epochs' delta CC contracts to the single
    touched root), and the final root map is the one-component
    clustering — the root-contracted delta graph never exceeds
    (batch + 1) nodes no matter how many members the cluster has."""
    from confluent_example_firehose_spark.operators.dedup_stream_queries import (  # noqa: E501
        LAST_CLUSTER_STATE,
    )
    from confluent_example_firehose_spark.registry import query_fns

    text = "all work and no play makes a dull corpus indeed"
    rows = [(i, text) for i in range(40)]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    out = query_fns()["q_cluster_stream"](spark, str(tmp_path)).collect()
    assert len(out) == 40
    assert all(r["cluster_id"] == 0 for r in out)
    assert dict(LAST_CLUSTER_STATE) == {i: 0 for i in range(40)}


def test_class_pair_survives_for_late_members(spark, tmp_path):
    """Regression pin for the r11 refreshByPath self-inclusion bug:
    the class pair verified when B first arrives (epoch 1, vs A from
    epoch 0) must be READ BACK from the persisted relation when a
    LATER member of B arrives (epoch 2) — the untagged state wrote
    empty class-pair appends for every epoch >= 1, so the late member
    silently lost its cross-class emission while all three hash SFs
    stayed green by corpus luck."""
    from confluent_example_firehose_spark.registry import query_fns

    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    b = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    rows = [(0, a), (5, b), (6, b)]  # epochs 0, 1, 2 via doc_id % 4
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {
        (r["doc_id"], r["dup_of"]): r["jac"]
        for r in query_fns()["q_dedup_near_stream"](
            spark, str(tmp_path)
        ).collect()
    }
    assert (5, 0) in out  # B's first arrival pairs with A
    assert out.get((6, 5)) == 1.0  # late member pairs within class
    # THE pin: the late member's cross-class emission, which requires
    # the (B, A) class pair to have survived in cp_state
    assert (6, 0) in out and out[(6, 0)] == out[(5, 0)]
