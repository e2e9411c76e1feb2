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


@pytest.fixture()
def instrument():
    """Enable the state-sized law-test collects (LAST_CLASS_PAIRS /
    LAST_CLUSTER_STATE) for one test — production and probe runs keep
    them off (ADVICE r11 item 4)."""
    import confluent_example_firehose_spark.operators.dedup_stream_queries as m

    m.INSTRUMENT_COLLECT = True
    yield
    m.INSTRUMENT_COLLECT = False


def _min_label_cc(nodes, pairs) -> dict:
    """Reference union-find with union-by-min (root == component min
    id) — the batch comparator for the streaming CC laws."""
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


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


def test_index_state_laws(spark, sf_dir, fns, instrument):
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


def _shingleable_docs(spark, sf_dir):
    from pyspark.sql import functions as F

    from confluent_example_firehose_spark.catalog import load_table

    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .filter(F.size(F.split(F.trim("text"), r"\s+")) >= 3)
    )


def test_cluster_stream_final_state_equals_batch_cc(
    spark, sf_dir, fns, instrument
):
    """Cross-operator law (r12 rewire): after all epochs, the
    maintained class-level state expands to exactly the batch
    connected components over q_dedup_near's verified pair set — the
    incremental index-fed delta CC converges to the one-shot
    transitive closure of the SAME detector (same shingles, same
    verify kernel, same threshold), over the full shingleable
    corpus."""
    from confluent_example_firehose_spark.operators.dedup_stream_queries import (  # noqa: E501
        LAST_CLUSTER_STATE,
    )

    fns["q_cluster_stream"](spark, sf_dir).collect()
    streamed = dict(LAST_CLUSTER_STATE)
    nodes = [
        r["doc_id"]
        for r in _shingleable_docs(spark, sf_dir)
        .select("doc_id")
        .collect()
    ]
    pairs = [
        (r["id_a"], r["id_b"])
        for r in fns["q_dedup_near"](spark, sf_dir).collect()
    ]
    assert streamed == _min_label_cc(nodes, pairs)
    # Live-component count law: one comp state row per distinct FINAL
    # label (the exact form of the <= bound in the state test).
    from confluent_example_firehose_spark.operators.sketch_stream_queries import (  # noqa: E501
        LAST_STATE_ROWS,
    )

    assert LAST_STATE_ROWS["q_cluster_stream_comps"] == len(
        set(streamed.values())
    )


def test_cluster_stream_state_contracted_and_at_arrival(
    spark, sf_dir, fns
):
    """State law (r12): the root map holds one row per distinct
    CONTENT (content-diversity-bounded — strictly below the corpus-
    linear r11 doc-level map on a corpus with duplicates), and the
    comp relation one row per live component. Output law: every
    shingleable arrival gets exactly one at-arrival assignment,
    cluster_id <= doc_id (the doc is in its own component) and the
    cluster head arrived no later than the doc."""
    from pyspark.sql import functions as F

    from confluent_example_firehose_spark.operators.sketch_stream_queries import (  # noqa: E501
        LAST_STATE_ROWS,
    )

    rows = fns["q_cluster_stream"](spark, sf_dir).collect()
    sh = _shingleable_docs(spark, sf_dir)
    eligible = sh.count()
    distinct_contents = sh.select(F.md5("text")).distinct().count()
    assert LAST_STATE_ROWS["q_cluster_stream_roots"] == distinct_contents
    # Emitted at-arrival labels are a LEDGER: a label can be superseded
    # by a later merge, so live components can only be <= the distinct
    # emitted ids (the exact comp-count law — live comps == distinct
    # FINAL labels — is pinned in the final-state CC test below).
    n_emitted = len({r["cluster_id"] for r in rows})
    assert 0 < LAST_STATE_ROWS["q_cluster_stream_comps"] <= n_emitted
    assert len(rows) == eligible
    for r in rows:
        assert r["cluster_id"] <= r["doc_id"]
        assert r["cluster_id"] % SK_BATCHES <= r["batch_id"]


def test_cluster_stream_giant_cluster_skew(spark, tmp_path, instrument):
    """Duplicate-skew shape for the ingest clusterer: a corpus that is
    ONE giant exact-duplicate cluster arriving across all epochs. The
    content contraction collapses it to a single class, every arrival
    resolves to cluster 0 at arrival, the final assignment is the
    one-component clustering, and the class-level state is ONE root
    row no matter how many members arrive."""
    from confluent_example_firehose_spark.operators.dedup_stream_queries import (  # noqa: E501
        LAST_CLUSTER_STATE,
    )
    from confluent_example_firehose_spark.operators.sketch_stream_queries import (  # noqa: E501
        LAST_STATE_ROWS,
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
    assert LAST_STATE_ROWS["q_cluster_stream_roots"] == 1
    assert LAST_STATE_ROWS["q_cluster_stream_comps"] == 1


def test_cluster_stream_selective_rewrite_bytes(spark, tmp_path):
    """VERDICT r11 item 2's done-criterion: per-epoch rewritten bytes
    scale with TOUCHED roots, not total state. A large epoch-0 corpus
    (200 distinct singleton docs) followed by one-doc epochs must show
    the later epochs rewriting a small fraction of the epoch-0 bytes —
    only the single touched pb partition is written fresh; the other
    partitions hardlink forward."""
    from confluent_example_firehose_spark.operators.dedup_stream_queries import (  # noqa: E501
        LAST_REWRITE_BYTES,
    )
    from confluent_example_firehose_spark.registry import query_fns

    rows = [
        (4 * i, f"w{i}a w{i}b w{i}c w{i}d w{i}e") for i in range(200)
    ] + [(k, f"x{k}a x{k}b x{k}c x{k}d x{k}e") for k in (1, 2, 3)]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    LAST_REWRITE_BYTES.clear()
    out = query_fns()["q_cluster_stream"](spark, str(tmp_path)).collect()
    assert len(out) == 203
    wb = LAST_REWRITE_BYTES["q_cluster_stream_roots"]
    assert len(wb) == SK_BATCHES
    assert wb[0] > 0
    for later in wb[1:]:
        assert 0 < later < wb[0] / 4, (
            f"one-class epoch rewrote {later} bytes vs epoch-0 "
            f"{wb[0]} — selective rewrite is not selective"
        )


def test_index_reads_bucket_pruned_and_output_invariant(
    spark, tmp_path
):
    """VERDICT r12 item 1's done-criteria: with the adaptive gate
    forced open (PRUNE_MIN_STATE_BYTES = 0), the per-epoch admission /
    candidate / verify probes push the epoch's touched-bucket
    predicate into the state scans — LAST_READ_BYTES must show later
    one-doc epochs reading a small fraction of the classes relation's
    bytes — and the emitted ledger must be IDENTICAL to the
    full-scan plan's (the bucket predicate only ever removes rows the
    equi-joins could not match). Epoch-0 writes 200 singleton classes
    across all buckets; epochs 1-3 each add one doc (one or two
    touched buckets)."""
    import confluent_example_firehose_spark.operators.dedup_stream_queries as m
    from confluent_example_firehose_spark.registry import query_fns

    rows = [
        (4 * i, f"w{i}a w{i}b w{i}c w{i}d w{i}e") for i in range(200)
    ] + [
        (1, "x1a x1b x1c x1d x1e"),
        (5, "x1a x1b x1c x1d x1e"),  # exact dup of doc 1, epoch 1
        (2, "w7a w7b w7c w7d w7e"),  # exact dup of an epoch-0 doc
        (3, "z3a z3b z3c z3d z3e"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    fn = query_fns()["q_dedup_near_stream"]
    full = {
        (r["batch_id"], r["doc_id"], r["dup_of"], r["jac"])
        for r in fn(spark, str(tmp_path)).collect()
    }
    assert full, "corpus has cross-epoch duplicates by construction"
    old = m.PRUNE_MIN_STATE_BYTES
    m.PRUNE_MIN_STATE_BYTES = 0
    try:
        pruned = {
            (r["batch_id"], r["doc_id"], r["dup_of"], r["jac"])
            for r in fn(spark, str(tmp_path)).collect()
        }
        reads = dict(m.LAST_READ_BYTES)
    finally:
        m.PRUNE_MIN_STATE_BYTES = old
    assert pruned == full
    # The classes admission probe is metered for every epoch with
    # state (1..3); the one-class epochs must touch a small fraction
    # of the 200-class relation's bytes.
    cls = reads["q_dedup_near_stream_classes"]
    assert len(cls) == SK_BATCHES - 1
    for touched, total in cls:
        assert 0 < touched < total / 4, (
            f"one-class epoch read {touched} of {total} classes-state "
            "bytes — the probe scan is not bucket-pruned"
        )
    # Shingle verify reads only the candidate pairs' buckets.
    for touched, total in reads["q_dedup_near_stream_shingles"]:
        assert touched <= total


def test_curation_probe_bucket_pruned_and_output_invariant(
    spark, tmp_path
):
    """The admitted-fp state's left_anti probe under the forced-open
    adaptive gate: identical ledger to the full-scan plan, and the
    one-fp epochs read a small fraction of the 200-fp state's bytes
    (VERDICT r12 item 6's read-side done-criterion)."""
    import confluent_example_firehose_spark.operators.dedup_stream_queries as m
    from confluent_example_firehose_spark.registry import query_fns

    rows = [
        (
            4 * i,
            f"the w{i}a a w{i}b the w{i}c a w{i}d the w{i}e w{i}f",
        )
        for i in range(200)
    ] + [
        (k, f"the x{k}a a x{k}b the x{k}c a x{k}d the x{k}e x{k}f")
        for k in (1, 2, 3)
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    fn = query_fns()["q_curation_stream"]
    full = sorted(tuple(r) for r in fn(spark, str(tmp_path)).collect())
    assert full[0][4] > 0, "epoch 0 admits quality-passing docs"
    old = m.PRUNE_MIN_STATE_BYTES
    m.PRUNE_MIN_STATE_BYTES = 0
    try:
        pruned = sorted(
            tuple(r) for r in fn(spark, str(tmp_path)).collect()
        )
        reads = list(m.LAST_READ_BYTES["q_curation_stream_admitted_read"])
    finally:
        m.PRUNE_MIN_STATE_BYTES = old
    assert pruned == full
    assert len(reads) == SK_BATCHES - 1  # every epoch with state
    for touched, total in reads:
        assert 0 < touched < total / 4, (
            f"one-fp epoch read {touched} of {total} admitted-state "
            "bytes — the probe scan is not bucket-pruned"
        )


def test_ingest_stream_ledger_laws(spark, sf_dir, fns):
    """Capstone ledger partition + cross-operator admission law: every
    arrival appears exactly once with a consistent status; per-batch
    admitted and quality-fail counts equal q_curation_stream's ledger
    (same gates, same fingerprint, one shared pass); duplicates name a
    representative that arrived strictly before them in (epoch,
    doc_id) order; quality-passing rows carry an at-arrival cluster,
    failing rows carry nothing."""
    from collections import Counter

    from confluent_example_firehose_spark.catalog import load_table

    rows = fns["q_ingest_stream"](spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs
    assert len({r["doc_id"] for r in rows}) == n_docs
    adm = Counter(
        r["batch_id"] for r in rows if r["status"] == "admitted"
    )
    qf = Counter(
        r["batch_id"] for r in rows if r["status"] == "quality_fail"
    )
    cur = {
        r["batch_id"]: r
        for r in fns["q_curation_stream"](spark, sf_dir).collect()
    }
    for bid, c in cur.items():
        assert adm.get(bid, 0) == c["n_admitted"]
        assert qf.get(bid, 0) == c["n_quality_fail"]
    for r in rows:
        assert r["batch_id"] == r["doc_id"] % SK_BATCHES
        if r["status"] == "quality_fail":
            assert r["dup_of"] is None and r["cluster_id"] is None
        else:
            assert r["cluster_id"] is not None
            assert r["cluster_id"] <= r["doc_id"]
            if r["status"] == "admitted":
                assert r["dup_of"] is None
            else:
                d = r["dup_of"]
                assert (d % SK_BATCHES, d) < (r["batch_id"], r["doc_id"])


def test_ingest_stream_final_state_equals_batch_cc(
    spark, sf_dir, fns, instrument
):
    """Capstone clustering law: the final shared-state clustering
    equals batch CC over q_dedup_near's pair set RESTRICTED to the
    quality-passing universe — the gate changes which docs enter the
    index, nothing about how survivors cluster."""
    from confluent_example_firehose_spark.catalog import load_table
    from confluent_example_firehose_spark.operators.dedup_stream_queries import (  # noqa: E501
        LAST_CLUSTER_STATE,
        _quality_classes,
    )

    fns["q_ingest_stream"](spark, sf_dir).collect()
    streamed = dict(LAST_CLUSTER_STATE)
    qdocs = {
        r["doc_id"]
        for r in _quality_classes(
            load_table(spark, sf_dir, "documents").select(
                "doc_id", "text"
            )
        )
        .select("doc_id")
        .collect()
    }
    pairs = [
        (r["id_a"], r["id_b"])
        for r in fns["q_dedup_near"](spark, sf_dir).collect()
        if r["id_a"] in qdocs and r["id_b"] in qdocs
    ]
    assert streamed == _min_label_cc(qdocs, pairs)


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


def test_bucket_compaction_bounds_files_and_is_output_invariant(
    spark, tmp_path
):
    """_compact_buckets' two laws, pinned with the threshold forced to
    2 (a bucket is rewritten the moment it holds 2 part files):
    (a) after every epoch each members bucket dir holds exactly ONE
    part file even though the same content buckets are touched every
    epoch (duplicate arrivals re-touch their class's bucket), where
    the no-compaction twin accrues one file per touched epoch; and
    (b) the per-epoch verified pair sets and the final state relation
    ROW SETS are identical between the two runs — compaction is a
    content-identity physical rewrite (the b_id tag is an ordinary
    column and survives). The prune gate is forced open so the
    touched-bucket (resolved-pbs) sweep path runs, not just the
    small-state listdir sweep."""
    import os

    import confluent_example_firehose_spark.operators.dedup_stream_queries as m
    from pyspark.sql import functions as F

    base = [
        f"c{i}a c{i}b c{i}c c{i}d c{i}e" for i in range(8)
    ]  # 8 distinct contents, re-arriving EVERY epoch under new ids

    def run(root):
        ip = m._index_paths(str(root))
        pair_sets = []
        for b in range(4):
            rows = [(100 * b + i, base[i]) for i in range(8)]
            # one brand-new near-dup of content 0 per epoch keeps the
            # candidate/verify path (and class_pairs appends) live
            rows.append((100 * b + 50, base[0] + f" extra{b}"))
            flt = spark.createDataFrame(
                rows, "doc_id long, text string"
            ).select("doc_id", "text", F.md5("text").alias("cfp"))
            mb, nc, cp, extra, _ = m._index_epoch(
                spark, b, flt, ip, "t_compact"
            )
            pair_sets.append(
                {
                    (r["cfp"], r["other"], round(r["jac"], 6))
                    for r in cp.collect()
                }
            )
            for c in (mb, *extra):
                c.unpersist()
        state = {
            rel: sorted(
                tuple(r)
                for r in spark.read.parquet(ip[rel]).collect()
            )
            for rel in ip
            if m._has_state(ip[rel])
        }
        counts = {}
        for rel in ip:
            if not m._has_state(ip[rel]):
                continue
            counts[rel] = max(
                sum(
                    1
                    for fn in os.listdir(os.path.join(ip[rel], e))
                    if fn.startswith("part-")
                )
                for e in os.listdir(ip[rel])
                if e.startswith("pb=")
            )
        return pair_sets, state, counts

    old_gate, old_files = m.PRUNE_MIN_STATE_BYTES, m.INDEX_COMPACT_FILES
    m.PRUNE_MIN_STATE_BYTES = 0
    try:
        m.INDEX_COMPACT_FILES = 2
        pairs_c, state_c, counts_c = run(tmp_path / "compacted")
        m.INDEX_COMPACT_FILES = 10**9
        pairs_n, state_n, counts_n = run(tmp_path / "plain")
    finally:
        m.PRUNE_MIN_STATE_BYTES = old_gate
        m.INDEX_COMPACT_FILES = old_files
    assert pairs_c == pairs_n and pairs_c[1], (
        "compaction changed the emitted pair sets"
    )
    assert state_c == state_n, (
        "compaction changed a state relation's row set"
    )
    # members buckets are touched all 4 epochs: the twin accrues files,
    # the compacted run holds the bound (2-file trigger leaves 1).
    assert counts_n["members"] >= 3
    assert counts_c["members"] == 1, (
        f"members bucket holds {counts_c['members']} part files — "
        "compaction did not bound the per-bucket file count"
    )


def test_semantic_stream_keys_to_earliest_same_cluster_neighbor(
    spark, tmp_path
):
    """q_dedup_semantic_stream on a constructed two-blob corpus: 256
    vectors, blob membership chosen so the first shard (vec_id % 4
    == 0) trains one centroid per blob (k = _sem_k(64) = 2), each
    vector a tiny deterministic perturbation of its blob base — so
    within-blob cosine ~1 >= SEM_TAU and cross-blob ~0. Law: every
    vector of a later epoch keys to the SMALLEST earlier same-blob
    vec_id (0 for blob A, 4 for blob B — both land in epoch 0), and
    epoch-0 vectors emit nothing."""
    dim = 8

    def blob(i):
        return 1 if (i % 8) >= 4 else 0

    rows = []
    for i in range(256):
        base = [0.0] * dim
        base[blob(i)] = 1.0
        v = [
            base[j] + ((i * 31 + j * 17) % 97) / 9700.0
            for j in range(dim)
        ]
        rows.append((i, v))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).write.parquet(str(tmp_path / "embeddings.parquet"))
    from confluent_example_firehose_spark.registry import query_fns

    out = {
        (r["vec_id"]): (r["batch_id"], r["kept_by"], r["cos"])
        for r in query_fns()["q_dedup_semantic_stream"](
            spark, str(tmp_path)
        ).collect()
    }
    expected_ids = {i for i in range(256) if i % 4 >= 1}
    assert set(out) == expected_ids
    for i, (b, kept_by, cos) in out.items():
        assert b == i % 4
        assert kept_by == (0 if blob(i) == 0 else 4)
        assert cos > 0.9


def test_compact_buckets_crash_recovery(spark, tmp_path):
    """_compact_buckets' .old recovery rule, both crash windows: a
    bucket whose dir is MISSING with .old present (crashed between
    the two renames) is restored from .old; a bucket with BOTH
    present (crashed before the cleanup rmtree) drops the superseded
    .old. Either way no .old dir survives to break a later full-dir
    partition discovery, and the relation's row set is intact."""
    import os
    import shutil as sh

    import confluent_example_firehose_spark.operators.dedup_stream_queries as m
    from pyspark.sql import functions as F

    path = str(tmp_path / "rel")
    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.lit(0).alias("b_id"),
        (F.col("id") % 4).cast("int").alias("pb"),
    )
    m._pb_append(df, path)
    rows_before = sorted(
        tuple(r) for r in spark.read.parquet(path).collect()
    )
    # window 1: bucket dir renamed away, .old authoritative
    os.rename(os.path.join(path, "pb=1"), os.path.join(path, "pb=1.old"))
    # window 2: both present (copy stands in for the superseded dir)
    sh.copytree(
        os.path.join(path, "pb=2"), os.path.join(path, "pb=2.old")
    )
    m._compact_buckets(spark, path, None)
    entries = set(os.listdir(path))
    assert "pb=1" in entries and "pb=1.old" not in entries
    assert "pb=2" in entries and "pb=2.old" not in entries
    rows_after = sorted(
        tuple(r) for r in spark.read.parquet(path).collect()
    )
    assert rows_after == rows_before


def test_run_concurrent_awaits_all_and_reraises_first():
    """Optimization r14: the overlapped maintenance runner must (a) run
    EVERY job even when one fails — an orphaned in-flight state append
    would corrupt the epoch — and (b) re-raise the first failure in
    submission order after all jobs settle."""
    import threading
    import time as _t

    import confluent_example_firehose_spark.operators.dedup_stream_queries as m

    ran = []

    def ok(tag, delay=0.0):
        def job():
            _t.sleep(delay)
            ran.append(tag)
        return job

    def boom():
        ran.append("boom")
        raise RuntimeError("first failure")

    with pytest.raises(RuntimeError, match="first failure"):
        m._run_concurrent([ok("a"), boom, ok("b", 0.05)])
    assert sorted(ran) == ["a", "b", "boom"]  # all jobs ran
    # the single-job fast path runs inline (no pool)
    tid = []
    m._run_concurrent([lambda: tid.append(threading.get_ident())])
    assert tid == [threading.get_ident()]


def test_lazy_pbs_resolves_once_under_concurrency(spark):
    """Optimization r14: several per-relation maintenance pipelines
    share one lazy bucket list (members/classes/shingles all prune on
    the batch's cfp buckets); concurrent resolution must run the
    collect_set job ONCE and every caller must see the same list."""
    from concurrent.futures import ThreadPoolExecutor

    from pyspark.sql import functions as F

    import confluent_example_firehose_spark.operators.dedup_stream_queries as m

    calls = []
    real = m._distinct_pbs

    def counting(df, col):
        calls.append(1)
        return real(df, col)

    df = spark.range(100).select(F.col("id").alias("cfp"))
    get = None
    old = m._distinct_pbs
    m._distinct_pbs = counting
    try:
        get = m._lazy_pbs(df, m._pb(F.col("cfp")))
        with ThreadPoolExecutor(max_workers=4) as ex:
            results = list(ex.map(lambda _: get(), range(4)))
    finally:
        m._distinct_pbs = old
    assert len(calls) == 1  # resolved exactly once
    assert all(r == results[0] for r in results)
