"""Unit tests for the dedup operators on hand-built frames (semantics
checked against values computed by hand — the differential gate at
sf0.01 is tools/check_oracle.py; these pin the kernels)."""

from __future__ import annotations

from pyspark.sql import functions as F

from confluent_example_firehose_spark.operators.dedup import (
    doc_shingle_hashes,
    hamming64,
    jaccard,
    minhash_candidate_pairs,
    simhash_fingerprints,
    word_shingles,
    words,
)


def test_words_and_shingles(spark):
    df = spark.createDataFrame([("A b  c d",)], ["text"])
    out = df.select(
        words("text").alias("w"), word_shingles("text", 3).alias("sh")
    ).first()
    assert out["w"] == ["a", "b", "c", "d"]
    assert out["sh"] == ["a b c", "b c d"]


def test_shingles_short_doc_empty(spark):
    df = spark.createDataFrame([("one two",)], ["text"])
    assert df.select(word_shingles("text", 3).alias("sh")).first()["sh"] == []


def test_jaccard_exact_value(spark):
    df = spark.createDataFrame([(["a", "b", "c"], ["b", "c", "d"])], ["x", "y"])
    j = df.select(jaccard(F.col("x"), F.col("y")).alias("j")).first()["j"]
    assert abs(j - 2.0 / 4.0) < 1e-12


def test_minhash_finds_duplicate_pair(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(1, base), (2, base + " tail"), (3, "completely different text here entirely unrelated words")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_candidate_pairs(df, "doc_id", "text").collect()
    }
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_minhash_skew_bucket_cap(spark):
    # 5 identical docs with max_bucket=3 -> the degenerate bucket drops
    rows = [(i, "same same same same same text") for i in range(5)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = minhash_candidate_pairs(df, "doc_id", "text", max_bucket=3).collect()
    assert out == []


def test_simhash_identical_docs_zero_hamming(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"), (2, "alpha beta gamma delta epsilon zeta")],
        ["doc_id", "text"],
    )
    a, b = [r["fp"] for r in simhash_fingerprints(df, "doc_id", "text").collect()]
    assert a == b
    d = spark.range(1).select(
        hamming64(F.lit(a), F.lit(b)).alias("d")
    ).first()["d"]
    assert d == 0


def test_shingle_hashes_match_string_shingles(spark):
    # hash-pipeline shingle COUNT equals the string-shingle count
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "x y"), (3, "p q r")], ["doc_id", "text"]
    )
    hashed = {
        r["_id"]: len(r["sh"])
        for r in doc_shingle_hashes(df, "doc_id", "text", keep_empty=True).collect()
    }
    strings = {
        r["doc_id"]: len(r["sh"])
        for r in df.select("doc_id", word_shingles("text").alias("sh")).collect()
    }
    assert hashed == strings == {1: 3, 2: 0, 3: 1}


def test_fuzzy_block_skew_guard(spark):
    """A degenerate hot block (> max_block members) must be dropped from
    pair generation entirely; cold blocks keep their pairs (VERDICT r2 #3)."""
    from confluent_example_firehose_spark.operators.relational_queries import (
        fuzzy_block_names,
    )

    rows = [(f"hot name{i} shared",) for i in range(6)]
    rows += [("cold pair one rare",), ("cold pair two rare",)]
    df = spark.createDataFrame(rows, ["p_name"])
    kept = fuzzy_block_names(df, max_block=4)
    blocks = {r["block"] for r in kept.collect()}
    assert blocks == {"rare"}  # "shared" block (6 > 4) dropped
    assert kept.count() == 2


def test_simhash_block_geometry_recall_contract(spark):
    """d=5 pair crafted to touch ALL four 16-bit blocks: the 4-block
    scheme provably misses it (pigeonhole only covers d <= 3), the
    8-block scheme provably finds it (5 flips cannot touch all 8
    blocks) — the exact contract q_dedup_simhash8 exists for."""
    from confluent_example_firehose_spark.operators.dedup import (
        simhash_candidate_pairs,
    )

    flips = (1 << 0) | (1 << 8) | (1 << 16) | (1 << 32) | (1 << 48)
    fp = spark.createDataFrame([(1, 0), (2, flips)], "_id long, fp long")
    four = simhash_candidate_pairs(fp, n_blocks=4).collect()
    eight = simhash_candidate_pairs(fp, n_blocks=8).collect()
    assert four == []  # every 16-bit block differs -> no shared bucket
    assert [(r["id_a"], r["id_b"]) for r in eight] == [(1, 2)]


def test_simhash8_bucket_cap_regime(spark):
    """ADVICE r4 (medium): the generic max_bucket=256 silently dropped
    whole buckets once 8-bit blocks collided at realistic corpus sizes,
    voiding the d<=7 recall guarantee. Build a 300-id bucket (over the
    old cap) containing a d=7 pair that shares ONLY that block: the old
    cap provably misses it, q_dedup_simhash8's sized cap finds it."""
    from confluent_example_firehose_spark.operators.dedup import (
        simhash_candidate_pairs,
    )
    from confluent_example_firehose_spark.operators.dedup_queries import (
        SIMHASH8_BUCKET_CAP,
    )

    # d=7 pair: one bit flipped in each of blocks 1-7, block 0 == 0
    flips = 0
    for b in range(1, 8):
        flips |= 1 << (b * 8)
    assert bin(flips).count("1") == 7
    # 298 fillers also share block 0 (low byte 0), unique elsewhere —
    # bucket (block 0, value 0) holds 300 ids > the old 256 cap.
    rows = [(1, 0), (2, flips)] + [
        (10 + i, (i + 3) << 16) for i in range(298)
    ]
    fp = spark.createDataFrame(rows, "_id long, fp long")
    # strict=False reproduces the OLD silent-drop behavior this test
    # documents; with the r6 strict default the same call raises
    # instead (pinned by test_simhash_strict_guard_raises_on_over_cap)
    old_cap = simhash_candidate_pairs(
        fp, n_blocks=8, max_bucket=256, strict=False
    )
    sized = simhash_candidate_pairs(
        fp, n_blocks=8, max_bucket=SIMHASH8_BUCKET_CAP
    )
    old_pairs = {(r["id_a"], r["id_b"]) for r in old_cap.collect()}
    sized_pairs = {(r["id_a"], r["id_b"]) for r in sized.collect()}
    assert (1, 2) not in old_pairs  # the silent drop ADVICE flagged
    assert (1, 2) in sized_pairs


def test_incremental_dedup_bipartite_only(spark, sf_dir):
    """Every new-batch doc gets exactly one best match drawn from the
    OLD corpus only — the bipartite contract (never new x new)."""
    from confluent_example_firehose_spark.operators.dedup_queries import (
        INCR_NEW,
        INCR_OLD,
        q_dedup_incremental,
    )

    rows = q_dedup_incremental(spark, sf_dir).collect()
    assert len(rows) == INCR_NEW - INCR_OLD
    assert {r["new_id"] for r in rows} == set(range(INCR_OLD, INCR_NEW))
    assert all(r["best_old_id"] < INCR_OLD for r in rows)
    assert all((r["jac"] >= 0.5) == (r["is_dup"] == 1) for r in rows)


def test_bucket_pairs_refined_splits_instead_of_dropping(spark):
    """An over-cap block must still yield the pairs that agree on the
    secondary key (plain bucket_pairs drops the whole block)."""
    from confluent_example_firehose_spark.operators.dedup import (
        bucket_pairs,
        bucket_pairs_refined,
    )

    rows = [(i, "blk", i % 2) for i in range(10)]  # one block of 10
    banded = spark.createDataFrame(rows, ["_id", "b", "sec"])
    dropped = bucket_pairs(banded, ["b"], max_bucket=5).count()
    assert dropped == 0  # the cap silently loses everything
    # refinement splits the 10-block into two parity sub-blocks of 5,
    # each under the cap (a sub-block STILL over cap raises — pinned
    # by test_bucket_pairs_refined_raises_on_over_cap_sub_block)
    refined = bucket_pairs_refined(banded, ["b"], "sec", max_bucket=5)
    got = {(r["id_a"], r["id_b"]) for r in refined.collect()}
    # two sub-blocks of 5 (even/odd ids) -> C(5,2) * 2 = 20 pairs,
    # all same-parity
    assert len(got) == 20
    assert all((a - b) % 2 == 0 for a, b in got)


def test_bucket_pairs_refined_noop_under_cap(spark):
    from confluent_example_firehose_spark.operators.dedup import (
        bucket_pairs,
        bucket_pairs_refined,
    )

    rows = [(i, "b%d" % (i // 3), i) for i in range(12)]
    banded = spark.createDataFrame(rows, ["_id", "b", "sec"])
    base = {
        (r["id_a"], r["id_b"])
        for r in bucket_pairs(banded, ["b"], max_bucket=64).collect()
    }
    ref = {
        (r["id_a"], r["id_b"])
        for r in bucket_pairs_refined(
            banded, ["b"], "sec", max_bucket=64
        ).collect()
    }
    assert base == ref


def test_bucket_pairs_refined_raises_on_over_cap_sub_block(spark):
    """ADVICE r7: a refined sub-block that still exceeds max_bucket
    must RAISE, not silently drop — the silent drop both loses recall
    invisibly and diverges from the q_entity_resolution oracle, which
    keeps every same-secondary pair in an over-cap block."""
    import pytest

    from confluent_example_firehose_spark.operators.dedup import (
        bucket_pairs_refined,
    )

    # one block of 12, all with the SAME secondary value: refinement
    # can't split it, so the sub-block (size 12) stays over cap 5
    rows = [(i, "blk", 0) for i in range(12)]
    banded = spark.createDataFrame(rows, ["_id", "b", "sec"])
    refined = bucket_pairs_refined(banded, ["b"], "sec", max_bucket=5)
    with pytest.raises(Exception, match="refinement contract violated"):
        refined.collect()


def test_simhash_strict_guard_raises_on_over_cap(spark):
    """ADVICE r5: the pigeonhole full-recall contract must fail loudly.
    A fingerprint table whose blocks collide beyond max_bucket (with a
    small surviving bucket so candidates exist) must raise_error the
    job under strict=True and pass silently with strict=False."""
    import pytest
    from confluent_example_firehose_spark.operators.dedup import (
        simhash_candidate_pairs,
    )

    # 9 identical fingerprints -> every block bucket has 9 ids (> cap
    # of 8 with the 2-id bucket below it); 2 distinct ones -> one
    # under-cap bucket that still yields a candidate pair
    rows = [(i, 0xDEADBEEF) for i in range(9)] + [
        (100, 0x0F0F), (101, 0x0F0F)
    ]
    fp = spark.createDataFrame(rows, ["_id", "fp"])
    strict = simhash_candidate_pairs(fp, max_bucket=8, strict=True)
    with pytest.raises(Exception, match="recall contract violated"):
        strict.collect()
    loose = simhash_candidate_pairs(fp, max_bucket=8, strict=False)
    got = {(r["id_a"], r["id_b"]) for r in loose.collect()}
    assert got == {(100, 101)}


def test_contraction_completes_under_duplicate_skew(spark):
    """VERDICT r10 item 1 (the completion path): exact-duplicate mass
    far beyond the bucket cap must COMPLETE with full recall under the
    contracted pipeline — the raw pipeline raises on the same input
    (pinned above). 100 copies of one fingerprint with max_bucket=8:
    classes contract to ONE representative, the cap never sees the
    duplicate mass, and the output is all C(100,2) d=0 pairs plus the
    cross-class pair to a nearby fingerprint."""
    from confluent_example_firehose_spark.operators.dedup import (
        fp_classes,
        simhash_pairs_contracted,
    )

    rows = [(i, 0xDEADBEEF) for i in range(100)] + [(100, 0xDEADBEEF ^ 1)]
    fp = spark.createDataFrame(rows, ["_id", "fp"])
    classes = fp_classes(fp)
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_pairs_contracted(
            fp, classes, radius=3, max_bucket=8
        ).collect()
    }
    want = {(a, b, 0) for a in range(100) for b in range(a + 1, 100)}
    want |= {(a, 100, 1) for a in range(100)}
    assert got == want


def test_contraction_strict_guard_still_fires_on_diversity_skew(spark):
    """The cap's real contract — fingerprint DIVERSITY skew (many
    DISTINCT fps sharing a block value) — must still raise after the
    contraction: 9 distinct fps sharing their low 48 bits put 9
    single-member classes in three shared block buckets (> cap 8)."""
    import pytest
    from confluent_example_firehose_spark.operators.dedup import (
        fp_classes,
        simhash_pairs_contracted,
    )

    rows = [(i, 0xABCD0000 | (i << 48)) for i in range(9)]
    fp = spark.createDataFrame(rows, ["_id", "fp"])
    with pytest.raises(Exception, match="recall contract violated"):
        simhash_pairs_contracted(
            fp, fp_classes(fp), radius=3, max_bucket=8
        ).collect()


def test_dedup_near_completes_under_duplicate_skew(spark, tmp_path):
    """The MinHash leg of the r11 contraction (VERDICT r10 item 1):
    exact-duplicate mass far beyond the 64-id band-bucket cap used to
    be silently DROPPED (every band bucket of the duplicated text
    blows the cap); the md5-class contraction emits all within-class
    pairs arithmetically at jac = 1.0 and keeps the cap for genuine
    near-dup diversity. 100 identical docs + 1 near-dup neighbour:
    expect all C(100,2) = 4950 exact pairs AND the 100 cross pairs to
    the neighbour."""
    from confluent_example_firehose_spark.registry import query_fns

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, base) for i in range(100)] + [(100, base + " tail")]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    out = query_fns()["q_dedup_near"](spark, str(tmp_path)).collect()
    exact = {(r["id_a"], r["id_b"]) for r in out if r["jac"] == 1.0}
    cross = {(r["id_a"], r["id_b"]) for r in out if r["jac"] < 1.0}
    assert exact == {(a, b) for a in range(100) for b in range(a + 1, 100)}
    assert cross == {(a, 100) for a in range(100)}
    assert all(r["jac"] >= 0.2 for r in out)


def test_contraction_decision_rule():
    """The adaptive gate's pure rule (dedup.contraction_worthwhile):
    contract on material duplicate mass (>1/8) OR — since r12 (ADVICE
    r11 item 1) — when one duplicate class exceeds the caller's bucket
    cap, the shape the direct path's guards mishandle even at tiny
    total duplicate mass. Anchored to the real corpus shapes: sf0.1
    (8 dups in 5,000 -> direct) and the 100x clone (99% dups ->
    contract)."""
    from confluent_example_firehose_spark.operators.dedup import (
        contraction_worthwhile as cw,
    )

    assert not cw(5000, 4992)  # sf0.1: direct
    assert cw(500000, 5000)  # 100x all-duplicates clone
    assert cw(100, 10)  # 90% duplicate mass
    assert not cw(0, 0)
    assert not cw(1000, 1000)  # duplicate-free
    # r12 over-cap-class rule: 65 identical docs inside a 10,000-doc
    # otherwise-distinct corpus is 0.65% duplicate mass (direct by the
    # fraction rule) but the 65-member class exceeds the 64-id band
    # cap -> contraction is forced; at or under the cap the fraction
    # rule stands.
    assert cw(10000, 9936, max_class=65, cap=64)
    assert not cw(10000, 9936, max_class=64, cap=64)
    assert not cw(10000, 9936, max_class=65, cap=None)  # no cap wired


def test_adaptive_dup_stats_exact_and_memoized(spark, tmp_path):
    """adaptive_dup_stats returns EXACT (n, distinct, max class) and
    memoizes per key: a second call with the same memo_key must not
    touch the DataFrame at all (pinned by passing a poisoned frame)."""
    from confluent_example_firehose_spark.operators.dedup import (
        _DUP_STATS_MEMO,
        adaptive_dup_stats,
    )

    df = spark.createDataFrame(
        [(i, "a") for i in range(5)]
        + [(i, "b") for i in range(5, 8)]
        + [(8, "c")],
        ["_id", "fp"],
    )
    key = (str(tmp_path), "documents", "test_fp")
    assert key not in _DUP_STATS_MEMO
    try:
        assert adaptive_dup_stats(df, "fp", memo_key=key) == (9, 3, 5)
        poisoned = spark.createDataFrame([(1, "z")], ["_id", "WRONG"])
        assert adaptive_dup_stats(poisoned, "fp", memo_key=key) == (
            9, 3, 5,
        )  # memo hit: the poisoned frame is never aggregated
    finally:
        _DUP_STATS_MEMO.pop(key, None)


def test_simhash_adaptive_equals_contracted_on_both_shapes(spark):
    """simhash_pairs_adaptive is plan choice only: on a duplicate-free
    table (direct branch) and a duplicate-heavy one (contracted
    branch) its pair set equals simhash_pairs_contracted's — the glue
    (column names, radius filter, cache list) cannot drift between
    branches."""
    from confluent_example_firehose_spark.operators.dedup import (
        fp_classes,
        simhash_pairs_adaptive,
        simhash_pairs_contracted,
    )

    shapes = [
        # duplicate-free (large enough that the 3x-rsd pad cannot flip
        # the branch): 60 distinct single-bit fps, all pairwise d=2
        ([(i, 1 << i) for i in range(60)], 1),
        # duplicate-heavy: 20 copies of one fp + 2 near fps
        (
            [(i, 0b1111) for i in range(20)]
            + [(100, 0b1110), (101, 0b0111)],
            2,
        ),
    ]
    for rows, n_caches in shapes:
        fp = spark.createDataFrame(rows, ["_id", "fp"])
        got, caches = simhash_pairs_adaptive(fp, radius=3)
        # cache-list length proves which branch ran: direct persists
        # only fp, contracted also persists the class census
        assert len(caches) == n_caches
        got = {(r["id_a"], r["id_b"], r["hamming"]) for r in got.collect()}
        classes = fp_classes(fp).persist()
        want = {
            (r["id_a"], r["id_b"], r["hamming"])
            for r in simhash_pairs_contracted(
                fp, classes, radius=3
            ).collect()
        }
        for c in caches + [classes]:
            c.unpersist()
        assert got == want


def test_compact_for_cache_passes_through_fileless_frames(spark):
    """ADVICE r13 item 3: a frame with NO input files (in-memory /
    cached relation) must pass through compact_for_cache unchanged —
    fan_out conservatively fans those OUT, and compacting them would be
    its inverse (wrongly collapsing a persisted relation's parallelism
    at real scale). Only the small-files case (0 < files < cores)
    compacts."""
    from confluent_example_firehose_spark.operators.dedup import (
        compact_for_cache,
    )

    mem = spark.createDataFrame([(i,) for i in range(10)], ["x"])
    assert len(mem.inputFiles()) == 0
    assert compact_for_cache(mem) is mem
