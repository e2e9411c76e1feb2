"""Semantics pins for the r7 operators on hand-built micro-corpora
(the differential gate at sf0.01 is tools/check_oracle.py; these pin
the rules on inputs where the expected output is computed by hand)."""

from __future__ import annotations

from confluent_example_firehose_spark.registry import all_queries


def test_substring_dedup_counts(spark, tmp_path):
    """W=8 sliding windows. doc1 and doc2 share their full 10-word
    text -> every window position duplicated; doc3 is unique -> zero;
    doc4 repeats its own first 8 words at position 8 -> exactly the
    two positions holding that window are duplicated (self-duplication
    counts, per ExactSubstr)."""
    a = " ".join(f"a{i}" for i in range(10))
    c = " ".join(f"c{i}" for i in range(10))
    x8 = " ".join(f"x{i}" for i in range(8))
    rows = [
        (1, "en", "s1", 0, a),
        (2, "en", "s2", 0, a),
        (3, "en", "s1", 0, c),
        (4, "en", "s2", 0, f"{x8} {x8}"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, n_chars long,"
        " text string"
    )
    sf_dir = str(tmp_path / "sub_sf")
    df.coalesce(1).write.parquet(sf_dir + "/documents.parquet")
    out = {
        r["doc_id"]: r
        for r in all_queries()["q_dedup_substring"].fn(spark, sf_dir).collect()
    }
    assert out[1]["n_windows"] == 3 and out[1]["n_dup"] == 3
    assert out[2]["n_windows"] == 3 and out[2]["n_dup"] == 3
    assert out[3]["n_windows"] == 3 and out[3]["n_dup"] == 0
    # 16 words -> 9 positions; pos 0 and pos 8 hold the same window
    assert out[4]["n_windows"] == 9 and out[4]["n_dup"] == 2


def test_semdedup_exact_twins(spark, tmp_path):
    """Exact-duplicate vectors ALWAYS land in the same cluster (their
    centroid distances are identical, argmin ties break identically),
    so SemDeDup must drop the higher vec_id of each twin pair keyed to
    the lower one; orthogonal singles (cos 0 < tau) survive. Also
    exercises the k_eff < IVF_K degraded-training path (6 vectors)."""
    dim = 8

    def unit(i):
        v = [0.0] * dim
        v[i] = 1.0
        return v

    rows = [
        (0, unit(0)),
        (1, unit(1)),
        (2, unit(2)),
        (3, unit(0)),  # twin of 0
        (4, unit(1)),  # twin of 1
        (5, unit(3)),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    sf_dir = str(tmp_path / "sem_sf")
    df.coalesce(1).write.parquet(sf_dir + "/embeddings.parquet")
    out = {
        r["vec_id"]: r
        for r in all_queries()["q_dedup_semantic"].fn(spark, sf_dir).collect()
    }
    assert set(out) == {3, 4}
    assert out[3]["kept_by"] == 0 and out[3]["cos"] >= 0.999
    assert out[4]["kept_by"] == 1 and out[4]["cos"] >= 0.999


def test_bpe_encode_counts(spark, tmp_path):
    """Corpus words [ab, ab, cd]: round 1 merges the most frequent
    pair ('a b', count 2) making 'ab' one token; round 2 merges
    'c d'; the census then runs dry and the trainer stops early —
    encode must still work with fewer than BPE_ROUNDS merges. Every
    word collapses to a single token."""
    rows = [
        (1, "en", "s1", 0, "ab ab"),
        (2, "en", "s2", 0, "cd"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, n_chars long,"
        " text string"
    )
    sf_dir = str(tmp_path / "bpe_sf")
    df.coalesce(1).write.parquet(sf_dir + "/documents.parquet")
    out = {
        r["doc_id"]: r
        for r in all_queries()["q_bpe_encode"].fn(spark, sf_dir).collect()
    }
    assert out[1]["n_words"] == 2 and out[1]["n_tokens"] == 2
    assert out[2]["n_words"] == 1 and out[2]["n_tokens"] == 1


def test_embed_ingest_finds_corpus_twin(spark, tmp_path):
    """Batch = vec_id % 10 == 0. vec 10 is an exact twin of corpus
    vec 3 -> dropped against it; vec 0 is orthogonal to the whole
    corpus -> survives (absent from the dup report). Corpus of 5 ->
    k=1, a single cluster, so the rule reduces to plain batch x
    corpus cosine."""
    dim = 8

    def unit(i):
        v = [0.0] * dim
        v[i] = 1.0
        return v

    rows = [(i, unit(i % dim)) for i in range(1, 6)]  # corpus 1..5
    rows += [(0, unit(7)), (10, unit(3))]  # batch: orthogonal + twin of 3
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    sf_dir = str(tmp_path / "ingest_sf")
    df.coalesce(1).write.parquet(sf_dir + "/embeddings.parquet")
    out = {
        r["vec_id"]: r
        for r in all_queries()["q_dedup_embed_ingest"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert set(out) == {10}
    assert out[10]["dup_of"] == 3 and out[10]["cos"] >= 0.999


def test_boilerplate_removes_cross_doc_chunks(spark, tmp_path):
    """W=10 chunks, BOILER_MIN=2 distinct docs. Chunk A opens docs 1,
    2 and 3 -> boilerplate, removed everywhere; chunks B, C and the
    3-word ragged tail are unique -> kept; doc 3 is PURE boilerplate
    and must vanish from the output entirely."""
    a = " ".join(f"a{i}" for i in range(10))
    b = " ".join(f"b{i}" for i in range(10))
    c = " ".join(f"c{i}" for i in range(10))
    tail = "t0 t1 t2"
    rows = [
        (1, "en", "s1", 0, f"{a} {b} {tail}"),
        (2, "en", "s2", 0, f"{a} {c}"),
        (3, "en", "s1", 0, a),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, n_chars long,"
        " text string"
    )
    sf_dir = str(tmp_path / "boiler_sf")
    df.coalesce(1).write.parquet(sf_dir + "/documents.parquet")
    out = {
        r["doc_id"]: r
        for r in all_queries()["q_text_boilerplate"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert set(out) == {1, 2}
    assert out[1]["n_chunks"] == 3 and out[1]["n_kept"] == 2
    assert out[1]["clean_text"] == f"{b} {tail}"
    assert out[2]["n_chunks"] == 2 and out[2]["n_kept"] == 1
    assert out[2]["clean_text"] == c


def test_hybrid_rrf_fuses_hand_computed_lists(spark, tmp_path):
    """5 docs, hand-computed BM25 and cosine lists. Lexical: only docs
    1-3 contain query terms; doc1 (all three terms) > doc2 (spark x2)
    > doc3 (merge x1). Dense vs q = e0 (vec_id 3's own embedding):
    doc3 cos 1.0, doc4 cos 1.0 (tie -> doc_id), doc2 cos 0.6, docs
    1/5 cos 0. RRF k=60 fuses to [3, 1, 2, 4, 5]; single-list docs
    carry NULL for the missing rank."""
    docs = [
        (1, "en", "s1", 0, "spark vector merge"),
        (2, "en", "s2", 0, "spark spark"),
        (3, "en", "s1", 0, "merge"),
        (4, "en", "s2", 0, "nothing here"),
        (5, "en", "s1", 0, "filler words only"),
    ]
    dim = 4

    def vec(*xs):
        return [float(x) for x in xs] + [0.0] * (dim - len(xs))

    embs = [
        (1, vec(0, 1)),
        (2, vec(0.6, 0.8)),
        (3, vec(1)),  # the query vector (RRF_QUERY_VEC = 3)
        (4, vec(1)),  # exact twin of the query
        (5, vec(0, 0, 1)),
    ]
    sf_dir = str(tmp_path / "rrf_sf")
    spark.createDataFrame(
        docs, "doc_id long, lang string, source string, n_chars long,"
        " text string"
    ).coalesce(1).write.parquet(sf_dir + "/documents.parquet")
    spark.createDataFrame(
        embs, "vec_id long, embedding array<float>"
    ).coalesce(1).write.parquet(sf_dir + "/embeddings.parquet")

    rows = all_queries()["q_hybrid_rrf"].fn(spark, sf_dir).collect()
    order = [r["doc_id"] for r in rows]
    assert order == [3, 1, 2, 4, 5]
    by_doc = {r["doc_id"]: r for r in rows}
    assert by_doc[1]["lex_rank"] == 1 and by_doc[1]["dense_rank"] == 4
    assert by_doc[2]["lex_rank"] == 2 and by_doc[2]["dense_rank"] == 3
    assert by_doc[3]["lex_rank"] == 3 and by_doc[3]["dense_rank"] == 1
    assert by_doc[4]["lex_rank"] is None and by_doc[4]["dense_rank"] == 2
    assert by_doc[5]["lex_rank"] is None and by_doc[5]["dense_rank"] == 5
    for r in rows:
        want = sum(
            1.0 / (60 + r[k])
            for k in ("lex_rank", "dense_rank")
            if r[k] is not None
        )
        assert abs(r["rrf"] - want) < 1e-12


def test_dsir_weights_hand_computed(spark, tmp_path):
    """Target ('en') = 'a a b' (P=3); pool = doc 10 'a a a', doc 11
    'b b', doc 12 'c' (Q=6). Buckets of a/b/c are distinct mod 512
    (362/254/371). Add-one smoothed log-ratios: w(a)=ln(3*518/(4*515)),
    w(b)=ln(2*518/(3*515)), w(c)=ln(518/(2*515)); doc weights 3*w(a) <
    2*w(b) < w(c), so the ranking is [12, 11, 10] — smoothing rewards
    the token the POOL has seen least, the documented DSIR behavior at
    tiny counts."""
    import math

    rows = [
        (1, "en", "s1", 0, "a a b"),
        (10, "de", "s1", 0, "a a a"),
        (11, "fr", "s2", 0, "b b"),
        (12, "de", "s1", 0, "c"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, n_chars long,"
        " text string"
    )
    sf_dir = str(tmp_path / "dsir_sf")
    df.coalesce(1).write.parquet(sf_dir + "/documents.parquet")
    out = all_queries()["q_dsir_sample"].fn(spark, sf_dir).collect()
    assert [r["doc_id"] for r in out] == [12, 11, 10]
    assert [r["rank"] for r in out] == [1, 2, 3]
    wa = math.log(3 * 518 / (4 * 515))
    wb = math.log(2 * 518 / (3 * 515))
    wc = math.log(518 / (2 * 515))
    want = {10: (3 * wa, 3), 11: (2 * wb, 2), 12: (wc, 1)}
    for r in out:
        w, n = want[r["doc_id"]]
        assert abs(r["weight"] - w) < 2e-6 and r["n_tokens"] == n


def test_derep_keeps_first_occurrence_within_doc(spark, tmp_path):
    """W=2 chunks. doc 1 'x y x y z w x y' -> chunks [x y, x y, z w,
    x y] -> kept [x y, z w]; doc 2 repeats doc 1's chunk but has no
    internal repeats -> untouched (intra-doc rule must ignore other
    docs); doc 3 single ragged word."""
    rows = [
        (1, "en", "s1", 0, "x y x y z w x y"),
        (2, "en", "s2", 0, "x y q r"),
        (3, "en", "s1", 0, "solo"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, n_chars long,"
        " text string"
    )
    sf_dir = str(tmp_path / "derep_sf")
    df.coalesce(1).write.parquet(sf_dir + "/documents.parquet")
    out = {
        r["doc_id"]: r
        for r in all_queries()["q_text_derep"].fn(spark, sf_dir).collect()
    }
    assert out[1]["n_chunks"] == 4 and out[1]["n_kept"] == 2
    assert out[1]["clean_text"] == "x y z w"
    assert out[2]["n_chunks"] == 2 and out[2]["n_kept"] == 2
    assert out[2]["clean_text"] == "x y q r"
    assert out[3]["n_chunks"] == 1 and out[3]["clean_text"] == "solo"


def test_bloom_probe_invariants_on_testdata(spark):
    """On the real sf0.001 corpus: every present probe is claimed by
    at least its own sources (no false negatives, per-source AND
    merged); absent probes have n_present == 0; any single-source hit
    implies the merged filter also hits (its bits are a subset of the
    union)."""
    from confluent_example_firehose_spark.registry import all_queries

    rows = all_queries()["q_bloom_probe"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) > 25
    for r in rows:
        assert r["n_maybe_sources"] >= r["n_present_sources"]
        if r["probe_id"] >= 0:
            assert r["n_present_sources"] >= 1
            assert r["global_maybe"] == 1
        else:
            assert r["n_present_sources"] == 0
        if r["n_maybe_sources"] >= 1:
            assert r["global_maybe"] == 1


def test_bloom_stream_merge_invariants(spark, tmp_path):
    """4-batch incremental build on a hand-built corpus: batch 1
    (doc 5) duplicates batch 0's text (doc 0), so epoch 1 adds ZERO
    new bits; cumulative counts are nondecreasing and the final total
    equals the batch-built filter's distinct-bit count (merge ==
    batch, THE mergeability law)."""
    import hashlib

    from confluent_example_firehose_spark.operators.bloom_queries import (
        BLOOM_K,
        BLOOM_M,
    )
    from confluent_example_firehose_spark.registry import all_queries

    rows = [
        (0, "en", "s1", 0, "alpha beta"),
        (5, "en", "s2", 0, "alpha beta"),  # batch 1 == batch 0's text
        (2, "en", "s1", 0, "gamma delta"),
        (3, "en", "s2", 0, "epsilon zeta"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, n_chars long,"
        " text string"
    )
    sf_dir = str(tmp_path / "bstream_sf")
    df.coalesce(1).write.parquet(sf_dir + "/documents.parquet")
    out = sorted(
        all_queries()["q_bloom_stream"].fn(spark, sf_dir).collect(),
        key=lambda r: r["batch_id"],
    )
    assert [r["batch_id"] for r in out] == [0, 1, 2, 3]
    assert out[1]["n_new_bits"] == 0  # duplicate text adds nothing
    cums = [r["n_cum_bits"] for r in out]
    assert cums == sorted(cums)

    def pos(text):
        h = int(hashlib.md5(text.encode()).hexdigest()[:15], 16)
        h2 = (h >> 30) * 2 + 1
        return {(h + i * h2) % BLOOM_M for i in range(BLOOM_K)}

    batch_built = set().union(*(pos(r[4]) for r in rows))
    assert cums[-1] == len(batch_built)
    assert sum(r["n_new_bits"] for r in out) == cums[-1]
