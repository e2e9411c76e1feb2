"""Property-based tests (hypothesis): the engine's custom operators
against independent in-memory models on arbitrary small inputs."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from confluent_example_firehose_spark.operators.asof import asof_join_agg
from confluent_example_firehose_spark.operators.firehose import last_value_table

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

rows_left = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 50)),  # (key, t)
    min_size=1,
    max_size=12,
)
rows_right = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 50), st.integers(0, 99)),
    min_size=0,
    max_size=12,
)


@settings(**_SETTINGS)
@given(left=rows_left, right=rows_right)
def test_asof_join_matches_model(spark, left, right):
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], ["k", "t", "lid"]
    )
    rdf = spark.createDataFrame(
        [(k, t, float(v), i) for i, (k, t, v) in enumerate(right)],
        "k2 long, t2 long, px double, rid long",
    )
    got = {
        r["lid"]: r["px"]
        for r in asof_join_agg(
            ldf, rdf, "k", "k2", "t", "t2", ["px"], "rid"
        ).collect()
    }
    # model: max (t2, rid) among right rows with same key, t2 <= t
    for i, (k, t) in enumerate(left):
        cands = [
            (t2, rid, float(v))
            for (k2, t2, v), rid in zip(right, range(len(right)))
            if k2 == k and t2 <= t
        ]
        want = max(cands)[2] if cands else None
        assert got[i] == want, (i, k, t, cands)


events = st.lists(
    st.tuples(
        st.integers(0, 2),  # key
        st.integers(0, 30),  # ts
        st.integers(0, 5),  # uid (unique tiebreak added below)
        st.floats(-100, 100, allow_nan=False),
    ),
    min_size=1,
    max_size=15,
)


@settings(**_SETTINGS)
@given(evs=events)
def test_last_value_table_matches_pandas(spark, evs):
    data = [(k, t, i, v) for i, (k, t, _, v) in enumerate(evs)]
    import pyspark.sql.functions as F

    df = spark.createDataFrame(data, ["key", "ts", "eid", "value"])
    out = last_value_table(
        df,
        ["key"],
        "value",
        ["ts", "eid"],
        extra_aggs={"n_events": F.count(F.lit(1))},
    )
    got = {r["key"]: (r["last_value"], r["n_events"]) for r in out.collect()}
    pdf = pd.DataFrame(data, columns=["key", "ts", "eid", "value"])
    for k, grp in pdf.groupby("key"):
        top = grp.sort_values(["ts", "eid"]).iloc[-1]
        assert got[k][0] == top["value"]
        assert got[k][1] == len(grp)


def test_salted_join_equals_plain_join(spark):
    from confluent_example_firehose_spark.operators.relational import (
        salted_join,
    )

    # skewed big side: key 1 dominates
    big = spark.createDataFrame(
        [(1, i) for i in range(200)] + [(2, i) for i in range(5)],
        "k long, payload long",
    )
    small = spark.createDataFrame(
        [(1, "hot"), (2, "cold"), (3, "unmatched")], "k long, label string"
    )
    got = sorted(
        (r["k"], r["payload"], r["label"])
        for r in salted_join(big, small, "k", salt_buckets=4).collect()
    )
    want = sorted(
        (r["k"], r["payload"], r["label"])
        for r in big.join(small, "k").collect()
    )
    assert got == want


def test_session_window_exact_gap_merges(spark):
    """Spark's session_window MERGES an event at exactly start+gap into
    the running session (gap-inclusive), matching the oracle's
    `diff > gap` new-session predicate in q_window_session — pinned
    because the two off-by-one conventions silently diverge."""
    import datetime as dt
    import pyspark.sql.functions as F

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, t0), (1, t0 + dt.timedelta(minutes=30))], "u long, ts timestamp"
    )
    out = df.groupBy(
        "u", F.session_window("ts", "30 minutes").alias("w")
    ).count().collect()
    assert len(out) == 1 and out[0]["count"] == 2


def test_lookup_enrich_identity_fallback(spark):
    """lookup_enrich: dim hit substitutes, dim miss keeps the original
    value (LookupMapper getOrDefault twin)."""
    from confluent_example_firehose_spark.operators.firehose import (
        lookup_enrich,
    )

    fact = spark.createDataFrame(
        [(1, "raw_a"), (2, "raw_b")], ["fk", "label"]
    )
    dim = spark.createDataFrame([(1, "nice_a")], ["dk", "pretty"])
    out = {
        r["fk"]: r["label"]
        for r in lookup_enrich(
            fact, dim, "fk", "dk", {"label": "pretty"}
        ).collect()
    }
    assert out == {1: "nice_a", 2: "raw_b"}


bin_items = st.lists(st.integers(0, 40), min_size=1, max_size=30)


@settings(**_SETTINGS)
@given(toks=bin_items, budget=st.integers(5, 60))
def test_next_fit_bins_invariants(toks, budget):
    from confluent_example_firehose_spark.operators.packing_queries import (
        next_fit_bins,
    )

    bins = next_fit_bins(toks, budget=budget)
    assert len(bins) == len(toks)
    # bin ids are a nondecreasing 0-based run without gaps
    assert bins[0] == 0
    assert all(b2 - b1 in (0, 1) for b1, b2 in zip(bins, bins[1:]))
    # per-bin fill: within budget unless the bin holds a single
    # OVERSIZED item (zero-token docs don't consume budget, so they may
    # share the oversized item's bin); and a closed bin could not have
    # accepted its successor
    fills: dict[int, int] = {}
    nonzero: dict[int, int] = {}
    for t, b in zip(toks, bins):
        fills[b] = fills.get(b, 0) + t
        nonzero[b] = nonzero.get(b, 0) + (1 if t > 0 else 0)
    for b, fill in fills.items():
        assert fill <= budget or nonzero[b] == 1
    for (t, b_prev), b_next in zip(zip(toks[1:], bins), bins[1:]):
        if b_next != b_prev:  # the item that opened a new bin...
            assert fills[b_prev] + t > budget  # ...would have overflowed


@settings(**_SETTINGS)
@given(
    vec=st.lists(
        st.floats(-10, 10, allow_nan=False, allow_infinity=False, width=32),
        min_size=1,
        max_size=16,
    )
)
def test_quantize_codes_model(vec):
    # model of q_embed_quantize's kernel math on arbitrary vectors
    mn, mx = min(vec), max(vec)
    scale = 1.0 if mx == mn else mx - mn
    codes = [round((x - mn) * 255 / scale) for x in vec]
    assert all(0 <= c <= 255 for c in codes)
    if mx == mn:
        assert set(codes) == {0}
    else:
        # extremes map to the rail codes
        assert codes[vec.index(mn)] == 0
        assert codes[vec.index(mx)] == 255


def test_bpe_merge_encoding_greedy_exact(spark):
    """The doubled-separator replace must equal greedy left-to-right
    BPE merging, including the overlap case."""
    import pyspark.sql.functions as F

    cases = [
        ("§§a§§b§§a§§b§§", "§§ab§§ab§§"),   # both pairs merge
        ("§§a§§a§§a§§", None),              # overlap: only first pair
    ]
    r = spark.range(1).select(
        F.replace(
            F.lit(cases[0][0]), F.lit("§a§§b§"), F.lit("§ab§")
        ).alias("m1"),
        F.replace(
            F.lit(cases[1][0]), F.lit("§a§§a§"), F.lit("§aa§")
        ).alias("m2"),
    ).first()
    assert r["m1"] == "§§ab§§ab§§"
    assert r["m2"] == "§§aa§§a§§"
    import duckdb

    d = duckdb.sql(
        "SELECT replace('§§a§§b§§a§§b§§', '§a§§b§', '§ab§'),"
        " replace('§§a§§a§§a§§', '§a§§a§', '§aa§')"
    ).fetchone()
    assert d == (r["m1"], r["m2"])


def test_corpus_stays_inside_case_mapping_parity(spark, sf_dir):
    """Tripwire for an engine boundary the r6 unicode probe measured:
    Spark's lower('İ') keeps the combining dot (i + U+0307) while
    DuckDB's utf8proc folds to a bare 'i', so any text oracle would
    diverge on such characters. The generator emits ASCII today; if a
    regenerated corpus ever leaves ASCII, this fails and points here
    instead of surfacing as an inscrutable oracle hash mismatch.
    (Resolution if it fires legitimately: normalize case-divergent
    codepoints at ingest, or move the affected oracles to byte-level
    keys like portable_hash60 over raw text.)"""
    from pyspark.sql import functions as F

    from confluent_example_firehose_spark.catalog import load_table

    d = load_table(spark, sf_dir, "documents")
    n_non_ascii = d.filter(
        ~F.col("text").rlike(r"^[\x00-\x7F]*$")
    ).count()
    assert n_non_ascii == 0


# --- r6 cross-engine contracts under randomized inputs -----------------

_ascii_text = st.text(
    # printable ASCII plus the whitespace the \s+ tokenizer must fold
    alphabet=st.sampled_from(
        list("abcXYZ019'\"\\,.!?") + [" ", "\t", "\n", "\r", "\x0b", "\x0c"]
    ),
    max_size=60,
)


@settings(**_SETTINGS)
@given(texts=st.lists(_ascii_text, min_size=1, max_size=8))
def test_words_tokenizer_matches_duckdb(spark, texts):
    """The r6 whitespace alignment as a law: the engine's words()
    (split on Java \\s+, drop empties, lowercase) and the oracle-side
    regexp_split_to_array(lower(text), '[ \\t\\n\\r\\f\\v]+')
    (RE2's \\s EXCLUDES vertical tab — found by this very test, so the
    oracles spell Spark's exact class) tokenize EVERY ASCII
    string identically — including tabs, newlines, vertical tabs,
    form feeds, runs of mixed whitespace, and quote characters."""
    import duckdb

    from pyspark.sql import functions as F

    from confluent_example_firehose_spark.operators.dedup import words

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "t"])
    got = {
        r["i"]: r["w"]
        for r in df.select("i", words("t").alias("w")).collect()
    }
    con = duckdb.connect()
    for i, t in enumerate(texts):
        want = con.execute(
            r"SELECT list_filter(regexp_split_to_array(lower(?),"
            r" '[ \t\n\r\f\v]+'), x -> x <> '')",
            [t],
        ).fetchone()[0]
        assert got[i] == want, (t, got[i], want)
    con.close()


@settings(**_SETTINGS)
@given(texts=st.lists(st.text(
    alphabet=st.sampled_from(list("abz0'\"% _\\")), max_size=30,
), min_size=1, max_size=8))
def test_portable_hash60_matches_duckdb(spark, texts):
    """portable_hash60 (the content-addressable dedup key) is the SAME
    integer in both engines for arbitrary ASCII content — including
    quotes, percent signs, and backslashes that would break a
    string-interpolated implementation."""
    import duckdb

    from pyspark.sql import functions as F

    from confluent_example_firehose_spark.operators.dedup import (
        portable_hash60,
    )

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "t"])
    got = {
        r["i"]: r["h"]
        for r in df.select(
            "i", portable_hash60(F.col("t")).alias("h")
        ).collect()
    }
    con = duckdb.connect()
    for i, t in enumerate(texts):
        want = con.execute(
            "SELECT CAST('0x' || substr(md5(?), 1, 15) AS BIGINT)",
            [t],
        ).fetchone()[0]
        assert got[i] == want, (t, got[i], want)
    con.close()


# --- r6 kernel algebra under randomized inputs -------------------------

_LONG_MAX = (1 << 63) - 1
_U64 = (1 << 64) - 1

_hash_arr = st.lists(
    st.integers(-(1 << 63), (1 << 63) - 1), min_size=0, max_size=10
)


@settings(**_SETTINGS)
@given(a=_hash_arr, b=_hash_arr)
def test_minhash_union_min_law(spark, a, b):
    """The law LSH correctness rests on, engine-level (no xxhash64
    model needed): sig(A ∪ B) == elementwise min(sig(A), sig(B)), and
    sig is invariant to element order and duplication. Exercises the
    one-fold aggregate/zip_with/least implementation, including the
    empty-set LONG_MAX sentinel."""
    from pyspark.sql import functions as F

    from confluent_example_firehose_spark.operators.dedup import (
        minhash_signature,
    )

    shuffled = list(reversed(a)) + a  # reorder + duplicate every element
    df = spark.createDataFrame(
        [(a, b, a + b, shuffled)],
        "a array<long>, b array<long>, u array<long>, s array<long>",
    )
    row = df.select(
        minhash_signature(F.col("a"), 8).alias("sa"),
        minhash_signature(F.col("b"), 8).alias("sb"),
        minhash_signature(F.col("u"), 8).alias("su"),
        minhash_signature(F.col("s"), 8).alias("ss"),
    ).first()
    assert row["su"] == [min(x, y) for x, y in zip(row["sa"], row["sb"])]
    assert row["ss"] == row["sa"]
    if not a:
        assert row["sa"] == [_LONG_MAX] * 8


def _model_portable_simhash(text: str):
    """Pure-Python model of the ENTIRE portable fingerprint path:
    lowercase -> split on \\s+ -> drop empties -> 3-word shingles
    joined with ' ' -> distinct md5-hash60 -> 64-way majority bit vote
    (ties -> 0). Returns None when the doc has < 3 words (the
    keep_empty=False filter)."""
    import hashlib
    import re

    ws = [w for w in re.split(r"[ \t\n\r\f\v]+", text.lower()) if w != ""]
    if len(ws) < 3:
        return None
    sh = {
        int(
            hashlib.md5(" ".join(ws[i : i + 3]).encode()).hexdigest()[:15],
            16,
        )
        for i in range(len(ws) - 2)
    }
    fp = 0
    for bit in range(64):
        votes = 2 * sum(1 for h in sh if (h >> bit) & 1) - len(sh)
        if votes > 0:
            fp |= 1 << bit
    return fp - (1 << 64) if fp >= (1 << 63) else fp


@settings(**_SETTINGS)
@given(texts=st.lists(_ascii_text, min_size=1, max_size=6))
def test_simhash_portable_fingerprint_matches_model(spark, texts):
    """End-to-end model test of simhash_fingerprints(portable=True) on
    arbitrary ASCII text: tokenizer, shingling, md5-hash60, distinct,
    and the numpy bit-vote UDF all agree with an independent
    pure-Python reimplementation — the contract that lets the DuckDB
    oracle (and any future engine) recompute fingerprints exactly."""
    from confluent_example_firehose_spark.operators.dedup import (
        simhash_fingerprints,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = {
        r["_id"]: r["fp"]
        for r in simhash_fingerprints(
            df, "doc_id", "text", portable=True
        ).collect()
    }
    want = {
        i: _model_portable_simhash(t)
        for i, t in enumerate(texts)
        if _model_portable_simhash(t) is not None
    }
    assert got == want


@settings(**_SETTINGS)
@given(
    pairs=st.lists(
        st.tuples(
            st.integers(-(1 << 63), (1 << 63) - 1),
            st.integers(-(1 << 63), (1 << 63) - 1),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_hamming64_matches_popcount_model(spark, pairs):
    """hamming64 == popcount of the 64-bit XOR for arbitrary signed
    longs, including negatives (two's complement) and the extremes."""
    from confluent_example_firehose_spark.operators.dedup import hamming64

    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(pairs)],
        "i long, a long, b long",
    )
    got = {
        r["i"]: r["d"]
        for r in df.select(
            "i", hamming64(F.col("a"), F.col("b")).alias("d")
        ).collect()
    }
    for i, (a, b) in enumerate(pairs):
        assert got[i] == bin((a ^ b) & _U64).count("1"), (a, b)


@st.composite
def _fp_corpus(draw):
    """Fingerprint corpora guaranteed to contain near pairs: a few
    random 64-bit bases, each with perturbed copies at <= 3 flipped
    bits."""
    bases = draw(
        st.lists(st.integers(0, _U64), min_size=1, max_size=4, unique=True)
    )
    fps = list(bases)
    for base in bases:
        flips = draw(
            st.lists(st.integers(0, 63), min_size=0, max_size=3)
        )
        p = base
        for bit in flips:
            p ^= 1 << bit
        fps.append(p)
    # to signed
    return [f - (1 << 64) if f >= (1 << 63) else f for f in set(fps)]


@settings(**_SETTINGS)
@given(fps=_fp_corpus())
def test_pigeonhole_recall_and_soundness_property(spark, fps):
    """The d < n_blocks pigeonhole contract on ARBITRARY fingerprints:
    every pair at Hamming <= 3 is produced by 4-block candidate
    generation (recall), and every produced pair shares at least one
    exact 16-bit block (soundness — the blocking never invents a
    bucket)."""
    from confluent_example_firehose_spark.operators.dedup import (
        simhash_candidate_pairs,
    )

    df = spark.createDataFrame(
        [(i, f) for i, f in enumerate(fps)], "_id long, fp long"
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in simhash_candidate_pairs(df, max_bucket=10_000).collect()
    }
    for i in range(len(fps)):
        for j in range(i + 1, len(fps)):
            d = bin((fps[i] ^ fps[j]) & _U64).count("1")
            if d <= 3:
                assert (i, j) in got, (fps[i], fps[j], d)
    for i, j in got:
        blocks_i = [((fps[i] & _U64) >> (16 * b)) & 0xFFFF for b in range(4)]
        blocks_j = [((fps[j] & _U64) >> (16 * b)) & 0xFFFF for b in range(4)]
        assert any(x == y for x, y in zip(blocks_i, blocks_j)), (i, j)


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 14),  # id
            st.integers(0, 2),  # block
            st.integers(0, 1),  # secondary
        ),
        min_size=1,
        max_size=20,
        unique_by=lambda r: (r[0], r[1]),  # one row per (id, block)
    ),
    cap=st.integers(2, 4),
)
@example(rows=[(i, 0, 0) for i in range(6)], cap=2)  # forces the raise
@example(rows=[(i, 0, i % 2) for i in range(6)], cap=3)  # clean split
def test_bucket_pairs_refined_matches_model(spark, rows, cap):
    """bucket_pairs_refined's documented semantics as a law: blocks
    within the cap pair fully; over-cap blocks re-pair within
    (block, secondary) sub-blocks; a sub-block STILL over the cap
    RAISES (ADVICE r7 — the pre-r8 silent drop lost recall invisibly
    and diverged from the q_entity_resolution oracle); result is the
    distinct union."""
    from collections import defaultdict

    from confluent_example_firehose_spark.operators.dedup import (
        bucket_pairs_refined,
    )

    df = spark.createDataFrame(rows, "_id long, blk long, sec long")
    by_block = defaultdict(list)
    for i, blk, sec in rows:
        by_block[blk].append((i, sec))
    want = set()
    must_raise = False
    for members in by_block.values():
        groups = (
            [[i for i, _ in members]]
            if len(members) <= cap
            else [
                [i for i, s in members if s == sec_v]
                for sec_v in {s for _, s in members}
            ]
        )
        for g in groups:
            if len(g) > cap:
                must_raise = True
                continue
            g = sorted(g)
            want.update(
                (g[x], g[y])
                for x in range(len(g))
                for y in range(x + 1, len(g))
            )
    result = bucket_pairs_refined(df, ["blk"], "sec", max_bucket=cap)
    if must_raise:
        with pytest.raises(Exception, match="refinement contract"):
            result.collect()
        return
    got = {(r["id_a"], r["id_b"]) for r in result.collect()}
    assert got == want


@settings(**_SETTINGS)
@given(
    a=st.lists(st.integers(0, 9), max_size=8),
    b=st.lists(st.integers(0, 9), max_size=8),
)
def test_jaccard_matches_set_model(spark, a, b):
    """jaccard() equals the set-model |A∩B|/|A∪B| on arbitrary
    distinct-element arrays, with empty-vs-empty pinned to 0.0."""
    from confluent_example_firehose_spark.operators.dedup import jaccard

    sa, sb = sorted(set(a)), sorted(set(b))
    df = spark.createDataFrame([(sa, sb)], "a array<long>, b array<long>")
    got = df.select(jaccard(F.col("a"), F.col("b")).alias("j")).first()["j"]
    union = len(set(sa) | set(sb))
    want = 0.0 if union == 0 else len(set(sa) & set(sb)) / union
    assert got == want


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    n=st.integers(1, 9),
    raw_edges=st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)), max_size=14
    ),
)
def test_connected_components_matches_union_find(spark, n, raw_edges):
    """connected_components (min-label propagation with the r6
    edge persist/partition) equals a pure-Python union-find with
    min-id canonical labels on arbitrary small undirected graphs —
    including self-loops, duplicate edges, isolated nodes, and path
    graphs near the iteration bound."""
    from confluent_example_firehose_spark.operators.curation_queries import (
        connected_components,
    )

    edges = [(a % n, b % n) for a, b in raw_edges]
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {i: find(i) for i in range(n)}

    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    und = [(a, b) for a, b in edges] + [(b, a) for a, b in edges]
    if und:
        edf = spark.createDataFrame(und, "src long, dst long")
    else:
        edf = spark.createDataFrame([], "src long, dst long")
    got = {
        r["id"]: r["comp"]
        for r in connected_components(nodes, edf).collect()
    }
    assert got == want, (edges, got, want)


_graph_edges = st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 7)),
    min_size=0,
    max_size=14,
)


def _edges_df(spark, rows, schema):
    if rows:
        return spark.createDataFrame(rows, schema)
    return spark.createDataFrame([], schema)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    raw_edges=_graph_edges,
    seed_mod=st.integers(1, 4),
    hops=st.integers(1, 3),
)
def test_bfs_distances_matches_model(spark, raw_edges, seed_mod, hops):
    """bfs_distances (frontier-only messaging + per-round checkpoint,
    the late-r6 reshape) equals a pure-Python multi-source BFS bounded
    at `hops` on arbitrary small directed graphs — including empty
    graphs, empty seed sets, self-loops, and duplicate edges. Seeds
    are the kernel's contract: distinct SRC nodes satisfying the
    predicate (a dst-only node can receive a distance but never
    seeds)."""
    from confluent_example_firehose_spark.operators.graph_queries import (
        bfs_distances,
    )

    seeds = {a for a, _ in raw_edges if a % seed_mod == 0}
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for hop in range(hops):
        nxt = set()
        for a, b in raw_edges:
            if a in frontier and b not in dist:
                dist[b] = hop + 1
                nxt.add(b)
        frontier = nxt
    want = dist

    edf = _edges_df(spark, raw_edges, "src long, dst long")
    got = {
        r["node"]: r["dist"]
        for r in bfs_distances(
            edf, F.col("src") % seed_mod == 0, hops
        ).collect()
    }
    assert got == want, (raw_edges, seed_mod, hops, got, want)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    raw_edges=st.lists(
        st.tuples(
            st.integers(0, 6), st.integers(0, 6), st.integers(1, 9)
        ),
        min_size=0,
        max_size=12,
    ),
    seed_mod=st.integers(1, 4),
    rounds=st.integers(1, 3),
)
def test_sssp_distances_matches_model(spark, raw_edges, seed_mod, rounds):
    """sssp_distances (changed-cost frontier messaging, the late-r6
    reshape) equals the textbook bounded Bellman-Ford recurrence —
    min cost over paths of <= `rounds` edges from any seed — on
    arbitrary small weighted digraphs. This is exactly the
    'frontier-only equals full messaging' equivalence the reshape's
    comment claims, checked mechanically (duplicate edges with
    different weights, self-loops, cost-lowering re-relaxations)."""
    from confluent_example_firehose_spark.operators.graph_queries import (
        sssp_distances,
    )

    seeds = {a for a, _, _ in raw_edges if a % seed_mod == 0}
    dist = {s: 0 for s in seeds}
    for _ in range(rounds):
        prev = dict(dist)
        for a, b, w in raw_edges:
            if a in prev:
                c = prev[a] + w
                if b not in dist or c < dist[b]:
                    dist[b] = c
    want = dist

    edf = _edges_df(spark, raw_edges, "src long, dst long, w long")
    got = {
        r["node"]: r["cost"]
        for r in sssp_distances(
            edf, F.col("src") % seed_mod == 0, rounds
        ).collect()
    }
    assert got == want, (raw_edges, seed_mod, rounds, got, want)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    raw_edges=_graph_edges,
    k=st.integers(1, 3),
    rounds=st.integers(1, 3),
)
def test_kcore_survivors_matches_model(spark, raw_edges, k, rounds):
    """kcore_survivors (small-side checkpoint + broadcast restriction
    chain, the late-r6 reshape) equals a pure-Python peel: per round,
    keep = nodes with src-degree >= k, then restrict edges to
    keep x keep; output = surviving per-src edge counts. Duplicate
    edges count twice (the kernel's count(*) contract), dst-only
    nodes have degree 0 and peel out immediately."""
    from confluent_example_firehose_spark.operators.graph_queries import (
        kcore_survivors,
    )

    cur = list(raw_edges)
    for _ in range(rounds):
        deg = {}
        for a, _b in cur:
            deg[a] = deg.get(a, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        cur = [(a, b) for a, b in cur if a in keep and b in keep]
    want = {}
    for a, _b in cur:
        want[a] = want.get(a, 0) + 1

    edf = _edges_df(spark, raw_edges, "src long, dst long")
    got = {
        r["node"]: r["core_deg"]
        for r in kcore_survivors(edf, k, rounds).collect()
    }
    assert got == want, (raw_edges, k, rounds, got, want)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(raw_edges=_graph_edges, iters=st.integers(1, 3))
def test_pagerank_ranks_matches_integer_model(spark, raw_edges, iters):
    """pagerank_ranks (fixed-point integer damped rank, edges
    pre-partitioned once — the late-r6 plan reshape) equals a
    pure-Python integer model on arbitrary small digraphs: per round,
    contrib(b) = sum over edges (a,b) of (rank(a)*85) // (100*deg(a)),
    new rank = base + contrib, node universe = distinct src only (a
    dst-only node receives no rank row), duplicate edges contribute
    twice. Integer // is exact on non-negatives in both engines, so
    the model is bit-exact, not approximate."""
    from confluent_example_firehose_spark.operators.graph_queries import (
        PR_SCALE,
        pagerank_ranks,
    )

    nodes = {a for a, _ in raw_edges}
    deg = {}
    for a, _b in raw_edges:
        deg[a] = deg.get(a, 0) + 1
    base = 15 * PR_SCALE // 100
    rank = {n: PR_SCALE for n in nodes}
    for _ in range(iters):
        contrib = {}
        for a, b in raw_edges:
            c = (rank[a] * 85) // (100 * deg[a])
            contrib[b] = contrib.get(b, 0) + c
        rank = {n: base + contrib.get(n, 0) for n in nodes}
    want = rank

    edf = _edges_df(spark, raw_edges, "src long, dst long")
    got = {
        r["node"]: r["rank"]
        for r in pagerank_ranks(edf, iters, 1000).collect()
    }
    assert got == want, (raw_edges, iters, got, want)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    raw_edges=_graph_edges,
    seed_mod=st.integers(1, 4),
    iters=st.integers(1, 3),
)
def test_trustrank_ranks_matches_integer_model(
    spark, raw_edges, seed_mod, iters
):
    """trustrank_ranks (seed-personalized teleport + zero-rank
    frontier filter) equals the same integer model with trust starting
    and re-seeding ONLY at seed nodes; non-seeded unreached nodes stay
    exactly 0 and are filtered from the output. The zero-rank filter
    is the claim under test: skipping rank-0 senders must not change
    any receiver's sum (0-rank contributions are 0 only because
    integer // truncates toward zero — pinned here)."""
    from confluent_example_firehose_spark.operators.graph_queries import (
        PR_SCALE,
        trustrank_ranks,
    )

    nodes = {a for a, _ in raw_edges}
    seeds = {n for n in nodes if n % seed_mod == 0}
    deg = {}
    for a, _b in raw_edges:
        deg[a] = deg.get(a, 0) + 1
    base = 15 * PR_SCALE // 100
    rank = {n: (PR_SCALE if n in seeds else 0) for n in nodes}
    for _ in range(iters):
        contrib = {}
        for a, b in raw_edges:
            c = (rank[a] * 85) // (100 * deg[a])
            contrib[b] = contrib.get(b, 0) + c
        rank = {
            n: (base if n in seeds else 0) + contrib.get(n, 0)
            for n in nodes
        }
    want = {n: r for n, r in rank.items() if r > 0}

    edf = _edges_df(spark, raw_edges, "src long, dst long")
    got = {
        r["node"]: r["rank"]
        for r in trustrank_ranks(
            edf, F.col("node") % seed_mod == 0, iters, 1000
        ).collect()
    }
    assert got == want, (raw_edges, seed_mod, iters, got, want)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    corpus=st.lists(
        st.text(alphabet="ab", min_size=1, max_size=5),
        min_size=1,
        max_size=10,
    ),
    rounds=st.integers(1, 3),
)
def test_bpe_merge_rounds_matches_recensus_model(spark, corpus, rounds):
    """bpe_merge_rounds (the r6 pair-DELTA census + parent/child cache
    window) equals a pure-Python BPE trainer that RE-COUNTS the whole
    corpus every round — the exact 'delta census is bit-identical to
    full re-census' claim of the reshape, on arbitrary small corpora
    (overlapping pairs like 'aaa', duplicate words, 1-char words).
    Greedy merge model: left-to-right non-overlapping; argmax ties
    break on ascending pair text; a census that runs dry before the
    round budget stops trainer and model with the same result prefix."""
    from confluent_example_firehose_spark.operators.scoring_queries import (
        bpe_merge_rounds,
    )

    stream = [list(w) for w in corpus]
    want = []
    for k in range(1, rounds + 1):
        census = {}
        for toks in stream:
            for i in range(len(toks) - 1):
                p = toks[i] + " " + toks[i + 1]
                census[p] = census.get(p, 0) + 1
        if not census:
            break
        top = min(census.items(), key=lambda kv: (-kv[1], kv[0]))
        want.append((k, top[0], top[1]))
        a, b = top[0].split(" ")
        merged = []
        for toks in stream:
            out, i = [], 0
            while i < len(toks):
                if (
                    i + 1 < len(toks)
                    and toks[i] == a
                    and toks[i + 1] == b
                ):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            merged.append(out)
        stream = merged

    enc = [
        ("§§" + "".join(c + "§§" for c in w),) for w in corpus
    ]
    st_df = spark.createDataFrame(enc, "w string")
    got = [
        (r["round"], r["pair"], r["cnt"])
        for r in bpe_merge_rounds(st_df, rounds)
        .orderBy("round")
        .collect()
    ]
    assert got == want, (corpus, rounds, got, want)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "ab", "ba"]),
            min_size=0,
            max_size=9,
        ),
        min_size=1,
        max_size=6,
    ),
    line_w=st.integers(1, 3),
)
def test_line_dedup_matches_model(spark, docs, line_w):
    """line_dedup (corpus-wide first-occurrence chunk dedup on the r6
    hashed window key + single-join reassembly) equals a pure-Python
    model that walks docs by (doc_id, pos) with a seen-set keyed by
    chunk TEXT — so the law also asserts that hashing the window key
    did not change which chunk survives. Tiny word alphabet forces
    heavy cross-document chunk collisions; empty docs are dropped,
    fully-duplicated docs vanish, ragged tail chunks are shorter than
    line_w."""
    from confluent_example_firehose_spark.operators.dedup_queries import (
        line_dedup,
    )

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    seen = set()
    want = {}
    for doc_id, text in rows:
        ws = [w for w in text.lower().split() if w]
        if not ws:
            continue
        chunks = [
            " ".join(ws[p * line_w : (p + 1) * line_w])
            for p in range((len(ws) + line_w - 1) // line_w)
        ]
        kept = []
        for p, ch in enumerate(chunks):
            if ch not in seen:
                seen.add(ch)
                kept.append(p)
        if kept:
            want[doc_id] = (
                len(chunks),
                len(kept),
                " ".join(chunks[p] for p in kept),
            )

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_chunks"], r["n_kept"], r["clean_text"])
        for r in line_dedup(df, line_w).collect()
    }
    assert got == want, (docs, line_w, got, want)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["x", "y", "zz", "x y"]),
            min_size=0,
            max_size=12,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_repetition_profile_matches_counter_model(spark, docs):
    """repetition_profile (the r6 zero-shuffle row-local Arrow kernel)
    equals a pure-Python Counter model — the exact claim of the
    reshape: the numpy per-batch kernel computes the same counts the
    explode->groupBy form did. Covers all-same-word docs (max
    repetition), sub-2-word docs (filtered), and the bigram join
    encoding ('x y' as a WORD cannot collide with the bigram of 'x'
    then 'y' because words cannot contain whitespace — the law feeds
    'x y' as two words via the split). Ratio denominators stay <= 24,
    where round-half ties at the 6th digit are impossible, so Python
    round() is exact."""
    from collections import Counter

    from confluent_example_firehose_spark.operators.quality_queries import (
        TOP_BIGRAM_MAX,
        TOP_UNIGRAM_MAX,
        repetition_profile,
    )

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    want = {}
    for doc_id, text in rows:
        w = [t for t in text.lower().split() if t]
        if len(w) < 2:
            continue
        uni = Counter(w)
        bi = Counter(a + " " + b for a, b in zip(w, w[1:]))
        n, nd = len(w), len(uni)
        tu = round(max(uni.values()) / n, 6)
        tb = round(max(bi.values()) / (n - 1), 6)
        want[doc_id] = (
            n, nd, round(nd / n, 6), tu, tb,
            int(tu > TOP_UNIGRAM_MAX or tb > TOP_BIGRAM_MAX),
        )

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_words"], r["n_distinct"], r["distinct_ratio"],
            r["top_unigram_frac"], r["top_bigram_frac"],
            r["flag_repetitive"],
        )
        for r in repetition_profile(df).collect()
    }
    assert got == want, (docs, got, want)


_sub_docs = st.lists(
    st.lists(
        st.sampled_from(["aa", "bb", "cc"]), min_size=0, max_size=14
    ),
    min_size=1,
    max_size=8,
)


@settings(**_SETTINGS)
@given(docs=_sub_docs)
def test_substring_dedup_matches_model(spark, docs, tmp_path_factory):
    """q_dedup_substring (law 16): the corpus-wide duplicated-window
    census against a pure-Python Counter model on arbitrary small
    word lists from a 3-token alphabet (dense duplicate collisions,
    self-overlaps, and documents shorter than the window). A window
    position is duplicated iff its SUB_W-word content occurs >= 2
    times anywhere in the corpus, including inside the same doc."""
    from collections import Counter

    from confluent_example_firehose_spark.operators.dedup_queries import (
        SUB_W,
        q_dedup_substring,
    )

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    census: Counter = Counter()
    per_doc: dict[int, list[str]] = {}
    for doc_id, text in rows:
        w = [t for t in text.lower().split() if t]
        wins = [
            " ".join(w[i:i + SUB_W]) for i in range(len(w) - SUB_W + 1)
        ]
        if wins:
            per_doc[doc_id] = wins
            census.update(wins)
    want = {
        doc_id: (
            len(wins), sum(1 for x in wins if census[x] >= 2)
        )
        for doc_id, wins in per_doc.items()
    }

    sf_dir = str(tmp_path_factory.mktemp("sub_law"))
    spark.createDataFrame(
        [(i, "en", "s", 0, t) for i, t in rows],
        "doc_id long, lang string, source string, n_chars long,"
        " text string",
    ).coalesce(1).write.mode("overwrite").parquet(
        sf_dir + "/documents.parquet"
    )
    got = {
        r["doc_id"]: (r["n_windows"], r["n_dup"])
        for r in q_dedup_substring(spark, sf_dir).collect()
    }
    assert got == want, (docs, got, want)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "ab", "ba"]),
            min_size=0,
            max_size=9,
        ),
        min_size=1,
        max_size=6,
    ),
    line_w=st.integers(1, 3),
    min_docs=st.integers(1, 3),
)
def test_boilerplate_filter_matches_model(spark, docs, line_w, min_docs):
    """boilerplate_filter (remove EVERY occurrence of any chunk seen in
    >= min_docs DISTINCT documents) equals a pure-Python census model
    keyed by chunk TEXT — asserting both the distinct-doc census rule
    (a chunk repeated twice inside ONE doc has nd=1 and survives) and
    that hashing the census key did not change which chunks are
    removed. min_docs=1 removes everything (empty output); tiny word
    alphabet forces heavy cross-document collisions; ragged tail
    chunks are shorter than line_w."""
    from collections import defaultdict

    from confluent_example_firehose_spark.operators.boilerplate_queries import (
        boilerplate_filter,
    )

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    chunks_by_doc = {}
    census = defaultdict(set)
    for doc_id, text in rows:
        ws = [w for w in text.lower().split() if w]
        if not ws:
            continue
        chunks = [
            " ".join(ws[p * line_w : (p + 1) * line_w])
            for p in range((len(ws) + line_w - 1) // line_w)
        ]
        chunks_by_doc[doc_id] = chunks
        for ch in chunks:
            census[ch].add(doc_id)
    want = {}
    for doc_id, chunks in chunks_by_doc.items():
        kept = [
            p for p, ch in enumerate(chunks)
            if len(census[ch]) < min_docs
        ]
        if kept:
            want[doc_id] = (
                len(chunks),
                len(kept),
                " ".join(chunks[p] for p in kept),
            )

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_chunks"], r["n_kept"], r["clean_text"])
        for r in boilerplate_filter(df, line_w, min_docs).collect()
    }
    assert got == want, (docs, line_w, min_docs, got, want)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["en", "de", "fr"]),
            st.lists(
                st.sampled_from(["a", "b", "ab", "ba"]),
                min_size=0,
                max_size=9,
            ),
        ),
        min_size=1,
        max_size=8,
    ),
)
def test_dsir_select_matches_model(spark, docs):
    """dsir_select equals a pure-Python add-one-smoothed hashed-unigram
    log-likelihood-ratio model (same md5 buckets, math.log) on every
    pool doc's (weight, n_tokens) — with top >= n_docs so the law pins
    the FORMULA while the top-k cutoff stays covered by the DuckDB
    hash gate at three SFs. Empty pools, empty targets (every pool
    bucket smoothed on the p side) and empty docs are all generated."""
    import hashlib
    import math
    from collections import Counter, defaultdict

    from confluent_example_firehose_spark.operators.dsir_queries import (
        dsir_select,
    )

    B = 64
    rows = [
        (i, lang, " ".join(ws)) for i, (lang, ws) in enumerate(docs)
    ]

    def bucket(term):
        return int(hashlib.md5(term.encode()).hexdigest()[:15], 16) % B

    p_census = Counter()
    q_census = Counter()
    doc_tf = defaultdict(Counter)
    for doc_id, lang, text in rows:
        ws = [w for w in text.lower().split() if w]
        for t in ws:
            b = bucket(t)
            if lang == "en":
                p_census[b] += 1
            else:
                q_census[b] += 1
                doc_tf[doc_id][b] += 1
    P, Q = sum(p_census.values()), sum(q_census.values())
    want = {}
    for doc_id, tfs in doc_tf.items():
        w = sum(
            tf
            * math.log(
                ((p_census.get(b, 0) + 1) * (Q + B))
                / ((q_census[b] + 1) * (P + B))
            )
            for b, tf in tfs.items()
        )
        want[doc_id] = (w, sum(tfs.values()))

    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {
        r["doc_id"]: (r["weight"], r["n_tokens"])
        for r in dsir_select(df, "en", B, 1000).collect()
    }
    assert set(got) == set(want), (docs, got, want)
    for doc_id, (w, n) in want.items():
        gw, gn = got[doc_id]
        assert gn == n and abs(gw - w) < 2e-6, (docs, doc_id, got, want)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "ab", "ba"]),
            min_size=0,
            max_size=9,
        ),
        min_size=1,
        max_size=6,
    ),
    line_w=st.integers(1, 3),
)
def test_derep_text_matches_model(spark, docs, line_w):
    """derep_text (keep the first occurrence of every chunk WITHIN a
    doc) equals a per-doc seen-set walk — the intra-doc twin of the
    line-dedup law, which also pins that array_distinct preserves
    first-occurrence order. Other docs' content must never affect a
    doc's output (the law's seen-set resets per doc)."""
    from confluent_example_firehose_spark.operators.derep_queries import (
        derep_text,
    )

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    want = {}
    for doc_id, text in rows:
        ws = [w for w in text.lower().split() if w]
        if not ws:
            continue
        chunks = [
            " ".join(ws[p * line_w : (p + 1) * line_w])
            for p in range((len(ws) + line_w - 1) // line_w)
        ]
        seen = set()
        kept = []
        for ch in chunks:
            if ch not in seen:
                seen.add(ch)
                kept.append(ch)
        want[doc_id] = (len(chunks), len(kept), " ".join(kept))

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_chunks"], r["n_kept"], r["clean_text"])
        for r in derep_text(df, line_w).collect()
    }
    assert got == want, (docs, line_w, got, want)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["s0", "s1"]),
            st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
        ),
        min_size=1,
        max_size=8,
    ),
)
def test_bloom_probe_matches_model(spark, docs, tmp_path_factory):
    """q_bloom_probe equals a pure-Python Bloom model (same md5
    fingerprints, same double-hashing positions, per-source position
    sets, merged union set) on arbitrary tiny corpora — including
    duplicate texts across sources (n_present counts DISTINCT
    sources) and the no-false-negative law n_maybe >= n_present."""
    import hashlib

    from confluent_example_firehose_spark.operators.bloom_queries import (
        BLOOM_K,
        BLOOM_M,
        BLOOM_PROBE_N,
    )
    from confluent_example_firehose_spark.registry import all_queries

    def fp(text):
        return int(hashlib.md5(text.encode()).hexdigest()[:15], 16)

    def pos(h):
        h2 = (h >> 30) * 2 + 1
        return {(h + i * h2) % BLOOM_M for i in range(BLOOM_K)}

    rows = [
        (i, "en", src, 0, text) for i, (src, text) in enumerate(docs)
    ]
    bit_src = {}
    for _i, _l, src, _n, text in rows:
        bit_src.setdefault(src, set()).update(pos(fp(text)))
    bit_all = set().union(*bit_src.values())
    probes = [(r[0], fp(r[4])) for r in rows if r[0] % 20 == 0]
    probes += [
        (-(i + 1), fp(f"bloom-absent-{i}")) for i in range(BLOOM_PROBE_N)
    ]
    want = {}
    for pid, key in probes:
        ps = pos(key)
        n_maybe = sum(1 for s in bit_src.values() if ps <= s)
        glob = 1 if ps <= bit_all else 0
        n_present = len(
            {r[2] for r in rows if fp(r[4]) == key}
        )
        want[pid] = (n_maybe, glob, n_present)

    sf_dir = str(tmp_path_factory.mktemp("bloom_law"))
    spark.createDataFrame(
        rows, "doc_id long, lang string, source string, n_chars long,"
        " text string"
    ).coalesce(1).write.mode("overwrite").parquet(
        sf_dir + "/documents.parquet"
    )
    got = {
        r["probe_id"]: (
            r["n_maybe_sources"], r["global_maybe"], r["n_present_sources"]
        )
        for r in all_queries()["q_bloom_probe"].fn(spark, sf_dir).collect()
    }
    assert got == want, (docs, got, want)
    for nm, _g, np_ in got.values():
        assert nm >= np_  # a Bloom filter never false-negatives


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(raw_edges=_graph_edges, rounds=st.integers(1, 3))
def test_lpa_communities_matches_model(spark, raw_edges, rounds):
    """lpa_communities equals a pure-Python synchronous LPA model
    (per-node neighbor-label vote, most-frequent-wins, ties to the
    MINIMUM label) on arbitrary small symmetrized graphs — the full
    community census compared, not just top-k (topk > node count).
    Covers self-loops, multi-edges (symmetrization dedups nothing,
    so a doubled edge votes twice in BOTH engines) and label
    coalescing across rounds."""
    from collections import Counter, defaultdict

    from confluent_example_firehose_spark.operators.community_queries import (
        lpa_communities,
    )

    if not raw_edges:
        return
    sym = raw_edges + [(b, a) for a, b in raw_edges]
    neigh = defaultdict(list)
    for a, b in sym:
        neigh[a].append(b)
    labels = {v: v for v in neigh}
    for _ in range(rounds):
        new = {}
        for v in neigh:
            votes = Counter(labels[u] for u in neigh[v])
            new[v] = max(votes.items(), key=lambda kv: (kv[1], -kv[0]))[0]
        labels = new
    want_census = Counter(labels.values())
    want = sorted(
        ((n, lbl) for lbl, n in want_census.items()),
        key=lambda t: (-t[0], t[1]),
    )

    df = _edges_df(spark, sym, "src long, dst long")
    got_rows = sorted(
        lpa_communities(df, rounds, 1000).collect(),
        key=lambda r: r["rank"],
    )
    got = [(r["n_nodes"], r["community"]) for r in got_rows]
    assert got == want, (raw_edges, rounds, got, want)


@settings(**_SETTINGS)
@given(
    avail=st.dictionaries(
        st.text(alphabet="abcdef", min_size=1, max_size=3),
        st.integers(1, 200),
        min_size=1,
        max_size=8,
    ),
    div=st.integers(1, 4),
)
def test_waterfill_matches_model(spark, avail, div):
    """22nd law (r8): the UniMax water-fill kernel equals an
    independent pure-Python water-filler on arbitrary availability
    maps — saturate smallest-first, split the remainder into equal
    integer shares, +1 remainder to the first sources in (avail,
    source) order; sum(allocated) == budget exactly."""
    from confluent_example_firehose_spark.operators.budget_queries import (
        waterfill,
    )

    s = spark.createDataFrame(
        list(avail.items()), "source string, avail long"
    )
    got = {
        r["source"]: (r["allocated"], r["saturated"])
        for r in waterfill(s, div).collect()
    }
    budget = sum(avail.values()) // div
    order = sorted(avail, key=lambda k: (avail[k], k))
    want, remaining, left = {}, budget, len(order)
    for i, src in enumerate(order):
        if avail[src] * left <= remaining:
            want[src] = (avail[src], 1)
            remaining -= avail[src]
            left -= 1
        else:
            base, rem = divmod(remaining, left)
            for j, other in enumerate(order[i:]):
                want[other] = (base + 1 if j < rem else base, 0)
            break
    assert got == want, (avail, div, got, want)
    assert sum(a for a, _ in got.values()) == budget


@settings(**_SETTINGS)
@given(
    terms=st.lists(
        st.text(alphabet="xyz", min_size=1, max_size=2),
        min_size=1,
        max_size=30,
    )
)
def test_cms_never_underestimates_model(spark, terms):
    """23rd law (r8): CMS point estimates (min over rows of the cell
    counts) are >= the exact count for EVERY term of an arbitrary
    token stream, and equal when no cell collides — replayed against
    a pure-Python sketch built with the same double-hash family."""
    from collections import Counter

    from confluent_example_firehose_spark.operators.cms_queries import (
        CMS_D,
        CMS_W,
        cms_sketch,
    )

    census_py = Counter(terms)
    # independent model: python md5-based portable hash + double hash
    import hashlib

    def cells(t):
        h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
        h2 = (h >> 30) * 2 + 1
        return [(r, (h + r * h2) % CMS_W) for r in range(CMS_D)]

    sketch_py = Counter()
    for t, c in census_py.items():
        for cell in cells(t):
            sketch_py[cell] += c

    census = spark.createDataFrame(
        list(census_py.items()), "term string, cnt long"
    )
    got = {
        (r["r"], r["pos"]): r["c"] for r in cms_sketch(census).collect()
    }
    assert got == dict(sketch_py), (terms, got, sketch_py)
    for t, c in census_py.items():
        est = min(got[cell] for cell in cells(t))
        assert est >= c


@settings(**_SETTINGS)
@given(
    cents=st.lists(
        st.integers(min_value=0, max_value=50_000),
        min_size=1,
        max_size=60,
    )
)
def test_histogram_percentiles_match_rank_model(spark, cents):
    """24th law (r9): the fixed-bin histogram percentile kernel
    (q_quantile_stream / q_quantile_mergeable's rank-crossing
    extraction) equals an independent pure-Python ceil-rank model on
    arbitrary non-negative cent lists, and each estimate sits within
    one bin width of the true percentile. Non-negative domain: the
    cross-engine `div` truncates toward zero, so bin 0 would span
    (-BIN, BIN) for signed values — the one-bin error bound is a
    non-negative-domain guarantee (stated, not hidden)."""
    import math
    from collections import Counter

    from confluent_example_firehose_spark.operators.index_queries import (
        QH_BIN_CENTS,
    )
    from confluent_example_firehose_spark.operators.sketch_stream_queries import (
        histogram_percentiles,
    )

    census = Counter(c // QH_BIN_CENTS for c in cents)
    merged = spark.createDataFrame(
        list(census.items()), "bin long, cnt long"
    )
    row = histogram_percentiles(merged)

    n = len(cents)
    ordered = sorted(cents)

    def model(num, den):
        # smallest bin with den*cum >= num*n (the integer crossing)
        cum = 0
        for b in sorted(census):
            cum += census[b]
            if den * cum >= num * n:
                return b * QH_BIN_CENTS
        raise AssertionError("crossing not reached")

    for col, (num, den), pct in (
        ("p50", (1, 2), 0.5),
        ("p90", (9, 10), 0.9),
        ("p99", (99, 100), 0.99),
    ):
        want = model(num, den)
        assert row[col] == want, (cents, col, row[col], want)
        true_c = ordered[math.ceil(pct * n) - 1]
        assert want <= true_c < want + QH_BIN_CENTS, (
            cents,
            col,
            want,
            true_c,
        )
    assert row["n"] == n


fp_pool = st.sampled_from(
    # tight cluster (many within-radius + exact-duplicate classes),
    # a far value, and sign-bit extremes (fingerprints are signed
    # 64-bit longs in Spark)
    [0, 1, 3, 7, 0xFF, 1 << 35, -1, -2, (1 << 63) - 1, -(1 << 63)]
)


@settings(**_SETTINGS)
@given(
    fps=st.lists(fp_pool, min_size=1, max_size=14),
    radius=st.sampled_from([0, 1, 3, 7]),
    n_blocks=st.sampled_from([4, 8]),
)
def test_simhash_contraction_equals_direct_pairing(
    spark, fps, radius, n_blocks
):
    """VERDICT r10 item 1 law: equivalence-class contraction is
    output-invariant — simhash_pairs_contracted on an arbitrary
    (_id, fp) table equals the brute-force all-pairs model
    {(a, b, d) : a < b, d = popcount(fp_a XOR fp_b) <= radius}.
    radius is capped below n_blocks on the 4-block runs so the
    pigeonhole full-recall precondition holds (d < n_blocks)."""
    from confluent_example_firehose_spark.operators.dedup import (
        fp_classes,
        simhash_pairs_contracted,
    )

    radius = min(radius, n_blocks - 1)
    mask = (1 << 64) - 1
    want = {
        (a, b, bin((fps[a] ^ fps[b]) & mask).count("1"))
        for a in range(len(fps))
        for b in range(a + 1, len(fps))
        if bin((fps[a] ^ fps[b]) & mask).count("1") <= radius
    }
    fp = spark.createDataFrame(
        list(enumerate(fps)), "_id long, fp long"
    )
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_pairs_contracted(
            fp,
            fp_classes(fp),
            radius=radius,
            n_blocks=n_blocks,
            max_bucket=64,
        ).collect()
    }
    assert got == want
