"""Property-based tests (hypothesis): the engine's custom operators
against independent in-memory models on arbitrary small inputs."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

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
            "SELECT CAST(concat('0x', substr(md5(?), 1, 15)) AS BIGINT)",
            [t],
        ).fetchone()[0]
        assert got[i] == want, (t, got[i], want)
    con.close()
