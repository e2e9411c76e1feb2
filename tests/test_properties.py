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
