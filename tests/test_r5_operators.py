"""Hand-verified semantics for the late round-5 operators (the
differential gate checks engine agreement; these pin the intended
MEANING on tiny frames where the answer is computable by eye)."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_cdc_last_writer_wins_and_tombstone_removes(spark):
    from datetime import datetime

    rows = [
        # user 1: upsert 100, then tombstone -> absent
        (1, 1, datetime(2024, 1, 1, 0, 0), "view", 1.00),
        (2, 1, datetime(2024, 1, 2, 0, 0), "error", 0.0),
        # user 2: tombstone, then upsert 2.50 -> present at 250
        (3, 2, datetime(2024, 1, 1, 0, 0), "error", 0.0),
        (4, 2, datetime(2024, 1, 2, 0, 0), "purchase", 2.50),
        # user 3: two upserts same ts -> event_id breaks the tie
        (5, 3, datetime(2024, 1, 1, 0, 0), "view", 3.00),
        (6, 3, datetime(2024, 1, 1, 0, 0), "view", 4.00),
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "user_id", "ts", "event_type", "value"]
    )
    log = ev.select(
        "user_id",
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        "ts",
        "event_id",
    )
    g = log.groupBy("user_id").agg(
        F.max_by(F.struct("op", "cents"), F.struct("ts", "event_id")).alias(
            "last"
        )
    )
    out = {
        r["user_id"]: r["last"]["cents"]
        for r in g.filter(F.col("last.op") == "U").collect()
    }
    assert out == {2: 250, 3: 400}


def test_quantile_rank_crossing_integer_frontier(spark):
    # 10 values 1..10 in one group, bin width 1 (cents == bin):
    # 2c >= n crosses at the 5th value -> p50 = 5;
    # 10c >= 9n at the 9th -> p90 = 9; 100c >= 99n at the 10th -> 10.
    from pyspark.sql import Window as W

    df = spark.range(1, 11).select(
        F.lit("g").alias("k"), F.col("id").alias("bin")
    ).groupBy("k", "bin").agg(F.count("*").alias("cnt"))
    cum = df.select(
        "k",
        "bin",
        F.sum("cnt").over(W.partitionBy("k").orderBy("bin")).alias("c"),
        F.sum("cnt").over(W.partitionBy("k")).alias("n"),
    )
    row = cum.groupBy("k").agg(
        F.min(F.when(2 * F.col("c") >= F.col("n"), F.col("bin"))).alias(
            "p50"
        ),
        F.min(
            F.when(10 * F.col("c") >= 9 * F.col("n"), F.col("bin"))
        ).alias("p90"),
        F.min(
            F.when(100 * F.col("c") >= 99 * F.col("n"), F.col("bin"))
        ).alias("p99"),
    ).first()
    assert (row["p50"], row["p90"], row["p99"]) == (5, 9, 10)


def test_kcore_peel_removes_chain_keeps_clique(spark):
    # triangle {1,2,3} (deg 2 each) + pendant 4-5 chain: K=2 peel
    # removes 5 (deg 1) then 4; the triangle survives with deg 2.
    und = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
    e = spark.createDataFrame(
        und + [(b, a) for a, b in und], ["src", "dst"]
    )
    cur = e
    for _ in range(3):
        deg = cur.groupBy("src").agg(F.count("*").alias("dg"))
        keep = deg.filter(F.col("dg") >= 2).select("src")
        cur = (
            cur.join(keep.withColumnRenamed("src", "node"),
                     cur.src == F.col("node"))
            .drop("node")
            .join(keep.select(F.col("src").alias("node")),
                  F.col("dst") == F.col("node"))
            .drop("node")
        )
    surv = {
        r["src"]: r["dg"]
        for r in cur.groupBy("src").agg(F.count("*").alias("dg")).collect()
    }
    assert surv == {1: 2, 2: 2, 3: 2}


def test_winsorize_quantized_frontier_clips_exactly(spark):
    # values 1..9 and one outlier 1000 (cents). p05/p95 of the 10
    # values (linear interpolation): p05 = 1.45 -> lo 1; p95 = 554.5
    # -> hi 554 (rounded: 1.45 -> 1, 554.5 -> 555? round-half-even vs
    # half-up is engine-sensitive at .5 — assert the clip COUNTS and
    # that the winsorized sum uses the quantized frontier).
    vals = list(range(1, 10)) + [1000]
    df = spark.createDataFrame([(v,) for v in vals], ["cents"])
    th = df.agg(
        F.round(F.percentile("cents", 0.05)).cast("long").alias("lo"),
        F.round(F.percentile("cents", 0.95)).cast("long").alias("hi"),
    ).first()
    lo, hi = th["lo"], th["hi"]
    assert lo >= 1 and hi < 1000  # outlier lands outside the frontier
    clipped = [min(max(v, lo), hi) for v in vals]
    got = df.agg(
        F.sum(
            F.when(F.col("cents") < lo, lo)
            .when(F.col("cents") > hi, hi)
            .otherwise(F.col("cents"))
        ).alias("s")
    ).first()["s"]
    assert got == sum(clipped)
