"""Semantics pins for the time-series operators (timeseries_queries.py):
staleness -> NULL on the resample grid, and PromQL's counter-reset rule
in the rate query. The oracle check proves engine agreement; these pin
the *intended* semantics on hand-built rows."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from confluent_example_firehose_spark.operators import timeseries_queries as tsq


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_resample_forward_fill_and_staleness(spark, tmp_path):
    # One series, observations at 00:10 (v=1.0) and 02:05 (v=5.0).
    # Grid every 30 min, staleness 30 min:
    #   00:00 -> NULL (no obs yet)
    #   00:30 -> 1.0  (obs 20 min old)
    #   01:00 -> NULL (obs 50 min old: stale)
    #   02:30 -> 5.0  (obs 25 min old)
    rows = [
        ("a", _ts("2024-01-01 00:10:00"), 1.0, 1),
        ("a", _ts("2024-01-01 02:05:00"), 5.0, 2),
    ]
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double, event_id long"
    )
    sf = str(tmp_path / "sf")
    df.write.parquet(f"{sf}/events.parquet")
    out = {
        (r["event_type"], r["grid_ts"].isoformat()): r["value"]
        for r in tsq.q_ts_resample(spark, sf).collect()
    }
    assert out[("a", "2024-01-01T00:00:00")] is None
    assert out[("a", "2024-01-01T00:30:00")] == 1.0
    assert out[("a", "2024-01-01T01:00:00")] is None
    assert out[("a", "2024-01-01T02:30:00")] == 5.0


def test_rate_counter_reset(spark, tmp_path):
    # Counter goes 10 -> 25 -> 3 -> 8 within one 6h window:
    # deltas 15, 3 (reset: new value IS the increase), 5 => increase 23.
    base = _ts("2024-01-01 00:00:00")
    rows = [
        ("c", base + dt.timedelta(minutes=i * 10), v, i)
        for i, v in enumerate([10.0, 25.0, 3.0, 8.0])
    ]
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double, event_id long"
    )
    sf = str(tmp_path / "sf")
    df.write.parquet(f"{sf}/events.parquet")
    out = tsq.q_ts_rate(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_samples"] == 4
    assert r["n_deltas"] == 3  # first sample has no prev
    assert float(r["increase"]) == 23.0
    assert abs(float(r["rate_per_sec"]) - 23.0 / tsq.RATE_WINDOW_SEC) < 1e-12


def test_resample_one_shuffle(spark, sf_dir):
    # The window pass is the only wide stage over the union; no join,
    # no cartesian anywhere in the plan.
    plan = tsq.q_ts_resample(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_downsample_ohlc_order(spark, tmp_path):
    # Same hour, out-of-order values; open/close picked by (ts, event_id).
    rows = [
        ("a", _ts("2024-01-01 03:20:00"), 7.0, 2),
        ("a", _ts("2024-01-01 03:05:00"), 2.0, 1),
        ("a", _ts("2024-01-01 03:50:00"), 4.0, 3),
        ("a", _ts("2024-01-01 03:50:00"), 9.0, 4),  # ts tie -> event_id
    ]
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double, event_id long"
    )
    sf = str(tmp_path / "sf")
    df.write.parquet(f"{sf}/events.parquet")
    out = tsq.q_ts_downsample(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["open"], r["high"], r["low"], r["close"], r["n_samples"]) == (
        2.0, 9.0, 2.0, 9.0, 4,
    )


def test_anomaly_planted_spike(spark, tmp_path):
    # 30 flat-ish samples then a spike: only the spike is flagged, and
    # never against a baseline that includes itself.
    base = _ts("2024-01-01 00:00:00")
    vals = [10.0 + (0.1 if i % 2 else -0.1) for i in range(30)] + [50.0]
    rows = [
        ("a", base + dt.timedelta(minutes=i), v, i)
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double, event_id long"
    )
    sf = str(tmp_path / "sf")
    df.write.parquet(f"{sf}/events.parquet")
    out = tsq.q_ts_anomaly(spark, sf).collect()
    assert [r["event_id"] for r in out] == [30]
    assert out[0]["zscore"] > 3


def test_ewma_fold(spark, tmp_path):
    # s1=1.0; s2=.8*1+.2*11=3.0; s3=.8*3+.2*23=7.0
    base = _ts("2024-01-01 00:00:00")
    rows = [
        ("a", base + dt.timedelta(minutes=i), v, i)
        for i, v in enumerate([1.0, 11.0, 23.0])
    ]
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double, event_id long"
    )
    sf = str(tmp_path / "sf")
    df.write.parquet(f"{sf}/events.parquet")
    out = tsq.q_ts_ewma(spark, sf).collect()
    assert len(out) == 1
    assert out[0]["n_samples"] == 3
    assert abs(out[0]["ewma"] - 7.0) < 1e-9
