"""Time-series operators over the metrics domain the reference lives in
(Kafka metrics -> Prometheus): grid resampling with forward-fill +
staleness, and counter-rate with reset handling — the batch twins of
PromQL's instant-vector selection and rate()/increase().

Reference parity: the reference only ever exposes the LATEST value per
series (AbstractPrometheusFirehose.java:41-51 upserts a gauge; history
is Prometheus's job). These queries are what the downstream Prometheus
evaluation does with that stream — re-expressed as Spark plans so the
engine can answer them directly over the raw event history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .relational import dsum, dsum_sql

# Evaluation grid: every 30 min over the first 2 days of the stream;
# staleness lookback 30 min (PromQL's default is 5 min against 15 s
# scrapes; the ratio here matches the synthetic stream's ~3/hour per
# series density).
GRID_START = "2024-01-01 00:00:00"
GRID_END = "2024-01-03 00:00:00"
GRID_STEP_MIN = 30
STALE_MIN = 30

RATE_WINDOW_SEC = 6 * 3600  # rate() over 6-hour windows


@register(
    "q_ts_resample",
    oracle=f"""
    WITH obs AS (
        SELECT event_type, ts, max(value) AS value
        FROM events
        WHERE ts <= TIMESTAMP '{GRID_END}'
        GROUP BY event_type, ts
    ),
    grid AS (
        SELECT s.event_type, t.g AS ts
        FROM (SELECT DISTINCT event_type FROM events) s,
             UNNEST(generate_series(TIMESTAMP '{GRID_START}',
                                    TIMESTAMP '{GRID_END}',
                                    INTERVAL {GRID_STEP_MIN} MINUTE)) t(g)
    ),
    u AS (
        SELECT event_type, ts, value, FALSE AS is_grid FROM obs
        UNION ALL
        SELECT event_type, ts, NULL, TRUE FROM grid
    ),
    f AS (
        SELECT *,
               last_value(value IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY ts, is_grid
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS ff,
               last_value(CASE WHEN NOT is_grid THEN ts END IGNORE NULLS)
               OVER (
                   PARTITION BY event_type ORDER BY ts, is_grid
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS last_obs_ts
        FROM u
    )
    SELECT event_type, ts AS grid_ts,
           CASE WHEN last_obs_ts IS NOT NULL
                 AND epoch_us(ts) - epoch_us(last_obs_ts)
                     <= {STALE_MIN} * 60 * 1000000
                THEN ff END AS value
    FROM f
    WHERE is_grid
    """,
)
def q_ts_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid resampling with forward-fill and staleness — the batch twin
    of PromQL instant-vector selection: the series value AT grid time t
    is the last observation at or before t, unless that observation is
    older than the staleness window (then the series is absent -> NULL).

    Plan shape: observations deduped per (series, ts) with max (a
    collision guard that keeps the window frame deterministic), grid
    points generated with sequence()+explode (narrow), one union, ONE
    shuffle on the series key for the window pass — last(ignorenulls)
    over (ts, is_grid) does both the fill and the staleness bookkeeping
    in a single frame. At 100 TB the partition key is the series id
    (high cardinality in a real deployment — labels, not just type), so
    the window parallelizes per series; nothing global. Timestamps
    compare in integer micros on both engines (epoch_us / unix_micros)
    — no interval arithmetic ambiguity."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts") <= F.lit(GRID_END).cast("timestamp")
    )
    obs = ev.groupBy("event_type", "ts").agg(F.max("value").alias("value"))
    grid = (
        ev.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.explode(
                F.expr(
                    f"sequence(to_timestamp('{GRID_START}'), "
                    f"to_timestamp('{GRID_END}'), "
                    f"interval {GRID_STEP_MIN} minutes)"
                )
            ).alias("ts"),
        )
    )
    u = obs.select(
        "event_type", "ts", "value", F.lit(False).alias("is_grid")
    ).unionByName(
        grid.select(
            "event_type",
            "ts",
            F.lit(None).cast("double").alias("value"),
            F.lit(True).alias("is_grid"),
        )
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("ts", "is_grid")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    f = u.select(
        "event_type",
        "ts",
        "is_grid",
        F.last("value", ignorenulls=True).over(w).alias("ff"),
        F.last(
            F.when(~F.col("is_grid"), F.col("ts")), ignorenulls=True
        )
        .over(w)
        .alias("last_obs_ts"),
    )
    stale_us = STALE_MIN * 60 * 1_000_000
    return f.filter("is_grid").select(
        "event_type",
        F.col("ts").alias("grid_ts"),
        F.when(
            F.col("last_obs_ts").isNotNull()
            & (
                F.unix_micros("ts") - F.unix_micros("last_obs_ts")
                <= stale_us
            ),
            F.col("ff"),
        ).alias("value"),
    )


@register(
    "q_ts_rate",
    oracle=f"""
    WITH d AS (
        SELECT event_type, ts, value,
               lag(value) OVER (
                   PARTITION BY event_type ORDER BY ts, event_id
               ) AS prev
        FROM events
    ),
    deltas AS (
        SELECT event_type,
               make_timestamp(
                   (epoch_us(ts) // {RATE_WINDOW_SEC * 1_000_000})
                   * {RATE_WINDOW_SEC * 1_000_000}
               ) AS window_start,
               CASE WHEN prev IS NULL THEN NULL
                    WHEN value >= prev THEN value - prev
                    ELSE value END AS delta
        FROM d
    )
    SELECT event_type, window_start,
           count(*) AS n_samples,
           count(delta) AS n_deltas,
           {dsum_sql('delta')} AS increase,
           {dsum_sql('delta')} / {RATE_WINDOW_SEC} AS rate_per_sec
    FROM deltas
    GROUP BY event_type, window_start
    """,
)
def q_ts_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counter rate with reset handling — the batch twin of PromQL
    increase()/rate(): per series, consecutive-sample deltas where a
    NEGATIVE delta means the counter reset and the new value IS the
    increase (PromQL's reset rule), summed per 6-hour window. A delta
    is attributed to the window of its LATER sample (documented
    convention; PromQL interpolates at range edges instead — a
    per-window-only variant would just drop the lag across the
    boundary).

    Plan shape: one shuffle on the series key for the lag window, then
    a partial+final agg on (series, window) — the window grid is
    arithmetic on the timestamp (epoch floor), not a join against a
    generated grid, so nothing global exists anywhere. The delta sum
    rides the decimal-cast trick (relational.py dsum) to stay
    order-insensitive; per-row double subtraction is bit-identical
    across engines."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy("ts", "event_id")
    prev = F.lag("value").over(w)
    d = ev.select("event_type", "ts", "value", prev.alias("prev"))
    win_us = RATE_WINDOW_SEC * 1_000_000
    window_start = F.timestamp_micros(
        (F.unix_micros("ts") - F.unix_micros("ts") % win_us)
    )
    delta = (
        F.when(F.col("prev").isNull(), F.lit(None).cast("double"))
        .when(F.col("value") >= F.col("prev"), F.col("value") - F.col("prev"))
        .otherwise(F.col("value"))
    )
    deltas = d.select(
        "event_type", window_start.alias("window_start"), delta.alias("delta")
    )
    return (
        deltas.groupBy("event_type", "window_start")
        .agg(
            F.count("*").alias("n_samples"),
            F.count("delta").alias("n_deltas"),
            dsum("delta").alias("increase"),
            (dsum("delta") / RATE_WINDOW_SEC).alias("rate_per_sec"),
        )
    )
