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

# Anomaly detection: z-score of each sample against the trailing window
# of prior samples in the same series.
ANOM_LOOKBACK = 20  # trailing samples in the baseline window
ANOM_MIN_N = 10  # require this many priors before scoring
ANOM_Z = 3.0  # |z| threshold

EWMA_ALPHA = 0.2  # q_ts_ewma smoothing factor


def _obs_key():
    """Single lexicographic string key encoding (ts, event_id) — both
    engines order it identically, and it fits min_by/arg_min's
    scalar-key signature (DuckDB has no composite-key arg_min).
    epoch micros are < 20 digits and non-negative for this data."""
    return F.concat(
        F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
        F.lit(":"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )


_OBS_KEY_SQL = (
    "lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') || ':' || "
    "lpad(CAST(event_id AS VARCHAR), 12, '0')"
)


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


@register(
    "q_ts_downsample",
    oracle=f"""
    SELECT event_type,
           date_trunc('hour', ts) AS bucket,
           arg_min(value, {_OBS_KEY_SQL}) AS open,
           max(value) AS high,
           min(value) AS low,
           arg_max(value, {_OBS_KEY_SQL}) AS close,
           count(*) AS n_samples
    FROM events
    GROUP BY event_type, date_trunc('hour', ts)
    """,
)
def q_ts_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling — first/last/min/max per (series, hour), the
    lossy-rollup shape every metrics store uses for retention tiers
    (and the continuous-aggregate primitive of hypertable systems).

    Plan shape: ONE partial+final hash aggregation on (series, hour) —
    min_by/max_by carry one (key, value) pair of state per group, so
    map-side combine collapses each task's samples before the shuffle.
    open/close use a single lexicographic string key over
    (ts, event_id) instead of a struct because the oracle engine's
    arg_min is scalar-key-only; event_id uniqueness makes the pick
    deterministic. No window, no second pass: at 100 TB this is one
    shuffle whose width is the bucket count, not the sample count."""
    ev = load_table(spark, sf_dir, "events")
    k = _obs_key()
    return (
        ev.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("bucket")
        )
        .agg(
            F.min_by("value", k).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", k).alias("close"),
            F.count("*").alias("n_samples"),
        )
    )


@register(
    "q_ts_anomaly",
    oracle=f"""
    WITH scored AS (
        SELECT event_type, ts, event_id, value,
               avg(value) OVER w AS mu,
               stddev_samp(value) OVER w AS sd,
               count(*) OVER w AS n_prior
        FROM events
        WINDOW w AS (
            PARTITION BY event_type ORDER BY ts, event_id
            ROWS BETWEEN {ANOM_LOOKBACK} PRECEDING AND 1 PRECEDING
        )
    )
    SELECT event_type, ts, event_id, value, zscore
    FROM (
        SELECT event_type, ts, event_id, value, n_prior, sd,
               round((value - mu) / sd, 4) AS zscore
        FROM scored
    )
    WHERE n_prior >= {ANOM_MIN_N} AND sd > 0
      AND abs(zscore) > {ANOM_Z}
    """,
)
def q_ts_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection: each sample scored against
    the mean/stddev of its own series' trailing {ANOM_LOOKBACK}
    samples (strictly prior — the sample never contaminates its own
    baseline); flagged when |z| > {ANOM_Z} with >= {ANOM_MIN_N}
    priors. The streaming-monitoring twin of a PromQL
    `abs(x - avg_over_time(..)) > 3 * stddev_over_time(..)` alert.

    Plan shape: ONE shuffle on the series key for the running-frame
    window (rows-frame avg/stddev/count computed incrementally in one
    pass), then a narrow filter. z is rounded to 4 digits in both
    engines BEFORE the |z| > threshold test as well as in the output,
    so both the emitted values AND the selection frontier are quantized
    away from ULP-level avg/stddev differences between engines (r3
    ADVICE: a raw-double frontier could flake on a borderline
    sample)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-ANOM_LOOKBACK, -1)
    )
    scored = ev.select(
        "event_type",
        "ts",
        "event_id",
        "value",
        F.avg("value").over(w).alias("mu"),
        F.stddev_samp("value").over(w).alias("sd"),
        F.count("*").over(w).alias("n_prior"),
    )
    z = F.round((F.col("value") - F.col("mu")) / F.col("sd"), 4)
    return scored.filter(
        (F.col("n_prior") >= ANOM_MIN_N)
        & (F.col("sd") > 0)
        & (F.abs(z) > ANOM_Z)
    ).select(
        "event_type",
        "ts",
        "event_id",
        "value",
        z.alias("zscore"),
    )


@register(
    "q_ts_ewma",
    oracle=f"""
    SELECT event_type,
           CAST(len(vals) AS BIGINT) AS n_samples,
           round(list_reduce(vals,
                 (acc, x) -> acc * {1 - EWMA_ALPHA} + x * {EWMA_ALPHA}),
                 6) AS ewma
    FROM (
        SELECT event_type, list(value ORDER BY ts, event_id) AS vals
        FROM events
        GROUP BY event_type
    )
    """,
)
def q_ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series EWMA (alpha={EWMA_ALPHA}): the exponential smoothing
    recurrence s_i = (1-a)*s_(i-1) + a*v_i seeded with the first
    sample — inherently sequential per series, so it runs as ONE fold
    over the series' time-ordered value array (collect + array_sort +
    aggregate), not a window: Spark has no recursive window frame, and
    a UDF would leave the JVM for arithmetic this cheap.

    Plan shape: one shuffle to group the series (collect_list with
    partial aggregation), sort + fold narrow on the reduce side. The
    collected array is bounded by per-series sample count — the state
    a keyed stream would hold anyway; a 100 TB deployment keys on full
    label-set series (high cardinality, small per-series history), not
    on this test table's 15 event_types. Both engines fold the
    identically-ordered array with identical double ops, so the result
    is bit-identical before the final 6-digit round."""
    ev = load_table(spark, sf_dir, "events")
    obs = ev.select(
        "event_type", F.struct("ts", "event_id", "value").alias("o")
    )
    grouped = obs.groupBy("event_type").agg(
        F.array_sort(F.collect_list("o")).alias("obs")
    )
    vals = F.transform(F.col("obs"), lambda s: s["value"])
    fold = F.aggregate(
        F.slice(vals, 2, F.size(vals) - 1),
        F.element_at(vals, 1),
        lambda acc, x: acc * F.lit(1 - EWMA_ALPHA) + x * F.lit(EWMA_ALPHA),
    )
    return grouped.select(
        "event_type",
        F.size(vals).cast("long").alias("n_samples"),
        F.round(fold, 6).alias("ewma"),
    )
