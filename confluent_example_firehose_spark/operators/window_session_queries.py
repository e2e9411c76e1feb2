"""Session and sliding event-time windows, batch twins (SURVEY.md §2.B).

Both are fully oracle-checkable: session windows via the classic
gaps-and-islands SQL, sliding windows via the dual-grid expansion
(each event belongs to exactly window/slide grids).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .relational import dsum, dsum_sql

_GAP_MIN = 30  # session gap, minutes


@register(
    "q_window_session",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         > INTERVAL {_GAP_MIN} MINUTE
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    islands AS (
        SELECT user_id, ts, value,
               sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING
               ) AS session_id
        FROM ordered
    )
    SELECT user_id, min(ts) AS session_start, max(ts) AS session_last,
           count(*) AS n, {dsum_sql('value')} AS sum_value
    FROM islands
    GROUP BY user_id, session_id
    """,
)
def q_window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min gap) per user: F.session_window in a
    batch groupBy — the same operator Structured Streaming uses for
    streaming sessionization (merging session state). The oracle is
    the gaps-and-islands formulation; session_window.start == the
    island's min(ts) because a session starts at its first event.

    Scale: one shuffle on (user_id); session merging is per-key local.
    The windowed shuffle key prevents one giant user from serializing
    — skewed users split via AQE."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            "user_id", F.session_window("ts", f"{_GAP_MIN} minutes").alias("w")
        )
        .agg(
            F.count("*").alias("n"),
            dsum("value").alias("sum_value"),
            F.max("ts").alias("session_last"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "session_last",
            "n",
            "sum_value",
        )
    )


@register(
    "q_window_sliding",
    oracle=f"""
    SELECT w_start, event_type, count(*) AS n,
           {dsum_sql('value')} AS sum_value
    FROM (
        SELECT e.event_type, e.value, g.w_start
        FROM events e,
             LATERAL (
                 SELECT unnest([
                     TIMESTAMP '1970-01-01' + to_seconds(
                         CAST(floor(epoch(e.ts) / 30) * 30 AS BIGINT)),
                     TIMESTAMP '1970-01-01' + to_seconds(
                         CAST(floor(epoch(e.ts) / 30) * 30 - 30 AS BIGINT))
                 ]) AS w_start
             ) g
    )
    GROUP BY w_start, event_type
    """,
)
def q_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (60 s window, 30 s slide): every event lands in
    exactly window/slide = 2 windows; Spark expands then aggregates
    (partial agg collapses before the shuffle). Oracle: the same
    expansion written as a dual-grid unnest."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "60 seconds", "30 seconds").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n"), dsum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("w_start"), "event_type", "n", "sum_value"
        )
    )
