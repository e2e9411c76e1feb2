"""As-of join declared queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..registry import register
from .asof import asof_join_agg, asof_join_merge


@register(
    "q_join_asof",
    oracle="""
    SELECT event_id, user_id, o_orderkey, o_totalprice
    FROM (
        SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice,
               row_number() OVER (
                   PARTITION BY e.event_id
                   ORDER BY o.o_orderdate DESC NULLS LAST,
                            o.o_orderkey DESC NULLS LAST
               ) AS rn
        FROM events e
        LEFT JOIN orders o
          ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
    )
    WHERE rn = 1
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of: each event picks the customer's latest order at/before the
    event time; events without a matching order keep nulls."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice", "o_orderdate"
    )
    out = asof_join_agg(
        ev,
        orders,
        left_on="user_id",
        right_on="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        right_cols=["o_orderkey", "o_totalprice"],
        right_tiebreak="o_orderkey",
    )
    return out.select("event_id", "user_id", "o_orderkey", "o_totalprice")


@register(
    "q_join_asof_merge",
    oracle="""
    SELECT event_id, user_id, o_totalprice
    FROM (
        SELECT e.event_id, e.user_id, o.o_totalprice,
               row_number() OVER (
                   PARTITION BY e.event_id
                   ORDER BY o.o_orderdate DESC NULLS LAST,
                            o.o_orderkey DESC NULLS LAST
               ) AS rn
        FROM events e
        LEFT JOIN orders o
          ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
    )
    WHERE rn = 1
    """,
)
def q_join_asof_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME as-of semantics as q_join_asof via the other physical
    strategy: cogrouped applyInPandas running pd.merge_asof per key —
    one shuffle of each side on the key, O(n+m) sort-merge per group.
    The scale path when per-key candidate multiplicity makes the
    join+max_by plan explode (minute-quotes vs trades); checked against
    the identical SQL oracle, proving the two strategies agree."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice", "o_orderdate"
    )
    out = asof_join_merge(
        ev,
        orders,
        left_on="user_id",
        right_on="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        right_cols=["o_totalprice"],
        right_tiebreak="o_orderkey",
    )
    return out.select("event_id", "user_id", "o_totalprice")
