"""Flagship pipeline: the whole reference in one Catalyst plan.

scan -> JSON parse -> map filter -> broadcast dictionary enrich ->
keyed latest-value state table (SURVEY.md §7 minimum slice; operators
#1,#2,#3,#5,#6 of §2.A). The batch twin of the reference's consume
loop AbstractFirehose.java:113-142 + AbstractPrometheusFirehose.java:41-51.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table
from .operators.firehose import last_value_table


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")

    # JSON decode of the props payload (permissive, corrupt -> null).
    parsed = ev.withColumn("k_val", F.from_json("props", "k INT")["k"])

    # Dimension enrichment via broadcast left joins (LookupMapper twin).
    enriched = (
        parsed.join(F.broadcast(cust), parsed.user_id == cust.c_custkey, "left")
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey, "left")
        .select(
            "event_id",
            "ts",
            "user_id",
            "event_type",
            "value",
            "k_val",
            F.coalesce("c_mktsegment", F.lit("NONE")).alias("segment"),
            F.coalesce("n_name", F.lit("UNKNOWN")).alias("nation_name"),
        )
    )

    # Keyed latest-value state table (gauge upsert twin): partial+final
    # hash agg, no sort — survives 100 TB because each map task first
    # collapses to <=n_groups rows.
    latest = last_value_table(
        enriched,
        ["user_id", "event_type", "segment", "nation_name"],
        "value",
        ["ts", "event_id"],
        extra_aggs={
            "n_events": F.count(F.lit(1)),
            "sum_k": F.sum("k_val"),
        },
    )
    return latest.select(
        "user_id",
        "event_type",
        "segment",
        "nation_name",
        F.col("last_value"),
        F.col("last_ts"),
        "n_events",
        "sum_k",
    )
