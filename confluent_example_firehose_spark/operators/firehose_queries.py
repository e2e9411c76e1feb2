"""Declared queries for the reference's own operator surface (§2.A).

The events table is the firehose stream's batch twin (FIXTURES.md §B):
ts+value drive latest-value aggregation, props drives JSON parsing,
user_id/event_type are the enrichment keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .firehose import last_value_table

# A synthetic tags map built from event columns: lets us demonstrate the
# reference's map operators (map-key filter #3, map->array projection #4,
# FirehoseMetric.java:65-102) on the driver's tables with an exact SQL
# oracle. 'unit' plays the FilteredTags role (FirehoseMetric.java:12-16).
def _tags_map() -> F.Column:
    return F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("unit"), F.lit("count"),
        F.lit("user"), F.col("user_id").cast("string"),
    )


@register(
    "q_scan_events",
    oracle="SELECT event_id, ts, user_id, event_type, value, props FROM events",
)
def q_scan_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source scan (#1): full-fidelity scan of the stream's batch twin.

    Reference: Kafka byte[] poll, AbstractFirehose.java:68-74,116. The
    parquet scan is vectorized and column-pruned by Catalyst.
    """
    return load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )


@register(
    "q_json_parse",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k_val
    FROM events
    WHERE CAST(json_extract(props, '$.k') AS INTEGER) IS NOT NULL
    """,
)
def q_json_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON deserialize / schema projection (#2).

    Reference: Jackson bind with permissive skip,
    AbstractFirehose.java:98-105,118-123. from_json nulls corrupt rows;
    the filter is the skip path.
    """
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select(
        "event_id",
        F.from_json(F.col("props"), "k INT").alias("p"),
    )
    return parsed.select(
        "event_id", F.col("p.k").alias("k_val")
    ).filter(F.col("k_val").isNotNull())


@register(
    "q_map_filter",
    oracle="""
    SELECT event_id,
           concat('type=', event_type, ',user=', CAST(user_id AS VARCHAR)) AS tag_str
    FROM events
    """,
)
def q_map_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-key filter (#3): drop FilteredTags keys from the tags map.

    Reference: FirehoseMetric.java:12-16,65-76. map_filter runs inside
    codegen; output serialized to a key-sorted k=v string so the oracle
    is exact (SURVEY.md §1.4 determinism fix).
    """
    ev = load_table(spark, sf_dir, "events").withColumn("tags", _tags_map())
    filtered = F.map_filter(F.col("tags"), lambda k, _v: k != F.lit("unit"))
    entries = F.array_sort(F.map_entries(filtered))
    kv = F.transform(entries, lambda e: F.concat_ws("=", e["key"], e["value"]))
    return ev.select("event_id", F.array_join(kv, ",").alias("tag_str"))


@register(
    "q_map_project",
    oracle="""
    SELECT event_id,
           'type,user' AS labels_str,
           concat(event_type, ',', CAST(user_id AS VARCHAR)) AS values_str,
           2 AS n_labels
    FROM events
    """,
)
def q_map_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map -> array projections (#4): aligned key/value arrays.

    Reference: labelsAsArray/labelValuesAsArray,
    FirehoseMetric.java:77-102, with key-sorted determinism.
    """
    from .firehose import label_values, labels

    ev = load_table(spark, sf_dir, "events").withColumn("tags", _tags_map())
    return ev.select(
        "event_id",
        F.array_join(labels("tags"), ",").alias("labels_str"),
        F.array_join(label_values("tags"), ",").alias("values_str"),
        F.size(labels("tags")).cast("int").alias("n_labels"),
    )


@register(
    "q_lookup_enrich",
    oracle="""
    SELECT e.event_id,
           e.user_id,
           coalesce(c.c_mktsegment, 'NONE') AS segment,
           coalesce(n.n_name, 'UNKNOWN') AS nation_name
    FROM events e
    LEFT JOIN customer c ON e.user_id = c.c_custkey
    LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    """,
)
def q_lookup_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary lookup join (#5): broadcast dims, identity fallback.

    Reference: LookupMapper.java:20-29 (Map<label, Map<old,new>> with
    getOrDefault). Both dims are broadcast — the fact side never
    shuffles, which is the only sane plan at 100 TB fact scale.
    """
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        ev.join(F.broadcast(cust), ev.user_id == cust.c_custkey, "left")
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey, "left")
        .select(
            "event_id",
            "user_id",
            F.coalesce("c_mktsegment", F.lit("NONE")).alias("segment"),
            F.coalesce("n_name", F.lit("UNKNOWN")).alias("nation_name"),
        )
    )


@register(
    "q_last_value",
    oracle="""
    SELECT user_id, event_type, value AS last_value, ts AS last_ts
    FROM events
    QUALIFY row_number() OVER (
        PARTITION BY user_id, event_type
        ORDER BY ts DESC, event_id DESC
    ) = 1
    """,
)
def q_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed last-value aggregation (#6) + lazy series creation (#8).

    Reference: gauge upsert, AbstractPrometheusFirehose.java:41-51 —
    last-write-wins per (name, labels). Batch twin keyed on
    (user_id, event_type) with total order (ts, event_id). Planned as
    partial+final hash agg (max_by) — no window sort, map-side combine
    collapses each input split to <=n_groups rows before the shuffle.
    """
    ev = load_table(spark, sf_dir, "events")
    out = last_value_table(
        ev, ["user_id", "event_type"], "value", ["ts", "event_id"]
    )
    return out.select(
        "user_id",
        "event_type",
        F.col("last_value"),
        F.col("last_ts"),
    )


@register(
    "q_series_cap",
    oracle="""
    SELECT user_id, event_type, last_value, last_ts
    FROM (
        SELECT user_id, event_type, last_value, last_ts,
               row_number() OVER (
                   ORDER BY last_ts DESC, user_id, event_type
               ) AS recency_rank
        FROM (
            SELECT user_id, event_type, value AS last_value, ts AS last_ts
            FROM events
            QUALIFY row_number() OVER (
                PARTITION BY user_id, event_type
                ORDER BY ts DESC, event_id DESC
            ) = 1
        )
    )
    WHERE recency_rank <= 500
    """,
)
def q_series_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max-size series eviction — the registry cap twin (operator #7's
    second half: Guava maximumSize(10000) LRU,
    AbstractPrometheusFirehose.java:22). The streaming per-key state
    handler cannot see other keys, so the cap is expressed where it
    belongs in Spark: a bounded top-K over the state table by recency
    (keep the 500 most-recently-updated series; older series are the
    evictees). Planned as TakeOrdered — no full sort at any scale."""
    ev = load_table(spark, sf_dir, "events")
    state = last_value_table(
        ev, ["user_id", "event_type"], "value", ["ts", "event_id"]
    )
    return (
        state.select("user_id", "event_type", "last_value", "last_ts")
        .orderBy(
            F.col("last_ts").desc(), F.col("user_id"), F.col("event_type")
        )
        .limit(500)
    )
