"""Schemas: the reference's FirehoseMetric record + testdata tables.

METRIC_SCHEMA mirrors the POJO at
/root/reference/src/main/java/io/confluent/firehose/FirehoseMetric.java:17-46
(fields id/name/timestamp/component/tags/value/window; timestamp is epoch
SECONDS per FirehoseMetric.java:19). Parse semantics are permissive like
AbstractFirehose.java:118-123 (bad record -> null -> filtered), via
``from_json`` which nulls out corrupt rows instead of failing the job.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Tag keys excluded from label projections; FirehoseMetric.java:12-16.
FILTERED_TAGS = ("unit",)

METRIC_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("timestamp", T.LongType()),  # epoch seconds
        T.StructField("component", T.StringType()),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
        T.StructField("value", T.DoubleType()),
        T.StructField(
            "window",
            T.StructType(
                [
                    T.StructField("from", T.LongType()),
                    T.StructField("to", T.LongType()),
                    T.StructField("interval", T.IntegerType()),
                ]
            ),
        ),
    ]
)

# The driver's synthetic tables (TESTDATA.md / FIXTURES.md §B).
TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# events.props JSON payload schema (FIXTURES.md: props string '{"k": 69}').
EVENT_PROPS_SCHEMA = T.StructType([T.StructField("k", T.IntegerType())])
