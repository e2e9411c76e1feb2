"""SparkSession factory.

Defaults are tuned for the local[32] test box but express
cluster-portable intent: AQE for runtime re-planning (skew joins,
partition coalescing), shuffle partitions sized to cores (would be
~2-3x total cores on a real cluster), Arrow for every pandas UDF
exchange, UTC session timezone so timestamps hash-match the DuckDB
oracle (duckdb timestamps are UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "confluent-firehose-spark") -> SparkSession:
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Let AQE rewrite a sort-merge join to a shuffled-hash join at
        # runtime when every post-shuffle partition's build side fits
        # locally (guide §3.1 — default 0 disables the rewrite). The
        # logical plans keep SMJ as the safe strategy; this converts
        # per partition from MEASURED sizes, so it is exactly as
        # cluster-portable as AQE itself.
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            "64m",
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Parquet TIMESTAMP(NANOS) (events.ts) is unsupported by the
        # vectorized reader; read as long and normalize in catalog.py
        # (integer-divide to micros — matches DuckDB's own truncation).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
