"""Table catalog: loaders over the driver-generated parquet.

Parquet scans are the batch twin of the reference's Kafka source
(AbstractFirehose.java:68-74); Catalyst pushes predicates and prunes
columns into the scan, which is what makes the same logical plans
viable at 100 TB (partition pruning + column pruning happen before IO).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schema import TABLE_NAMES

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        # Normalize events.ts to TIMESTAMP_LTZ whatever the generator
        # wrote (the driver regenerates testdata between rounds and has
        # switched physical types before):
        #  - TIMESTAMP(NANOS) reads as raw long under the nanosAsLong
        #    session flag -> integer-divide (not float: 1.7e18 ns
        #    overflows double mantissa) to micros, exactly DuckDB's own
        #    truncation;
        #  - TIMESTAMP(MICROS, isAdjustedToUTC=false) reads as
        #    TIMESTAMP_NTZ -> cast to LTZ; the session timezone is
        #    pinned UTC (session.py) so the wall-clock is preserved and
        #    unix_micros()/window() downstream keep working.
        t = dict(df.dtypes).get("ts")
        if t == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif t == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register each table as a temp view (for the SQL API surface)."""
    tables = load_all(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
