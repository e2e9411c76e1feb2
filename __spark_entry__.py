"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``confluent_example_firehose_spark/``; each
query module registers (spark_fn, oracle_sql) pairs side by side so
the two can never drift apart.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from confluent_example_firehose_spark import registry  # noqa: E402
from confluent_example_firehose_spark.flagship import flagship  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def _ensure_session_confs(spark: SparkSession) -> None:
    """Apply confs the engine relies on when the driver owns the session.
    All of these are runtime-settable; each is individually guarded so a
    stricter build can't break entry()."""
    confs = {
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        # a plain session defaults to 200 shuffle partitions — at the
        # gate's sf0.01 that is pure task overhead (and 200 state-store
        # partitions for every streaming query); size to the box
        "spark.sql.shuffle.partitions": os.environ.get(
            "SPARK_GRAFT_CPUS", "32"
        ),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # AQE SMJ->SHJ local rewrite (guide §3.1): the r13 fact-join
        # merge hints rely on it to regain hash-join speed locally
        # while keeping sort-merge as the safe at-scale strategy.
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "64m",
    }
    for k, v in confs.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _ensure_session_confs(spark)
    return flagship(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    fns = registry.query_fns()

    def wrap(fn):
        def inner(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_session_confs(spark)
            # Release builder caches the PREVIOUS query deferred
            # (caching.materialize_unpersist(defer=True)) — the driver
            # has collected its result by the time the next query runs.
            from confluent_example_firehose_spark.caching import (
                drain_pending,
            )

            drain_pending()
            return fn(spark, sf_dir)

        return inner

    return {name: wrap(fn) for name, fn in fns.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted -> rows-only)."""
    return registry.oracle_sqls()
