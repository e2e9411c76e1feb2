"""Query registry: every declared query pairs a Spark callable with its
DuckDB oracle SQL (or None for rows-only checks).

Contract (driver): callable(spark, sf_dir) -> DataFrame; oracle SQL runs
on DuckDB views of the same parquet. Column names must match exactly —
alias everything identically on both sides. Hash compare is
order-insensitive, so ORDER BY is only needed where a LIMIT makes the
row *set* order-dependent (always give those a total order).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: Optional[str]  # DuckDB SQL, or None -> rows-only check


def register(name: str, oracle: Optional[str] = None):
    """Decorator: @register("q_name", oracle="SELECT ...")."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle)
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    # Import for side effects: each module registers its queries.
    from .operators import (  # noqa: F401
        asof_queries,
        dedup_queries,
        firehose_queries,
        multimodal_queries,
        relational_queries,
        similarity_queries,
        text_queries,
        tpch_queries,
        udf_queries,
        window_session_queries,
    )
    from .sources import file_sources  # noqa: F401
    from .streaming import streaming_queries  # noqa: F401

    return dict(_REGISTRY)


def query_fns() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sqls() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
