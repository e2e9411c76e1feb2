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


# Queries that already have a driver CORRECTNESS row (union of the keys in
# CORRECTNESS_r01.json + CORRECTNESS_r02.json). The driver only records the
# FIRST 50 entries of queries() each round, so ordering is rotation state:
# queries NOT in this set are emitted first so every query eventually gets a
# driver-verified row. Update this set from CORRECTNESS_r{N}.json each round.
_DRIVER_VERIFIED: frozenset[str] = frozenset(
    {
        "q_join_asof", "q_join_asof_merge", "q_dedup_exact", "q_dedup_jaccard",
        "q_dedup_near", "q_dedup_simhash", "q_scan_events", "q_json_parse",
        "q_map_filter", "q_map_project", "q_lookup_enrich", "q_last_value",
        "q_series_cap", "q_multimodal_join", "q_multimodal_features",
        "q_multimodal_resize", "q_multimodal_frames", "q_scan_parquet",
        "q_filter_project", "q_agg_basic", "q_agg_distinct", "q_agg_approx",
        "q_rollup_cube", "q_window_rank", "q_window_running", "q_topk",
        "q_join_inner", "q_join_outer", "q_join_semi_anti", "q_join_range",
        "q_set_ops", "q_scalar_funcs", "q_date_funcs", "q_array_explode",
        "q_json_funcs", "q_window_tumbling", "q_pandas_udf", "q_agg_quantiles",
        "q_join_salted", "q_pivot", "q_dedup_fuzzy", "q_similarity_topk",
        "q_dedup_embed", "q_similarity_ivf", "q_similarity_lsh",
        "q_text_tokens", "q_text_tokens_bpe", "q_text_quality",
        "q_text_langid", "q_doc_fingerprint", "q_tpch_q3", "q_tpch_q5",
        "q_tpch_q6",
    }
)


def all_queries() -> dict[str, QuerySpec]:
    # Import for side effects: each module registers its queries.
    from .operators import (  # noqa: F401
        asof_queries,
        dedup_queries,
        firehose_queries,
        multimodal_queries,
        relational_ext_queries,
        relational_queries,
        similarity_queries,
        text_queries,
        tpch_queries,
        udf_queries,
        window_session_queries,
    )
    from .sources import file_sources  # noqa: F401
    from .streaming import streaming_queries  # noqa: F401

    # Imported LAST: the round-3 additions sit at the end of the
    # never-driver-verified block so they don't displace older
    # unverified queries from the driver's 50-entry window.
    from .operators import curation_queries  # noqa: F401
    from .operators import timeseries_queries  # noqa: F401
    from .operators import ir_queries  # noqa: F401

    # Driver-priority ordering: never-driver-verified queries first (in
    # registration order), already-verified ones after, so the driver's
    # 50-entry CORRECTNESS window always covers the unverified set.
    ordered = sorted(
        _REGISTRY.items(), key=lambda kv: (kv[0] in _DRIVER_VERIFIED,)
    )
    return dict(ordered)


def query_fns() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sqls() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
