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


# Window head, in order: the driver only records the FIRST 50 entries of
# queries() each round, so ordering is rotation state. Positions 1-3 are
# the r3 driver-red queries (canonicalization fixed in r4 — they MUST be
# re-adjudicated); 4-14 are the r3 additions that registered past the
# 50-entry window and have never received a driver row (VERDICT.md r3
# action items 1-2).
_PRIORITY: tuple[str, ...] = (
    "q_corpus_curation", "q_tpch_q12", "q_scan_json",
    "q_contamination", "q_chunk_documents", "q_pii_redact",
    "q_zorder_layout", "q_ts_resample", "q_ts_rate", "q_ts_downsample",
    "q_ts_anomaly", "q_ts_ewma", "q_text_bm25", "q_text_tfidf",
)

# Queries that already have a driver CORRECTNESS row (union of the keys in
# CORRECTNESS_r01 + r02 + r03, minus the r3 hash-fails pinned above).
# Queries NOT in this set and not in _PRIORITY are emitted right after the
# priority block (in registration order) so every query eventually gets a
# driver-verified row. Update from CORRECTNESS_r{N}.json each round.
_DRIVER_VERIFIED: frozenset[str] = frozenset(
    {
        "q_agg_approx", "q_agg_basic", "q_agg_distinct", "q_agg_quantiles",
        "q_array_explode", "q_bucketed_join", "q_conditional_agg",
        "q_date_funcs", "q_dedup_clusters", "q_dedup_embed", "q_dedup_exact",
        "q_dedup_fuzzy", "q_dedup_jaccard", "q_dedup_near", "q_dedup_simhash",
        "q_dedup_stream", "q_doc_fingerprint", "q_dpp_join",
        "q_exists_subquery", "q_filter_project", "q_grouping_sets",
        "q_join_asof", "q_join_asof_merge", "q_join_inner", "q_join_outer",
        "q_join_range", "q_join_salted", "q_join_semi_anti", "q_json_funcs",
        "q_json_parse", "q_last_value", "q_lookup_enrich", "q_map_filter",
        "q_map_project", "q_microbatch_flush", "q_multimodal_features",
        "q_multimodal_frames", "q_multimodal_join", "q_multimodal_resize",
        "q_pandas_udaf", "q_pandas_udf", "q_percentile_exact", "q_pivot",
        "q_profile_table", "q_rollup_cube", "q_sample_stratified",
        "q_scalar_funcs", "q_scalar_subquery", "q_scan_csv", "q_scan_events",
        "q_scan_parquet", "q_series_cap", "q_set_ops", "q_similarity_ivf",
        "q_similarity_lsh", "q_similarity_topk", "q_sink_parquet_partitioned",
        "q_sink_pull", "q_sink_push", "q_sink_push_http", "q_stateful_ttl",
        "q_stream_join", "q_stream_static_enrich", "q_string_agg",
        "q_text_langid", "q_text_quality", "q_text_tokens",
        "q_text_tokens_bpe", "q_topk", "q_tpch_q1", "q_tpch_q10",
        "q_tpch_q11", "q_tpch_q13", "q_tpch_q14", "q_tpch_q15", "q_tpch_q16",
        "q_tpch_q17", "q_tpch_q18", "q_tpch_q19", "q_tpch_q2", "q_tpch_q20",
        "q_tpch_q21", "q_tpch_q22", "q_tpch_q3", "q_tpch_q4", "q_tpch_q5",
        "q_tpch_q6", "q_tpch_q7", "q_tpch_q8", "q_tpch_q9", "q_udtf",
        "q_unpivot", "q_watermark", "q_window_ntile", "q_window_rank",
        "q_window_running", "q_window_session", "q_window_session_stream",
        "q_window_sliding", "q_window_tumbling",
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

    from .operators import curation_queries  # noqa: F401
    from .operators import timeseries_queries  # noqa: F401
    from .operators import ir_queries  # noqa: F401
    from .operators import quality_queries  # noqa: F401
    from .operators import packing_queries  # noqa: F401
    from .operators import index_queries  # noqa: F401
    from .sources import pysource  # noqa: F401
    from .operators import analytics_queries  # noqa: F401
    from .operators import scoring_queries  # noqa: F401

    # Driver-priority ordering: the explicit _PRIORITY head (r3 reds +
    # never-checked r3 additions), then any other never-driver-verified
    # query in registration order (round-4 additions land here, inside
    # the 50-entry window), then the verified tail.
    prio = {name: i for i, name in enumerate(_PRIORITY)}
    names = list(_REGISTRY)
    reg_pos = {name: i for i, name in enumerate(names)}
    ordered = sorted(
        _REGISTRY.items(),
        key=lambda kv: (
            prio.get(kv[0], len(prio)),
            kv[0] in _DRIVER_VERIFIED,
            reg_pos[kv[0]],
        ),
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
