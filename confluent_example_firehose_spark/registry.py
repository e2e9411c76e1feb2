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
from typing import Callable, Optional, Union

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# An oracle is DuckDB SQL. A callable oracle is resolved lazily at
# oracle_sqls() time — needed when the SQL embeds DATA-DEPENDENT
# literals (q_similarity_ivf's trained centroids) that must be computed
# from the same parquet the comparison reads, not at import time.
OracleSpec = Union[str, Callable[[], Optional[str]], None]

_REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: OracleSpec  # DuckDB SQL, or None -> rows-only check

    def oracle_sql(self) -> Optional[str]:
        """Resolve the oracle to SQL (or None -> rows-only). Callable
        oracles may themselves return None (e.g. testdata missing at
        resolve time) — that degrades to a rows-only check instead of
        crashing the driver's collection pass."""
        if callable(self.oracle):
            return self.oracle()
        return self.oracle


def register(name: str, oracle: OracleSpec = None):
    """Decorator: @register("q_name", oracle="SELECT ...")."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle)
        return fn

    return deco


# Window head: the driver only records the FIRST 50 entries of
# queries() each round, so ordering is rotation state. The order is now
# computed from the CORRECTNESS_r*.json history on disk (see
# _driver_history): never-driver-checked queries come UNCONDITIONALLY
# first (VERDICT r4 item 1 — three r4 additions sat at positions 51-53
# and never got a row), then this round's re-adjudications (_RECHECK:
# queries whose output or oracle changed this round), then everything
# else, least-recently-checked first.
_RECHECK: tuple[str, ...] = (
    # r6 (VERDICT r5 item 1): the tier-2 list is deliberately minimal
    # this round so tier 3 (stalest-first) fills the window with the 49
    # queries whose latest driver check is r1/r2. The only entry is the
    # rows-only -> hash-checked conversion that needs a fresh driver row
    # to record its new oracle (VERDICT r5 item 2).
    "q_similarity_ivf",
    # r7 TODO (set at the START of r7 — editing tier 2 mid-r6 would
    # displace the stale set from THIS round's window): re-adjudicate
    # the r6-changed-output queries that could not fit the r6 window:
    # q_bpe_merges (3->8 rounds), q_dedup_source_matrix (tau 0.2->0.5),
    # q_robust_stats (rank frontier), q_dedup_lines (hashed window
    # key), q_stream_join_outer (watermark oracle), q_graph_trustrank
    # (oracle cleanup), q_stateful_ttl_event if its r6 row is missing,
    # q_doc_fingerprint (the one stale r2 row the window couldn't
    # hold), q_bpe_merges again + q_quality_repetition (late-r6
    # reshapes: pair-delta census / zero-shuffle row-local kernel),
    # q_graph_pagerank/bfs/sssp/trustrank/kcore (late-r6 edges
    # pre-partitioning, frontier messaging, and the k-core small-side
    # checkpoint — all plan-only), and q_dedup_clusters +
    # q_dedup_canonical (late-r6 connected_components edge
    # persist/partition — plan-only). All late-r6 reshapes keep outputs
    # unchanged and were locally oracle-verified at sf0.01 (text ones
    # also sf0.001), but the driver row should confirm. The reshaped
    # loops are additionally extracted as kernels and pinned by
    # pure-Python model laws (tests/test_properties.py laws 8-15), so
    # their correctness no longer rests on the stale driver rows alone.
    # Use tools/window_preview.py to check the 50-slot budget BEFORE
    # registering anything new in r7.
)

def _driver_history() -> dict[str, int]:
    """name -> latest round with a driver CORRECTNESS row, read from the
    committed CORRECTNESS_r*.json files at the repo root. Self-
    maintaining: a query absent from every file has never been driver-
    checked and must be ordered into the 50-entry window first."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, int] = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for name in rows:
            latest[name] = max(latest.get(name, 0), rnd)
    return latest


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
    from .operators import split_queries  # noqa: F401
    from .operators import graph_queries  # noqa: F401

    # Driver-priority ordering, three tiers inside the 50-entry window:
    #   1. never driver-checked (no CORRECTNESS row in any round) — in
    #      registration order; new queries ALWAYS land here;
    #   2. this round's re-adjudications (_RECHECK order);
    #   3. the rest, least-recently-checked round first, then
    #      registration order (rotates old greens back under the
    #      driver's eye across rounds).
    history = _driver_history()
    recheck = {name: i for i, name in enumerate(_RECHECK)}
    reg_pos = {name: i for i, name in enumerate(_REGISTRY)}
    ordered = sorted(
        _REGISTRY.items(),
        key=lambda kv: (
            kv[0] in history,  # tier 1: never-checked first
            recheck.get(kv[0], len(recheck)),  # tier 2
            history.get(kv[0], 0),  # tier 3: stalest first
            reg_pos[kv[0]],
        ),
    )
    return dict(ordered)


def query_fns() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sqls() -> dict[str, str]:
    out: dict[str, str] = {}
    for name, spec in all_queries().items():
        sql = spec.oracle_sql()
        if sql is not None:
            out[name] = sql
    return out
