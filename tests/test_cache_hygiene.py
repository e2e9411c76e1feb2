"""Cache-lifecycle hygiene gate (VERDICT r9 item 7 / ADVICE r8 item 4).

Two pins:
1. DYNAMIC: every query that persists a builder census now materializes
   its result and unpersists the builders (caching.py). After running
   each such query, any NEW entry in the context's persistent-RDD map
   must be a locally-checkpointed result block (owned by the returned
   frame, reclaimed with it by the ContextCleaner) — never a leaked
   .persist() that would live until session end.
2. STATIC: a source lint over the whole package — any function that
   calls .persist() must also release it in the same function
   (unpersist / materialize_unpersist), so a future operator can't
   silently reintroduce the leak.
"""

from __future__ import annotations

import ast
import os

import pytest

from confluent_example_firehose_spark.registry import query_fns

# Queries whose plans persist a builder frame (shingle hashes, SimHash
# fingerprints, term censuses, cluster assignments, range-partitioned
# layouts). Each must come back with zero non-checkpoint cache residue.
PERSISTING = [
    "q_cms_topk",
    "q_nb_classify",
    "q_dsir_sample",
    "q_dedup_semantic",
    "q_dedup_near",
    "q_dedup_simhash",
    "q_dedup_simhash8",
    "q_dedup_source_matrix",
    "q_split_leakage",
    "q_zorder_layout",
]

PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "confluent_example_firehose_spark",
)


def _persistent_ids(spark) -> dict[int, "object"]:
    out = {}
    it = spark.sparkContext._jsc.getPersistentRDDs().entrySet().iterator()
    while it.hasNext():
        e = it.next()
        out[e.getKey()] = e.getValue()
    return out


@pytest.mark.parametrize("name", PERSISTING)
def test_no_leaked_persists(spark, sf_dir, name):
    """After collect + the next drain point, zero non-checkpoint cache
    residue. Queries on the r11 DEFERRED path (materialize_unpersist
    defer=True) hold their builder caches until drain_pending() — the
    production drain points are the driver-contract wrapper, the bench
    loop, and the suite's per-test autouse fixture — so the property
    is asserted exactly where the production session would stand
    before the NEXT query runs."""
    from confluent_example_firehose_spark.caching import drain_pending

    before = set(_persistent_ids(spark))
    fns = query_fns()
    df = fns[name](spark, sf_dir)
    df.collect()
    drain_pending()
    leaked = []
    for rid, jrdd in _persistent_ids(spark).items():
        if rid in before:
            continue
        if not jrdd.rdd().isLocallyCheckpointed():
            leaked.append(rid)
    assert not leaked, (
        f"{name} left non-checkpoint persisted RDDs {leaked} — a "
        "builder cache outlived the query+drain lifecycle; release it "
        "via caching.materialize_unpersist / drain_pending"
    )


def test_every_persist_site_released_in_function():
    """AST lint: in every package module, a function whose source
    contains a .persist( call must also contain unpersist or
    materialize_unpersist — the cache's lifecycle must close where it
    opens."""
    offenders = []
    for dirpath, _dirs, files in os.walk(PKG):
        for fname in files:
            if not fname.endswith(".py"):
                continue
            path = os.path.join(dirpath, fname)
            with open(path) as f:
                src = f.read()
            if ".persist(" not in src:
                continue
            tree = ast.parse(src)
            for node in ast.walk(tree):
                if not isinstance(
                    node, (ast.FunctionDef, ast.AsyncFunctionDef)
                ):
                    continue
                body = ast.get_source_segment(src, node) or ""
                if ".persist(" in body and not (
                    "unpersist" in body or "materialize_unpersist" in body
                ):
                    offenders.append(f"{fname}:{node.lineno} {node.name}")
    assert not offenders, (
        "persist() without same-function release: " + ", ".join(offenders)
    )
