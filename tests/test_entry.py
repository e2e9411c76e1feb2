"""Smoke: driver contract — entry() runs, queries()/oracle_sql() align."""

from __future__ import annotations

import importlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

entry_mod = importlib.import_module("__spark_entry__")


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "last_value" in df.columns


def test_registry_consistency(spark):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert qs, "no queries registered"
    # every oracle key must have a query
    assert set(oracles) <= set(qs)


def test_each_query_runs_smoke(spark, sf_dir):
    for name, fn in entry_mod.queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, f"{name} returned no columns"
        df.limit(1).collect()
