#!/usr/bin/env python
"""Skew probe: run the correctness gate against a HOT-KEY copy of
sf0.01 — the shape a 100 TB purchase graph actually has (a handful of
mega-customers) that uniform TPC-H-ish generators never produce:

- orders: every even o_orderkey is remapped to ONE hot customer (the
  table's min o_custkey), concentrating ~50% of all purchase edges on
  a single src key;
- events: every even event_id is remapped to ONE hot user, so the
  per-user windows/sessions/funnels walk a single giant key — the
  shape a viral user gives a 100 TB event log;
- every other table is symlinked unchanged.

This stresses exactly the paths the scale story leans on: the graph
suite's src-keyed joins and degree aggregations (one super-node),
q_graph_triangles' per-customer cap (the hot customer must be capped
IDENTICALLY by Spark and the oracle), the TPC-H customer joins, and
AQE's skew-join handling. The oracle replays on the same skewed
parquet, so every row is hash-adjudicated, not just "didn't crash".

Usage: python tools/skew_probe.py [query ...]   # default: the
orders/lineitem consumers listed in DEFAULT

Builds /tmp/sf0.01_skew once per boot (delete to rebuild), then execs
tools/check_oracle.py against it."""

from __future__ import annotations

import os
import subprocess
import sys

import duckdb

BASE = "/root/testdata/sf0.01"
SKEW = "/tmp/sf0.01_skew"

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

DEFAULT = [
    # orders consumers (hot customer / graph super-node)
    "q_graph_bfs", "q_graph_pagerank", "q_graph_sssp",
    "q_graph_trustrank", "q_graph_kcore", "q_graph_triangles",
    "q_tpch_q3", "q_tpch_q5", "q_tpch_q18",
    "q_join_inner", "q_join_salted", "q_yoy_growth",
    # events consumers (hot user / giant session key)
    "q_window_session", "q_window_sliding", "q_last_value",
    "q_window_rank", "q_funnel", "q_cohort_retention",
    "q_ts_resample", "q_ts_rate", "q_window_tumbling",
]


def build() -> None:
    if os.path.isdir(SKEW):
        return
    os.makedirs(SKEW)
    con = duckdb.connect()
    for t in TABLES:
        src = f"{BASE}/{t}.parquet"
        dst = f"{SKEW}/{t}.parquet"
        if t == "orders":
            con.execute(f"""
            COPY (
                SELECT * EXCLUDE (o_custkey),
                       CASE WHEN o_orderkey % 2 = 0
                            THEN (SELECT min(o_custkey) FROM '{src}')
                            ELSE o_custkey END AS o_custkey
                FROM '{src}'
            ) TO '{dst}' (FORMAT PARQUET)
            """)
        elif t == "events":
            con.execute(f"""
            COPY (
                SELECT * EXCLUDE (user_id),
                       CASE WHEN event_id % 2 = 0
                            THEN (SELECT min(user_id) FROM '{src}')
                            ELSE user_id END AS user_id
                FROM '{src}'
            ) TO '{dst}' (FORMAT PARQUET)
            """)
        else:
            os.symlink(src, dst)
    con.close()


def main() -> int:
    build()
    cmd = [
        sys.executable,
        os.path.join(os.path.dirname(__file__), "check_oracle.py"),
        SKEW,
        *(sys.argv[1:] or DEFAULT),
    ]
    return subprocess.call(cmd)


if __name__ == "__main__":
    sys.exit(main())
