"""Decompose headline-query wall time: DataFrame construction (driver,
Catalyst not yet invoked), first count (includes analysis+optimization+
codegen+execution), and steady-state repeats — per query.

Optimization-round measurement tool (guide section 1: measure first).

Usage: python tools/profile_headliners.py [sf_dir] [runs] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from confluent_example_firehose_spark.caching import drain_pending
from confluent_example_firehose_spark.flagship import flagship
from confluent_example_firehose_spark.registry import query_fns
from confluent_example_firehose_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    names = sys.argv[3:]
    if not names:
        import bench

        names = list(bench.HEADLINE)

    spark = get_spark(app_name="profile_headliners")
    fns = dict(query_fns())
    fns["q_flagship"] = lambda s, d: flagship(s, d)

    # Warm at sf0.001 like bench.py (JVM/codegen warmup excluded).
    warm = "/root/testdata/sf0.001"
    for name in names:
        fns[name](spark, warm).count()
    drain_pending()
    spark.catalog.clearCache()

    out = {}
    for name in names:
        fn = fns[name]
        build_ts, exec_ts = [], []
        for _ in range(runs):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.count()
            t2 = time.perf_counter()
            build_ts.append(round(t1 - t0, 4))
            exec_ts.append(round(t2 - t1, 4))
            drain_pending()
            spark.catalog.clearCache()
        out[name] = {
            "build": build_ts,
            "exec": exec_ts,
            "best_total": round(
                min(b + e for b, e in zip(build_ts, exec_ts)), 4
            ),
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"total_best": round(sum(v["best_total"] for v in out.values()), 4)}))
    spark.stop()


if __name__ == "__main__":
    main()
