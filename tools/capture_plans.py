"""Capture .explain('formatted') output for named queries into plans/rNN/.

Optimization-round evidence tool: the judge checks plan claims
(Exchange counts, join strategies, PushedFilters, Python-eval nodes)
against these committed files, since it cannot run Spark itself.

Usage:
  python tools/capture_plans.py <out_dir> <suffix> [sf_dir] [query ...]

  out_dir  e.g. plans/r13
  suffix   'before' or 'after' -> plans/r13/<query>_<suffix>.txt
  sf_dir   default /root/testdata/sf0.1 (plan shape, not speed, is the
           point -- but the adaptive dedup branches decide from data, so
           capture at the bench SF the claims are about)
  query    default: the bench HEADLINE list
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from confluent_example_firehose_spark.caching import drain_pending
from confluent_example_firehose_spark.flagship import flagship
from confluent_example_firehose_spark.registry import query_fns
from confluent_example_firehose_spark.session import get_spark


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(2)
    out_dir, suffix = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    names = sys.argv[4:]
    if not names:
        import bench

        names = list(bench.HEADLINE)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app_name="capture_plans")
    fns = dict(query_fns())
    fns["q_flagship"] = lambda s, d: flagship(s, d)

    for name in names:
        fn = fns.get(name)
        if fn is None:
            print(f"SKIP {name}: not registered")
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # capture the failure as evidence too
            plan = f"ERROR capturing plan: {e}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"-- {name} @ {sf_dir} ({suffix})\n")
            f.write(plan)
        print(f"WROTE {path}")
        drain_pending()
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
