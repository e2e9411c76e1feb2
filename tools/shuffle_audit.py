#!/usr/bin/env python
"""Shuffle audit: executed-plan metrics for every bench headline query.

For each query in bench.py's HEADLINE set (plus any names passed on the
command line), runs the registered implementation at the target SF and
reads the EXECUTED plan's metric registry via
plans.inspect.execution_metrics — the same numbers the Spark UI shows —
then reports per query:

  exchanges        distinct shuffle-exchange nodes in the final plan
  shuffle_mb       total shuffleBytesWritten across them (MiB)
  shuffle_rows     total shuffleRecordsWritten
  spill_mb         total memory+disk spill (MiB; any nonzero is a flag)
  out_rows         result rows

This is the "is there a shuffle here that becomes the bottleneck at
100x" question asked mechanically: a query whose shuffle_rows is
O(input rows) re-partitions the corpus; one whose shuffle carries only
aggregates/candidates survives the scale-up. Results are pasted into
SCALE.md's audit table.

Usage: python tools/shuffle_audit.py [sf_dir] [query ...]

With --session-delta, measures by diffing the AppStatusStore's
cumulative stage totals (plans.inspect.session_shuffle_totals) around
each query instead of walking its final plan: iterative operators
shuffle in construction-time jobs against eager checkpoints that the
final plan never shows, and the delta mode charges them those rounds.
Run it on an otherwise-idle session — deltas include every stage the
context runs."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from confluent_example_firehose_spark.plans.inspect import execution_metrics
from confluent_example_firehose_spark.registry import query_fns
from confluent_example_firehose_spark.session import get_spark

SHUFFLE_WRITE_BYTES = {"shuffleBytesWritten", "dataSize"}


def audit(df) -> dict[str, float]:
    metrics = execution_metrics(df)
    ex_nodes = set()
    sh_bytes = sh_rows = spill = out_rows = 0
    for node, key, val in metrics:
        is_exchange = node.startswith(("Exchange", "ShuffleExchange"))
        if is_exchange:
            ex_nodes.add((node, id(node)))
        if key == "shuffleBytesWritten":
            sh_bytes += val
        elif key == "shuffleRecordsWritten":
            sh_rows += val
        elif key in ("spillSize", "memoryBytesSpilled", "diskBytesSpilled"):
            spill += val
    # exchange count from the formatted plan (metric walk can't
    # distinguish node instances reliably once AQE reuses stages)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_ex = plan.count("Exchange ")
    out_rows = df.count()
    return {
        "exchanges": n_ex,
        "shuffle_mb": round(sh_bytes / 2**20, 2),
        "shuffle_rows": sh_rows,
        "spill_mb": round(spill / 2**20, 2),
        "out_rows": out_rows,
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--session-delta"]
    session_delta = "--session-delta" in sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    only = args[1:] if args and os.path.isdir(args[0]) else args

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import importlib

    bench = importlib.import_module("bench")
    names = only or bench.HEADLINE

    spark = get_spark("shuffle-audit")
    fns = query_fns()
    if session_delta:
        import time

        from confluent_example_firehose_spark.plans.inspect import (
            session_shuffle_totals,
        )

        print("| query | shuffle MiB | shuffle rows | spill MiB | out rows | sec |")
        print("|---|---|---|---|---|---|")
        for name in names:
            if name == "q_flagship":
                from confluent_example_firehose_spark.flagship import flagship

                fn = lambda s, d: flagship(s, d)  # noqa: E731
            else:
                fn = fns[name]
            before = session_shuffle_totals(spark)
            t0 = time.time()
            out_rows = fn(spark, sf_dir).count()
            secs = time.time() - t0
            after = session_shuffle_totals(spark)
            mb = (after["shuffle_bytes"] - before["shuffle_bytes"]) / 2**20
            rows = after["shuffle_records"] - before["shuffle_records"]
            sp = (after["spill_bytes"] - before["spill_bytes"]) / 2**20
            print(
                f"| {name} | {mb:.2f} | {rows} | {sp:.2f} "
                f"| {out_rows} | {secs:.2f} |",
                flush=True,
            )
        return
    print("| query | exchanges | shuffle MiB | shuffle rows | spill MiB | out rows |")
    print("|---|---|---|---|---|---|")
    for name in names:
        if name == "q_flagship":
            from confluent_example_firehose_spark.flagship import flagship

            df = flagship(spark, sf_dir)
        else:
            df = fns[name](spark, sf_dir)
        a = audit(df)
        print(
            f"| {name} | {a['exchanges']} | {a['shuffle_mb']} "
            f"| {a['shuffle_rows']} | {a['spill_mb']} | {a['out_rows']} |",
            flush=True,
        )


if __name__ == "__main__":
    main()
