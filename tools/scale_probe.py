#!/usr/bin/env python
"""Scale probe: wall-time representative heavy queries at three scale
factors (sf0.001 / sf0.01 / sf0.1 — 10x data per step) and report the
step ratios. Near-or-below-10x ratios on a 10x step are the empirical
signal that a query's plan scales with data volume (no superlinear
shuffle/sort/window term); markedly superlinear ratios flag a plan to
re-audit. Results land in SCALE.md.

Usage: python tools/scale_probe.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from confluent_example_firehose_spark.registry import query_fns  # noqa: E402
from confluent_example_firehose_spark.session import get_spark  # noqa: E402

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]

DEFAULT = [
    "q_dedup_near",
    "q_dedup_simhash",
    "q_pack_firstfit",
    "q_mixture_sample",
    "q_quality_repetition",
    "q_inverted_index",
    "q_ngram_topk",
    "q_corpus_curation",
    "q_tpch_q5",
    "q_funnel",
    "q_cohort_retention",
    "q_embed_quantize",
]


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    fns = query_fns()
    spark = get_spark("scale-probe")
    # warm the JVM/codegen once so sf0.001 isn't charged the startup
    fns["q_agg_basic"](spark, SFS[0]).collect()
    print("| query | sf0.001 s | sf0.01 s | sf0.1 s | r(0.01/0.001) | r(0.1/0.01) |")
    print("|---|---|---|---|---|---|")
    for name in names:
        times = []
        for sf in SFS:
            t0 = time.monotonic()
            fns[name](spark, sf).collect()
            times.append(time.monotonic() - t0)
        r1 = times[1] / times[0]
        r2 = times[2] / times[1]
        print(
            f"| {name} | {times[0]:.2f} | {times[1]:.2f} | {times[2]:.2f} "
            f"| {r1:.1f}x | {r2:.1f}x |"
        )


if __name__ == "__main__":
    main()
