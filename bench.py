#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is the registered engine implementation (same callables the
driver's correctness gate runs); timing is wall-clock around a full
materialization (count + a cheap projection collect to force every
column's evaluation without driver-side result bloat).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: one per operator family (SURVEY.md §2) — the firehose
# core, relational breadth, and the north-star extensions.
HEADLINE = [
    "q_flagship",          # scan→parse→map ops→broadcast enrich→last-value
    "q_json_parse",        # from_json schema projection
    "q_last_value",        # keyed latest-value agg (gauge-cache twin)
    "q_lookup_enrich",     # broadcast dictionary join
    "q_agg_basic",         # partial+final hash agg over lineitem
    "q_join_inner",        # multi-table equi join
    "q_window_rank",       # ranking window functions
    "q_topk",              # global sort/limit
    "q_rollup_cube",       # grouping sets
    "q_tpch_q3",           # 3-way join + top-k
    "q_tpch_q5",           # 6-way join
    "q_window_session",    # session windows (gaps-and-islands twin)
    "q_dedup_exact",       # exact dedup over documents
    "q_dedup_near",        # minhash-LSH near-dup
    "q_dedup_simhash",     # simhash blocking near-dup
    "q_similarity_topk",   # brute-force cosine top-k over embeddings
    "q_text_tokens",       # tokenize+explode+count
    "q_corpus_curation",   # composite curation pipeline (filter→dedup→stats)
]


# Single-thread reference speed: the box measured ~150 ms on this spin
# when BENCH_r06's 7.86 s was recorded — the yardstick every normalized
# total is expressed against (VERDICT r7 item 5).
SPIN_REF_MS = 150.0


def _spin_ms() -> float:
    """Fixed pure-Python spin: absolute single-thread speed canary."""
    t0 = time.perf_counter()
    acc = 0
    for i in range(5_000_000):
        acc += i
    return round((time.perf_counter() - t0) * 1000, 1)


def _spin_worker(_):
    acc = 0
    for i in range(5_000_000):
        acc += i
    return acc


def _spin_par_ms(procs: int = 8) -> float:
    """Wall time for `procs` concurrent spins (separate processes).
    On an uncontended box this tracks the single-thread spin; under
    noisy-neighbor contention it inflates far more — the r8 failure
    mode the 1-thread canary under-measured (spin 204→286 ms while
    the 32-thread bench total tripled). Compare spin_par/spin across
    rounds to separate CPU-speed drift from parallel contention.

    Spawn, not fork: this runs in a process hosting a live JVM/py4j
    and its helper threads — fork-with-threads is undefined-behavior
    territory (ADVICE r8). The workers are self-contained module-level
    functions, so spawn's re-import is cheap; the timed region is the
    map, after the pool is up."""
    import multiprocessing as mp

    with mp.get_context("spawn").Pool(procs) as pool:
        pool.map(_spin_worker, range(procs))  # warm: absorb spawn cost
        t0 = time.perf_counter()
        pool.map(_spin_worker, range(procs))
        return round((time.perf_counter() - t0) * 1000, 1)


# Box-cleanliness envelope (VERDICT r10 item 4): r10's four idle-start
# closing sessions swung 9.74-11.82 s raw with parallel capacity
# varying ~35% between sessions; the two-canary protocol made that
# visible, this gate makes it a recorded verdict. A number is "clean"
# only when parallel contention is low (spin_par within PAR_RATIO_MAX
# of the single-thread spin — on an uncontended >=8-core box the two
# track each other) AND the PRE-RUN 1-minute loadavg is below
# LOADAVG_START_MAX (sampled before the JVM starts: the bench's own
# local[32] load is common-mode and must not mask a dirty start).
# Records outside the envelope are ANNOTATED, not refused — the
# per-round driver needs its JSON line unconditionally; the builder's
# closing protocol sets SPARK_GRAFT_BENCH_REQUIRE_CLEAN=1, under which
# a dirty record exits non-zero (median-of->=3 sessions is then the
# documented fallback).
PAR_RATIO_MAX = 1.3
LOADAVG_START_MAX = 1.5


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    try:
        loadavg_start = round(os.getloadavg()[0], 2)
    except OSError:
        loadavg_start = None
    # sf parsed from the dir name (sf0.1 -> 0.1); fall back to 0.1
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        sf = float(base.replace("sf", ""))
    except ValueError:
        sf = 0.1

    os.environ["SPARK_GRAFT_CPUS"] = cpus  # get_spark sizes local[N] from this
    from confluent_example_firehose_spark.session import get_spark
    from confluent_example_firehose_spark.registry import query_fns
    from confluent_example_firehose_spark.flagship import flagship

    spark = get_spark(app_name="bench")

    fns = dict(query_fns())
    fns["q_flagship"] = lambda s, d: flagship(s, d)

    # Steady-state measurement: run every headline query once, untimed,
    # at the smallest SF first. This compiles each query's whole-stage
    # codegen units, classloads the interpreted HOF paths, and spins up
    # the Arrow/pandas-UDF workers — one-time constants that at 100 TB
    # amortize to zero but at sf0.1 dominated several queries (measured:
    # q_dedup_near 22.6 s cold vs 2.4 s steady-state in one session).
    # The timed pass below still pays ALL per-run work (scan, shuffle,
    # persist) at the target SF — only JVM warmup is excluded.
    spin_before = _spin_ms()
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    from confluent_example_firehose_spark.caching import drain_pending

    for name in HEADLINE:
        fn = fns.get(name)
        if fn is not None:
            fn(spark, warm_dir).count()
    drain_pending()  # release deferred builder caches (list + RDDs)
    spark.catalog.clearCache()  # drop warmup persists

    # Min of 3 timed runs per query: single-run numbers on a shared
    # local[32] box swing 2-5x on GC/OS noise (measured back-to-back
    # totals of 29.2 s vs 21.0 s with identical plans; r5 saw the same
    # code measure 1.3 s and 2.3 s on consecutive idle-box runs at
    # min-of-2); min-of-N is the standard steady-state convention and
    # stays honest — every run pays its full scan/shuffle/persist cost
    # at the target SF.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    # INTERLEAVED mode (VERDICT r13 item 2, opt-in, additions-only):
    # SPARK_GRAFT_BENCH_INTERLEAVED=1 round-robins the N runs ACROSS
    # queries (N full passes over the headline list) instead of running
    # each query's N back-to-back, so on a box with bursty hypervisor
    # steal every query samples the same contention epochs and the
    # per-query minima stay comparable to each other. Methodology is
    # otherwise identical (same queries, same count() action, same
    # min-of-N, same cache drain between runs); the default path is
    # unchanged and remains the driver-comparable record.
    interleaved = bool(os.environ.get("SPARK_GRAFT_BENCH_INTERLEAVED"))
    timings: dict[str, float] = {}
    if interleaved:
        for _ in range(runs):
            for name in HEADLINE:
                fn = fns.get(name)
                if fn is None:
                    continue
                t0 = time.perf_counter()
                fn(spark, sf_dir).count()
                elapsed = time.perf_counter() - t0
                if name not in timings or elapsed < timings[name]:
                    timings[name] = elapsed
                drain_pending()
                spark.catalog.clearCache()
        timings = {
            name: round(timings[name], 4)
            for name in HEADLINE
            if name in timings
        }
    else:
        for name in HEADLINE:
            fn = fns.get(name)
            if fn is None:
                continue
            best = None
            for _ in range(runs):
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                df.count()  # rows materialized; count forces execution
                elapsed = time.perf_counter() - t0
                best = elapsed if best is None else min(best, elapsed)
                # Queries that persist() intermediates (dedup/simhash)
                # must not leak cache into the next run's or query's
                # numbers.
                drain_pending()
                spark.catalog.clearCache()
            timings[name] = round(best, 4)
    total = round(sum(timings.values()), 4)

    # Environment snapshot: round-over-round BENCH deltas on a shared
    # box are meaningless without the load context (r3's uniform ~2x
    # "gain" tracked box load, not code — VERDICT r3).
    env: dict[str, object] = {"cpus": int(cpus), "runs": runs}
    if interleaved:
        env["interleaved"] = True
    try:
        env["loadavg_1m"], env["loadavg_5m"], env["loadavg_15m"] = (
            round(x, 2) for x in os.getloadavg()
        )
    except OSError:
        pass
    try:
        with open("/proc/meminfo") as f:
            mem = {
                line.split(":")[0]: int(line.split()[1])
                for line in f
                if ":" in line
            }
        env["mem_available_gib"] = round(mem["MemAvailable"] / 1048576, 1)
    except (OSError, KeyError, ValueError):
        pass
    # Single-thread speed canary (r7): loadavg alone missed a ~1.6x
    # box-wide slowdown burst (every query uniformly slower at loadavg
    # ~2). Sampled BEFORE the warmup pass and again here (r8): the box
    # drifts within one bench run, and a cold/loaded recording is
    # otherwise indistinguishable from a code regression (BENCH_r07's
    # 16.37 s was a 2.08x line on unchanged code at spin ~198-280 vs
    # r6's ~150). spin_ms keeps the r7 meaning (the post-run sample).
    spin_after = _spin_ms()
    spin_par = _spin_par_ms()
    env["spin_ms_before"] = spin_before
    env["spin_ms"] = spin_after
    env["spin_par_ms"] = spin_par
    env["loadavg_1m_start"] = loadavg_start
    spin_mean = (spin_before + spin_after) / 2 or SPIN_REF_MS

    # Cleanliness verdict (VERDICT r10 item 4) — see the envelope
    # comment above main().
    par_ratio = round(spin_par / spin_mean, 3)
    clean = par_ratio <= PAR_RATIO_MAX and (
        loadavg_start is None or loadavg_start <= LOADAVG_START_MAX
    )
    env_gate = {
        "par_ratio": par_ratio,
        "loadavg_1m_start": loadavg_start,
        "par_ratio_max": PAR_RATIO_MAX,
        "loadavg_start_max": LOADAVG_START_MAX,
        "clean": clean,
    }
    # Self-normalizing line (VERDICT r7 item 5): the recorded JSON
    # carries its own box-drift correction — value scaled to what the
    # same run would measure at the r6-reference single-thread speed.
    value_norm = round(total * SPIN_REF_MS / spin_mean, 4)

    print(
        json.dumps(
            {
                "metric": "headline_total_wall",
                "value": total,
                "value_canary_normalized": value_norm,
                "canary_ref_ms": SPIN_REF_MS,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "env": env,
                "env_gate": env_gate,
            }
        )
    )
    spark.stop()
    if not clean and os.environ.get("SPARK_GRAFT_BENCH_REQUIRE_CLEAN"):
        print(
            f"bench: box outside cleanliness envelope "
            f"(par_ratio={par_ratio} max={PAR_RATIO_MAX}, "
            f"loadavg_1m_start={loadavg_start} max={LOADAVG_START_MAX}) "
            f"— not a closing-record session; take the median of >=3",
            file=sys.stderr,
        )
        sys.exit(3)


if __name__ == "__main__":
    main()
