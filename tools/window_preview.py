"""Preview the driver's 50-entry correctness window for THIS round.

The driver records a CORRECTNESS row only for the FIRST 50 entries of
``__spark_entry__.queries()``; ``registry.all_queries()`` orders that
window in three tiers (never-checked, _RECHECK, stalest-first). Every
round the budget math is the same: new + recheck + stale-you-want
must be <= 50, and each NEW query silently displaces the stalest
re-adjudication. This tool makes the composition visible BEFORE
committing a registration, instead of after the round's CORRECTNESS
file comes back short.

Usage:  python tools/window_preview.py [--window 50]
"""

from __future__ import annotations

import argparse
import os
import sys
from collections import Counter

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from confluent_example_firehose_spark.registry import (  # noqa: E402
    _RECHECK,
    _changed_since_checked,
    _driver_history,
    all_queries,
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--window", type=int, default=50)
    args = ap.parse_args()

    history = _driver_history()
    names = list(all_queries())
    changed = _changed_since_checked(history)
    win, rest = names[: args.window], names[args.window :]

    def tier(n: str) -> str:
        if n not in history:
            return "1:new"
        if n in _RECHECK:
            return "2:recheck"
        if n in changed:
            return f"2b:changed(r{history[n]})"
        return f"3:stale(r{history[n]})"

    print(f"registered queries: {len(names)}  window: {args.window}")
    print("window composition:", dict(Counter(tier(n) for n in win)))
    print()
    for i, n in enumerate(win):
        print(f"  {i + 1:3d}  {tier(n):16s} {n}")

    spill = [n for n in rest if n not in history]
    if spill:
        print(
            f"\nWARNING: {len(spill)} never-checked quer"
            f"{'y' if len(spill) == 1 else 'ies'} OUTSIDE the window "
            f"(will get no driver row this round): {spill}"
        )
    oldest_out = sorted(
        ((history.get(n, 0), n) for n in rest), key=lambda t: t
    )[:5]
    print("\nstalest entries left outside the window:")
    for rnd, n in oldest_out:
        print(f"  r{rnd}  {n}")
    return 1 if spill else 0


if __name__ == "__main__":
    raise SystemExit(main())
