#!/usr/bin/env python
"""Generate QUERIES.md: the declared-query inventory, from the registry
(so it can never drift from the code). Run: python tools/gen_queries_md.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from confluent_example_firehose_spark import registry  # noqa: E402


def first_line(doc: str | None) -> str:
    if not doc:
        return ""
    lines = [ln.strip() for ln in doc.strip().splitlines()]
    out = []
    for ln in lines:
        if not ln:
            break
        out.append(ln)
    return " ".join(out)


def main() -> None:
    qs = registry.all_queries()
    n_sql = sum(1 for s in qs.values() if s.oracle)
    rows = []
    for name in sorted(qs):
        spec = qs[name]
        mod = spec.fn.__module__.rsplit(".", 1)[-1]
        check = "DuckDB hash-match" if spec.oracle else "rows-only"
        rows.append((name, mod, check, first_line(spec.fn.__doc__)))
    with open("QUERIES.md", "w") as f:
        f.write(
            "# QUERIES — declared query inventory\n\n"
            "Auto-generated from the registry by `tools/gen_queries_md.py`"
            " — regenerate after adding queries; do not edit by hand.\n\n"
            f"**{len(qs)} queries: {n_sql} checked by DuckDB oracle "
            f"(row-count + schema + order-insensitive value-hash at "
            f"sf0.01), {len(qs) - n_sql} rows-only (streaming / "
            f"approximate / implementation-defined outputs).**\n\n"
            "| query | module | check | what it demonstrates |\n"
            "|---|---|---|---|\n"
        )
        for name, mod, check, doc in rows:
            doc = doc.replace("|", "\\|")
            f.write(f"| `{name}` | {mod} | {check} | {doc} |\n")
    print(f"QUERIES.md: {len(qs)} queries ({n_sql} oracle-checked)")


if __name__ == "__main__":
    main()
