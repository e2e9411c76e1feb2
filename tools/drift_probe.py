#!/usr/bin/env python
"""Drift probe: run the correctness gate against a PERTURBED copy of
sf0.01 — the corpus shapes the driver's regenerated testdata could
legally throw at us that today's data happens not to contain:

- documents: tab / newline / double-space separators injected into a
  third of the texts (doc_id %% 7 / 11 / 13), plus an empty-text doc,
  a NULL-text doc, a 1-word doc, and a 2-word doc (below the shingle
  threshold);
- embeddings: one empty vector appended;
- events: a new 'drift_const' event type with a CONSTANT value and a
  single-user, single-day footprint — zero variance / zero spread is
  division-by-zero bait for every per-type regression, correlation,
  and quantile aggregate under ANSI mode.

Every oracle is supposed to state engine-portable semantics (words()
splits \\s+; list ops guard len > 0); this probe proves it on data
that exercises the guards instead of trusting the comment. Usage:

    python tools/drift_probe.py [query ...]   # default: full suite

Builds /tmp/sf0.01_drift once per boot (delete to rebuild), then execs
tools/check_oracle.py against it.
"""

from __future__ import annotations

import os
import subprocess
import sys

import duckdb

BASE = "/root/testdata/sf0.01"
DRIFT = "/tmp/sf0.01_drift"

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def build() -> None:
    if os.path.isdir(DRIFT):
        return
    os.makedirs(DRIFT)
    con = duckdb.connect()
    for t in TABLES:
        src = f"{BASE}/{t}.parquet"
        dst = f"{DRIFT}/{t}.parquet"
        if t == "documents":
            con.execute(f"""
            COPY (
                SELECT doc_id,
                       CASE WHEN doc_id % 7 = 0
                                THEN replace(text, ' ', chr(9))
                            WHEN doc_id % 11 = 0
                                THEN replace(text, ' ', '  ')
                            WHEN doc_id % 13 = 0
                                THEN replace(text, ' ', chr(10))
                            WHEN doc_id % 17 = 0
                                THEN replace(text, ' ', chr(11))
                            WHEN doc_id % 19 = 0
                                THEN replace(text, ' ', chr(12) || chr(13))
                            ELSE text END AS text,
                       lang, source, n_chars
                FROM '{src}'
                UNION ALL
                SELECT * FROM (VALUES
                    (9000, '', 'en', 'drift', 0),
                    (9001, 'solo', 'en', 'drift', 4),
                    (9002, 'two words', 'en', 'drift', 9),
                    (9003, NULL, 'en', 'drift', 0))
                    v(doc_id, text, lang, source, n_chars)
            ) TO '{dst}' (FORMAT PARQUET)
            """)
        elif t == "events":
            con.execute(f"""
            COPY (
                SELECT * FROM '{src}'
                UNION ALL
                SELECT 900000 + i AS event_id,
                       (SELECT min(ts) FROM '{src}')
                           + to_microseconds(i * 1000000) AS ts,
                       777777 AS user_id,
                       'drift_const' AS event_type,
                       42.0 AS value,
                       '{{}}' AS props
                FROM range(5) t(i)
            ) TO '{dst}' (FORMAT PARQUET)
            """)
        elif t == "embeddings":
            con.execute(f"""
            COPY (
                SELECT * FROM '{src}'
                UNION ALL
                SELECT 9000 AS vec_id, []::FLOAT[] AS embedding,
                       0 AS label
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
        DRIFT,
        *sys.argv[1:],
    ]
    return subprocess.call(cmd)


if __name__ == "__main__":
    sys.exit(main())
