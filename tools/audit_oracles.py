"""Oracle canonicalization audit — kills driver-hash degrees of freedom.

The driver's correctness gate hashes stringified values; anything that
stringifies differently between Spark and DuckDB even when values are
EQUAL is a latent hash-fail. r3 proved this: DuckDB sum(BIGINT) returns
HUGEINT (arrow decimal128, pandas float64) while Spark returns BIGINT,
so '6690.0' vs '6690' hash-mismatched three queries that were bit-exact
under the value-level local checker.

For every registered query with an oracle this tool reports:
  1. TYPE-CLASS MISMATCH: per-column arrow type classes (int / float /
     decimal / string / timestamp / date / bool / binary / list) that
     differ between the Spark result and the DuckDB result — the exact
     r3 failure mode, caught mechanically.
  2. EXACT VALUE DIFF: full-precision comparison (float.hex for doubles
     — no rounding anywhere), sorted canonical rows; first diff shown.
  3. UNROUNDED DOUBLE: a float column whose values are not fixed-point
     at <=6 decimal digits (i.e. the query emits raw float arithmetic
     that may differ at ULP level between engines).

Canonical full-precision row dumps are written to DUMPS/<query>.txt
(one file, spark/duck sections) so any future driver-red can be diffed
against the exact rows this session produced instead of re-guessed.
Dumps over MAX_DUMP_ROWS are elided to keep the repo small; every query
always gets a row in DUMPS/MANIFEST.txt (rows + sha256 of the canonical
spark dump), so drift on the big results is still detectable.

Usage: python tools/audit_oracles.py [sf_dir] [query ...]
Exit 1 on any type-class mismatch or exact value diff (unrounded-double
findings are warnings: some queries legitimately emit raw doubles whose
exactness is proven by integer provenance).
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, "/root/repo")

import duckdb
import pyarrow as pa

from confluent_example_firehose_spark.registry import all_queries
from confluent_example_firehose_spark.schema import TABLE_NAMES
from confluent_example_firehose_spark.session import get_spark

DUMPS_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "DUMPS")
MAX_DUMP_ROWS = 1000


def type_class(t: pa.DataType) -> str:
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "list"
    return str(t)


def exact_cell(v) -> str:
    """Full-precision canonical string: float.hex for floats (ULP-exact),
    ISO for timestamps, str otherwise. No rounding anywhere."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v.hex()
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


# Documented unrounded-double allowlist (VERDICT r9 item 6): (query,
# column) pairs that legitimately emit raw float arithmetic because the
# pinned cross-engine law is BIT-exactness of the producing expression
# — rounding them would mask the stronger property (an ULP divergence
# regression would hide inside the rounding) and is therefore wrong,
# not just unnecessary. Three provenance families:
#   cosine    — both engines compute the identical dimension-sequential
#               fold (functions/vector.cosine == DuckDB
#               list_cosine_similarity replay / list_reduce), proven
#               bit-identical; the exact-diff gate above compares
#               float.hex, so the law IS exercised on every audit run.
#   per-row product — a single IEEE multiply/divide of two column
#               values with no aggregation (order-independent).
#   exact-int quotient/log sums with deterministic term order — each
#               term is a pure function of exact int64 counts and the
#               summation order is pinned by construction (<= a handful
#               of terms combined in rank order).
# Any (query, column) NOT listed here still warns — new raw-float
# output must either be rounded or justified by extending this table.
_COS = (
    "bit-identical dimension-sequential cosine fold on both engines "
    "(functions/vector.cosine vs the oracle's list replay); unrounded "
    "BY DESIGN — the pinned law is fold bit-exactness"
)
_INT_QUOT = (
    "single IEEE division of exact-int64-derived operands; no "
    "order-sensitive accumulation anywhere in the expression"
)
_ROW_EXPR = (
    "per-row arithmetic on stored column values only (no aggregation) "
    "— IEEE-deterministic independent of row order"
)
_RAW = "raw stored column value passthrough/selection — no arithmetic"
_SUM2DP = (
    "aggregate over 2-dp fixed-point doubles: sum-order-sensitive in "
    "principle, measured bit-identical across engines at sf0.001/0.01/"
    "0.1 since r3 (both reduce in on-disk row order at oracle scales) "
    "and ENFORCED by this tool's float.hex exact-diff on every run — a "
    "future divergence fails the audit at the right detection point; "
    "rounding instead would repoint long-stable driver hashes"
)
UNROUNDED_ALLOWLIST: dict[tuple[str, str], str] = {
    ("q_ann_index_stream", "cos"): _COS,
    ("q_dedup_embed", "cos"): _COS,
    ("q_dedup_embed_ingest", "cos"): _COS,
    ("q_dedup_semantic", "cos"): _COS,
    ("q_similarity_ivf", "cos"): _COS,
    ("q_similarity_lsh", "cos"): _COS,
    ("q_similarity_lsh_multiprobe", "cos"): _COS,
    ("q_similarity_topk", "cos"): _COS,
    ("q_multimodal_join", "e0"): _RAW,
    ("q_tpch_q2", "unit_cost"): _RAW,
    ("q_filter_project", "revenue"): _ROW_EXPR,
    ("q_ts_rate", "rate_per_sec"): _ROW_EXPR,
    ("q_hybrid_rrf", "rrf"): (
        "fixed-order sum of <= 2 reciprocals of exact integer ranks — "
        "identical term order by construction on both engines (r7 "
        "integer-rank-fusion recipe)"
    ),
    ("q_contamination", "contamination"): _INT_QUOT,
    ("q_text_quality", "avg_word_len"): _INT_QUOT,
    ("q_text_quality", "stop_ratio"): _INT_QUOT,
    ("q_text_quality", "ttr"): _INT_QUOT,
    ("q_window_ntile", "pct_rank"): _INT_QUOT,
    ("q_window_ntile", "cume"): _INT_QUOT,
    ("q_agg_basic", "avg_qty"): _INT_QUOT,
    ("q_tpch_q1", "avg_qty"): _INT_QUOT,
    ("q_agg_basic", "avg_price"): _SUM2DP,
    ("q_agg_basic", "avg_disc"): _SUM2DP,
    ("q_tpch_q1", "avg_price"): _SUM2DP,
    ("q_tpch_q1", "avg_disc"): _SUM2DP,
    ("q_pandas_udaf", "wavg_value"): _SUM2DP,
    ("q_tpch_q14", "promo_revenue"): _SUM2DP,
    ("q_tpch_q17", "avg_yearly"): _SUM2DP,
    ("q_tpch_q8", "mkt_share"): _SUM2DP,
}


def _allow_reason(name: str, col: str) -> str | None:
    return UNROUNDED_ALLOWLIST.get((name, col))


def unrounded(v: float) -> bool:
    """True if v is not representable as a <=6-decimal-digit fixed-point
    number — i.e. the query emitted raw float arithmetic."""
    if v is None or math.isnan(v) or math.isinf(v):
        return False
    return round(v, 6) != v


def canon_rows(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(exact_cell(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # callable oracles (data-dependent literals) read this dir
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir
    only = set(sys.argv[2:])
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    spark = get_spark("oracle-audit")
    os.makedirs(DUMPS_DIR, exist_ok=True)
    manifest: list[str] = []
    n_fail = n_warn = n_ok = n_allow = 0
    for name, spec in sorted(all_queries().items()):
        if only and name not in only:
            continue
        osql = spec.oracle_sql()
        if osql is None:
            continue
        try:
            sdf = spec.fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
            stypes = {
                f.name: type_class(t)
                for f, t in zip(
                    sdf.schema.fields,
                    pa.schema(
                        [
                            (f.name, _spark_to_arrow(f.dataType))
                            for f in sdf.schema.fields
                        ]
                    ).types,
                )
            }
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        try:
            res = con.execute(osql)
            tbl = res.arrow()
            ocols = tbl.schema.names
            otypes = {f.name: type_class(f.type) for f in tbl.schema}
            orows = [
                tuple(tbl.column(c)[i].as_py() for c in ocols)
                for i in range(tbl.num_rows)
            ]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems, warns = [], []
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(ocols)}")
        else:
            for c in sorted(scols):
                if stypes[c] != otypes[c]:
                    problems.append(
                        f"type-class[{c}]: spark={stypes[c]} duck={otypes[c]}"
                    )
            sc = canon_rows(srows, scols)
            oc = canon_rows(orows, list(ocols))
            if sc != oc:
                msg = f"exact-diff: {len(sc)} vs {len(oc)} rows"
                for a, b in zip(sc, oc):
                    if a != b:
                        msg += f"\n    spark: {a}\n    duck:  {b}"
                        break
                problems.append(msg)
            for ci, c in enumerate(scols):
                if any(
                    isinstance(r[ci], float) and unrounded(r[ci]) for r in srows
                ):
                    if _allow_reason(name, c) is not None:
                        n_allow += 1
                    else:
                        warns.append(f"unrounded-double[{c}]")
            import hashlib

            digest = hashlib.sha256(
                "\n".join(sc).encode()
            ).hexdigest()[:16]
            manifest.append(f"{name} rows={len(sc)} sha256={digest}")
            path = os.path.join(DUMPS_DIR, f"{name}.txt")
            if only:
                # subset runs (often at other SFs) must not churn the
                # committed full-registry dumps
                pass
            elif len(sc) <= MAX_DUMP_ROWS:
                with open(path, "w") as f:
                    f.write(
                        f"# {name} @ {sf_dir}\n# cols: {sorted(scols)}\n"
                    )
                    f.write("## spark\n")
                    f.write("\n".join(sc) + "\n")
                    f.write("## duck\n")
                    f.write("\n".join(oc) + "\n")
            elif os.path.exists(path):
                os.remove(path)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        elif warns:
            print(f"WARN {name}: " + ", ".join(warns))
            n_warn += 1
        else:
            n_ok += 1
    if manifest and not only:
        with open(os.path.join(DUMPS_DIR, "MANIFEST.txt"), "w") as f:
            f.write(f"# canonical spark dumps @ {sf_dir}\n")
            f.write("\n".join(sorted(manifest)) + "\n")
    print(
        f"\n{n_ok} clean, {n_warn} warned, {n_fail} failed"
        f" ({n_allow} allowlisted unrounded columns)"
    )
    return 1 if n_fail else 0


def _spark_to_arrow(dt) -> pa.DataType:
    from pyspark.sql.pandas.types import to_arrow_type

    return to_arrow_type(dt)


if __name__ == "__main__":
    sys.exit(main())
