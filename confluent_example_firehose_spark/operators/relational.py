"""Relational operator helpers + oracle-determinism utilities.

Cross-engine float determinism: double sums depend on addition order,
which differs between Spark's partial/final agg and DuckDB. Casting
each addend to DECIMAL(30,10) makes the sum exact (identical in any
order); casting the exact decimal back to double is deterministic.
`dsum`/`davg` encode that; `DSUM_SQL`/`DAVG_SQL` are the oracle twins.
Per-row double arithmetic (no reordering) is bit-identical across
engines and needs no treatment.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(30,10)"


def dsum(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double")


def davg(col: Column | str) -> Column:
    """Order-independent average: exact decimal sum / count, in double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double") / F.count(c)


# DuckDB's DECIMAL->DOUBLE cast is not correctly rounded (int128 * 10^-n
# in float math, off by 1 ulp); Spark's BigDecimal path is. Routing the
# oracle's cast through VARCHAR uses strtod, which IS correctly rounded,
# making both engines produce the bit-identical double of the same exact
# decimal. (Verified empirically: q_agg_basic sums differed by 1 ulp
# before, exact after.)


def _dec_to_double_sql(agg: str) -> str:
    return f"CAST(CAST({agg} AS VARCHAR) AS DOUBLE)"


def dsum_sql(expr: str) -> str:
    return _dec_to_double_sql(f"sum(CAST(({expr}) AS DECIMAL(30,10)))")


def davg_sql(expr: str) -> str:
    return f"{dsum_sql(expr)} / count({expr})"


def salted_join(
    big,
    small,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
):
    """Skew-beating equi-join: salt the big side's key into
    `salt_buckets` sub-keys (deterministic pmod of xxhash64 over the
    whole row's key + a uniform spreader) and replicate the small side
    once per bucket, so one hot key's rows spread over `salt_buckets`
    reducers instead of one straggler task.

    AQE's skew-join split handles moderate skew automatically; explicit
    salting is for the pathological case (one key = 30% of 100 TB)
    where even a split partition exceeds an executor. Replication cost:
    |small| * salt_buckets rows — only ever use with a dimension-sized
    right side.
    """
    from pyspark.sql import functions as F

    big_s = big.withColumn(
        "_salt",
        F.pmod(
            F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets)
        ).cast("int"),
    )
    small_s = small.crossJoin(
        F.broadcast(
            big.sparkSession.range(salt_buckets).select(
                F.col("id").cast("int").alias("_salt")
            )
        )
    )
    return big_s.join(small_s, [key, "_salt"], how).drop("_salt")
