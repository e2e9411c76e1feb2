"""Vector math over array<float> embedding columns — pure Catalyst
higher-order functions, no UDFs, so similarity pipelines stay inside
whole-stage codegen.

Determinism: computation is done in double with a sequential left fold
(F.aggregate), which is bit-identical to DuckDB's list_cosine_similarity
on DOUBLE[] and to a Python sequential loop (verified empirically), so
cosine scores are oracle-exact without rounding.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm2(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """cos = dot/(|a|*|b|) — same association order as DuckDB's
    list_cosine_similarity, hence bit-identical on the same input."""
    return dot(a, b) / (norm2(a) * norm2(b))
