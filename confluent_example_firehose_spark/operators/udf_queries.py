"""Python UDTF + grouped-agg pandas UDAF declared queries — completing
the UDF/UDAF/UDTF row of SURVEY.md §2.B (q_pandas_udf covers the scalar
Arrow UDF).

Determinism note: the UDAF aggregates INTEGER quantities (value scaled
to cents, k weights) so the sums are exact in any accumulation order —
float-order drift between Spark partitions and DuckDB cannot appear.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

from ..catalog import load_table
from ..registry import register


@udtf(returnType="event_id bigint, pkey string, pval bigint")
class ExplodeProps:
    """Row-generating UDTF: one output row per key of the JSON props
    object (the generic form of from_json when the key set is unknown
    at plan time — the case a fixed schema cannot express)."""

    def eval(self, event_id: int, props: str):  # noqa: D102
        if not props:
            return
        try:
            obj = json.loads(props)
        except ValueError:
            return  # permissive skip, AbstractFirehose.java:118-123
        if isinstance(obj, dict):
            for k in sorted(obj):
                v = obj[k]
                if isinstance(v, bool) or not isinstance(v, int):
                    continue
                yield event_id, k, v


@register(
    "q_udtf",
    oracle="""
    SELECT event_id, 'k' AS pkey,
           CAST(json_extract(props, '$.k') AS BIGINT) AS pval
    FROM events
    WHERE json_extract(props, '$.k') IS NOT NULL
    """,
)
def q_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF via LATERAL join: explode each event's JSON props
    into (key, value) rows. Row-at-a-time Python IS the slow path — the
    right tool only when output cardinality per row is data-dependent
    and the schema is dynamic; for fixed schemas use from_json (see
    q_json_parse)."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("_ev_udtf")
    spark.udtf.register("explode_props", ExplodeProps)
    return spark.sql(
        """
        SELECT p.event_id, p.pkey, p.pval
        FROM _ev_udtf e, LATERAL explode_props(e.event_id, e.props) p
        """
    )


@register(
    "q_pandas_udaf",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(round(value * 100) AS BIGINT)
                    * CAST(json_extract(props, '$.k') AS BIGINT)) AS DOUBLE)
           / (100.0 * sum(CAST(json_extract(props, '$.k') AS BIGINT)))
               AS wavg_value,
           count(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def q_pandas_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (the UDAF surface): k-weighted mean
    of event value per type. Arrow ships each group's columns as numpy
    arrays; integer accumulation makes the result order-independent.
    Plan: partial aggregation is NOT available for pandas UDAFs (whole
    groups must co-locate), so this costs a full shuffle of the
    projected columns — the documented trade vs built-in aggs."""

    @pandas_udf("double")
    def wavg(cents: pd.Series, k: pd.Series) -> float:
        # permissive like the rest of the engine: null weights (corrupt
        # props) are skipped, an all-null/zero-weight group yields null
        # — matching SQL aggregate semantics, not crashing the task
        mask = k.notna() & cents.notna()
        kk = k[mask].to_numpy(dtype=np.int64)
        cc = cents[mask].to_numpy(dtype=np.int64)
        ksum = kk.sum()
        if ksum == 0:
            return None
        return float((cc * kk).sum()) / (100.0 * ksum)

    # pandas UDAFs cannot mix with built-in aggs in one agg() — every
    # aggregate in the plan must be pandas-evaluated
    @pandas_udf("long")
    def ncount(cents: pd.Series) -> int:
        return len(cents)

    ev = load_table(spark, sf_dir, "events")
    ev = ev.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )
    return ev.groupBy("event_type").agg(
        wavg("cents", "k").alias("wavg_value"),
        ncount("cents").alias("n"),
    )


@register(
    "q_arrow_udf",
    oracle="""
    SELECT event_id,
           CAST(((user_id * 2654435761) % 4294967296) % 97 AS BIGINT)
               AS shard
    FROM events
    """,
)
def q_arrow_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized scalar Python UDF (Spark 4 `useArrow=True`) —
    the third Python execution path next to row-pickled UDFs (q_udtf)
    and pandas UDFs (q_pandas_udf): per-ROW Python semantics with
    Arrow-batched transfer, i.e. plain-Python ergonomics without the
    pickle tax. The kernel is Knuth multiplicative sharding on the
    user id — all-integer, so DuckDB replays it exactly. Used here to
    pin the execution path (ArrowEvalPython, asserted in
    tests/test_plans_r5.py); a production plan would fold arithmetic
    this simple into a Column expression (see q_scalar_funcs), which
    is precisely the built-ins-first rule the UDF trio exists to
    demarcate."""
    from pyspark.sql.functions import udf

    @udf(returnType="long", useArrow=True)
    def shard(user_id: int) -> int:
        return ((user_id * 2654435761) % 4294967296) % 97

    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_id", shard("user_id").alias("shard"))
