"""As-of join — an operator Spark lacks natively (SURVEY.md §2.B).

Two implementations with identical semantics:

1. `asof_join_agg` (default): composition of built-ins — range-condition
   LEFT join + max_by per left row. Catalyst plans the equi-part of the
   condition as a hash join and the range part as a post-join filter;
   the groupBy collapses candidates with a partial agg. The join is NOT
   force-broadcast (the right side may be fact-sized; at 100 TB a forced
   `F.broadcast(fact)` is a driver OOM) — AQE picks broadcast at runtime
   when the right side is actually small. The max_by groupBy includes the
   join key alongside the surrogate row id, so after a sort-merge join
   the aggregation reuses the join's hash partitioning (a subset of the
   grouping keys satisfies the clustered distribution) — no second
   shuffle of the fact.

2. `asof_join_merge`: cogrouped applyInPandas running pd.merge_asof per
   key group — the scale path when the per-key candidate multiplicity
   of (1) explodes (e.g. minute-level quotes vs trades). Sort-merge
   within group, O(n+m) per key instead of O(n*m).

Both keep last-match-wins determinism via a unique-key tiebreak.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def asof_join_agg(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    right_cols: list[str],
    right_tiebreak: str,
    broadcast_right: bool = False,
) -> DataFrame:
    """For each left row: the right row with max (right_time, tiebreak)
    among rows with matching key and right_time <= left_time. Left rows
    with no match keep nulls (left-asof semantics).

    Cardinality preservation: the groupBy key is a surrogate row id,
    not the left columns — duplicate left rows (same key AND time) must
    each produce their own output row, exactly like a SQL left join,
    and map-typed left columns would not even be groupable. The join
    key rides along in the groupBy purely so the aggregation can reuse
    the join's output partitioning (hash on the key co-locates every
    candidate for one left row); it is constant per _lid."""
    lid = left.withColumn("_lid", F.monotonically_increasing_id())
    r = F.broadcast(right) if broadcast_right else right
    cond = (lid[left_on] == r[right_on]) & (r[right_time] <= lid[left_time])
    joined = lid.join(r, cond, "left")
    order = F.struct(r[right_time], r[right_tiebreak])
    matched = F.struct(*[r[c] for c in right_cols])
    # Null ordering key for unmatched rows -> max_by skips them; a group
    # that is entirely unmatched yields null (left-join preservation).
    order_or_null = F.when(r[right_tiebreak].isNotNull(), order)
    agg = joined.groupBy(
        lid[left_on].alias("_gkey"), lid["_lid"]
    ).agg(
        *[F.first(lid[c]).alias(c) for c in left.columns],
        F.max_by(matched, order_or_null).alias("_match"),
    )
    out = agg
    for c in right_cols:
        out = out.withColumn(c, F.col(f"_match.{c}"))
    return out.drop("_match", "_lid", "_gkey")


def asof_join_merge(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    right_cols: list[str],
    right_tiebreak: str,
) -> DataFrame:
    """Cogrouped pd.merge_asof: both sides shuffle once on the key; each
    cogroup sorts locally and merges in O(n+m). Arrow moves the batches.
    """
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in left.schema.fields
        + [right.schema[c] for c in right_cols]
    )

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if lpdf.empty:
            return pd.DataFrame(columns=list(lpdf.columns) + right_cols)
        lpdf = lpdf.sort_values([left_time])
        if rpdf.empty:
            for c in right_cols:
                lpdf[c] = None
            return lpdf
        # stable sort: tiebreak last so merge_asof's "last match" is the
        # max (right_time, tiebreak) — same as asof_join_agg
        rpdf = rpdf.sort_values([right_time, right_tiebreak])
        merged = pd.merge_asof(
            lpdf,
            rpdf[[right_time] + [c for c in right_cols if c != right_time]],
            left_on=left_time,
            right_on=right_time,
            direction="backward",
        )
        if right_time not in right_cols:
            merged = merged.drop(columns=[right_time])
        return merged

    return (
        left.groupBy(left_on)
        .cogroup(right.groupBy(right_on))
        .applyInPandas(merge, out_schema)
    )
