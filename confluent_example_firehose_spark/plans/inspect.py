"""Physical-plan introspection helpers.

Used by tests/test_plans.py (plan-shape regression guards) and
tools/gen_plans_md.py (PLANS.md evidence). The engine adds no custom
Catalyst rules anywhere (SURVEY.md §4.2 — a deliberate property:
anything seemingly needing one becomes foreachBatch/pandas_udf user
code); this module only OBSERVES plans, it never rewrites them.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

JOIN_KINDS = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
)
PYTHON_KINDS = (
    "ArrowEvalPython",
    "FlatMapGroupsInPandas",
    "MapInPandas",
    "BatchEvalPython",
    "FlatMapCoGroupsInPandas",
    "PythonUDTF",
)


def executed_plan(df: DataFrame) -> str:
    """The executed physical plan as text (pre-AQE final plan; AQE
    re-optimizations show up as AdaptiveSparkPlan nodes)."""
    return df._jdf.queryExecution().executedPlan().toString()


@dataclass
class PlanSummary:
    joins: list[str] = field(default_factory=list)
    n_exchanges: int = 0
    python_stages: list[str] = field(default_factory=list)
    has_pushed_filters: bool = False
    has_bucketed_scan: bool = False

    @property
    def jvm_only(self) -> bool:
        return not self.python_stages


def summarize(df: DataFrame) -> PlanSummary:
    plan = executed_plan(df)
    return PlanSummary(
        joins=[k for k in JOIN_KINDS for _ in range(plan.count(k))],
        n_exchanges=len(re.findall(r"\bExchange\b", plan)),
        python_stages=sorted({k for k in PYTHON_KINDS if k in plan}),
        has_pushed_filters=bool(re.search(r"PushedFilters: \[[^\]]", plan)),
        has_bucketed_scan=(
            "SelectedBucketsCount" in plan or "Bucketed: true" in plan
        ),
    )
