"""Physical-plan inspection helpers: the feedback loop for scale hygiene.

Used by tests/test_plans.py to assert plan SHAPE, not just results:
filters reach the parquet scan (PushedFilters), projections prune
columns (ReadSchema), small dims broadcast, and hot paths stay inside
WholeStageCodegen. A query that silently loses one of these properties
is a 100 TB regression even when its sf0.01 results stay correct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")  # type: ignore[attr-defined]


def plan_has(df: DataFrame, needle: str) -> bool:
    return needle in formatted_plan(df)


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters lines of the scan nodes."""
    return "\n".join(l.strip() for l in formatted_plan(df).splitlines() if "PushedFilters" in l)


def read_schema(df: DataFrame) -> str:
    return "\n".join(l.strip() for l in formatted_plan(df).splitlines() if "ReadSchema" in l)


def has_broadcast_join(df: DataFrame) -> bool:
    return plan_has(df, "BroadcastHashJoin")


def codegen_stage_count(df: DataFrame) -> int:
    """Number of distinct whole-stage-codegen stages: `*(N)` markers in
    the simple-mode executed plan (AQE finalizes it after an action)."""
    import re

    df.collect()  # count() would plan a DIFFERENT query; collect finalizes this one
    simple = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "simple")  # type: ignore[attr-defined]
    return len(set(re.findall(r"\*\((\d+)\)", simple)))
