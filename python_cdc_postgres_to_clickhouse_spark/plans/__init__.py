"""Physical-plan inspection: the engine's `.explain` checklist.

At 100 TB, a plan defect (filter not pushed, join not broadcast, window not
limit-pushed) is the difference between minutes and days. These helpers make
plan properties assertable in tests so regressions fail CI rather than a
cluster bill.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def formatted(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filters(df: DataFrame) -> bool:
    """Parquet scan received pushdown predicates."""
    plan = formatted(df)
    return "PushedFilters: [" in plan and "PushedFilters: []" not in plan


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from parquet (column pruning check)."""
    import re

    plan = formatted(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols.extend(part.split(":")[0].strip() for part in m.group(1).split(",") if part)
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df)


def has_window_group_limit(df: DataFrame) -> bool:
    """row_number ≤ k filters push a top-k limit into the shuffle."""
    return "WindowGroupLimit" in physical_plan(df)


def has_partial_aggregate(df: DataFrame) -> bool:
    """Two-phase hash aggregation (map-side combine before the shuffle)."""
    plan = physical_plan(df)
    return "partial_" in plan or "Partial" in plan


def wholestage_codegen_ids(df: DataFrame) -> int:
    """Number of whole-stage-codegen spans (bigger spans = fewer breaks)."""
    return physical_plan(df).count("WholeStageCodegen")
