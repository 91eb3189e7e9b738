"""Physical-plan inspection helpers — the engine's ".explain and iterate"
workflow (used by tests/test_plans.py and during operator development)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def plan_has(df: DataFrame, *fragments: str) -> bool:
    plan = executed_plan(df)
    return all(f in plan for f in fragments)


def scan_columns(df: DataFrame) -> list[str]:
    """Columns actually read by the first FileScan (pruning check)."""
    for line in executed_plan(df).splitlines():
        if "FileScan" in line:
            inside = line.split("FileScan parquet ", 1)[-1]
            cols = inside.split("]", 1)[0].lstrip("[")
            return [c.split("#")[0] for c in cols.split(",")]
    return []
