"""Physical-plan inspection helpers: assert that the plan Catalyst
picked is the plan we designed for (pushdown reached the scan, small
sides broadcast, codegen covers the hot path).

Used by tests and the bench to keep 100 TB-relevant properties from
regressing silently — a correct-but-full-scan plan at sf0.1 is a
broken plan at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filters(df: DataFrame) -> bool:
    plan = formatted_plan(df)
    return "PushedFilters: [" in plan and "PushedFilters: []" not in plan


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from parquet (projection pruning check)."""
    import re

    plan = formatted_plan(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols += [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
    return sorted(set(cols))


def count_broadcast_joins(df: DataFrame) -> int:
    return formatted_plan(df).count("BroadcastHashJoin")


def count_shuffles(df: DataFrame) -> int:
    return formatted_plan(df).count("Exchange hashpartitioning") + formatted_plan(
        df
    ).count("Exchange rangepartitioning")


def codegen_stage_count(df: DataFrame) -> int:
    """Number of whole-stage-codegen spans in the EXECUTED plan (AQE
    only finalizes codegen stages at runtime, so this triggers one
    execution)."""
    df.collect()  # count() would plan a separate query; collect
    # finalizes THIS df's adaptive plan
    executed = df._jdf.queryExecution().executedPlan().toString()
    import re

    return len(set(re.findall(r"\*\((\d+)\)", executed)))
