"""Helpers to read a DataFrame's physical plan as data.

Built on ``explain``'s formatted output (a public, stable surface) so no
private JVM APIs are load-bearing beyond the one string accessor.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame, mode: str = "formatted") -> str:
    """The explain() output as a string."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's parquet scans."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def scan_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every parquet scan — shows column pruning."""
    plan = formatted_plan(df)
    return [m.group(1) for m in re.finditer(r"ReadSchema: (\S+)", plan)]


def join_kinds(df: DataFrame) -> list[str]:
    """Physical join operators in the plan (e.g. BroadcastHashJoin)."""
    plan = formatted_plan(df)
    return re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)",
        plan,
    )


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges (excludes broadcast exchanges, which
    print as BroadcastExchange)."""
    plan = formatted_plan(df)
    return len(re.findall(r"\(\d+\) Exchange\b", plan))


def codegen_stage_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans in the FINAL adaptive plan.

    AQE only materializes codegen markers once the query runs, so this
    EXECUTES the DataFrame (collect) — use on bounded test queries only.
    """
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return len(set(re.findall(r"\*\((\d+)\)", plan)))


def has_operator(df: DataFrame, name: str) -> bool:
    return name in formatted_plan(df)
