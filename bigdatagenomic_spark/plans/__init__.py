"""Physical-plan inspection (the 100 TB design gate).

The reference has no planner at all (SURVEY.md §4.1) — every rewrite the
engine relies on comes from Catalyst, so the scale contract is "the
optimized plan has the right shape", and this package makes that shape
assertable in tests: filters reach the parquet scan, small dims
broadcast, aggregates have a map-side partial phase, top-k never does a
global sort. A plan regression (e.g. a filter that stops pushing down)
fails CI instead of surfacing as a 100× slowdown on the cluster.
"""

from bigdatagenomic_spark.plans.inspect import (
    codegen_stage_count,
    exchange_count,
    formatted_plan,
    has_operator,
    join_kinds,
    pushed_filters,
    scan_schemas,
)

__all__ = [
    "formatted_plan",
    "pushed_filters",
    "scan_schemas",
    "join_kinds",
    "exchange_count",
    "codegen_stage_count",
    "has_operator",
]
