"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query (the assembly pipeline, derived
deterministically from the `documents` table — SURVEY.md Q27) at
sf0.001. ``queries``/``oracle_sql`` expose the full registry in
``bigdatagenomic_spark.queries``; every operator from SURVEY.md §2 gets
one entry, with a DuckDB-runnable ANSI-SQL oracle unless the operator is
approximate/non-SQL-expressible (those are rows-only by contract).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from bigdatagenomic_spark import queries as _registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _registry.queries()["q27_assembly"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each hash-checked query."""
    return _registry.oracle_sql()
