"""Loaders for the driver-generated test tables (TESTDATA.md / FIXTURES.md §B).

Parquet scans are the engine's default source: columnar, predicate
pushdown, column pruning and partition pruning all come from Catalyst for
free (verify with ``df.explain`` → ``PushedFilters`` / ``ReadSchema``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _ensure_session_confs(spark: SparkSession) -> None:
    """Set correctness-critical SQL confs at runtime.

    Callers (the correctness driver, notebooks) may hand us a vanilla
    SparkSession built without :func:`bigdatagenomic_spark.session.get_spark`,
    so every conf a query's *result* depends on must be (re)applied here —
    both are runtime-settable SQL confs, so ``conf.set`` is sufficient:

    * ``nanosAsLong`` — the driver's ``events.parquet`` stores its ``ts``
      column as INT64 TIMESTAMP(NANOS), which the Spark parquet reader
      rejects outright without this flag.
    * ``session.timeZone=UTC`` — timestamp formatting/extraction must agree
      with the DuckDB oracle regardless of host timezone.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS); with
        # spark.sql.legacy.parquet.nanosAsLong it arrives as BIGINT
        # nanoseconds — convert to a real timestamp (integer division, no
        # double round-trip: epoch-nanos exceed 2^53).
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Register every test table as a temp view (for the SQL API surface)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
