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

    * ``nanosAsLong`` — belt-and-braces for *older* driver testdata whose
      ``events.parquet`` stored ``ts`` as INT64 TIMESTAMP(NANOS), which the
      Spark parquet reader rejects outright without this flag. (Current
      testdata stores TIMESTAMP(MICROS, isAdjustedToUTC=false); the flag is
      then inert.)
    * ``session.timeZone=UTC`` — timestamp formatting/extraction must agree
      with the DuckDB oracle regardless of host timezone.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # Invariant: events.ts loads as TimestampNTZType. The current
        # driver testdata stores ts as parquet TIMESTAMP(MICROS,
        # isAdjustedToUTC=false), which Spark 4 reads directly as NTZ —
        # naive wall-clock, matching DuckDB's naive TIMESTAMP, and (key
        # property) every derived value (hour, date_trunc, unix_micros)
        # is independent of spark.sql.session.timeZone.
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType, TimestampNTZType

        if isinstance(df.schema["ts"].dataType, LongType):
            # Belt-and-braces for older testdata: TIMESTAMP(NANOS) +
            # nanosAsLong arrives as BIGINT epoch nanos — integer
            # division (epoch nanos exceed 2^53, so no double
            # round-trip), then drop the TZ; the session TZ was just
            # healed to UTC above, so the NTZ cast is deterministic.
            df = df.withColumn(
                "ts",
                F.timestamp_micros(F.expr("ts DIV 1000")).cast(TimestampNTZType()),
            )
    return df


def fan_out(df: DataFrame, parts: int | None = None) -> DataFrame:
    """Raise map-side parallelism after a narrow-split scan (guide §2.5,
    "input skew": one huge unsplittable input partition).

    The driver testdata ships every table as ONE parquet row group, so a
    scan — and every map-side operator fused above it (tokenize, shingle,
    minhash, vector math) — executes as ONE task regardless of
    ``maxPartitionBytes`` (a row group is the atomic split unit; measured
    round 14: the whole q_text_novelty tokenize ran 1-task on local[32],
    2.06 s vs 0.53 s fanned out). At production scale the same table
    arrives in thousands of row groups, so this is a NO-OP whenever the
    scan already carries at least the session's default parallelism —
    the repartition only fires exactly in the degenerate-layout case it
    exists for. Round-robin (not keyed): the goal is slot balance, and
    Spark's sort-before-repartition keeps retries deterministic.

    Use at the root of CPU-heavy per-row pipelines; pure column
    projections and already-shuffle-rooted plans don't need it.
    """
    sc = df.sparkSession.sparkContext
    target = parts or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Register every test table as a temp view (for the SQL API surface)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
