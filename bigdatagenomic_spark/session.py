"""SparkSession factory.

Replaces the reference's MPI bootstrap (assembly_final.cpp:651-652
``mpi_tools::init`` + ``distributed_control``) with a SparkSession.
All distribution, serialization (assembly_final.cpp:22-27 hand-written
archives) and barriers are delegated to Spark.

Tuned for the project environment (local[N], single JVM) but every knob
is the one you would also set on a 1000-executor cluster:
  * AQE on: runtime join-strategy switching, partition coalescing and
    skew-join splitting — the 100 TB safety net.
  * shuffle.partitions sized to cores locally; on a real cluster this is
    overridden per-deploy (or left to AQE's coalescing).
  * UTC session timezone so results hash-match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "bigdatagenomic_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine SparkSession."""
    cpus = cpus or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # the driver's events.parquet stores TIMESTAMP(NANOS), which the
        # Spark parquet reader rejects by default; read as long + convert
        # in sources.tables.load_table
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
