"""Bucketed tables: pre-shuffled storage for repeat-join workloads.

The reference re-partitions its whole graph on every run (GraphLab's
ingress step, assembly_final.cpp:656-668 ``load_graph`` →
``finalize``): the hash-partition of vertices is recomputed from
scratch each execution. At 100 TB that is exactly the cost worth
paying ONCE and amortizing: Spark's bucketed tables persist the hash
partitioning (and optionally a per-bucket sort) into the table layout,
so every later equi-join or aggregation on the bucket keys skips its
shuffle entirely — the scan itself reports the bucket spec and Catalyst
drops the Exchange.

When to bucket (the 100 TB decision rule):
  * a fact table joined repeatedly on the same key (orders ⋈ lineitem
    on orderkey, events ⋈ sessions on user_id) — bucket BOTH sides with
    the SAME bucket count so the join is bucket-local;
  * groupBy-heavy tables where the groupBy key is stable release to
    release — bucketing makes the aggregation exchange-free too;
  * NOT worth it for one-shot queries (you pay the shuffle at write
    time regardless — bucketing only wins when reads outnumber writes).

Bucket count sizing: target ~100-200 MB of post-compression data per
bucket per partition-dir; too few buckets caps join parallelism, too
many produces the small-files problem (each writing task emits one
file PER bucket it touches — always ``repartition(keys)`` before a
bucketed write so each bucket's rows land in one task).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a parquet table bucketed on ``keys``.

    Repartitions on the bucket keys first so each of the ``n_buckets``
    output buckets is written by the task that owns its rows — without
    this, every task writes a sliver of every bucket and a 1000-task
    write emits 1000 × n_buckets files.

    ``sort_by`` additionally sorts rows inside each bucket file; a
    sort-merge join between two tables bucketed AND sorted on the join
    key needs neither shuffle nor sort at read time.
    """
    out = df.repartition(n_buckets, *[F.col(k) for k in keys])
    writer = out.write.mode(mode).format("parquet").bucketBy(n_buckets, *keys)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed tables on their bucket keys.

    Plain ``join`` — the point is what Catalyst does with it: when both
    scans report the same bucket spec on ``on``, the planner emits a
    SortMergeJoin whose children are the bucketed scans directly, with
    no Exchange on either side (pinned by
    tests/test_plans.py::test_bucketed_join_has_no_exchange).
    """
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
