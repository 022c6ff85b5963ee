"""Sinks (operator R8).

The reference writes one text block per vertex via ``best_path_writer``
(assembly_final.cpp:631-645, invoked :740-744):

    id \\t next_id \\n --Offset: .. \\n --Length: .. \\n --Content-- \\n
    Content Size: .. \\n <content>

``write_best_path_text`` reproduces that block format with a pure-column
``concat`` projection + ``df.write.text`` (distributed, no driver
collect). The engine's *default* sink is parquet (columnar, splittable,
compressed — what you actually want at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def best_path_block(df: DataFrame) -> DataFrame:
    """Format annotated reads as the reference's per-vertex text block."""
    block = F.concat(
        F.col("read_id").cast("string"),
        F.lit("\t"),
        F.col("next_id").cast("string"),
        F.lit("\n--Offset: "),
        F.col("offset").cast("string"),
        F.lit("\n--Length: "),
        F.col("length").cast("string"),
        F.lit("\n--Content--\nContent Size: "),
        F.length("content").cast("string"),
        F.lit("\n"),
        F.col("content"),
    )
    return df.select(block.alias("value"))


def write_best_path_text(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    best_path_block(df).write.mode(mode).text(path)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_rebalanced(
    df: DataFrame,
    path: str,
    target_mb: int = 128,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Parquet write with AQE-sized output files (the small-files fix).

    A write inherits whatever partitioning the plan ends with: 1000
    shuffle partitions -> 1000 files per partition-dir, a compaction
    tax every downstream scan pays in open/footer costs. The REBALANCE
    hint inserts an AQE-managed exchange that coalesces AND splits to
    ``spark.sql.adaptive.advisoryPartitionSizeInBytes`` — unlike a
    fixed ``repartition(n)``, it needs no row-count probe, handles
    skewed output partitions (splits oversized ones), and adapts as
    the data grows. The conf is set only for this write and restored.
    """
    spark = df.sparkSession
    key = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    saved = spark.conf.get(key)
    try:
        spark.conf.set(key, str(target_mb * 1024 * 1024))
        writer = df.hint("rebalance").write.mode(mode)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
    finally:
        spark.conf.set(key, saved)


def write_training_shards(
    docs: DataFrame,
    path: str,
    n_shards: int = 8,
    seed: str = "r5",
    max_records_per_file: int = 250_000,
    mode: str = "overwrite",
) -> None:
    """Materialize a training epoch: deterministic global shuffle
    (operators/llm_prep.assign_shards) written as one parquet directory
    per shard (``shard=K/``), rows pre-sorted by their in-shard
    position so a loader streaming ``shard=K`` in file order replays
    the epoch's schedule without a sort.

    ``maxRecordsPerFile`` bounds file size from above (the writer rolls
    files), and the within-partition sort keeps each rolled file a
    CONTIGUOUS position range — resumable mid-shard checkpointing falls
    out of the layout. Partition pruning gives each loader worker its
    shard without reading the others.
    """
    from bigdatagenomic_spark.operators.llm_prep import assign_shards

    sharded = assign_shards(docs, n_shards=n_shards, seed=seed)
    out = sharded.join(docs, "doc_id").repartition("shard").sortWithinPartitions(
        "shard", "pos"
    )
    (
        out.write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy("shard")
        .parquet(path)
    )
