"""S09: foreachBatch idempotent upsert sink (plain-parquet exactly-once).

The memory/parquet append sinks (replay.py, S01) cover the easy cases;
production windowed aggregations need an UPSERT sink: every trigger
re-emits updated windows, and a crash between "write" and "commit
offsets" replays the last micro-batch. ``foreach_batch_upsert`` gets
exactly-once on plain parquet the standard way:

  * the aggregation streams in **update** mode — each micro-batch holds
    only the (window, key) rows whose aggregate changed;
  * the sink writes with **dynamic partition overwrite**, partitioned by
    the FULL grouping key (window start + group column). Granularity
    matters: an update batch carries only changed rows, so any partition
    it touches must be fully contained in the batch — partitioning by a
    coarser unit (e.g. the date) would delete that partition's unchanged
    sibling rows on overwrite. One grouping key = one partition = one
    row's current state, so replaying a batch rewrites the same
    partitions with the same bytes (idempotent) and never touches the
    rest of the table;
  * at 100 TB the partition count is bounded by (windows retained ×
    group cardinality), and a micro-batch only rewrites partitions
    inside the watermark horizon — not the table's history.

This is the sink pattern Delta/Iceberg MERGE INTO formalizes; with
vanilla parquet the partition is the merge granularity.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def foreach_batch_upsert(target_path: str, partition_cols: Sequence[str]):
    """Build a foreachBatch fn that partition-overwrites target_path.

    partition_cols must be the aggregation's full grouping key (see
    module docstring — coarser keys lose unchanged sibling rows).
    """

    def _upsert(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        (
            batch_df.write.mode("overwrite")
            .partitionBy(*partition_cols)
            .parquet(target_path)
        )

    return _upsert


def run_upsert_sink(
    agg_stream: DataFrame,
    target_path: str,
    partition_cols: Sequence[str],
    checkpoint_dir: str,
    timeout_s: int = 300,
) -> None:
    """Drain agg_stream (update mode) into a partition-overwritten parquet
    table; returns after the availableNow run completes."""
    q = (
        agg_stream.writeStream.outputMode("update")
        .foreachBatch(foreach_batch_upsert(target_path, partition_cols))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(f"upsert sink did not finish in {timeout_s}s")


def read_upserted(spark: SparkSession, target_path: str) -> DataFrame:
    return spark.read.parquet(target_path)
