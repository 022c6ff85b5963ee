"""S01: file-stream replay harness + memory-sink runner.

Replays a batch ``events`` table as a file stream: the table is split
into N time-ordered parquet chunk files in one directory, and
``readStream`` with ``maxFilesPerTrigger=1`` turns each chunk into one
micro-batch (so watermarks advance between chunks exactly like wall
clock time would advance between triggers in production).

This is test/bench scaffolding — in production the source would be
Kafka or cloud-storage file arrival; everything downstream of
``read_event_stream`` is identical.
"""

from __future__ import annotations

import glob
import itertools
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_MEM_SEQ = itertools.count()


def write_chunks(dfs: list[DataFrame], out_dir: str) -> list[str]:
    """Write each DataFrame as one parquet chunk file, in arrival order.

    Files are named and written in sequence so the file-stream source
    (which orders by modification time, then path) replays them in the
    given order.
    """
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    with tempfile.TemporaryDirectory() as tmp:
        for i, df in enumerate(dfs, start=1):
            part_dir = os.path.join(tmp, f"c{i}")
            df.coalesce(1).write.mode("overwrite").parquet(part_dir)
            (part_file,) = glob.glob(os.path.join(part_dir, "part-*.parquet"))
            dest = os.path.join(out_dir, f"chunk-{i:03d}.parquet")
            shutil.copyfile(part_file, dest)
            paths.append(dest)
    return paths


def write_event_chunks(events: DataFrame, out_dir: str, n_chunks: int = 4) -> list[str]:
    """Split ``events`` into time-ordered parquet chunk files under out_dir.

    The global-order ntile is driver-test-scale only (single-partition
    sort); the production equivalent is the natural arrival order of
    files/offsets, which needs no sort at all.
    """
    chunked = events.withColumn(
        "_chunk", F.ntile(n_chunks).over(Window.orderBy("ts", "event_id"))
    )
    return write_chunks(
        [
            chunked.where(F.col("_chunk") == i).drop("_chunk")
            for i in range(1, n_chunks + 1)
        ],
        out_dir,
    )


def read_event_stream(
    spark: SparkSession,
    chunk_dir: str,
    schema,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-stream source over the replay directory, one chunk per batch."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(chunk_dir)
    )


def run_to_memory(
    stream_df: DataFrame,
    output_mode: str = "complete",
    timeout_s: int = 300,
) -> DataFrame:
    """Run a streaming plan to completion into a memory sink.

    Uses ``availableNow`` so the query drains all chunk files (still
    honoring maxFilesPerTrigger batching) and then stops — the
    deterministic way to say "replay the whole stream".
    Returns the sink table as a batch DataFrame.
    """
    spark = stream_df.sparkSession
    name = f"mem_sink_{next(_MEM_SEQ)}"
    ckpt = tempfile.mkdtemp(prefix="bdg_ckpt_")
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(timeout_s):
            raise TimeoutError(f"streaming query {name} did not finish in {timeout_s}s")
    finally:
        if q.isActive:
            q.stop()
        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(name)
