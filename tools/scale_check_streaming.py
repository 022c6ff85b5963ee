"""Streaming state-at-scale sweep (VERDICT r10 #6): replay the x1/x10/
x100 events corpus through the two stream-stream joins whose
bounded-state claim has never been measured —

  * S15 `stream_stream_click_view_join(how="left_outer")` — clicks
    left-outer-matched to same-user views in the preceding 30 min,
  * S16 `stream_funnel_join` — the cascaded view→click→purchase
    funnel (two chained stream-stream joins, intermediate state),

and record per-micro-batch state-store metrics
(`query.recentProgress[*].stateOperators`: numRowsTotal,
memoryUsedBytes) plus the peak across the replay.

The claim under test (streaming/ops.py): "every condition time-bounds
the match, so intermediate state evicts". The replica corpus
(tools/make_scale_tables.py) shifts each replica's 30-day window by
366 days, so x100 is a 100x-longer calendar at the SAME per-hour event
density — if eviction works, PEAK state rows are ~flat in the replica
count (state holds only the watermark horizon's rows), while a broken
watermark would show peak state growing ~100x.

Chunking: time-ordered parquet files per replica, bucketed by
FIXED-CALENDAR-SPAN ts ranges (CHUNK_DAYS per micro-batch — x100 gets
~100x the FILES, not 100x the file size), written in one
repartition+partitionBy job (no global sort), so
`maxFilesPerTrigger=1` advances the watermark between micro-batches
exactly like wall-clock arrival would at a constant event rate. A
fixed chunk COUNT would instead make each micro-batch 100x bigger at
x100, and peak state is floored at the in-flight batch size — that
measures the replay harness, not eviction (the first cut of this tool
made exactly that mistake and read 100x "state growth" that was pure
batch sizing).

Usage: python tools/scale_check_streaming.py [rel_dir] [--out F]
    [--only s15|s16] [--reps x1,x10,x100] [--max-chunks N]
(default /tmp/scale_rel with x1/x10/x100 subdirs; writes JSON to --out).
--max-chunks replays only the first N chunks — state boundedness
plateaus within the first few horizons, so a prefix of the x100
calendar demonstrates eviction at a fraction of the replay cost; the
artifact records the cap.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHUNK_DAYS = 30 / 8  # fixed micro-batch calendar span (8 per 30-day window)
REPLICAS = ("x1", "x10", "x100")


def _write_time_chunks(ev, out_dir: str, n_chunks: int) -> int:
    """Split events into n_chunks equal-width ts buckets, one parquet
    file per bucket in ascending time order (no global sort — the
    bucket id is a map-side expression; ONE repartition+partitionBy
    write job for all buckets). Returns the number of non-empty
    chunks written."""
    import glob as _glob

    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    span_us = max(
        int((hi - lo).total_seconds() * 1_000_000), 1
    )
    # ts is TIMESTAMP_NTZ; cast both sides through TIMESTAMP for
    # unix_micros (consistent, bucket-only arithmetic)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    lo_us = F.unix_micros(F.lit(lo).cast("timestamp"))
    # divide BEFORE multiplying: us-deltas * n_chunks overflows int64
    # at the x100 calendar (3e15 us * ~1e4 chunks); the double has 53
    # mantissa bits, exact for any delta under ~9e15 us (~285 years)
    bucket = F.least(
        F.lit(n_chunks - 1),
        ((us - lo_us).cast("double") / span_us * n_chunks).cast("int"),
    )
    chunked = ev.withColumn("_b", bucket)
    written = 0
    with tempfile.TemporaryDirectory() as tmp:
        (
            chunked.repartition(n_chunks, "_b")
            .write.partitionBy("_b")
            .mode("overwrite")
            .parquet(tmp)
        )
        for b in range(n_chunks):
            pfs = _glob.glob(os.path.join(tmp, f"_b={b}", "part-*.parquet"))
            if not pfs:
                continue  # empty calendar bucket (gap between replicas)
            (pf,) = pfs
            # name in time order; copy sequentially so mtime order ==
            # time order too
            shutil.copyfile(
                pf, os.path.join(out_dir, f"chunk-{written:04d}.parquet")
            )
            written += 1
    return written


def _run_stream(spark, chunk_dir: str, schema, build, ckpt: str):
    """Replay the chunk dir through `build(stream_df)`, return
    (wall_s, per-batch state metrics, peak rows, peak bytes)."""
    from bigdatagenomic_spark.streaming.replay import read_event_stream

    stream = read_event_stream(spark, chunk_dir, schema)
    out = build(stream)
    q = (
        out.writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .start()
    )
    t0 = time.time()
    q.processAllAvailable()
    wall = time.time() - t0
    progress = list(q.recentProgress)
    q.stop()
    batches = []
    for p in progress:
        sos = p.get("stateOperators") or []
        if not sos:
            continue
        batches.append(
            {
                "batch": p.get("batchId"),
                "rows_per_op": [so.get("numRowsTotal") for so in sos],
                "bytes_per_op": [so.get("memoryUsedBytes") for so in sos],
            }
        )
    totals = [sum(b["rows_per_op"]) for b in batches]
    peak_rows = max(totals, default=0)
    peak_bytes = max(
        (sum(b["bytes_per_op"]) for b in batches), default=0
    )
    mean_rows = int(sum(totals) / len(totals)) if totals else 0
    # keep at most 40 evenly-spaced batch samples in the artifact
    step = max(1, len(batches) // 40)
    return wall, batches[::step], len(batches), mean_rows, peak_rows, peak_bytes


def _opt(argv: list, name: str):
    if name in argv:
        v = argv[argv.index(name) + 1]
        argv.remove(name)
        argv.remove(v)
        return v
    return None


def main() -> None:
    argv = sys.argv[1:]
    out_path = _opt(argv, "--out")
    only = _opt(argv, "--only")
    reps_opt = _opt(argv, "--reps")
    max_chunks = _opt(argv, "--max-chunks")
    max_chunks = int(max_chunks) if max_chunks else None
    replicas = tuple(reps_opt.split(",")) if reps_opt else REPLICAS
    rel_dir = argv[0] if argv else "/tmp/scale_rel"

    from pyspark.sql import functions as F

    from bigdatagenomic_spark.session import get_spark
    from bigdatagenomic_spark.streaming.ops import (
        stream_funnel_join,
        stream_stream_click_view_join,
    )

    spark = get_spark(app_name="scale-check-streaming")
    spark.sparkContext.setLogLevel("ERROR")
    # keep every batch's progress: the x100 replay runs ~800
    # micro-batches and the default retention (100) would silently
    # drop the early batches from the peak computation
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "5000")

    def s15(stream):
        clicks = stream.where(F.col("event_type") == "click")
        views = stream.where(F.col("event_type") == "view")
        return stream_stream_click_view_join(clicks, views, how="left_outer")

    def s16(stream):
        return stream_funnel_join(
            stream.where(F.col("event_type") == "view"),
            stream.where(F.col("event_type") == "click"),
            stream.where(F.col("event_type") == "purchase"),
        )

    cases = [("s15_leftouter", s15), ("s16_funnel", s16)]
    if only:
        cases = [(n, b) for n, b in cases if only in n]
    result: dict = {
        "chunk_days": CHUNK_DAYS,
        "load_avg": os.getloadavg()[0],
        "max_chunks": max_chunks,
        "cases": {},
    }
    for rep in replicas:
        src = os.path.join(rel_dir, rep, "events.parquet")
        if not os.path.exists(src):
            print(f"skip {rep}: {src} missing", flush=True)
            continue
        ev = spark.read.parquet(src)
        n_events = ev.count()
        lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
        span_days = max((hi - lo).total_seconds() / 86400.0, CHUNK_DAYS)
        n_chunks = int(span_days / CHUNK_DAYS) + 1
        chunk_dir = tempfile.mkdtemp(prefix=f"stream_chunks_{rep}_")
        n_files = _write_time_chunks(ev, chunk_dir, n_chunks)
        if max_chunks and n_files > max_chunks:
            import glob as _glob

            for f in sorted(_glob.glob(os.path.join(chunk_dir, "chunk-*")))[
                max_chunks:
            ]:
                os.remove(f)
            n_files = max_chunks
        print(
            f"{rep}: {n_events} events, span {span_days:.0f}d, "
            f"{n_files} non-empty chunks of {CHUNK_DAYS:.2f}d",
            flush=True,
        )
        # watermarks require TIMESTAMP (not the NTZ the parquet footer
        # infers) — read the stream with ts forced to TimestampType,
        # the same device as tests/test_streaming.py EVENT_SCHEMA
        from pyspark.sql import types as T

        inferred = spark.read.parquet(chunk_dir).schema
        schema = T.StructType(
            [
                T.StructField("ts", T.TimestampType())
                if f.name == "ts"
                else f
                for f in inferred.fields
            ]
        )
        for name, build in cases:
            ckpt = tempfile.mkdtemp(prefix=f"ckpt_{name}_{rep}_")
            wall, batches, n_batches, mean_rows, peak_rows, peak_bytes = (
                _run_stream(spark, chunk_dir, schema, build, ckpt)
            )
            result["cases"].setdefault(name, {})[rep] = {
                "events": n_events,
                "n_batches": n_batches,
                "wall_s": round(wall, 2),
                "mean_state_rows": mean_rows,
                "peak_state_rows": peak_rows,
                "peak_state_bytes": peak_bytes,
                "batch_samples": batches,
            }
            print(
                f"{name} {rep}: events={n_events} batches={n_batches} "
                f"wall={wall:.1f}s mean_state_rows={mean_rows} "
                f"peak_state_rows={peak_rows} "
                f"peak_state_mb={peak_bytes / 1e6:.1f}",
                flush=True,
            )
            shutil.rmtree(ckpt, ignore_errors=True)
            if out_path:  # incremental: keep partials if a later case dies
                with open(out_path, "w") as f:
                    json.dump(result, f, indent=1)
        shutil.rmtree(chunk_dir, ignore_errors=True)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(result, f, indent=1)
        print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
