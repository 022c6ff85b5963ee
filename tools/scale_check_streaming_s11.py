"""S11 stored-index growth sweep (VERDICT r11 #4): does the per-batch
cost of the streaming LSH index-maintenance pipeline stay flat as the
STORED band index grows x1/x10/x100?

S15/S16's sweep (tools/scale_check_streaming.py) proved stream-stream
join state evicts; S11 is deliberately different — its foreachBatch
loop grows a persistent bucketed index table by design, so the risk is
not state-store growth but probe cost: each micro-batch joins its band
keys against the ENTIRE stored index. The claim under test
(streaming/ops.py:run_lsh_index_maintenance): the probe is a bucketed
equi-join on (band, bkey) — zero Exchange on the index side, only the
small batch shuffles — so per-batch wall should grow only with the
index SCAN (columnar, 3 int-ish columns), not with shuffle volume.

Method (constant probe, growing index — isolates index-size cost):
  1. For each replica corpus (x1=5k / x10=50k / x100=500k docs,
     tools/make_scale_corpus.py), SEED the bucketed index through the
     very same pipeline (one availableNow micro-batch containing the
     whole replica) — no separate seeding code path that could drift.
  2. Stream the SAME fixed probe set (~625 sf0.1 base docs, doc_id
     remapped to a disjoint range, 3 chunks) against the seeded index
     and record per-micro-batch wall clock via the pipeline's
     ``timings`` hook, plus index rows/bytes.
The probe docs near-dup only their verbatim rep-0 twins (d%8==3 is
never d%10==0), so emitted-pair volume is ~flat across replicas —
any per-batch growth is index-probe cost, not output volume.

Usage: python tools/scale_check_streaming_s11.py [corpus_dir]
    [--out F] [--reps x1,x10,x100]
(default /tmp/scale_corpus; writes the JSON block to --out).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBE_SRC = "/root/testdata/sf0.1/documents.parquet"
PROBE_ID_OFFSET = 1 << 40
N_PROBE_CHUNKS = 3


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> int:
    argv = list(sys.argv[1:])
    out_path = None
    reps = ["x1", "x10", "x100"]
    if "--out" in argv:
        i = argv.index("--out")
        if i + 1 >= len(argv):
            print("usage: scale_check_streaming_s11.py [corpus_dir] --out FILE")
            return 2
        out_path = argv[i + 1]
        del argv[i : i + 2]
    if "--reps" in argv:
        i = argv.index("--reps")
        if i + 1 >= len(argv):
            print("usage: scale_check_streaming_s11.py [--reps x1,x10]")
            return 2
        reps = argv[i + 1].split(",")
        del argv[i : i + 2]
    corpus_dir = argv[0] if argv else "/tmp/scale_corpus"

    from pyspark.sql import functions as F

    from bigdatagenomic_spark.session import get_spark
    from bigdatagenomic_spark.streaming.ops import run_lsh_index_maintenance
    from bigdatagenomic_spark.streaming.replay import (
        read_event_stream,
        write_chunks,
    )

    spark = get_spark(app_name="s11-scale-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    # fixed probe set: same docs for every replica, ids disjoint from
    # every replica's id space (rep * 2^20 + doc_id < 2^27 << 2^40)
    probe = (
        spark.read.parquet(PROBE_SRC)
        .where((F.col("doc_id") % 8 == 3) & F.col("text").isNotNull())
        .select(
            (F.col("doc_id") + F.lit(PROBE_ID_OFFSET)).alias("doc_id"),
            "text",
        )
    )
    n_probe = probe.count()
    chunks = [
        probe.where(F.col("doc_id") % N_PROBE_CHUNKS == i).orderBy("doc_id")
        for i in range(N_PROBE_CHUNKS)
    ]

    results: dict[str, dict] = {}
    for rep in reps:
        docs = spark.read.parquet(
            os.path.join(corpus_dir, rep, "documents.parquet")
        ).select("doc_id", "text").where(F.col("text").isNotNull())
        work = tempfile.mkdtemp(prefix=f"s11_{rep}_")
        table = f"t_s11_sweep_{rep}"
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        idx_path = os.path.join(work, "idx")
        try:
            # 1. seed: the whole replica as ONE micro-batch through the
            #    real pipeline (identical write path, no drift)
            seed_dir = os.path.join(work, "seed_stream")
            write_chunks([docs], seed_dir)
            t0 = time.time()
            run_lsh_index_maintenance(
                read_event_stream(spark, seed_dir, docs.schema),
                idx_path,
                table,
                os.path.join(work, "seed_pairs"),
                os.path.join(work, "seed_ckpt"),
                timeout_s=1800,
            )
            seed_s = round(time.time() - t0, 3)
            index_rows = spark.table(table).count()
            index_bytes = _dir_bytes(idx_path)

            # 2. timed probe replay: 3 fixed chunks vs the seeded index
            probe_dir = os.path.join(work, "probe_stream")
            write_chunks(chunks, probe_dir)
            timings: list[dict] = []
            run_lsh_index_maintenance(
                read_event_stream(spark, probe_dir, docs.schema),
                idx_path,
                table,
                os.path.join(work, "probe_pairs"),
                os.path.join(work, "probe_ckpt"),
                timeout_s=1800,
                timings=timings,
            )
            probe_pairs = spark.read.parquet(
                os.path.join(work, "probe_pairs")
            ).count()
            walls = [t["wall_s"] for t in timings]
            results[rep] = {
                "index_rows": index_rows,
                "index_bytes": index_bytes,
                "seed_s": seed_s,
                "n_probe_docs": n_probe,
                "probe_batch_walls_s": walls,
                "median_probe_batch_s": round(
                    sorted(walls)[len(walls) // 2], 3
                ),
                "probe_pairs_emitted": probe_pairs,
            }
            print(f"{rep}: index_rows={index_rows} "
                  f"walls={walls} pairs={probe_pairs}", flush=True)
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {table}")
            shutil.rmtree(work, ignore_errors=True)

    block = {
        "case": "s11_index_maintenance",
        "claim": (
            "per-micro-batch probe cost tracks the bucketed index SCAN "
            "(no index-side shuffle), probe output ~flat by construction"
        ),
        "method": (
            "seed index from each replica via the real pipeline (one "
            "availableNow batch), then replay the SAME 3-chunk probe "
            "set and time each micro-batch via the timings hook"
        ),
        "replicas": results,
    }
    print(json.dumps(block))
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(block, fh, indent=1)
            fh.write("\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
