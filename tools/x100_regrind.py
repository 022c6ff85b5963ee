"""x100 re-measure of the wave-9 ops (min-of-3) — first used for the
SCALING_r11s2 artifact, re-run in round 12 on a quiet host (VERDICT
r11 #5) with two additions: q_text_readability (the 47.6x ratio
outlier from the loaded r11 sweep) and an input-partition diagnostic —
the replica corpora are 32 small files, so Spark's file packing
(maxPartitionBytes + openCostInBytes) can collapse the x100 scan into
a handful of partitions, serializing map-only per-row work; the
diagnostic separates that harness artifact (real 100 TB corpora have
thousands of well-sized files) from genuine operator cost. Writes
/tmp/x100_regrind.json (or --out FILE)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from bigdatagenomic_spark.operators.dedup import q_dedup_kmv
    from bigdatagenomic_spark.operators.scale import q_x_weighted_median
    from bigdatagenomic_spark.operators.text import (
        q_text_gopher_repetition,
        q_text_rake_keywords,
        q_text_readability,
    )
    from bigdatagenomic_spark.queries import q_asm_orf
    from bigdatagenomic_spark.session import get_spark

    argv = list(sys.argv[1:])
    out_path = "/tmp/x100_regrind.json"
    if "--out" in argv:
        i = argv.index("--out")
        if i + 1 >= len(argv):
            print("usage: x100_regrind.py [--out FILE]")
            sys.exit(2)
        out_path = argv[i + 1]
        del argv[i : i + 2]

    spark = get_spark(app_name="x100-regrind")
    spark.sparkContext.setLogLevel("ERROR")
    ops = [
        ("goph", q_text_gopher_repetition, "/tmp/scale_corpus"),
        ("rake", q_text_rake_keywords, "/tmp/scale_corpus"),
        ("kmv", q_dedup_kmv, "/tmp/scale_corpus"),
        ("orf", q_asm_orf, "/tmp/scale_corpus"),
        ("wmed", q_x_weighted_median, "/tmp/scale_rel"),
        ("readab", q_text_readability, "/tmp/scale_corpus"),
    ]
    # input-partition diagnostic: how many scan partitions does the
    # documents table get at each scale under the session's file
    # packing? (a collapsed x100 scan serializes map-only work)
    scan_parts = {}
    for rep in ("x1", "x100"):
        p = os.path.join("/tmp/scale_corpus", rep, "documents.parquet")
        scan_parts[rep] = (
            spark.read.parquet(p).rdd.getNumPartitions()
        )
    print("scan_partitions", json.dumps(scan_parts), flush=True)
    for _, fn, d in ops:
        force(fn(spark, os.path.join(d, "x1")))
    x1 = {}
    for n, fn, d in ops:
        runs = []
        for _ in range(2):
            t0 = time.monotonic()
            force(fn(spark, os.path.join(d, "x1")))
            runs.append(round(time.monotonic() - t0, 2))
        x1[n] = min(runs)
    print("x1", json.dumps(x1), flush=True)
    out = {}
    for n, fn, d in ops:
        runs = []
        for _ in range(3):
            t0 = time.monotonic()
            force(fn(spark, os.path.join(d, "x100")))
            runs.append(round(time.monotonic() - t0, 2))
        out[n] = {
            "sec": min(runs),
            "runs": runs,
            "load": round(os.getloadavg()[0], 1),
        }
        print("X100", n, json.dumps(out[n]), flush=True)
    with open(out_path, "w") as fh:
        json.dump(
            {"x1": x1, "x100": out, "scan_partitions": scan_parts},
            fh,
            indent=1,
        )
        fh.write("\n")


if __name__ == "__main__":
    main()
