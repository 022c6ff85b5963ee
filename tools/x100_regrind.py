"""One-off x100 re-measure of the wave-9 ops (min-of-3) for the
SCALING_r11s2 artifact — the committed sweep's x100 block showed 2-4x
run-to-run variance from host-load bursts, so the x100 ratios get a
dedicated quieter-window pass. Writes /tmp/x100_regrind.json."""

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
    )
    from bigdatagenomic_spark.queries import q_asm_orf
    from bigdatagenomic_spark.session import get_spark

    spark = get_spark(app_name="x100-regrind")
    spark.sparkContext.setLogLevel("ERROR")
    ops = [
        ("goph", q_text_gopher_repetition, "/tmp/scale_corpus"),
        ("rake", q_text_rake_keywords, "/tmp/scale_corpus"),
        ("kmv", q_dedup_kmv, "/tmp/scale_corpus"),
        ("orf", q_asm_orf, "/tmp/scale_corpus"),
        ("wmed", q_x_weighted_median, "/tmp/scale_rel"),
    ]
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
    with open("/tmp/x100_regrind.json", "w") as fh:
        json.dump({"x1": x1, "x100": out}, fh, indent=1)


if __name__ == "__main__":
    main()
