"""x1/x10/x100 scale sweep for the round-14-continuation CDC kernel
(q_text_cdc_chunks) over the reseeded corpus replicas from
tools/make_scale_corpus.py (/tmp/scale_corpus).

Expected shape, stated before measuring: boundary detection is a
row-local Arrow-batched kernel (one sliding_window_view matmul per
document — SCALING.md Part 15 addendum 2), chunk fingerprinting is a
map-side md5 per ~64-char chunk, and the only exchange is the
chunk-hash window for n_dup. Wall-time should therefore track corpus
character volume roughly linearly; nothing in the plan is quadratic or
skew-prone (the n_dup window key is the high-cardinality chunk hash —
identical replicas do multiply each hash's group by R, but the window
computes one count per group member with partial aggregation, so the
skew surface stays bounded).

Writes SCALING_r14s2.json (or --out FILE).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from bigdatagenomic_spark.operators.llm_prep import q_text_cdc_chunks
    from bigdatagenomic_spark.session import get_spark

    argv = list(sys.argv[1:])
    out_path = "SCALING_r14s2.json"
    if "--out" in argv:
        i = argv.index("--out")
        if i + 1 >= len(argv):
            print("usage: scale_check_cdc.py [--out FILE]")
            sys.exit(2)
        out_path = argv[i + 1]
        del argv[i : i + 2]

    spark = get_spark(app_name="scale-check-cdc")
    spark.sparkContext.setLogLevel("ERROR")

    results: dict = {"op": "q_text_cdc_chunks", "scales": {}}
    for scale in ("x1", "x10", "x100"):
        sf_dir = f"/tmp/scale_corpus/{scale}"
        if not os.path.isdir(sf_dir):
            print(f"{scale}: missing {sf_dir} — run tools/make_scale_corpus.py")
            sys.exit(1)
        force(q_text_cdc_chunks(spark, sf_dir))  # codegen/kernel warm-up
        runs = []
        for _ in range(5):
            t0 = time.time()
            force(q_text_cdc_chunks(spark, sf_dir))
            runs.append(round(time.time() - t0, 3))
        load = os.getloadavg()[0]
        results["scales"][scale] = {
            "min_sec": min(runs),
            "runs": runs,
            "load_1m_after": round(load, 2),
        }
        print(f"{scale}: min {min(runs)}s runs {runs} load {load:.2f}")

    x1 = results["scales"]["x1"]["min_sec"]
    for scale in ("x10", "x100"):
        r = results["scales"][scale]
        r["ratio_vs_x1"] = round(r["min_sec"] / x1, 2)
        print(f"{scale} ratio vs x1: {r['ratio_vs_x1']}")

    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)
        fh.write("\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
