"""Round-9 operator scale sweep (SCALING.md Part 7): run the new
corpus/event operators UNMODIFIED at x1/x10/x100.

Text family against the synthetic corpus replicas
(tools/make_scale_corpus.py — 5k -> 500k docs, 10% verbatim cross-
replica dup clusters so dedup-flavored work grows with scale):
  * cdc     — q_text_cdc_chunks: map-only boundary hashing + the
              chunk-hash dup-count window (the one exchange that grows)
  * bm25    — q_text_bm25: row-local tf/dl + 1-row stats broadcast +
              TakeOrdered (should be scan-bound, near-linear)
  * ttr     — q_text_ttr: pure scan projection (the linearity control)
  * decon   — q_x_decontam_fuzzy: LSH band join train x mod-19 eval +
              exact verify (candidates grow with the cross-replica
              verbatim clusters — the honest super-constant workload)

Event/order family against the replicated fact tables
(tools/make_scale_tables.py):
  * attr    — q_x_attribution: single user-keyed window over events
  * linreg  — q_x_linreg: one map-side-combined moment aggregate

Usage: python tools/scale_check_r9.py [corpus_dir] [rel_dir] [--out F]
(defaults /tmp/scale_corpus /tmp/scale_rel; expects x1/x10/x100).
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
    argv = sys.argv[1:]
    opt_values = {
        argv[i + 1]
        for i, a in enumerate(argv)
        if a.startswith("--") and i + 1 < len(argv)
    }
    args = [a for a in argv if not a.startswith("--") and a not in opt_values]
    corpus_dir = args[0] if len(args) > 0 else "/tmp/scale_corpus"
    rel_dir = args[1] if len(args) > 1 else "/tmp/scale_rel"
    out = None
    if "--out" in argv:
        out = argv[argv.index("--out") + 1]

    from bigdatagenomic_spark.operators.llm_prep import (
        q_text_cdc_chunks,
        q_x_decontam_fuzzy,
    )
    from bigdatagenomic_spark.operators.relational_ext import q_x_attribution
    from bigdatagenomic_spark.operators.stats import q_x_linreg
    from bigdatagenomic_spark.operators.text import q_text_bm25, q_text_ttr
    from bigdatagenomic_spark.session import get_spark

    corpus_ops = [
        ("cdc", q_text_cdc_chunks),
        ("bm25", q_text_bm25),
        ("ttr", q_text_ttr),
        ("decon", q_x_decontam_fuzzy),
    ]
    rel_ops = [("attr", q_x_attribution), ("linreg", q_x_linreg)]

    spark = get_spark(app_name="scale-check-r9")
    results: dict[str, dict] = {}
    for rep in (1, 10, 100):
        row: dict = {}
        for name, fn in corpus_ops:
            t0 = time.monotonic()
            force(fn(spark, os.path.join(corpus_dir, f"x{rep}")))
            row[name] = {"sec": round(time.monotonic() - t0, 2)}
        for name, fn in rel_ops:
            t0 = time.monotonic()
            force(fn(spark, os.path.join(rel_dir, f"x{rep}")))
            row[name] = {"sec": round(time.monotonic() - t0, 2)}
        # context rows: output sizes (counted once, not timed)
        row["cdc"]["rows"] = q_text_cdc_chunks(
            spark, os.path.join(corpus_dir, f"x{rep}")
        ).count()
        row["decon"]["rows"] = q_x_decontam_fuzzy(
            spark, os.path.join(corpus_dir, f"x{rep}")
        ).count()
        results[f"x{rep}"] = row
        print(json.dumps({f"x{rep}": row}), flush=True)

    report: dict = {"r9_ops": results}
    base = results["x1"]
    for hi in (10, 100):
        cur = results[f"x{hi}"]
        report[f"ratio_x{hi}"] = {
            op: round(cur[op]["sec"] / max(base[op]["sec"], 1e-9), 2)
            for op in cur
        }
    print(json.dumps(report, indent=1), flush=True)
    if out:
        with open(out, "w") as fh:
            json.dump(report, fh, indent=1)


if __name__ == "__main__":
    main()
