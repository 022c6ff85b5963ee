"""Round-11 session-2 operator scale sweep (SCALING.md Part 9 cont.):
the five wave-9 ops, unmodified, at x1/x10/x100.

Corpus family (tools/make_scale_corpus.py replicas):
  * goph   — q_text_gopher_repetition: row-local gram folds — map-only,
             must track the scan
  * rake   — q_text_rake_keywords: row-local phrase build + phrase/word
             aggregates + join — grows with token volume
  * kmv    — q_dedup_kmv: ONE distinct shuffle + bucketed two-phase
             bottom-k; the sketch algebra after it is constant-size
  * orf    — q_asm_orf: map-only regex scan — must track the scan

Event/order family (tools/make_scale_tables.py replicas):
  * wmed   — q_x_weighted_median: two_phase_cumsum per flag over the
             fact — rank-like cost, grows with rows (the gini/trimm
             sibling), crossing pick is bounded

Usage: python tools/scale_check_r11s2.py [corpus_dir] [rel_dir] [--out F]
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
    argv = list(sys.argv[1:])
    out = None
    if "--out" in argv:
        i = argv.index("--out")
        if i + 1 >= len(argv):
            print("usage: scale_check_r11s2.py [corpus_dir] [rel_dir] --out FILE")
            sys.exit(2)
        out = argv[i + 1]
        del argv[i : i + 2]
    corpus_dir = argv[0] if len(argv) > 0 else "/tmp/scale_corpus"
    rel_dir = argv[1] if len(argv) > 1 else "/tmp/scale_rel"

    from bigdatagenomic_spark.operators.dedup import q_dedup_kmv
    from bigdatagenomic_spark.operators.scale import q_x_weighted_median
    from bigdatagenomic_spark.operators.text import (
        q_text_gopher_repetition,
        q_text_rake_keywords,
    )
    from bigdatagenomic_spark.queries import q_asm_orf
    from bigdatagenomic_spark.session import get_spark

    corpus_ops = [
        ("goph", q_text_gopher_repetition),
        ("rake", q_text_rake_keywords),
        ("kmv", q_dedup_kmv),
        ("orf", q_asm_orf),
    ]
    rel_ops = [("wmed", q_x_weighted_median)]

    spark = get_spark(app_name="scale-check-r11s2")
    for _, fn in corpus_ops:
        force(fn(spark, os.path.join(corpus_dir, "x1")))
    for _, fn in rel_ops:
        force(fn(spark, os.path.join(rel_dir, "x1")))

    def timed(fn, sf_dir_: str) -> dict:
        runs = []
        for _ in range(2):
            t0 = time.monotonic()
            force(fn(spark, sf_dir_))
            runs.append(round(time.monotonic() - t0, 2))
        return {"sec": min(runs), "runs": runs}

    results: dict[str, dict] = {}
    for rep in (1, 10, 100):
        row: dict = {"load_avg_start": round(os.getloadavg()[0], 1)}
        for name, fn in corpus_ops:
            row[name] = timed(fn, os.path.join(corpus_dir, f"x{rep}"))
        for name, fn in rel_ops:
            row[name] = timed(fn, os.path.join(rel_dir, f"x{rep}"))
        results[f"x{rep}"] = row
        print(json.dumps({f"x{rep}": row}), flush=True)

    report: dict = {"r11s2_ops": results}
    base = results["x1"]
    for hi in (10, 100):
        cur = results[f"x{hi}"]
        report[f"ratio_x{hi}"] = {
            op: round(cur[op]["sec"] / max(base[op]["sec"], 1e-9), 2)
            for op in cur
            if isinstance(cur[op], dict) and "sec" in cur[op]
        }
    print(json.dumps(report, indent=1), flush=True)
    if out:
        with open(out, "w") as fh:
            json.dump(report, fh, indent=1)


if __name__ == "__main__":
    main()
