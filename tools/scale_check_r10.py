"""Round-10 operator scale sweep (SCALING.md Part 8): run the new
operators UNMODIFIED at x1/x10/x100.

Corpus family (tools/make_scale_corpus.py replicas — 10% verbatim
cross-replica dup clusters, so novelty has honest shrinking-novelty
work as the corpus grows):
  * entropy — q_text_entropy: row-local sorted-fold projection (the
              map-only linearity control)
  * novelty — q_text_novelty: shingle-hash df exchange + join-back
              (the one exchange that grows with the corpus)

Event/order family (tools/make_scale_tables.py replicas — facts grow,
dims don't):
  * bloomj  — q_x_bloom_join: the Bloom prefilter's value GROWS with
              the fact (more rows dropped before the join)
  * joinsz  — q_x_join_size: per-key count aggregate over events
  * shift   — q_x_level_shift: daily series grows (366 days/replica)
  * calib   — q_x_calibration: map + 10-row aggregate (control)
  * sax     — q_x_sax: weekly PAA series grows with the calendar
  * nagg    — q_graph_neighbor_agg: o_orderkey < 2000 slice — a
              PUSHDOWN control: the scan grows 100x, the work must not
  * walks   — q_graph_walks: same bounded slice, same pushdown control

Usage: python tools/scale_check_r10.py [corpus_dir] [rel_dir] [--out F]
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

    from bigdatagenomic_spark.operators.graph import (
        q_graph_neighbor_agg,
        q_graph_walks,
    )
    from bigdatagenomic_spark.operators.scale import (
        q_x_bloom_join,
        q_x_join_size,
    )
    from bigdatagenomic_spark.operators.stats import (
        q_x_calibration,
        q_x_level_shift,
        q_x_sax,
    )
    from bigdatagenomic_spark.operators.text import (
        q_text_entropy,
        q_text_novelty,
    )
    from bigdatagenomic_spark.session import get_spark

    corpus_ops = [
        ("entropy", q_text_entropy),
        ("novelty", q_text_novelty),
    ]
    rel_ops = [
        ("bloomj", q_x_bloom_join),
        ("joinsz", q_x_join_size),
        ("shift", q_x_level_shift),
        ("calib", q_x_calibration),
        ("sax", q_x_sax),
        ("nagg", q_graph_neighbor_agg),
        ("walks", q_graph_walks),
    ]

    spark = get_spark(app_name="scale-check-r10")
    # warm-up: JVM + codegen for every plan shape at x1, untimed (the
    # r9 sweep billed first-job costs to the x1 row, which understated
    # every ratio)
    for _, fn in corpus_ops:
        force(fn(spark, os.path.join(corpus_dir, "x1")))
    for _, fn in rel_ops:
        force(fn(spark, os.path.join(rel_dir, "x1")))
    def timed(fn, sf_dir_: str) -> dict:
        # min-of-2: the shared host carries external load bursts that
        # inflate single-shot walls 5-10x (the bench.py lesson); the
        # min is the closest observable to true steady-state
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
        # context rows (counted once, not timed)
        row["novelty"]["rows"] = q_text_novelty(
            spark, os.path.join(corpus_dir, f"x{rep}")
        ).count()
        row["shift"]["rows"] = q_x_level_shift(
            spark, os.path.join(rel_dir, f"x{rep}")
        ).count()
        results[f"x{rep}"] = row
        print(json.dumps({f"x{rep}": row}), flush=True)

    report: dict = {"r10_ops": results}
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
