"""Back-to-back drift check for a named query subset (VERDICT r12 #3).

Round 12 observed +15-29% on the iterative multi-job bench class
(q27_assembly, q_graph_cc, q_dedup_survivors, q_text_boilerplate) with
untouched code and identical plans. This tool runs those queries in ONE
fresh session — same harness discipline as bench.py (untimed codegen
pass, then N timed reps, min + median reported, q08 control) — so two
invocations alternated across git checkouts (ABAB: HEAD, r11, HEAD,
r11) put both binaries on the same host within minutes of each other
and ambient load cannot masquerade as a code regression.

Usage:
    python tools/drift_check.py [--reps N] [--sf DIR] [--label TXT]
                                [name ...]
Imports the package from the CURRENT WORKING DIRECTORY (not this
file's repo), so the same tool file can drive an old-commit worktree:
    cd /tmp/r11_worktree && python /root/repo/tools/drift_check.py
Prints one JSON line {label, git_head, control_min, queries:{name:
{min, median, runs}}}.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.getcwd())

DEFAULT_QUERIES = [
    "q08_agg_tpch_q1",  # control: scan+agg, plan unchanged since r1
    "q27_assembly",
    "q_graph_cc",
    "q_dedup_survivors",
    "q_text_boilerplate",
]


def main() -> int:
    argv = list(sys.argv[1:])
    reps, sf_dir, label = 5, "/root/testdata/sf0.1", "unlabeled"
    for flag in ("--reps", "--sf", "--label"):
        if flag in argv:
            i = argv.index(flag)
            if i + 1 >= len(argv):
                print(f"usage: drift_check.py [{flag} VALUE] [name ...]")
                return 2
            val = argv[i + 1]
            del argv[i : i + 2]
            if flag == "--reps":
                reps = int(val)
            elif flag == "--sf":
                sf_dir = val
            else:
                label = val
    names = argv or DEFAULT_QUERIES

    from bigdatagenomic_spark import queries as registry
    from bigdatagenomic_spark.session import get_spark

    head = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        capture_output=True, text=True,
    ).stdout.strip()
    spark = get_spark(app_name=f"drift-check-{label}")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    force(qs["q01_scan_filter"](spark, sf_dir))  # JVM/footers warm-up
    out: dict[str, dict] = {}
    for name in names:
        force(qs[name](spark, sf_dir))  # untimed codegen pass
        runs = []
        for _ in range(reps):
            t0 = time.time()
            force(qs[name](spark, sf_dir))
            runs.append(round(time.time() - t0, 3))
        out[name] = {
            "min": min(runs),
            "median": round(statistics.median(runs), 3),
            "runs": runs,
        }
    print(json.dumps({
        "label": label,
        "git_head": head,
        "cwd": os.getcwd(),
        "reps": reps,
        "sf_dir": sf_dir,
        "control_min": out.get("q08_agg_tpch_q1", {}).get("min"),
        "queries": out,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
