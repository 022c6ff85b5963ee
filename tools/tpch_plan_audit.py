"""Plan-hygiene audit of the 21 TPC-H shapes (round 12: the tranche
enters the driver gate, ROTATION.md).

For every q_tpch_*_shape at a given sf_dir, capture the EXECUTED plan
(AQE final) and count the physical operators that matter at 100 TB:
broadcast vs sort-merge joins, shuffle exchanges, and whole-stage
codegen coverage. Flags any shape whose plan contains a cartesian
product or a non-broadcast nested-loop join (none should).

Usage: python tools/tpch_plan_audit.py [sf_dir] [--out FILE]
(default /root/testdata/sf0.1; --out writes the JSON table).
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COUNTERS = {
    "bhj": r"BroadcastHashJoin",
    "smj": r"SortMergeJoin",
    "shj": r"ShuffledHashJoin",
    "bnlj": r"BroadcastNestedLoopJoin",
    "cartesian": r"CartesianProduct",
    "exchange": r"Exchange (?:hash|range)partitioning",
    # ADVICE r12: global aggregates / top-Ns emit "Exchange
    # SinglePartition" which the hash/range pattern missed — count it
    # separately so shuffle totals are complete
    "exchange_single": r"Exchange SinglePartition",
    "broadcast_exchange": r"BroadcastExchange",
    # executed-plan strings mark codegen membership with "*(id) Node";
    # this counts node OCCURRENCES inside codegen (see wsc_spans below
    # for distinct-span counting — ADVICE r12)
    "wsc_nodes": r"\*\(\d+\) ",
}


def main() -> int:
    argv = list(sys.argv[1:])
    out_path = None
    if "--out" in argv:
        i = argv.index("--out")
        if i + 1 >= len(argv):
            print("usage: tpch_plan_audit.py [sf_dir] [--out FILE]")
            return 2
        out_path = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"

    from bigdatagenomic_spark import queries as registry
    from bigdatagenomic_spark.session import get_spark

    spark = get_spark(app_name="tpch-plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    names = sorted(
        n for n in registry.queries() if n.startswith("q_tpch_")
    )
    table: dict[str, dict] = {}
    flagged = []
    for name in names:
        df = registry.queries()[name](spark, sf_dir)
        # execute THIS df's own QueryExecution (TPC-H outputs are small
        # aggregates/top-Ns) so the plan we read is the AQE FINAL plan
        # with codegen markers — a noop write would execute a separate
        # plan instance and leave this one isFinalPlan=false
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        # AQE's toString prints "== Final Plan ==" followed by
        # "== Initial Plan ==" — keep only the final section so no
        # node is counted twice
        plan = plan.split("== Initial Plan ==")[0]
        row = {
            k: len(re.findall(pat, plan)) for k, pat in COUNTERS.items()
        }
        # distinct codegen ids = whole-stage codegen SPANS (ADVICE r12:
        # wsc_nodes counts occurrences, not spans)
        row["wsc_spans"] = len(set(re.findall(r"\*\((\d+)\)", plan)))
        table[name] = row
        if row["cartesian"] or row["bnlj"]:
            flagged.append(name)
        print(name, json.dumps(row), flush=True)

    out = {
        "sf_dir": sf_dir,
        "plans": table,
        "flagged_cartesian_or_bnlj": flagged,
        "totals": {
            k: sum(r[k] for r in table.values())
            for k in list(COUNTERS) + ["wsc_spans"]
        },
    }
    print(json.dumps({"flagged": flagged, "totals": out["totals"]}))
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(out, fh, indent=1)
            fh.write("\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
