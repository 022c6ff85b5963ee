"""q18 ×100 forced-shuffle audit (VERDICT r8 #7 / SCALING.md Part 6).

Measures the round-9 q18 rewrite (top-100 pushed BELOW the customer
join, 100-row broadcast build side) against the legacy shape (limit
above the join) on the replicated fact tables, in the three broadcast
regimes the q5 audit established:

  * default    — the session's normal thresholds + AQE (testbed regime)
  * thresh10mb — Spark's stock 10 MB threshold
  * all_shuffled — broadcast disabled entirely (static + adaptive):
    the proxy for the 100 TB cluster where no side fits an executor

Per (regime, variant): wall seconds + the shuffle_audit.py stage-metric
sums (write MB/records, read MB, spill) over exactly the stages the run
executed.

Usage: python tools/audit_q18.py [tables_dir] [--out FILE]
       [--replicas x1,x100]
(default tables_dir /tmp/scale_rel; expects x1/x100 under it).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _api(base: str, path: str):
    with urllib.request.urlopen(base + path) as r:
        return json.load(r)


def measure(spark, base, app_id, fn, sf_dir) -> dict:
    before = _api(base, f"/applications/{app_id}/stages")
    mark = max((s["stageId"] for s in before), default=-1)
    t0 = time.monotonic()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    sec = time.monotonic() - t0
    stages = [
        s
        for s in _api(base, f"/applications/{app_id}/stages")
        if s["stageId"] > mark and s["status"] == "COMPLETE"
    ]
    mb = 1024 * 1024
    sw = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    sw_recs = sum(s.get("shuffleWriteRecords", 0) for s in stages)
    return {
        "sec": round(sec, 2),
        "n_stages": len(stages),
        "shuffle_write_mb": round(sw / mb, 3),
        "shuffle_write_records": sw_recs,
        "shuffle_read_mb": round(
            sum(s.get("shuffleReadBytes", 0) for s in stages) / mb, 3
        ),
        "spill_mb": round(
            sum(
                s.get("memoryBytesSpilled", 0) + s.get("diskBytesSpilled", 0)
                for s in stages
            )
            / mb,
            3,
        ),
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    tables_dir = "/tmp/scale_rel"
    if args and args[0] not in (
        sys.argv[sys.argv.index("--out") + 1] if "--out" in sys.argv else "",
    ):
        tables_dir = args[0]
    out = None
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]
    replicas = ["x1", "x100"]
    if "--replicas" in sys.argv:
        replicas = sys.argv[sys.argv.index("--replicas") + 1].split(",")

    from bigdatagenomic_spark.operators.analytics import (
        q18_limit_above_customer_join,
        q_tpch_q18_shape,
    )
    from bigdatagenomic_spark.session import get_spark

    spark = get_spark(
        app_name="audit-q18", extra_conf={"spark.ui.enabled": "true"}
    )
    ui = spark.sparkContext.uiWebUrl
    assert ui, "audit needs a fresh session with the UI enabled"
    base, app_id = f"{ui}/api/v1", spark.sparkContext.applicationId

    default_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    regimes = [
        ("default", default_thresh),
        ("thresh10mb", str(10 * 1024 * 1024)),
        ("all_shuffled", "-1"),
    ]
    variants = [
        ("before_limit_above", q18_limit_above_customer_join),
        ("after_limit_below", q_tpch_q18_shape),
    ]
    report: dict = {}
    for rep in replicas:
        sf_dir = os.path.join(tables_dir, rep)
        for regime, thresh in regimes:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
            spark.conf.set(
                "spark.sql.adaptive.autoBroadcastJoinThreshold", thresh
            )
            for vname, fn in variants:
                row = measure(spark, base, app_id, fn, sf_dir)
                report[f"{rep}.{regime}.{vname}"] = row
                print(f"{rep}.{regime}.{vname} {json.dumps(row)}", flush=True)

    print(json.dumps(report, indent=1), flush=True)
    if out:
        with open(out, "w") as fh:
            json.dump(report, fh, indent=1)


if __name__ == "__main__":
    main()
