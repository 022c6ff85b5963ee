"""Measured shuffle-volume audit (SCALING.md part 3).

The plan audits claim the expensive pipelines shuffle NARROW rows —
dup_spans ships 28-byte fingerprints (never text), boilerplate ships
segment hashes, survivors ships (id, component), broadcast plans ship
nothing. This tool converts those claims into measured bytes: it runs
each headline query against $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) with the Spark UI REST API enabled and reports
per-query totals of input records, shuffle write/read volume, spill,
and — the number the claims are actually about — compressed wire bytes
PER SHUFFLED ROW, summed over exactly the stages that query executed.

Stage inputBytes is deliberately NOT used: on the local filesystem the
Hadoop bytesRead statistic under-reports vectorized parquet scans by
orders of magnitude (observed: 17 KB reported for a 600k-row, 11 MB
scan), while inputRecords and shuffleWrite{Bytes,Records} are exact
task-level counters. Shuffle bytes are post-compression (lz4), so
bytes/row is a lower bound on the in-memory row width — fine for
auditing "narrow rows", since compression cannot hide a wide row
carrying document text.

Method: record the max stageId before the run, force the query through
a noop sink, then sum metrics over new COMPLETE stages from
/api/v1/applications/{app}/stages. Run standalone (the UI conf only
takes effect on a fresh session):

    python tools/shuffle_audit.py [--out FILE] [--sf-dir DIR] \
        [--queries a,b,c]

--sf-dir points the audit at any table directory (e.g. the x100
replicated facts from tools/make_scale_tables.py — VERDICT r7 #7 audits
q_tpch_q9_shape in the shuffled-facts regime that only appears there);
--queries narrows the audited set.
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = (
    "q08_agg_tpch_q1",      # partial agg: shuffle should be ~KB vs MB input
    "q04_broadcast_join",   # broadcast dim: zero shuffle expected
    "q26_cosine_topk",      # broadcast query side: zero shuffle expected
    "q_text_dup_spans",     # claim: 28-byte fingerprint rows only
    "q_text_boilerplate",   # claim: segment hashes only, text never twice
    "q_dedup_survivors",    # claim: sigs/bands/(id,component) only
    "q_x_curriculum",       # claim: two-phase cumsum, narrow rank rows
    "q_tpch_q9_shape",      # honest heavy case: shuffled facts
)


def _api(base: str, path: str):
    with urllib.request.urlopen(base + path) as r:
        return json.load(r)


def main() -> None:
    out_file = None
    if "--out" in sys.argv:
        out_file = sys.argv[sys.argv.index("--out") + 1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--sf-dir" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf-dir") + 1]
    queries_to_run = QUERIES
    if "--queries" in sys.argv:
        queries_to_run = tuple(
            sys.argv[sys.argv.index("--queries") + 1].split(",")
        )

    from bigdatagenomic_spark.queries import queries
    from bigdatagenomic_spark.session import get_spark

    spark = get_spark(
        app_name="shuffle-audit", extra_conf={"spark.ui.enabled": "true"}
    )
    ui = spark.sparkContext.uiWebUrl
    assert ui, "Spark UI did not start; audit needs a fresh session"
    base = f"{ui}/api/v1"
    app_id = spark.sparkContext.applicationId
    reg = queries()

    results: dict[str, dict] = {}
    for name in queries_to_run:
        before = _api(base, f"/applications/{app_id}/stages")
        mark = max((s["stageId"] for s in before), default=-1)
        df = reg[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        stages = [
            s
            for s in _api(base, f"/applications/{app_id}/stages")
            if s["stageId"] > mark and s["status"] == "COMPLETE"
        ]
        mb = 1024 * 1024
        in_recs = sum(s.get("inputRecords", 0) for s in stages)
        sw = sum(s.get("shuffleWriteBytes", 0) for s in stages)
        sw_recs = sum(s.get("shuffleWriteRecords", 0) for s in stages)
        sr = sum(s.get("shuffleReadBytes", 0) for s in stages)
        spill = sum(
            s.get("memoryBytesSpilled", 0) + s.get("diskBytesSpilled", 0)
            for s in stages
        )
        row = {
            "n_stages": len(stages),
            "input_records": in_recs,
            "shuffle_write_mb": round(sw / mb, 3),
            "shuffle_write_records": sw_recs,
            "shuffle_read_mb": round(sr / mb, 3),
            "spill_mb": round(spill / mb, 3),
            "bytes_per_shuffled_row": round(sw / sw_recs, 1) if sw_recs else 0.0,
            "shuffled_rows_per_input_row": (
                round(sw_recs / in_recs, 3) if in_recs else 0.0
            ),
        }
        results[name] = row
        print(name, row, flush=True)

    line = json.dumps(results)
    print(line, flush=True)
    if out_file:
        with open(out_file, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
