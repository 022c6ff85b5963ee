"""Graph-family scale validation (VERDICT r8 #4 / SCALING.md part 6):
run the round-8 iterative graph operators UNMODIFIED — k_core, SCC
(trim+coloring), HITS, Bellman-Ford SSSP — against 1x/10x/100x edge
sets derived from the replicated fact tables (tools/make_scale_tables.py)
and report wall-time growth plus the SCC round counts.

Edge construction keeps growth HONEST: each lineitem replica gets its
own disjoint part-vertex space (dst = replica_base + 2^23 + l_partkey,
src = l_orderkey which is already replica-offset), so x100 is 100
structurally identical disjoint copies of the x1 graph — per-vertex
degrees, component shapes, peel depths and SCC-DAG depth are all
scale-invariant, and the only thing allowed to grow is per-round data
volume. A wall ratio at or below the data ratio means the per-round
joins/aggregates scale; a growing ROUND count would mean the graph
construction leaked structure across replicas (a bug in this harness,
not the operator).

Workloads (operators called directly, not the bounded registry slices —
the registry queries pin correctness on l_orderkey<200 slices whose
size is SF-invariant; this harness measures the generic operators):
  * kcore2  — k_core(k=2) on the undirected order—part graph
  * scc     — strongly_connected_components on the directed graph:
              order->part always, part->order on each order's first
              line (creates bounded non-trivial SCCs inside each
              replica); stats_out pins {outer, trim, color, mark} —
              the driver-action budget (2 isEmpty + checkpoints per
              trim round) that VERDICT r8 flagged as unmeasured
  * hits    — 4 exact-integer HITS rounds on the directed graph
  * sssp    — 8 Bellman-Ford rounds from the min order vertex
              (single-replica reach by construction: the frontier
              stays x1-sized while the scanned edge set grows —
              exactly the broadcast-frontier shape we want at 100 TB)

Usage: python tools/scale_check_graph.py [tables_dir] [--out FILE]
       [--replicas 1,10,100]
(default tables_dir /tmp/scale_rel; expects x1/x10/x100 under it).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bigdatagenomic_spark.session import get_spark

REP_STRIDE = 1 << 24  # must match tools/make_scale_tables.py
PART_BASE = 1 << 23   # within-replica offset separating part vertices
                      # from order vertices (orderkeys < 2^23 per rep)


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def edges_for(spark, tables_dir: str, rep: int):
    """(directed, undirected, back-edged) edge frames for replica set x{rep}."""
    li = spark.read.parquet(
        os.path.join(tables_dir, f"x{rep}", "lineitem.parquet")
    ).select("l_orderkey", "l_partkey", "l_linenumber", "l_quantity")
    rep_base = (F.col("l_orderkey") / REP_STRIDE).cast("long") * REP_STRIDE
    part_vid = (rep_base + PART_BASE + F.col("l_partkey")).alias("dst")
    fwd = li.select(F.col("l_orderkey").alias("src"), part_vid,
                    F.col("l_quantity").cast("long").alias("w"))
    back = (
        li.where(F.col("l_linenumber") == 1)
        .select(part_vid.alias("src"),
                F.col("l_orderkey").alias("dst"),
                F.col("l_quantity").cast("long").alias("w"))
    )
    directed = fwd.select("src", "dst").unionByName(back.select("src", "dst"))
    weighted = fwd.unionByName(back)
    return fwd.select("src", "dst"), directed, weighted


def main() -> None:
    argv = sys.argv[1:]
    opt_values = {
        argv[i + 1]
        for i, a in enumerate(argv)
        if a.startswith("--") and i + 1 < len(argv)
    }
    args = [a for a in argv if not a.startswith("--") and a not in opt_values]
    tables_dir = args[0] if args else "/tmp/scale_rel"
    out = None
    if "--out" in argv:
        out = argv[argv.index("--out") + 1]
    replicas = (1, 10, 100)
    if "--replicas" in argv:
        replicas = tuple(
            int(x) for x in argv[argv.index("--replicas") + 1].split(",")
        )

    from bigdatagenomic_spark.operators.graph import (
        hits_exact,
        k_core,
        sssp_bellman_ford,
        strongly_connected_components,
    )

    spark = get_spark(app_name="scale-check-graph")
    results: dict[str, dict] = {}
    for rep in replicas:
        bi, directed, weighted = edges_for(spark, tables_dir, rep)
        n_edges = directed.count()
        row: dict = {"edges": n_edges}

        t0 = time.monotonic()
        rounds: list = []
        kc = k_core(bi, k=2, rounds_out=rounds)
        n_core = kc.count()
        row["kcore2"] = {
            "sec": round(time.monotonic() - t0, 3),
            "rows": n_core,
            "peel_rounds": rounds[0] if rounds else 0,
        }

        t0 = time.monotonic()
        stats: dict = {}
        scc = strongly_connected_components(directed, stats_out=stats)
        n_scc = scc.select("scc").distinct().count()
        row["scc"] = {
            "sec": round(time.monotonic() - t0, 3),
            "n_scc": n_scc,
            **stats,
        }

        t0 = time.monotonic()
        force(hits_exact(directed))
        row["hits"] = {"sec": round(time.monotonic() - t0, 3)}

        src = bi.agg(F.min("src")).collect()[0][0]
        t0 = time.monotonic()
        sym = weighted.unionByName(
            weighted.select(F.col("dst").alias("src"),
                            F.col("src").alias("dst"), "w")
        )
        n_reached = sssp_bellman_ford(sym, source=int(src)).count()
        row["sssp"] = {
            "sec": round(time.monotonic() - t0, 3),
            "reached": n_reached,
        }

        results[f"x{rep}"] = row
        print(json.dumps({f"x{rep}": row}), flush=True)

    report = {"graph": results}
    base = results.get(f"x{replicas[0]}", {})
    for hi in replicas[1:]:
        key = f"ratio_x{hi}"
        cur = results.get(f"x{hi}", {})
        report[key] = {
            op: round(cur[op]["sec"] / max(base[op]["sec"], 1e-9), 2)
            for op in ("kcore2", "scc", "hits", "sssp")
            if op in cur and op in base
        }
    print(json.dumps(report, indent=1), flush=True)
    if out:
        with open(out, "w") as fh:
            json.dump(report, fh, indent=1)


if __name__ == "__main__":
    main()
