"""Interleaved A/B of connected_components variants (VERDICT r14 #4):

  BASE  — round-14 shape: per round neighbor-min + ONE pointer jump,
          eager checkpoint, isEmpty convergence probe.
  JUMP2 — same, but TWO pointer jumps per materialized round (squares
          the propagation distance twice -> fewer rounds, each round
          pays one extra in-plan self-join but no extra job).
  LAZY  — BASE with the two up-front checkpoints (sym, labels) made
          lazy: round 1's first action materializes both in one job.

Patches graph.connected_components (near_dup_survivors imports it
function-locally, so q_dedup_survivors follows the patch). Also prints
rounds-to-converge per variant.

Usage: python tools/ab_cc_r15.py [--rounds N] [--sf DIR] [q ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def _cc(edges: DataFrame, max_rounds: int = 30, n_jumps: int = 1,
        lazy_init: bool = False, counter: list | None = None) -> DataFrame:
    from bigdatagenomic_spark.operators.graph import aggregate_messages

    eager = not lazy_init
    sym = (
        edges.select("src", "dst")
        .unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=eager)
    )
    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=eager)
    )
    for r in range(max_rounds):
        neighbor_min = aggregate_messages(
            labels.select("id", "component"),
            sym,
            msg=F.col("component"),
            combine="min",
            direction="out",
        )
        jumped = labels.join(neighbor_min, "id", "left").select(
            "id",
            F.col("component").alias("_old"),
            F.least(
                F.col("component"), F.coalesce("msg_agg", F.col("component"))
            ).alias("component"),
        )
        for _ in range(n_jumps):
            parents = jumped.select(
                F.col("id").alias("component"), F.col("component").alias("_parent")
            )
            jumped = jumped.join(parents, "component", "left").select(
                "id",
                "_old",
                F.least(
                    F.col("component"), F.coalesce("_parent", F.col("component"))
                ).alias("component"),
            )
        new_labels = jumped.localCheckpoint(eager=True)
        converged = new_labels.where(F.col("component") != F.col("_old")).isEmpty()
        labels = new_labels.select("id", "component")
        if converged:
            if counter is not None:
                counter.append(r + 1)
            break
    return labels


def cc_base(edges, max_rounds=30):
    return _cc(edges, max_rounds, n_jumps=1, lazy_init=False)


def cc_jump2(edges, max_rounds=30):
    return _cc(edges, max_rounds, n_jumps=2, lazy_init=False)


def cc_lazy(edges, max_rounds=30):
    return _cc(edges, max_rounds, n_jumps=1, lazy_init=True)


def cc_jump2_lazy(edges, max_rounds=30):
    return _cc(edges, max_rounds, n_jumps=2, lazy_init=True)


VARIANTS = {
    "base": cc_base,
    "jump2": cc_jump2,
    "lazy": cc_lazy,
    "jump2lazy": cc_jump2_lazy,
}


def main() -> int:
    argv = list(sys.argv[1:])
    rounds = 3
    if "--rounds" in argv:
        i = argv.index("--rounds")
        rounds = int(argv[i + 1])
        del argv[i : i + 2]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in argv:
        i = argv.index("--sf")
        sf_dir = argv[i + 1]
        del argv[i : i + 2]
    names = argv or ["q_graph_cc", "q_dedup_survivors"]

    from bigdatagenomic_spark import queries as registry
    from bigdatagenomic_spark.operators import dedup, graph
    from bigdatagenomic_spark.session import get_spark

    spark = get_spark(app_name="ab-cc-r15")
    qs = registry.queries()
    orig_cc = graph.connected_components

    def set_variant(fn):
        graph.connected_components = fn
        dedup_cc = getattr(dedup, "connected_components", None)
        if dedup_cc is not None:
            dedup.connected_components = fn

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(name: str) -> float:
        t0 = time.time()
        force(qs[name](spark, sf_dir))
        return time.time() - t0

    # rounds-to-converge per variant (once, untimed)
    for name in names:
        for vname in ("base", "jump2"):
            ctr: list = []
            fn = lambda e, max_rounds=30, _v=vname, _c=ctr: _cc(  # noqa: E731
                e, max_rounds, n_jumps=(2 if _v == "jump2" else 1), counter=_c
            )
            set_variant(fn)
            timed(name)
            print(f"{name} {vname}: rounds-to-converge {ctr}")

    timed("q08_agg_tpch_q1")
    print(f"control q08 min: {min(timed('q08_agg_tpch_q1') for _ in range(3)):.3f}")
    for name in names:
        spark.sparkContext.setJobDescription(f"ab-cc:{name}")
        results = {v: [] for v in VARIANTS}
        for v, fn in VARIANTS.items():
            set_variant(fn)
            timed(name)  # warm each shape
        for _ in range(rounds):
            for v, fn in VARIANTS.items():
                set_variant(fn)
                results[v].append(timed(name))
        print(
            f"{name}: "
            + " | ".join(
                f"{v} min {min(rs):.3f} {[round(r, 2) for r in rs]}"
                for v, rs in results.items()
            )
        )
    set_variant(orig_cc)
    print(f"control q08 min: {min(timed('q08_agg_tpch_q1') for _ in range(3)):.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
