"""Round-15 interleaved A/B: fan_out on vs OFF, patched at the SOURCE.

Round 14's tools/ab_fanout.py monkeypatched each operator module's
``fan_out`` attribute — which misses every call site that does a
function-local ``from bigdatagenomic_spark.sources.tables import
fan_out`` (all four sites in operators/scale.py and llm_prep's _docs
variant). For those queries the round-14 "interleaved A/B" compared
fan_out-on against fan_out-on: a wash by construction. The driver's
quiet-host bench then showed q_x_trimmed_mean 2.2x slower with the kept
fan_out (BENCH_r14 min 6.277 vs BENCH_r13 2.861, control 0.80).

This tool patches ``bigdatagenomic_spark.sources.tables.fan_out``
ITSELF (which function-local imports re-resolve on every call) plus
every already-bound module-level alias, so the OFF arm is real for all
53 call sites. Interleaved [on, off] pairs in one session, min-of-runs
decides (DRIFT_r13 protocol; the host shows multi-minute ambient bursts
that inflate identical code 2-60x).

Usage: python tools/ab_r15.py q_a q_b ... [--rounds N] [--sf DIR]
"""

from __future__ import annotations

import importlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OP_MODULES = (
    "dedup", "text", "llm_prep", "multimodal", "curation", "bpe",
    "relational_ext", "similarity", "stats", "analytics", "scale", "graph",
)


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
    names = argv

    from bigdatagenomic_spark import queries as registry
    from bigdatagenomic_spark.session import get_spark
    from bigdatagenomic_spark.sources import tables

    spark = get_spark(app_name="ab-r15")
    qs = registry.queries()

    mods = [tables]
    for m in OP_MODULES:
        mod = importlib.import_module(f"bigdatagenomic_spark.operators.{m}")
        if hasattr(mod, "fan_out"):
            mods.append(mod)

    origs = {m: m.fan_out for m in mods}
    identity = lambda df, parts=None: df  # noqa: E731

    def set_fanout(on: bool) -> None:
        for m in mods:
            m.fan_out = origs[m] if on else identity

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(name: str) -> float:
        t0 = time.time()
        force(qs[name](spark, sf_dir))
        return time.time() - t0

    # ambient-load control, before and after the sweep
    set_fanout(True)
    timed("q08_agg_tpch_q1")
    print(f"control q08 min: {min(timed('q08_agg_tpch_q1') for _ in range(3)):.3f}")

    for name in names:
        if name not in qs:
            print(f"{name}: NOT REGISTERED")
            continue
        spark.sparkContext.setJobDescription(f"ab15:{name}")
        set_fanout(True); timed(name)
        set_fanout(False); timed(name)
        on_runs, off_runs = [], []
        for _ in range(rounds):
            set_fanout(True); on_runs.append(timed(name))
            set_fanout(False); off_runs.append(timed(name))
        set_fanout(True)
        print(
            f"{name}: ON min {min(on_runs):.3f} {[round(r, 2) for r in on_runs]}"
            f" | OFF min {min(off_runs):.3f} {[round(r, 2) for r in off_runs]}"
        )
    set_fanout(True)
    print(f"control q08 min: {min(timed('q08_agg_tpch_q1') for _ in range(3)):.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
