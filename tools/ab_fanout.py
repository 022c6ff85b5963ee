"""Interleaved A/B of fan_out-on vs fan_out-off per query (round 14).

The host shows ambient bursts (same binary, 2-20x swings minutes apart;
DRIFT_r13 protocol), so per-change timing claims use interleaved pairs
in ONE session: for each query, alternate [on, off, on, off, ...] and
compare min-of-runs. Monkeypatches every operator module's fan_out
symbol to identity for the "off" arm.

Usage: python tools/ab_fanout.py q_a q_b ... [--rounds N] [--sf DIR]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
    import bigdatagenomic_spark.operators as ops_pkg

    spark = get_spark(app_name="ab-fanout")
    qs = registry.queries()

    # every module that imported fan_out
    import importlib
    mods = []
    for m in ("dedup", "text", "llm_prep", "multimodal", "curation", "bpe",
              "relational_ext", "similarity", "stats", "analytics", "scale",
              "graph"):
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

    for name in names:
        if name not in qs:
            print(f"{name}: NOT REGISTERED")
            continue
        spark.sparkContext.setJobDescription(f"ab:{name}")
        # warm both shapes
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
    return 0


if __name__ == "__main__":
    sys.exit(main())
