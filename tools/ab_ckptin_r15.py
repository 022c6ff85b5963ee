"""Interleaved A/B: checkpoint_input eager (r13) vs LAZY inside the
two-phase helpers. With a lazy pin the range-sampling pass is what
materializes the input (once — the shuffle then reads the pinned
blocks), so the standalone blocking job disappears but the
double-computation the eager pin exists to prevent stays prevented.

Patches scale.two_phase_rank / two_phase_cumsum (callers import them
function-locally, so the patch reaches q_x_curriculum /
q_x_train_shards / q_x_token_budget_mix).

Usage: python tools/ab_ckptin_r15.py [--rounds N] [--sf DIR] [q ...]
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
    names = argv or ["q_x_curriculum", "q_x_train_shards", "q_x_token_budget_mix"]

    from bigdatagenomic_spark import queries as registry
    from bigdatagenomic_spark.operators import scale
    from bigdatagenomic_spark.session import get_spark

    spark = get_spark(app_name="ab-ckptin-r15")
    qs = registry.queries()
    orig_rank, orig_cumsum = scale.two_phase_rank, scale.two_phase_cumsum

    def make_lazy(orig):
        def wrapped(df, *args, checkpoint_input=False, **kw):
            if checkpoint_input:
                df = df.localCheckpoint(eager=False)
            return orig(df, *args, checkpoint_input=False, **kw)

        return wrapped

    lazy_rank, lazy_cumsum = make_lazy(orig_rank), make_lazy(orig_cumsum)

    def set_lazy(on: bool) -> None:
        scale.two_phase_rank = lazy_rank if on else orig_rank
        scale.two_phase_cumsum = lazy_cumsum if on else orig_cumsum

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(name: str) -> float:
        t0 = time.time()
        force(qs[name](spark, sf_dir))
        return time.time() - t0

    timed("q08_agg_tpch_q1")
    print(f"control q08 min: {min(timed('q08_agg_tpch_q1') for _ in range(3)):.3f}")
    for name in names:
        spark.sparkContext.setJobDescription(f"ab-ckptin:{name}")
        set_lazy(True); timed(name)
        set_lazy(False); timed(name)
        lazy_runs, eager_runs = [], []
        for _ in range(rounds):
            set_lazy(True); lazy_runs.append(timed(name))
            set_lazy(False); eager_runs.append(timed(name))
        set_lazy(False)
        print(
            f"{name}: LAZY min {min(lazy_runs):.3f} {[round(r, 2) for r in lazy_runs]}"
            f" | EAGER min {min(eager_runs):.3f} {[round(r, 2) for r in eager_runs]}"
        )
    print(f"control q08 min: {min(timed('q08_agg_tpch_q1') for _ in range(3)):.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
