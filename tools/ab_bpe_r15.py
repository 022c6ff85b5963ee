"""Interleaved A/B: BPE merge loop with lazy per-round checkpoints
(round 15) vs the r14 eager form. Patches bpe.bpe_train for the OFF
arm (bpe_encode resolves it module-globally). Times q_text_bpe_train
and q_text_bpe_encode at the preflight SF (sf0.01 — the scale VERDICT
r14 #6 cites) and at sf0.1.

Usage: python tools/ab_bpe_r15.py [--rounds N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def bpe_train_eager(docs: DataFrame, n_merges: int | None = None) -> DataFrame:
    from bigdatagenomic_spark.functions import tokens
    from bigdatagenomic_spark.operators.bpe import (
        N_MERGES,
        _best_pair,
        _merge_round,
        _pair_counts,
    )

    n_merges = n_merges or N_MERGES
    vocab = (
        docs.where(F.col("text").isNotNull())
        .select(F.explode(tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    i = F.explode(F.sequence(F.lit(1), F.length("word"))).alias("pos")
    syms = vocab.select(
        "word", "freq", i
    ).select(
        "word", "freq", "pos", F.col("word").substr(F.col("pos"), F.lit(1)).alias("sym")
    ).localCheckpoint(eager=True)
    for _ in range(n_merges):
        best = _best_pair(_pair_counts(syms))
        syms = _merge_round(syms, best).localCheckpoint(eager=True)
    return syms.groupBy("word", "freq").agg(
        F.count("*").cast("long").alias("n_sym"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "sym"))),
                lambda s: s["sym"],
            ),
            " ",
        ).alias("segmented"),
    )


def main() -> int:
    argv = list(sys.argv[1:])
    rounds = 3
    if "--rounds" in argv:
        i = argv.index("--rounds")
        rounds = int(argv[i + 1])
        del argv[i : i + 2]

    from bigdatagenomic_spark import queries as registry
    from bigdatagenomic_spark.operators import bpe
    from bigdatagenomic_spark.session import get_spark

    spark = get_spark(app_name="ab-bpe-r15")
    qs = registry.queries()
    lazy_form = bpe.bpe_train

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(name: str, sf_dir: str) -> float:
        t0 = time.time()
        force(qs[name](spark, sf_dir))
        return time.time() - t0

    def q08():
        return timed("q08_agg_tpch_q1", "/root/testdata/sf0.1")

    q08()
    print(f"control q08 min: {min(q08() for _ in range(3)):.3f}")
    for name, sf_dir in (
        ("q_text_bpe_train", "/root/testdata/sf0.01"),
        ("q_text_bpe_encode", "/root/testdata/sf0.01"),
        ("q_text_bpe_train", "/root/testdata/sf0.1"),
    ):
        bpe.bpe_train = lazy_form
        timed(name, sf_dir)
        bpe.bpe_train = bpe_train_eager
        timed(name, sf_dir)
        lazy_runs, eager_runs = [], []
        for _ in range(rounds):
            bpe.bpe_train = lazy_form
            lazy_runs.append(timed(name, sf_dir))
            bpe.bpe_train = bpe_train_eager
            eager_runs.append(timed(name, sf_dir))
        bpe.bpe_train = lazy_form
        print(
            f"{name}@{sf_dir.rsplit('/',1)[1]}: LAZY min {min(lazy_runs):.3f}"
            f" {[round(r, 2) for r in lazy_runs]} | EAGER min"
            f" {min(eager_runs):.3f} {[round(r, 2) for r in eager_runs]}"
        )
    print(f"control q08 min: {min(q08() for _ in range(3)):.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
