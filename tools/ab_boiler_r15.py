"""Interleaved A/B: q_text_boilerplate window form (r14) vs the r13
checkpoint + count_distinct groupBy + anti-join form (VERDICT r14 #1:
the driver's quiet bench measured the window rewrite 1.559 -> 2.094 s;
re-adjudicate on a quiet host or revert).

Patches llm_prep.boilerplate_scrub with the r13 shape for the OFF arm
(byte-identical output — the r14 rewrite's own equivalence argument in
reverse). Interleaved [window, anti-join] pairs, min-of-runs.

Usage: python tools/ab_boiler_r15.py [--rounds N] [--sf DIR]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def boilerplate_scrub_r13(docs: DataFrame, w=None, max_docs=None) -> DataFrame:
    from bigdatagenomic_spark.functions import md5_long, tokens
    from bigdatagenomic_spark.operators.llm_prep import (
        BOILER_MAX_DOCS,
        SEG_W,
        word_segments,
    )

    w = w or SEG_W
    max_docs = max_docs or BOILER_MAX_DOCS
    toks = docs.where(F.col("text").isNotNull()).select(
        "doc_id", tokens(F.col("text")).alias("t")
    ).where(F.size("t") > 0)
    seg = toks.select(
        "doc_id",
        F.size("t").alias("n_tok"),
        F.posexplode(word_segments(F.col("t"), w)).alias("seg_id", "seg"),
    ).select(
        "doc_id",
        "seg_id",
        md5_long(F.col("seg")).alias("h1"),
        md5_long(F.concat(F.lit("\x02"), F.col("seg"))).alias("h2"),
        (((F.col("seg_id") + 1) * w) <= F.col("n_tok")).alias("is_full"),
    )
    seg = seg.localCheckpoint(eager=False)
    boiler = (
        seg.where("is_full")
        .groupBy("h1", "h2")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .where(F.col("nd") > max_docs)
        .select("h1", "h2")
    )
    kept = (
        seg.join(boiler, ["h1", "h2"], "left_anti")
        .groupBy("doc_id")
        .agg(
            F.sort_array(F.collect_list("seg_id")).alias("keep_ids"),
            F.count("*").cast("long").alias("n_kept"),
        )
    )
    n_seg = (F.floor((F.size("t") - 1) / F.lit(float(w))) + 1).cast("long")
    rebuild = F.array_join(
        F.transform(
            F.coalesce(F.col("keep_ids"), F.array().cast("array<int>")),
            lambda i: F.array_join(F.slice(F.col("t"), i * w + 1, F.lit(w)), " "),
        ),
        " ",
    )
    return toks.join(kept, "doc_id", "left").select(
        "doc_id",
        n_seg.alias("n_seg"),
        F.coalesce(F.col("n_kept"), F.lit(0).cast("long")).alias("n_kept"),
        rebuild.alias("clean_text"),
    )


def main() -> int:
    argv = list(sys.argv[1:])
    rounds = 4
    if "--rounds" in argv:
        i = argv.index("--rounds")
        rounds = int(argv[i + 1])
        del argv[i : i + 2]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in argv:
        i = argv.index("--sf")
        sf_dir = argv[i + 1]
        del argv[i : i + 2]

    from bigdatagenomic_spark import queries as registry
    from bigdatagenomic_spark.operators import llm_prep
    from bigdatagenomic_spark.session import get_spark

    spark = get_spark(app_name="ab-boiler-r15")
    qs = registry.queries()
    window_form = llm_prep.boilerplate_scrub

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    def timed() -> float:
        t0 = time.time()
        force(qs["q_text_boilerplate"](spark, sf_dir))
        return time.time() - t0

    def q08() -> float:
        t0 = time.time()
        force(qs["q08_agg_tpch_q1"](spark, sf_dir))
        return time.time() - t0

    # equivalence proof first, at sf0.01: both forms must hash-match
    small = "/root/testdata/sf0.01"
    llm_prep.boilerplate_scrub = window_form
    a = qs["q_text_boilerplate"](spark, small)
    llm_prep.boilerplate_scrub = boilerplate_scrub_r13
    b = qs["q_text_boilerplate"](spark, small)
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    print(f"equivalence sf0.01: exceptAll diff rows = {diff}")
    if diff:
        return 1

    q08()
    print(f"control q08 min: {min(q08() for _ in range(3)):.3f}")
    llm_prep.boilerplate_scrub = window_form
    timed()
    llm_prep.boilerplate_scrub = boilerplate_scrub_r13
    timed()
    win_runs, anti_runs = [], []
    for _ in range(rounds):
        llm_prep.boilerplate_scrub = window_form
        win_runs.append(timed())
        llm_prep.boilerplate_scrub = boilerplate_scrub_r13
        anti_runs.append(timed())
    llm_prep.boilerplate_scrub = window_form
    print(
        f"WINDOW min {min(win_runs):.3f} {[round(r, 2) for r in win_runs]}"
        f" | ANTIJOIN min {min(anti_runs):.3f} {[round(r, 2) for r in anti_runs]}"
    )
    print(f"control q08 min: {min(q08() for _ in range(3)):.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
