"""Round-10 shuffle audits (SCALING.md Part 9).

Two claims from the round-10 operator docstrings, converted into
measured bytes on the replicated corpora/facts:

1. **novelty hash key** — q_text_novelty shuffles the 60-bit md5 of
   the 5-gram shingle, never the string. Variant A/B: the registered
   hash-key plan vs an identical plan keyed on the raw shingle string.
   Expected: ~4-5x less shuffle write per decade of corpus.

2. **bloom semi-join reduction** — q_x_bloom_join's value appears in
   the regime where the exact join cannot broadcast (the 100 TB proxy:
   broadcast thresholds -1). Variant A/B: the registered plan (bloom
   bits broadcast by explicit hint, fact pre-filtered before the
   shuffle) vs the plain join (full fact shuffled on l_suppkey).
   Expected: fact shuffle shrinks to ~the nation's share of suppliers.

Method identical to tools/audit_q18.py: fresh UI-enabled session,
stage-metric sums over exactly the stages each run executed.

Usage: python tools/audit_r10.py [corpus_dir] [rel_dir] [--out FILE]
(defaults /tmp/scale_corpus /tmp/scale_rel; expects x10/x100).
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
        "shuffle_write_mb": round(sw / mb, 3),
        "shuffle_write_records": sw_recs,
        "bytes_per_row": round(sw / sw_recs, 1) if sw_recs else None,
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


def novelty_string_key(spark, sf_dir):
    """The plan q_text_novelty refuses to be: df keyed on the RAW
    5-gram string (same values — md5 is injective on this corpus's
    shingle set — but every occurrence ships the ~40-byte string)."""
    from pyspark.sql import functions as F

    from bigdatagenomic_spark.functions import tokens, word_shingles
    from bigdatagenomic_spark.operators.text import NOVELTY_N
    from bigdatagenomic_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    sh = d.select(
        "doc_id",
        F.explode(word_shingles(tokens(F.col("text")), NOVELTY_N)).alias("sh"),
    )
    df_h = sh.groupBy("sh").agg(F.count("*").alias("df"))
    per_doc = (
        sh.join(df_h, "sh")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            F.sum((F.col("df") == 1).cast("long")).cast("long").alias("n_novel"),
        )
    )
    return per_doc.withColumn(
        "novelty_micro", F.expr("n_novel * 1000000L div n_shingles")
    ).orderBy("doc_id")


def bloom_join_plain(spark, sf_dir):
    """q_x_bloom_join WITHOUT the prefilter: the exact join sees the
    full fact. In the broadcast regime this is near-identical; with
    broadcasts off, the full lineitem shuffles on l_suppkey."""
    from pyspark.sql import functions as F

    from bigdatagenomic_spark.operators.scale import BJ_NATION
    from bigdatagenomic_spark.sources.tables import load_table

    sup = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_nationkey") == BJ_NATION)
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_quantity")
    return (
        li.join(sup, li["l_suppkey"] == sup["s_suppkey"])
        .groupBy("s_suppkey")
        .agg(
            F.count("*").cast("long").alias("n_items"),
            F.sum("l_quantity").cast("long").alias("sum_qty"),
        )
        .orderBy("s_suppkey")
    )


def main() -> None:
    argv = sys.argv[1:]
    opt_values = {
        argv[i + 1]
        for i, a in enumerate(argv)
        if a.startswith("--") and i + 1 < len(argv)
    }
    args = [a for a in argv if not a.startswith("--") and a not in opt_values]
    corpus_dir = args[0] if len(args) > 0 else "/tmp/scale_corpus"
    rel_dir = args[1] if len(args) > 1 else "/tmp/scale_rel"
    out = None
    if "--out" in argv:
        out = argv[argv.index("--out") + 1]

    from bigdatagenomic_spark.operators.scale import q_x_bloom_join
    from bigdatagenomic_spark.operators.text import q_text_novelty
    from bigdatagenomic_spark.session import get_spark

    spark = get_spark(
        app_name="audit-r10", extra_conf={"spark.ui.enabled": "true"}
    )
    ui = spark.sparkContext.uiWebUrl
    assert ui, "audit needs a fresh session with the UI enabled"
    base, app_id = f"{ui}/api/v1", spark.sparkContext.applicationId
    default_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")

    report: dict = {}

    # 1. novelty: hash key vs string key (warm each shape once at x10)
    for fn in (q_text_novelty, novelty_string_key):
        fn(spark, os.path.join(corpus_dir, "x10")).write.format(
            "noop"
        ).mode("overwrite").save()
    for rep in ("x10", "x100"):
        d = os.path.join(corpus_dir, rep)
        for name, fn in (
            ("hash_key", q_text_novelty),
            ("string_key", novelty_string_key),
        ):
            row = measure(spark, base, app_id, fn, d)
            report[f"novelty.{rep}.{name}"] = row
            print(f"novelty.{rep}.{name} {json.dumps(row)}", flush=True)

    # 2. bloom join: prefiltered vs plain, broadcast on/off
    for fn in (q_x_bloom_join, bloom_join_plain):
        fn(spark, os.path.join(rel_dir, "x10")).write.format("noop").mode(
            "overwrite"
        ).save()
    for regime, thresh in (
        ("default", default_thresh),
        ("all_shuffled", "-1"),
    ):
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", thresh)
        for name, fn in (
            ("bloom_prefilter", q_x_bloom_join),
            ("plain_join", bloom_join_plain),
        ):
            row = measure(
                spark, base, app_id, fn, os.path.join(rel_dir, "x100")
            )
            report[f"bloomjoin.x100.{regime}.{name}"] = row
            print(
                f"bloomjoin.x100.{regime}.{name} {json.dumps(row)}",
                flush=True,
            )

    print(json.dumps(report, indent=1), flush=True)
    if out:
        with open(out, "w") as fh:
            json.dump(report, fh, indent=1)


if __name__ == "__main__":
    main()
