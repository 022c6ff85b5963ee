"""Round-11 operator scale sweep (SCALING.md Part 9): run the ops that
are NEW or REWORKED in round 11, unmodified, at x1/x10/x100.

Corpus family (tools/make_scale_corpus.py replicas):
  * entropy — q_text_entropy AFTER the run-length rewrite (the round-10
              measurement covered the O(types x tokens) fold this
              replaced; re-measure per VERDICT r10 #5)
  * hapax   — q_text_hapax: same run-length machinery, second user
  * readab  — q_text_readability: row-local sentence/syllable folds

Event/order family (tools/make_scale_tables.py replicas):
  * bloomj  — q_x_bloom_join AFTER the InSet-sketch rework (VERDICT r10
              flagged the chained-semi cut perf-weak; re-measure)
  * psi     — q_x_psi_drift: two scans + |types|-key aggregate
  * chi2    — q_x_chi2_independence: contingency + bounded grid
  * gini    — q_x_gini: two_phase_rank per priority class — rank cost
              grows with the fact, the moments are one aggregate
  * rollc   — q_x_rolling_corr AFTER the moment-sum rewrite
              (calendar-bounded daily series)
  * acf     — q_x_acf AFTER the moment-sum rewrite (same bound)
  * assort  — q_graph_degree_assortativity: l_orderkey < 200 slice —
              a PUSHDOWN control (scan grows 100x, work must not)

Round-11 wave 2-4 additions:
  * spear   — q_x_spearman_corr: two grid cumsums + broadcast attach +
              one moment aggregate; the tie grids are CONSTANT size
              (<=50 / <=11 per group), so cost should track the scan
  * mannw   — q_x_mann_whitney: grid cumsum over distinct cents — the
              grid is value-range-bounded (~49k points at any volume)
  * kstest  — q_x_ks_test: same grid, two cumsum passes
  * trimm   — q_x_trimmed_mean: two_phase_rank over the fact — rank
              cost grows with rows, like gini
  * burst   — q_text_burstiness: explode + (doc,term) + per-term aggs —
              grows with token volume
  * wordlen — q_text_wordlen_profile: explode + bounded cell grid
  * lift    — q_x_lift_rules: basket-bounded pair self-join
  * edist   — q_dedup_editdist: doc_id < 400 contract — PUSHDOWN
              control (scan grows 100x, candidate work must not)
  * codon   — q_asm_codon_usage: doc_id < 200 contract — same control

Usage: python tools/scale_check_r11.py [corpus_dir] [rel_dir] [--out F]
(defaults /tmp/scale_corpus /tmp/scale_rel; expects x1/x10/x100).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    argv = sys.argv[1:]
    out = None
    if "--out" in argv:
        out = argv[argv.index("--out") + 1]
        argv = [a for a in argv if a != "--out" and a != out]
    corpus_dir = argv[0] if len(argv) > 0 else "/tmp/scale_corpus"
    rel_dir = argv[1] if len(argv) > 1 else "/tmp/scale_rel"

    from bigdatagenomic_spark.operators.dedup import q_dedup_editdist
    from bigdatagenomic_spark.operators.graph import (
        q_graph_degree_assortativity,
    )
    from bigdatagenomic_spark.operators.relational_ext import (
        q_x_gini,
        q_x_lift_rules,
        q_x_rolling_corr,
    )
    from bigdatagenomic_spark.operators.scale import (
        q_x_bloom_join,
        q_x_trimmed_mean,
    )
    from bigdatagenomic_spark.operators.stats import (
        q_x_acf,
        q_x_chi2_independence,
        q_x_ks_test,
        q_x_mann_whitney,
        q_x_psi_drift,
        q_x_spearman_corr,
    )
    from bigdatagenomic_spark.operators.text import (
        q_text_burstiness,
        q_text_entropy,
        q_text_hapax,
        q_text_readability,
        q_text_wordlen_profile,
    )
    from bigdatagenomic_spark.queries import q_asm_codon_usage
    from bigdatagenomic_spark.session import get_spark

    corpus_ops = [
        ("entropy", q_text_entropy),
        ("hapax", q_text_hapax),
        ("readab", q_text_readability),
        ("burst", q_text_burstiness),
        ("wordlen", q_text_wordlen_profile),
        ("edist", q_dedup_editdist),
        ("codon", q_asm_codon_usage),
    ]
    rel_ops = [
        ("bloomj", q_x_bloom_join),
        ("psi", q_x_psi_drift),
        ("chi2", q_x_chi2_independence),
        ("gini", q_x_gini),
        ("rollc", q_x_rolling_corr),
        ("acf", q_x_acf),
        ("assort", q_graph_degree_assortativity),
        ("spear", q_x_spearman_corr),
        ("mannw", q_x_mann_whitney),
        ("kstest", q_x_ks_test),
        ("trimm", q_x_trimmed_mean),
        ("lift", q_x_lift_rules),
    ]

    spark = get_spark(app_name="scale-check-r11")
    # warm-up: JVM + codegen for every plan shape at x1, untimed
    for _, fn in corpus_ops:
        force(fn(spark, os.path.join(corpus_dir, "x1")))
    for _, fn in rel_ops:
        force(fn(spark, os.path.join(rel_dir, "x1")))

    def timed(fn, sf_dir_: str) -> dict:
        # min-of-2: the shared host carries external load bursts
        runs = []
        for _ in range(2):
            t0 = time.monotonic()
            force(fn(spark, sf_dir_))
            runs.append(round(time.monotonic() - t0, 2))
        return {"sec": min(runs), "runs": runs}

    results: dict[str, dict] = {}
    for rep in (1, 10, 100):
        row: dict = {"load_avg_start": round(os.getloadavg()[0], 1)}
        for name, fn in corpus_ops:
            row[name] = timed(fn, os.path.join(corpus_dir, f"x{rep}"))
        for name, fn in rel_ops:
            row[name] = timed(fn, os.path.join(rel_dir, f"x{rep}"))
        results[f"x{rep}"] = row
        print(json.dumps({f"x{rep}": row}), flush=True)

    report: dict = {"r11_ops": results}
    base = results["x1"]
    for hi in (10, 100):
        cur = results[f"x{hi}"]
        report[f"ratio_x{hi}"] = {
            op: round(cur[op]["sec"] / max(base[op]["sec"], 1e-9), 2)
            for op in cur
            if isinstance(cur[op], dict) and "sec" in cur[op]
        }
    print(json.dumps(report, indent=1), flush=True)
    if out:
        with open(out, "w") as fh:
            json.dump(report, fh, indent=1)


if __name__ == "__main__":
    main()
