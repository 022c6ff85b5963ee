"""x1/x10/x100 scale sweep for the round-14 ops (q_x_mann_kendall,
q_x_cohens_kappa) over the key-disjoint replica tables from
tools/make_scale_tables.py (/tmp/scale_rel) and the reseeded corpus
replicas from tools/make_scale_corpus.py (/tmp/scale_corpus).

Expected shapes, stated before measuring:
  * mann_kendall: the day-pair table is CALENDAR-bounded and the event
    replicas shift ts by rep*366 days, so x10 is ~10 years (~6.7M
    pairs/type — just inside the documented contract) and x100 is ~100
    years — DELIBERATELY past the 10-year contract, where the round-14
    ``_guard_day_span`` must now RAISE instead of building a 670M-row
    pair table per type. The sweep asserts the raise and records it:
    the wall is enforced, not just documented (VERDICT r13 #4).
  * cohens_kappa: scan-bound map-side aggregate (two rater bits per
    doc, one shuffle on source) — x100 should track the scan growth
    and nothing else.

Writes SCALING_r14.json (or --out FILE).
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
    from bigdatagenomic_spark.operators.stats import (
        q_x_cohens_kappa,
        q_x_mann_kendall,
    )
    from bigdatagenomic_spark.session import get_spark

    argv = list(sys.argv[1:])
    out_path = "SCALING_r14.json"
    if "--out" in argv:
        i = argv.index("--out")
        if i + 1 >= len(argv):
            print("usage: scale_check_r14.py [--out FILE]")
            sys.exit(2)
        out_path = argv[i + 1]
        del argv[i : i + 2]

    spark = get_spark(app_name="scale-check-r14")
    spark.sparkContext.setLogLevel("ERROR")
    plan = [
        ("mann_kendall", q_x_mann_kendall, "/tmp/scale_rel", ("x1", "x10")),
        (
            "cohens_kappa",
            q_x_cohens_kappa,
            "/tmp/scale_corpus",
            ("x1", "x10", "x100"),
        ),
    ]
    out: dict[str, dict] = {}
    for name, fn, base, reps in plan:
        for rep in reps:
            d = os.path.join(base, rep)
            force(fn(spark, d))  # untimed codegen/scan warm pass
            runs = []
            # min-of-5: the shared host shows intermittent multi-second
            # ambient bursts (DRIFT_r13.json), so the min needs enough
            # samples to catch a clean window
            for _ in range(5):
                t0 = time.monotonic()
                force(fn(spark, d))
                runs.append(round(time.monotonic() - t0, 2))
            out.setdefault(name, {})[rep] = {
                "sec": min(runs),
                "runs": runs,
                "load": round(os.getloadavg()[0], 1),
            }
            print(rep, name, json.dumps(out[name][rep]), flush=True)
    # the x100 event calendar (~100 years) must trip the span guard
    try:
        q_x_mann_kendall(spark, "/tmp/scale_rel/x100")
        out["mann_kendall"]["x100"] = {"guard_raised": False}
    except ValueError as exc:
        out["mann_kendall"]["x100"] = {
            "guard_raised": True,
            "error": str(exc)[:160],
        }
    print("x100 mann_kendall", json.dumps(out["mann_kendall"]["x100"]))
    for name, top in (("mann_kendall", "x10"), ("cohens_kappa", "x100")):
        x1 = out[name]["x1"]["sec"]
        xt = out[name][top]["sec"]
        out[name][f"ratio_{top}"] = round(xt / x1, 1) if x1 else None
    with open(out_path, "w") as fh:
        json.dump({"round14_new_ops": out}, fh, indent=1)
        fh.write("\n")
    print(
        json.dumps(
            {
                "mann_kendall_x10": out["mann_kendall"].get("ratio_x10"),
                "cohens_kappa_x100": out["cohens_kappa"].get("ratio_x100"),
                "guard_raised": out["mann_kendall"]["x100"].get(
                    "guard_raised"
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
