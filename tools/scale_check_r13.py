"""x1/x10/x100 scale sweep for the round-13 ops (q_x_kendall_tau,
q_x_theil_sen) over the key-disjoint replica tables from
tools/make_scale_tables.py (/tmp/scale_rel).

Expected shapes, stated before measuring:
  * kendall: FLAT-ish — the fact table collapses to the <=550-cell
    contingency grid per group in ONE map-side-combined aggregate;
    x100 pays only the bigger scan.
  * theil_sen: the pair table is CALENDAR-bounded, and the replicas
    shift ts by rep*366 days, so x10 is ~10 years (~6.6M pairs/type —
    inside the documented contract) and x100 is ~100 years (~660M
    pairs/type — DELIBERATELY past the documented 10-year contract, to
    show the wall the docstring warns about rather than hide it).

Writes SCALING_r13.json (or --out FILE).
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
        q_x_kendall_tau,
        q_x_theil_sen,
    )
    from bigdatagenomic_spark.session import get_spark

    argv = list(sys.argv[1:])
    out_path = "SCALING_r13.json"
    if "--out" in argv:
        i = argv.index("--out")
        if i + 1 >= len(argv):
            print("usage: scale_check_r13.py [--out FILE]")
            sys.exit(2)
        out_path = argv[i + 1]
        del argv[i : i + 2]

    spark = get_spark(app_name="scale-check-r13")
    spark.sparkContext.setLogLevel("ERROR")
    ops = [("kendall", q_x_kendall_tau), ("theil_sen", q_x_theil_sen)]
    base = "/tmp/scale_rel"
    out: dict[str, dict] = {}
    for rep in ("x1", "x10", "x100"):
        d = os.path.join(base, rep)
        for name, fn in ops:
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
    for name in out:
        x1, x100 = out[name]["x1"]["sec"], out[name]["x100"]["sec"]
        out[name]["ratio_x100"] = round(x100 / x1, 1) if x1 else None
    with open(out_path, "w") as fh:
        json.dump({"round13_new_ops": out}, fh, indent=1)
        fh.write("\n")
    print(json.dumps({n: out[n]["ratio_x100"] for n in out}))


if __name__ == "__main__":
    main()
