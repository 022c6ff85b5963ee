"""Artifact-vs-HEAD staleness audit (round-13 addition).

Rounds 4 and 5 both shipped registry entries AFTER the committed
preflight artifact, leaving them without oracle evidence; the verify
skill carries a manual snippet for that one check. This tool runs the
full set in one shot:

  1. the newest preflight_r*.json covers exactly the current registry
     (count match) and reports bad == {};
  2. every bench.py HEADLINE query exists in the registry AND in the
     newest BENCH_r*_builder_quiet.json min_queries block;
  3. the checked-50 prefix (queries.py _PRIORITY_PREFIX) is exactly 50
     registered names (the driver gate cannot silently shrink);
  4. bench_summary.json parses and carries the same metric keys as the
     builder-quiet artifact.

Exit 0 all green, 1 with a reason list otherwise. Run it before ending
a round.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def newest(pattern: str) -> str | None:
    arts = glob.glob(pattern)
    if not arts:
        return None
    return max(arts, key=lambda p: int(re.search(r"r(\d+)", p).group(1)))


def main() -> int:
    import __spark_entry__ as entry
    from bigdatagenomic_spark.queries import _PRIORITY_PREFIX, _REGISTRY

    problems: list[str] = []
    qs = entry.queries()

    art = newest("preflight_r*.json")
    if art is None:
        problems.append("no preflight_r*.json on disk")
    else:
        pf = json.load(open(art))
        if pf.get("total") != len(qs):
            problems.append(
                f"{art} covers {pf.get('total')} queries but the registry "
                f"has {len(qs)} — re-run tools/preflight.py"
            )
        if pf.get("bad"):
            problems.append(f"{art} has red rows: {sorted(pf['bad'])}")

    import bench

    bench_art = newest("BENCH_r*_builder_quiet.json")
    missing_reg = [q for q in bench.HEADLINE if q not in qs]
    if missing_reg:
        problems.append(f"HEADLINE names not in registry: {missing_reg}")
    if bench_art:
        mins = json.load(open(bench_art)).get("min_queries", {})
        missing_art = [q for q in bench.HEADLINE if q not in mins]
        if missing_art:
            problems.append(
                f"{bench_art} missing headliners: {missing_art} — re-bench"
            )

    if len(_PRIORITY_PREFIX) != 50:
        problems.append(f"_PRIORITY_PREFIX has {len(_PRIORITY_PREFIX)} entries")
    unreg = [n for n in _PRIORITY_PREFIX if n not in _REGISTRY]
    if unreg:
        problems.append(f"checked-50 names not registered: {unreg}")

    try:
        summary = json.load(open("bench_summary.json"))
        for k in ("value", "min_queries", "control_deviation"):
            if k not in summary:
                problems.append(f"bench_summary.json missing key {k}")
    except Exception as exc:
        problems.append(f"bench_summary.json unreadable: {exc}")

    print(json.dumps({"ok": not problems, "problems": problems}))
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())
