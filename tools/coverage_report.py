"""Driver-row coverage accounting (VERDICT r11 #2: "never-checked
strictly decreasing" must be checkable against a stated schedule).

Scans every on-disk CORRECTNESS_r*.json, unions the query names that
ever earned a driver row, and diffs against the current registry.
Prints the never-checked count + the projected count after the
CURRENT checked-50 earns its rows (what the next CORRECTNESS artifact
will deliver), so the debt trajectory in ROTATION.md is auditable
from artifacts alone.

Usage: python tools/coverage_report.py [--list]
(--list also prints the never-checked names, sorted).
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from bigdatagenomic_spark import queries as registry

    names = list(registry.queries())
    checked50 = names[:50]

    # A row counts as "checked" only if it was GREEN (ADVICE r12: a red
    # driver row — err set, hash_match false — must not pay down the
    # debt this tool exists to audit). Green = no err AND (hash_match
    # true, or rows_match true for the documented no-oracle entries).
    ever: set[str] = set()
    red: set[str] = set()
    arts = sorted(glob.glob("CORRECTNESS_r*.json"))
    for art in arts:
        with open(art) as fh:
            for name, row in json.load(fh).items():
                err = row.get("err")
                green = (not err and (row.get("hash_match") or row.get("rows_match"))) or (
                    # documented weaker tier: no-oracle entries (e.g. the
                    # approximate-by-contract q10) get a rows-only driver
                    # check — spark ran and produced rows
                    err == "no_oracle" and row.get("spark_rows") is not None
                )
                (ever if green else red).add(name)
    red -= ever  # red-only: never earned a green row anywhere

    never = [n for n in names if n not in ever]
    after_this_round = [n for n in never if n not in checked50]
    print(
        json.dumps(
            {
                "registry": len(names),
                "artifacts": arts,
                "ever_driver_checked": len(ever & set(names)),
                "never_checked": len(never),
                "checked50_first_time_rows": len(
                    [n for n in checked50 if n not in ever]
                ),
                "projected_never_checked_after_this_round": len(
                    after_this_round
                ),
                "red_only_rows": sorted(red & set(names)),
            }
        )
    )
    if "--list" in sys.argv:
        for n in never:
            marker = " (in current checked-50)" if n in checked50 else ""
            print(n + marker)
    return 0


if __name__ == "__main__":
    sys.exit(main())
