"""Spot-check named registry entries against their DuckDB oracles.

Usage: python tools/quick_check.py [--sf DIR] name [name ...]
Same comparison as tests/oracle_harness.compare_query (the driver's
normalization), but only for the named entries — the fast inner loop
while authoring a new operator, before the full-registry preflight.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    argv = list(sys.argv[1:])
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in argv:
        i = argv.index("--sf")
        if i + 1 >= len(argv):
            print("usage: quick_check.py [--sf DIR] name ...")
            return 2
        sf_dir = argv[i + 1]
        del argv[i : i + 2]
    if not argv:
        print("usage: quick_check.py [--sf DIR] name ...")
        return 2

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.driver.memory", "8g")
        .appName("quick-check")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry
    from tests.oracle_harness import compare_query

    qs, oracles = entry.queries(), entry.oracle_sql()
    bad = 0
    for name in argv:
        if name not in qs:
            print(f"{name}: NOT REGISTERED")
            bad += 1
            continue
        t0 = time.time()
        try:
            if name in oracles:
                problems = compare_query(spark, sf_dir, qs[name], oracles[name])
            else:
                n = qs[name](spark, sf_dir).count()
                problems = [] if n >= 0 else ["negative count"]
                print(f"{name}: rows-only n={n}")
        except Exception as e:  # noqa: BLE001
            problems = [f"EXCEPTION: {type(e).__name__}: {e}"]
        dt = time.time() - t0
        status = "OK" if not problems else "FAIL"
        print(f"{name}: {status} ({dt:.2f}s)")
        for p in problems:
            print(f"  - {p}")
        bad += bool(problems)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
