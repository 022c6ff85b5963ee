"""DuckDB oracle comparison harness (SURVEY.md §5.2 item 2).

Mimics the driver's correctness gate: run the Spark builder and the
oracle SQL on the same parquet tables, then compare row count, column
names, and order-insensitive values (rows sorted by all columns; floats
compared to 1e-9 after the queries' own declared rounding).
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime
from decimal import Decimal

import duckdb

from bigdatagenomic_spark.sources.tables import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm_cell(v):
    if v is None:
        return ("\x00null",)  # sorts consistently, distinct from any value
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", round(v, 9))
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, datetime):
        return ("t", v.replace(tzinfo=None).isoformat())
    if isinstance(v, date):
        return ("t", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("a", tuple(_norm_cell(x) for x in v))
    return ("s", str(v))


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


def _driver_compat_problems(sdf, o_types) -> list[str]:
    """Flag output types the correctness driver's pandas canonicalizer
    cannot hash-compare even when values agree:

    - Spark array/map/struct columns arrive as Python lists/dicts in
      pandas -> ``sort_values`` raises ``unhashable type`` (observed in
      CORRECTNESS_r02 on q_x_emb_normalize/quantize);
    - DuckDB HUGEINT (the result type of sum() over integers) converts
      to float64 in ``.df()`` while Spark yields int64, so stringified
      hashes split (observed on q_x_sessionize).

    Queries must emit scalars with matching integer/float-ness on both
    engines (arrays: comma-join them).
    """
    problems = []
    for f in sdf.schema.fields:
        t = f.dataType.typeName()
        if t in ("array", "map", "struct"):
            problems.append(
                f"driver-incompat: spark column {f.name!r} is {t} "
                "(pandas canon cannot sort it; emit a joined string)"
            )
    for c, t in o_types:
        ts = str(t).upper()
        if "HUGEINT" in ts or ts.endswith("[]") or ts.startswith(("STRUCT", "MAP", "LIST")):
            problems.append(
                f"driver-incompat: oracle column {c!r} is {ts} "
                "(pandas .df() degrades it; CAST to BIGINT / join to string)"
            )
    return problems


def compare_query(spark, sf_dir: str, fn, oracle: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    sdf = fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    con = duck_connection(sf_dir)
    res = con.sql(oracle)
    o_cols = res.columns
    o_types = list(zip(res.columns, res.types))
    o_rows = res.fetchall()
    problems = _driver_compat_problems(sdf, o_types)
    if sorted(s_cols) != sorted(o_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        return problems
    if len(s_rows) != len(o_rows):
        problems.append(f"row count differs: spark={len(s_rows)} oracle={len(o_rows)}")
    sn, on = _norm_rows(s_cols, s_rows), _norm_rows(o_cols, o_rows)
    if sn != on:
        diffs = [i for i, (a, b) in enumerate(zip(sn, on)) if a != b][:3]
        for i in diffs:
            problems.append(f"row {i} differs:\n  spark : {sn[i]}\n  oracle: {on[i]}")
        if not diffs and len(sn) != len(on):
            pass  # row-count problem already recorded
        elif not diffs:
            problems.append("value multiset differs in tail rows")
    return problems
