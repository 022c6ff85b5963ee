"""Independent-reference property tests for the round-11 operators:
hypothesis-generated inputs pit each op's DuckDB oracle SQL against a
from-scratch Python reference (SURVEY.md §5.2 item 6). Since the Spark
side is hash-pinned to the same oracle by tests/test_relational_oracle,
a pass validates both engines against a third implementation.

Per the round-11 seed-discipline policy (SURVEY.md §5.2 item 7), NEW
ops run max_examples=200 in the round they land; Python references use
engine rounding (floor-half-up grids / integer-exact micro), never
CPython round().
"""

from __future__ import annotations

import datetime
import math
import re

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from bigdatagenomic_spark.operators.graph import (
    Q_GRAPH_DEGREE_ASSORTATIVITY_SQL,
)
from bigdatagenomic_spark.operators.relational_ext import Q_X_GINI_SQL
from bigdatagenomic_spark.operators.stats import (
    Q_X_CHI2_INDEPENDENCE_SQL,
    Q_X_PSI_DRIFT_SQL,
)
from bigdatagenomic_spark.operators.text import (
    Q_TEXT_HAPAX_SQL,
    Q_TEXT_READABILITY_SQL,
)


def _tokens(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


# ---------------------------------------------------------------------------
# hapax legomena ratio
# ---------------------------------------------------------------------------

@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab c.d!", min_size=0, max_size=60),
        min_size=1,
        max_size=8,
    )
)
def test_hapax_oracle_matches_python(texts):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}),
    )
    got = {r[0]: r[1:] for r in con.sql(Q_TEXT_HAPAX_SQL).fetchall()}
    for i, text in enumerate(texts):
        toks = _tokens(text)
        if not toks:
            assert i not in got
            continue
        counts: dict[str, int] = {}
        for t in toks:
            counts[t] = counts.get(t, 0) + 1
        n_hapax = sum(1 for c in counts.values() if c == 1)
        assert got[i] == (
            len(toks),
            len(counts),
            n_hapax,
            n_hapax * 1000000 // len(counts),
        )


# ---------------------------------------------------------------------------
# Flesch readability
# ---------------------------------------------------------------------------

@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.text(alphabet="the quick fox.! ", min_size=0, max_size=80),
        min_size=1,
        max_size=8,
    )
)
def test_readability_oracle_matches_python(texts):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}),
    )
    got = {r[0]: r[1:] for r in con.sql(Q_TEXT_READABILITY_SQL).fetchall()}
    for i, text in enumerate(texts):
        sents = [s for s in re.split(r"[.!?]+", text) if s.strip()]
        toks = _tokens(text)
        if not sents or not toks:
            assert i not in got
            continue
        syl = sum(
            max(len(re.split(r"[aeiou]+", w)) - 1, 1) for w in toks
        )
        s, w = len(sents), len(toks)
        flesch = 206.835 - 1.015 * (w / s) - 84.6 * (syl / w)
        n_s, n_w, n_y, milli = got[i]
        assert (n_s, n_w, n_y) == (s, w, syl)
        # identical formula both sides; allow one milli step for libm ulp
        assert abs(milli - math.floor(flesch * 1000 + 0.5)) <= 1


# ---------------------------------------------------------------------------
# PSI drift
# ---------------------------------------------------------------------------

@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 20), st.sampled_from(["a", "b", "c"])),
        min_size=1,
        max_size=80,
    )
)
def test_psi_drift_oracle_matches_python(raw):
    ev = pd.DataFrame(
        {
            "event_id": range(len(raw)),
            "ts": [
                datetime.datetime(2024, 1, 1) + datetime.timedelta(days=d)
                for d, _ in raw
            ],
            "event_type": [t for _, t in raw],
        }
    )
    con = duckdb.connect()
    con.register("events", ev)
    got = {r[0]: r[1:] for r in con.sql(Q_X_PSI_DRIFT_SQL).fetchall()}

    days = [d for d, _ in raw]
    lo, hi = min(days), max(days)
    per: dict[str, list[int]] = {}
    for d, t in raw:
        n = per.setdefault(t, [0, 0])
        n[0 if (d - lo) * 2 < (hi - lo) else 1] += 1
    k = len(per)
    tot_ref = sum(v[0] for v in per.values())
    tot_cur = sum(v[1] for v in per.values())
    assert set(got) == set(per)
    for t, (n_ref, n_cur) in per.items():
        p_ref = (n_ref + 1) / (tot_ref + k)
        p_cur = (n_cur + 1) / (tot_cur + k)
        term = (p_cur - p_ref) * math.log(p_cur / p_ref)
        g_ref, g_cur, g_term = got[t]
        assert (g_ref, g_cur) == (n_ref, n_cur)
        assert abs(g_term - math.floor(term * 1000000 + 0.5)) <= 1


# ---------------------------------------------------------------------------
# chi-squared independence cells
# ---------------------------------------------------------------------------

@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 13), st.sampled_from(["a", "b", "c"])),
        min_size=1,
        max_size=80,
    )
)
def test_chi2_cells_oracle_matches_python(raw):
    ev = pd.DataFrame(
        {
            "event_id": range(len(raw)),
            "ts": [
                datetime.datetime(2024, 1, 1) + datetime.timedelta(days=d)
                for d, _ in raw
            ],
            "event_type": [t for _, t in raw],
        }
    )
    con = duckdb.connect()
    con.register("events", ev)
    got = {
        (r[0], r[1]): r[2:]
        for r in con.sql(Q_X_CHI2_INDEPENDENCE_SQL).fetchall()
    }

    obs: dict[tuple[str, int], int] = {}
    for d, t in raw:
        dow = (datetime.date(2024, 1, 1) + datetime.timedelta(days=d)).isoweekday()
        obs[(t, dow)] = obs.get((t, dow), 0) + 1
    types = sorted({t for t, _ in obs})
    dows = sorted({d for _, d in obs})
    row_tot = {t: sum(v for (tt, _), v in obs.items() if tt == t) for t in types}
    col_tot = {d: sum(v for (_, dd), v in obs.items() if dd == d) for d in dows}
    n = sum(obs.values())
    assert set(got) == {(t, d) for t in types for d in dows}
    for t in types:
        for d in dows:
            o = obs.get((t, d), 0)
            e = (row_tot[t] * col_tot[d]) / n
            cell = (o - e) * (o - e) / e
            g_o, g_rt, g_ct, g_e, g_cell = got[(t, d)]
            assert (g_o, g_rt, g_ct) == (o, row_tot[t], col_tot[d])
            assert abs(g_e - math.floor(e * 1000000 + 0.5)) <= 1
            assert abs(g_cell - math.floor(cell * 1000000 + 0.5)) <= 1


# ---------------------------------------------------------------------------
# Gini concentration (integer-exact — equality, no tolerance)
# ---------------------------------------------------------------------------

@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(1, 500)),
        min_size=1,
        max_size=60,
    )
)
def test_gini_oracle_matches_python(rows):
    orders = pd.DataFrame(
        {
            "o_orderkey": range(len(rows)),
            "o_orderpriority": [f"{p}-P" for p, _ in rows],
            "o_totalprice": [cents / 100.0 for _, cents in rows],
        }
    )
    con = duckdb.connect()
    con.register("orders", orders)
    got = {r[0]: r[1:] for r in con.sql(Q_X_GINI_SQL).fetchall()}
    for p in sorted({f"{p}-P" for p, _ in rows}):
        vals = sorted(c for pr, c in rows if f"{pr}-P" == p)
        n = len(vals)
        sx = sum(vals)
        six = sum((i + 1) * x for i, x in enumerate(vals))
        gini = (2 * six - (n + 1) * sx) * 1000000 // (n * sx)
        assert got[p] == (n, sx, gini)


# ---------------------------------------------------------------------------
# degree assortativity
# ---------------------------------------------------------------------------

@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 6)),
        min_size=1,
        max_size=60,
    )
)
def test_assortativity_oracle_matches_python(rows):
    li = pd.DataFrame(
        {
            "l_orderkey": [o for o, _ in rows],
            "l_partkey": [p for _, p in rows],
        }
    )
    con = duckdb.connect()
    con.register("lineitem", li)
    (got,) = con.sql(Q_GRAPH_DEGREE_ASSORTATIVITY_SQL).fetchall()

    items = sorted({(o, p) for o, p in rows if o < 200})
    edges = set()
    by_part: dict[int, list[int]] = {}
    for o, p in items:
        by_part.setdefault(p, []).append(o)
    for orders in by_part.values():
        for i, a in enumerate(orders):
            for b in orders[i + 1 :]:
                edges.add((min(a, b), max(a, b)))
    deg: dict[int, int] = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    m = len(edges)
    if m == 0:
        # empty edge set: count 0, SQL sums are NULL
        assert got == (0, None, None)
        return
    sx = sum(deg[a] + deg[b] for a, b in edges)
    sxy = sum(2 * deg[a] * deg[b] for a, b in edges)
    sxx = sum(deg[a] ** 2 + deg[b] ** 2 for a, b in edges)
    assert got[0] == m
    assert got[1] == sx
    var = 2 * m * sxx - sx * sx
    if var == 0:
        assert got[2] is None
    else:
        r = (2 * m * sxy - sx * sx) / var
        assert abs(got[2] - r) < 2e-6
