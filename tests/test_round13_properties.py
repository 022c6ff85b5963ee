"""Independent-reference property tests for the round-13 operators
(q_x_kendall_tau, q_x_theil_sen): hypothesis-generated inputs pit each
op's DuckDB oracle SQL against a from-scratch brute-force Python
reference (SURVEY.md §5.2 items 6-7). The Spark side is hash-pinned to
the same oracle by tests/test_relational_oracle, so a pass validates
both engines against a third implementation.

Seed discipline: new ops ran max_examples=200 in round 13 (the round
they landed); round 14 drops them to 30 per the standing policy
(VERDICT r13 #5) — both ops lead the round-14 checked-50 as rule-2
rotate-ins, and no hypothesis run ever found a counterexample, so
there are no discovered @example pins to keep. The
references are brute-force O(n^2) pair loops — deliberately NOT the
grid algebra the engines use — so a grid-collapse bug cannot hide.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from bigdatagenomic_spark.operators.stats import (
    Q_X_KENDALL_TAU_SQL,
    Q_X_THEIL_SEN_SQL,
)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["A", "N", "R"]),
            st.integers(min_value=1, max_value=12),
            st.integers(min_value=0, max_value=5),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_kendall_tau_oracle_matches_python(rows):
    con = duckdb.connect()
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_returnflag": [r[0] for r in rows],
                "l_quantity": [float(r[1]) for r in rows],
                "l_discount": [r[2] / 100.0 for r in rows],
            }
        ),
    )
    got = {r[0]: r[1:] for r in con.sql(Q_X_KENDALL_TAU_SQL).fetchall()}
    by_grp: dict[str, list] = {}
    for g, q, d in rows:
        by_grp.setdefault(g, []).append((q, d))
    # groups where EVERY row pair is x-tied or y-tied emit NULL tau but
    # still appear (cd row exists only if some qv2>qv1 pair exists) —
    # mirror the oracle's join semantics: a group with no concordance-
    # eligible pair has no cd row and is absent entirely
    for g, pts in by_grp.items():
        n = len(pts)
        c_minus_d = 0
        eligible = False
        for i in range(n):
            for j in range(n):
                if pts[j][0] > pts[i][0] and pts[j][1] != pts[i][1]:
                    eligible = True
                    c_minus_d += 1 if pts[j][1] > pts[i][1] else -1
        if not eligible:
            assert g not in got
            continue
        tx2 = 0
        for q in {p[0] for p in pts}:
            cq = sum(1 for p in pts if p[0] == q)
            tx2 += cq * (cq - 1)
        ty2 = 0
        for d in {p[1] for p in pts}:
            cd2 = sum(1 for p in pts if p[1] == d)
            ty2 += cd2 * (cd2 - 1)
        g_n, g_tau = got[g]
        assert g_n == n
        den_x = n * (n - 1) - tx2
        den_y = n * (n - 1) - ty2
        if den_x > 0 and den_y > 0:
            ref = 2.0 * c_minus_d / math.sqrt(float(den_x) * float(den_y))
            ref_micro = math.floor(ref * 1000000 + 0.5)
            assert g_tau is not None and abs(g_tau - ref_micro) <= 1
        else:
            assert g_tau is None
    assert set(got) <= set(by_grp)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["click", "view"]),
            st.integers(min_value=0, max_value=40),  # day offset
            st.integers(min_value=1, max_value=30),  # events that day
        ),
        min_size=1,
        max_size=40,
    )
)
def test_theil_sen_oracle_matches_python(day_specs):
    # expand (type, day, count) specs into individual event rows so the
    # oracle's daily-count aggregate is itself under test
    types, tss = [], []
    for typ, day, cnt in day_specs:
        for k in range(cnt):
            types.append(typ)
            tss.append(
                pd.Timestamp("2024-01-01")
                + pd.Timedelta(days=day, minutes=k)
            )
    con = duckdb.connect()
    con.register("events", pd.DataFrame({"event_type": types, "ts": tss}))
    got = {r[0]: r[1:] for r in con.sql(Q_X_THEIL_SEN_SQL).fetchall()}

    daily: dict[str, dict[int, int]] = {}
    for typ, day, cnt in day_specs:
        daily.setdefault(typ, {})
        daily[typ][day] = daily[typ].get(day, 0) + cnt
    for typ, dmap in daily.items():
        days = sorted(dmap)
        slopes = []
        for i in range(len(days)):
            for j in range(i + 1, len(days)):
                slopes.append(
                    (dmap[days[j]] - dmap[days[i]]) / (days[j] - days[i])
                )
        if not slopes:
            # single-day groups have no pairs -> no med row -> absent
            assert typ not in got
            continue
        slopes.sort()
        m = len(slopes)
        if m % 2:
            med = slopes[m // 2]
        else:
            med = (slopes[m // 2 - 1] + slopes[m // 2]) / 2
        ref_micro = math.floor(med * 1000000 + 0.5)
        g_days, g_pairs, g_slope = got[typ]
        assert g_days == len(days)
        assert g_pairs == m
        assert abs(g_slope - ref_micro) <= 1
    assert set(got) <= set(daily)
