"""Independent-reference property tests for the round-14 operators
(q_x_mann_kendall, q_x_cohens_kappa): hypothesis-generated inputs pit
each op's DuckDB oracle SQL against a from-scratch brute-force Python
reference (SURVEY.md §5.2 items 6-7). The Spark side is hash-pinned to
the same oracle by tests/test_relational_oracle, so a pass validates
both engines against a third implementation.

Seed discipline: new ops run max_examples=200 in the round they land;
these drop to 30 in the round AFTER their driver rows are on disk
(CORRECTNESS_r15 — both are rule-2 rotate-ins for round 15). The
Mann-Kendall reference is a brute-force O(n^2) day-pair loop —
deliberately NOT the broadcast-join grid algebra the engines use — and
the kappa reference recounts the contingency table row by row, so a
marginal-algebra bug cannot hide.
"""

from __future__ import annotations

import pytest

import math

import duckdb
import pandas as pd
from hypothesis import example, given, settings
from hypothesis import strategies as st

from bigdatagenomic_spark.operators.stats import (
    Q_X_COHENS_KAPPA_SQL,
    Q_X_MANN_KENDALL_SQL,
)


@settings(max_examples=200, deadline=None)
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
# discovered pin (round 14): two days sharing a count collapsed to one
# tie group; n_days must be sum(t), not the tie-group count
@example(day_specs=[("click", 0, 1), ("click", 1, 1)])
@pytest.mark.slow  # round 15: driver-budget cut (see pytest.ini)
def test_mann_kendall_oracle_matches_python(day_specs):
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
    got = {r[0]: r[1:] for r in con.sql(Q_X_MANN_KENDALL_SQL).fetchall()}

    daily: dict[str, dict[int, int]] = {}
    for typ, day, cnt in day_specs:
        daily.setdefault(typ, {})
        daily[typ][day] = daily[typ].get(day, 0) + cnt
    for typ, dmap in daily.items():
        days = sorted(dmap)
        n = len(days)
        if n < 2:
            # single-day groups have no pairs -> no s_tab row -> absent
            assert typ not in got
            continue
        s = 0
        for i in range(n):
            for j in range(i + 1, n):
                diff = dmap[days[j]] - dmap[days[i]]
                s += (diff > 0) - (diff < 0)
        tie_term = 0
        for v in set(dmap.values()):
            t = sum(1 for d in days if dmap[d] == v)
            tie_term += t * (t - 1) * (2 * t + 5)
        vs_num = n * (n - 1) * (2 * n + 5) - tie_term
        g_days, g_pairs, g_s, g_vs, g_z = got[typ]
        assert g_days == n
        assert g_pairs == n * (n - 1) // 2
        assert g_s == s
        assert g_vs == vs_num
        if s == 0:
            assert g_z == 0
        else:
            num = float(s - 1 if s > 0 else s + 1)
            ref = num / math.sqrt(vs_num / 18.0)
            ref_micro = math.floor(ref * 1000000 + 0.5)
            assert abs(g_z - ref_micro) <= 1
    assert set(got) <= set(daily)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["s1", "s2", "s3"]),
            st.integers(min_value=0, max_value=400),  # n_chars
            st.integers(min_value=0, max_value=80),  # spaces in text
        ),
        min_size=1,
        max_size=60,
    )
)
def test_cohens_kappa_oracle_matches_python(doc_specs):
    # build a text with exactly `spaces` spaces; n_chars is independent
    # metadata (the raters read different columns BY DESIGN)
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "source": [d[0] for d in doc_specs],
                "n_chars": [d[1] for d in doc_specs],
                "text": ["x" + " x" * d[2] for d in doc_specs],
            }
        ),
    )
    got = {r[0]: r[1:] for r in con.sql(Q_X_COHENS_KAPPA_SQL).fetchall()}

    by_src: dict[str, list] = {}
    for src, nc, sp in doc_specs:
        by_src.setdefault(src, []).append((1 if nc >= 200 else 0,
                                           1 if sp >= 39 else 0))
    for src, bits in by_src.items():
        n = len(bits)
        agree = sum(1 for a, b in bits if a == b)
        r1 = sum(a for a, _ in bits)
        c1 = sum(b for _, b in bits)
        chance = r1 * c1 + (n - r1) * (n - c1)
        num = n * agree - chance
        den = n * n - chance
        g_n, g_agree, g_num, g_den, g_micro = got[src]
        assert g_n == n
        assert g_agree == agree
        assert g_num == num
        assert g_den == den
        if den > 0:
            ref_micro = math.floor(num / den * 1000000 + 0.5)
            assert g_micro is not None and abs(g_micro - ref_micro) <= 1
        else:
            assert g_micro is None
    assert set(got) == set(by_src)
