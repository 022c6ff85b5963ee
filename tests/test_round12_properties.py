"""Independent-reference property tests for the round-12 operators
(q_asm_bwt, q_x_seq_patterns): hypothesis inputs pit each op's DuckDB
oracle SQL against a from-scratch Python reference (SURVEY.md §5.2
items 6-7). The Spark side is hash-pinned to the same oracle by
tests/test_relational_oracle, so a pass validates both engines against
a third implementation.

New ops run max_examples=200 in the round they land (seed-discipline
policy; drop to 30 after their driver row is on disk — CORRECTNESS_r13
for this pair, since they registered after the round-12 checked-50
froze). The BWT reference additionally proves ITSELF correct per
example by inverse-transforming its output back to the input
(last-first mapping), so the three-way agreement is anchored to the
defining property, not just two independent constructions.
"""

from __future__ import annotations

import datetime

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from bigdatagenomic_spark.operators.relational_ext import Q_X_SEQ_PATTERNS_SQL
from bigdatagenomic_spark.queries import (
    BWT_MAX_READ,
    BWT_MIN_READ,
    Q_ASM_BWT_SQL,
)


# ---------------------------------------------------------------------------
# q_asm_bwt
# ---------------------------------------------------------------------------

def _bwt_reference(s: str) -> str:
    t = s + "$"
    rots = sorted(t[i:] + t[:i] for i in range(len(t)))
    return "".join(r[-1] for r in rots)


def _inverse_bwt(bwt: str) -> str:
    """Standard last-first inversion: proves the reference transform is
    a real BWT (round-trips to the input), anchoring the test to the
    defining property."""
    n = len(bwt)
    first = sorted(range(n), key=lambda i: (bwt[i], i))
    out = []
    row = bwt.index("$")
    for _ in range(n):
        row = first[row]
        out.append(bwt[row])
    return "".join(out)


def _runs(s: str) -> int:
    return 1 + sum(1 for i in range(1, len(s)) if s[i] != s[i - 1])


_BASES = st.sampled_from("ACGT")
_READ = st.lists(_BASES, min_size=0, max_size=40).map("".join)
# noise chars exercise the [^ACGT] cleaning path
_NOISY = st.tuples(_READ, st.sampled_from(["", "x", "n ", "-"])).map(
    lambda t: t[1].join([t[0][: len(t[0]) // 2], t[0][len(t[0]) // 2 :]])
)


@settings(max_examples=200, deadline=None)
@given(st.lists(_NOISY, min_size=1, max_size=6))
def test_bwt_oracle_matches_python(texts):
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    got = {r[0]: r[1:] for r in con.sql(Q_ASM_BWT_SQL).fetchall()}
    for i, text in enumerate(texts):
        cleaned = "".join(c for c in text.upper() if c in "ACGT")
        if not (BWT_MIN_READ <= len(cleaned) <= BWT_MAX_READ):
            assert i not in got
            continue
        bwt = _bwt_reference(cleaned)
        # the reference proves itself: inversion recovers content + '$'
        assert _inverse_bwt(bwt) == cleaned + "$"
        assert got[i] == (len(cleaned), bwt, _runs(cleaned), _runs(bwt))


# ---------------------------------------------------------------------------
# q_x_seq_patterns
# ---------------------------------------------------------------------------

_TYPES = ["view", "click", "purchase"]
_EVENT = st.tuples(
    st.integers(min_value=0, max_value=4),            # user_id
    st.sampled_from(_TYPES),                          # event_type
    st.integers(min_value=0, max_value=6),            # coarse ts → ties
)


def _seq_reference(events):
    spans: dict[tuple[int, str], tuple[int, int]] = {}
    for u, ty, ts in events:
        lo, hi = spans.get((u, ty), (ts, ts))
        spans[(u, ty)] = (min(lo, ts), max(hi, ts))
    supp: dict[tuple[str, str], int] = {}
    for (u, a), (lo_a, _) in spans.items():
        for (u2, b), (_, hi_b) in spans.items():
            if u2 == u and lo_a < hi_b:
                supp[(a, b)] = supp.get((a, b), 0) + 1
    users_a: dict[str, int] = {}
    for (_, ty) in spans:
        users_a[ty] = users_a.get(ty, 0) + 1
    n_total = len({u for u, _ in spans})
    rows = []
    for (a, b), n in sorted(supp.items()):
        rows.append(
            (
                a,
                b,
                n,
                users_a[a],
                n * 1_000_000 // users_a[a],
                n * 1_000_000 // n_total,
            )
        )
    return rows


@settings(max_examples=200, deadline=None)
@given(st.lists(_EVENT, min_size=1, max_size=40))
def test_seq_patterns_oracle_matches_python(events):
    base = datetime.datetime(2024, 1, 1)
    df = pd.DataFrame(
        {
            "user_id": [u for u, _, _ in events],
            "event_type": [ty for _, ty, _ in events],
            "ts": [base + datetime.timedelta(hours=ts) for _, _, ts in events],
        }
    )
    con = duckdb.connect()
    con.register("events", df)
    got = con.sql(Q_X_SEQ_PATTERNS_SQL).fetchall()
    assert [tuple(r) for r in got] == _seq_reference(events)
