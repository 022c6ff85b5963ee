"""Property tests for the round-9 oracle semantics, engine-independent:
each test pits the DuckDB oracle SQL against a from-scratch Python
reference on hypothesis-generated inputs. The Spark implementations are
hash-pinned to these same oracles by tests/test_relational_oracle.py /
tools/preflight.py, so agreement here transitively validates both
engines. DuckDB-only — no SparkSession, so the whole module runs in
seconds."""

from __future__ import annotations

import hashlib
import math
from fractions import Fraction

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from bigdatagenomic_spark.operators.llm_prep import CDC_DIV, CDC_W, Q_TEXT_CDC_CHUNKS_SQL


def _cdc_python(text: str):
    """Independent CDC reference: md5-window boundaries, tiling chunks."""
    n = len(text)
    cuts = []
    for p in range(1, n - CDC_W + 2):  # 1-based window starts
        win = text[p - 1 : p - 1 + CDC_W]
        h = int(hashlib.md5(win.encode()).hexdigest()[:15], 16)
        if h % CDC_DIV == 0:
            cuts.append(p + CDC_W - 1)
    ends = [c for c in cuts if c < n] + [n]
    starts = [1] + [e + 1 for e in ends[:-1]]
    return [
        (i + 1, s, e - s + 1, hashlib.md5(text[s - 1 : e].encode()).hexdigest())
        for i, (s, e) in enumerate(zip(starts, ends))
    ]


@settings(max_examples=40, deadline=None)
@given(
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        min_size=CDC_W,
        max_size=240,
    )
)
def test_cdc_oracle_matches_python_reference(text):
    con = duckdb.connect()
    con.register(
        "docs", pd.DataFrame({"doc_id": [0], "text": [text]})
    )
    sql = Q_TEXT_CDC_CHUNKS_SQL.replace("FROM documents", "FROM docs")
    got = [
        (idx, start, clen, chash)
        for (_, idx, start, clen, chash, _) in con.sql(sql).fetchall()
    ]
    assert got == _cdc_python(text)


def _half_away_micro(x: float) -> int:
    s = 1 if x >= 0 else -1
    return s * int(abs(x) * 10000 + 0.5)


def _mmr_python(vecs, n_queries, shortlist, k, w_rel, w_red):
    """Greedy MMR reference on the integer micro-sim grid."""

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    out = []
    ids = sorted(vecs)
    for qid in ids[:n_queries]:
        rel = {
            v: _half_away_micro(cos(vecs[qid], vecs[v]))
            for v in ids
            if v != qid
        }
        short = sorted(rel, key=lambda v: (-rel[v], v))[:shortlist]
        pair = {
            (a, b): _half_away_micro(cos(vecs[a], vecs[b]))
            for a in short
            for b in short
            if a != b
        }
        sel = []
        first = min(short, key=lambda v: (-rel[v], v))
        sel.append((qid, first, 1, w_rel * rel[first]))
        chosen = {first}
        for t in range(2, k + 1):
            best = None
            for c in short:
                if c in chosen:
                    continue
                red = max(pair[(c, s)] for (_, s, _, _) in sel)
                score = w_rel * rel[c] - w_red * red
                key = (-score, c)
                if best is None or key < best[0]:
                    best = (key, c, score)
            _, c, score = best
            sel.append((qid, c, t, score))
            chosen.add(c)
        out.extend(sel)
    return out


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(-9, 9), st.integers(-9, 9), st.integers(1, 9)
        ),
        min_size=8,
        max_size=16,
        unique=True,
    )
)
def test_mmr_oracle_matches_python_reference(coords):
    import bigdatagenomic_spark.operators.similarity as S
    from bigdatagenomic_spark.queries import _mmr_oracle_sql

    vecs = {i: list(map(float, c)) for i, c in enumerate(coords)}
    con = duckdb.connect()
    con.register(
        "emb",
        pd.DataFrame(
            {
                "vec_id": list(vecs),
                "embedding": [vecs[i] for i in vecs],
                "label": [0] * len(vecs),
            }
        ),
    )
    con.sql("CREATE VIEW embeddings AS SELECT * FROM emb")
    got = [
        (q, v, p, m) for (q, v, p, m) in con.sql(_mmr_oracle_sql()).fetchall()
    ]
    want = _mmr_python(
        vecs, S.MMR_N_QUERIES, S.MMR_SHORTLIST, S.MMR_K, S.MMR_W_REL,
        S.MMR_W_RED,
    )
    assert got == want


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(-2000, 2000), st.integers(0, 10**7)),
        min_size=3,
        max_size=60,
    )
)
def test_linreg_oracle_matches_exact_fractions(points):
    """The OLS oracle's HUGEINT algebra must equal exact Fraction math
    (then the shared double division + 1e-6 floor-round)."""
    xs = [x for x, _ in points]
    if len(set(xs)) < 2:
        return  # degenerate: denominator 0 -> NULL by contract
    n = len(points)
    sx = sum(x for x, _ in points)
    sy = sum(y for _, y in points)
    sxx = sum(x * x for x, _ in points)
    sxy = sum(x * y for x, y in points)
    den = n * sxx - sx * sx
    slope = math.floor(
        float(Fraction(n * sxy - sx * sy)) / float(Fraction(den)) * 1_000_000
        + 0.5
    ) / 1_000_000
    icept = math.floor(
        float(Fraction(sy * sxx - sx * sxy)) / float(Fraction(den))
        * 1_000_000
        + 0.5
    ) / 1_000_000
    con = duckdb.connect()
    con.register(
        "pts", pd.DataFrame({"x": xs, "y": [y for _, y in points]})
    )
    row = con.sql(
        """
        WITH s AS (
          SELECT CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(x) AS HUGEINT) AS sx,
                 CAST(sum(y) AS HUGEINT) AS sy,
                 CAST(sum(x * x) AS HUGEINT) AS sxx,
                 CAST(sum(x * y) AS HUGEINT) AS sxy
          FROM pts)
        SELECT floor(CAST(n*sxy - sx*sy AS DOUBLE)
                     / nullif(CAST(n*sxx - sx*sx AS DOUBLE), 0.0)
                     * 1000000 + 0.5) / 1000000,
               floor(CAST(sy*sxx - sx*sxy AS DOUBLE)
                     / nullif(CAST(n*sxx - sx*sx AS DOUBLE), 0.0)
                     * 1000000 + 0.5) / 1000000
        FROM s
        """
    ).fetchone()
    assert row == (slope, icept)
