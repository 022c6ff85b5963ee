"""Oracle parity tests for every registry query with an oracle (t2 gate).

Runs at sf0.001 for speed; the driver runs the same comparisons at
sf0.01. Queries registered with ``None`` oracle get a rows-only smoke
check here, mirroring the driver's weaker check.
"""

from __future__ import annotations

import pytest

from bigdatagenomic_spark import queries as Q

from tests.oracle_harness import compare_query

SF_DIR = "/root/testdata/sf0.001"

_QUERIES = Q.queries()
_ORACLES = Q.oracle_sql()

# round 15: the heaviest oracle replays (DuckDB-side recursive/unrolled
# CTEs, not Spark) are `slow`-marked out of the default driver-budget
# run (pytest.ini); the driver's own correctness harness still checks
# them at sf0.01, and `-m slow` runs them here.
_SLOW_ORACLES = {"q_graph_pagerank", "q_graph_scc", "q_text_rake_keywords"}

WITH_ORACLE = [
    pytest.param(n, marks=pytest.mark.slow) if n in _SLOW_ORACLES else n
    for n in sorted(_ORACLES)
]
ROWS_ONLY = sorted(set(_QUERIES) - set(_ORACLES))


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, name):
    problems = compare_query(spark, SF_DIR, _QUERIES[name], _ORACLES[name])
    assert not problems, f"{name}:\n" + "\n".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only(spark, name):
    df = _QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
