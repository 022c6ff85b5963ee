"""Pins the driver-gate rotation invariants (ROTATION.md round 12).

The correctness driver independently checks the FIRST 50 registry
entries; these tests make the checked-50 construction itself
test-enforced so a bad edit to ``_PRIORITY_PREFIX`` fails fast rather
than silently shrinking the driver gate:

* exactly 50 entries, all unique, all registered;
* the registry's insertion order actually starts with the prefix
  (``_apply_priority_order`` ran);
* the sentinel tranche is a subset of the §2 contract surface
  (Q01-Q27 + q_s02 + q_s03) — the amended rule 1;
* every checked-50 entry has either an oracle SQL or an explicit
  rows-only contract (None), never a missing registration.
"""

from __future__ import annotations

CONTRACT = {
    "q01_scan_filter", "q02_predicates", "q03_inner_join",
    "q04_broadcast_join", "q05_outer_join", "q06_anti_join",
    "q07_range_join", "q08_agg_tpch_q1", "q09_count_distinct",
    "q10_approx_count_distinct", "q11_rollup", "q12_argmax",
    "q13_rank_window", "q14_running_sum", "q15_topk", "q16_intersect",
    "q17_string_funcs", "q18_date_funcs", "q19_math_funcs",
    "q20_case_when", "q21_array_l2norm", "q22_json_extract",
    "q23_subquery", "q24_dedup_exact", "q25_term_counts",
    "q26_cosine_topk", "q27_assembly", "q_s02_window_agg",
    "q_s03_session_agg",
}


def test_checked50_shape_and_uniqueness():
    from bigdatagenomic_spark.queries import _PRIORITY_PREFIX, _REGISTRY

    assert len(_PRIORITY_PREFIX) == 50
    assert len(set(_PRIORITY_PREFIX)) == 50
    missing = [n for n in _PRIORITY_PREFIX if n not in _REGISTRY]
    assert not missing, f"prefix names not in registry: {missing}"
    assert list(_REGISTRY)[:50] == _PRIORITY_PREFIX


def test_sentinels_are_contract_entries():
    from bigdatagenomic_spark.queries import _PRIORITY_PREFIX

    sentinels = [n for n in _PRIORITY_PREFIX if n in CONTRACT]
    # the sentinel tranche is a CONTIGUOUS leading block, allowing only
    # rule-2 entries (new/behavior-changed ops that must earn a driver
    # row) ahead of it — round 14 leads with a 10-deep rule-2 backlog
    # (the two round-13 additions + the eight sampling-double-scan plan
    # rewrites, VERDICT r13 #1); the bound tracks ROTATION.md's rule-2
    # list, never sweep slots
    first = _PRIORITY_PREFIX.index(sentinels[0])
    assert first <= 10, "sentinel tranche must sit at the prefix head"
    assert _PRIORITY_PREFIX[first : first + len(sentinels)] == sentinels
    # a tranche is ~1/3 of the contract, never the empty set
    assert 8 <= len(sentinels) <= 12


def test_contract_never_leaves_registry():
    from bigdatagenomic_spark.queries import _REGISTRY

    gone = CONTRACT - set(_REGISTRY)
    assert not gone, f"contract entries missing from registry: {gone}"


def test_checked50_all_have_oracle_registration():
    import __spark_entry__ as entry
    from bigdatagenomic_spark.queries import _PRIORITY_PREFIX

    oracles = entry.oracle_sql()
    qs = entry.queries()
    for name in _PRIORITY_PREFIX:
        assert name in qs
        # rows-only entries are deliberately absent from oracle_sql();
        # everything else must carry a non-empty SQL string
        if name in oracles:
            assert oracles[name].strip()
