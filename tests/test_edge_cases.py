"""Empty- and degenerate-input robustness for operator FUNCTIONS.

A 100 TB pipeline routinely produces empty slices (a filter that
matches nothing, a new partition, a cold-start corpus); every operator
must return an empty/correct result, never throw."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = (
    "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, "
    "value DOUBLE, props STRING"
)
DOC_SCHEMA = "doc_id LONG, text STRING, source STRING"


def _empty(spark, schema):
    return spark.createDataFrame([], schema)


def test_sessionize_empty_and_single(spark):
    from bigdatagenomic_spark.operators.relational_ext import sessionize

    assert sessionize(_empty(spark, EVENT_SCHEMA)).count() == 0
    one = spark.createDataFrame(
        [(1, datetime(2024, 1, 1), 7, "view", 1.0, "{}")], EVENT_SCHEMA
    )
    rows = sessionize(one).collect()
    assert len(rows) == 1 and rows[0].session_seq == 1


def test_funnel_empty_events(spark):
    from bigdatagenomic_spark.operators.relational_ext import funnel_counts

    got = {r.stage: r.n_users for r in funnel_counts(_empty(spark, EVENT_SCHEMA)).collect()}
    assert got == {1: 0, 2: 0, 3: 0}


def test_snapshot_diff_empty_sides(spark):
    from bigdatagenomic_spark.operators.llm_prep import snapshot_diff

    docs = spark.createDataFrame([(1, "a", "s"), (2, "b", "s")], DOC_SCHEMA)
    empty = _empty(spark, DOC_SCHEMA)
    added = snapshot_diff(empty, docs, ["doc_id"], ["text"]).collect()
    assert {r.change_type for r in added} == {"added"} and len(added) == 2
    removed = snapshot_diff(docs, empty, ["doc_id"], ["text"]).collect()
    assert {r.change_type for r in removed} == {"removed"} and len(removed) == 2
    assert snapshot_diff(empty, empty, ["doc_id"], ["text"]).count() == 0


def test_apply_changes_empty_changelog_and_empty_base(spark):
    from bigdatagenomic_spark.operators.relational_ext import apply_changes

    base = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id LONG, text STRING")
    log_schema = "doc_id LONG, text STRING, op STRING, seq INT"
    out = apply_changes(base, _empty(spark, log_schema), ["doc_id"], "seq")
    assert sorted((r.doc_id, r.text) for r in out.collect()) == [(1, "a"), (2, "b")]
    ins = spark.createDataFrame([(9, "z", "I", 1)], log_schema)
    out2 = apply_changes(
        _empty(spark, "doc_id LONG, text STRING"), ins, ["doc_id"], "seq"
    )
    assert [(r.doc_id, r.text) for r in out2.collect()] == [(9, "z")]


def test_outlier_flags_constant_column(spark):
    """Zero variance: sigma = 0 and MAD = 0 make both scores NULL/inf-free
    divisions in ANSI mode? They divide 0 by 0 -> NaN/NULL; the flags
    must simply mark nothing instead of throwing."""
    from bigdatagenomic_spark.operators.stats import outlier_flags

    df = spark.createDataFrame([( "A", 5.0)] * 10, "k STRING, x DOUBLE")
    flagged = outlier_flags(df, "k", "x")
    got = flagged.where(
        (F.abs("z_score") > 3) | (F.abs("robust_z") > 3.5)
    ).count()
    assert got == 0


def test_reservoir_k_larger_than_group(spark):
    from bigdatagenomic_spark.operators.relational_ext import reservoir_per_key

    df = spark.createDataFrame([(1, 10, 20)], "k INT, a INT, b INT")
    rows = reservoir_per_key(df, "k", ["a", "b"], 5).collect()
    assert len(rows) == 1 and rows[0].sample_rank == 1


def test_connected_components_no_edges(spark):
    from bigdatagenomic_spark.operators.graph import connected_components

    edges = _empty(spark, "src LONG, dst LONG")
    assert connected_components(edges).count() == 0


def test_quantile_bins_single_value(spark):
    from bigdatagenomic_spark.operators.stats import quantile_bins

    df = spark.createDataFrame([(7.0,)] * 8, "x DOUBLE")
    rows = quantile_bins(df, "x").collect()
    # all boundaries equal the value; every row lands in the top bin
    assert len(rows) == 8 and len({r.bin for r in rows}) == 1


def test_cosine_zero_vector_yields_null_not_error(spark):
    from bigdatagenomic_spark.functions import cosine

    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 0.0])], "id LONG, v ARRAY<DOUBLE>"
    )
    a = df.select(F.col("v").alias("a")).limit(1)
    out = (
        df.crossJoin(a)
        .select("id", cosine(F.col("v"), F.col("a")).alias("sim"))
        .collect()
    )
    assert all(r.sim is None for r in out)  # zero vector -> NULL, no crash


def test_emb_normalize_zero_vector(spark):
    from bigdatagenomic_spark.operators.similarity import q_x_emb_normalize  # noqa: F401
    from pyspark.sql import functions as F2

    # exercise the same expressions on a zero vector directly
    df = spark.createDataFrame([(1, [0.0, 0.0, 0.0])], "vec_id LONG, v ARRAY<DOUBLE>")
    norm = F2.sqrt(F2.aggregate("v", F2.lit(0.0), lambda acc, x: acc + x * x))
    out = df.select(
        F2.transform("v", lambda x: F2.try_divide(x, norm)).alias("u")
    ).collect()
    assert out[0].u == [None, None, None]


def test_resample_ffill_semantics(spark):
    """Last-wins in a bucket, forward fill across gaps, NULL before the
    first observation."""
    from datetime import datetime

    from bigdatagenomic_spark.operators.relational_ext import resample_ffill

    rows = [
        # user 0: obs at hour 2 (two events: later one wins) and hour 5
        (1, datetime(2024, 1, 1, 2, 10), 0, "a", 10.0, "{}"),
        (2, datetime(2024, 1, 1, 2, 40), 0, "a", 20.0, "{}"),
        (3, datetime(2024, 1, 1, 5, 0), 0, "a", 30.0, "{}"),
    ]
    events = spark.createDataFrame(
        rows,
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING,"
        " value DOUBLE, props STRING",
    )
    out = {r.slot: r for r in resample_ffill(events, n_slots=8).collect()}
    assert out[0].value is None and out[0].filled
    assert out[1].value is None
    assert out[2].value == 20.0 and not out[2].filled  # last obs in bucket
    assert out[3].value == 20.0 and out[3].filled      # forward filled
    assert out[4].value == 20.0
    assert out[5].value == 30.0 and not out[5].filled
    assert out[7].value == 30.0 and out[7].filled


def test_abtest_readout_hand_computed(spark):
    from datetime import datetime

    from bigdatagenomic_spark.operators.relational_ext import abtest_readout

    # md5-hash parity of user ids: choose users landing in each arm
    from bigdatagenomic_spark.functions import md5_long  # noqa: F401

    rows = []
    i = 0
    for uid in range(20):
        # every user gets a view; users 0-4 also a high-value purchase
        rows.append((i, datetime(2024, 1, 1, 1), uid, "view", 1.0, "{}")); i += 1
        if uid < 5:
            rows.append(
                (i, datetime(2024, 1, 1, 2), uid, "purchase", 500.0, "{}")
            ); i += 1
    events = spark.createDataFrame(
        rows,
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING,"
        " value DOUBLE, props STRING",
    )
    out = {r.variant: r for r in abtest_readout(events).collect()}
    assert set(out) == {"A", "B"}
    assert out["A"].n_users + out["B"].n_users == 20
    assert out["A"].n_converted + out["B"].n_converted == 5
    # control arm's lift over itself is exactly 0
    assert out["A"].lift_pct == 0.0 and out["A"].z_score == 0.0
    for r in out.values():
        assert abs(r.cvr - r.n_converted / r.n_users) < 1e-4


def test_ewma_half_matches_recurrence(spark):
    from bigdatagenomic_spark.operators.relational_ext import ewma_half

    vals = [4.0, 8.0, None, 2.0]  # None contributes 0
    grid = spark.createDataFrame(
        [(0, i, v) for i, v in enumerate(vals)],
        "user_id LONG, slot INT, value DOUBLE",
    )
    out = [r.ewma for r in ewma_half(grid).orderBy("slot").collect()]
    s, want = None, []
    for v in vals:
        x = 0.0 if v is None else v
        s = x if s is None else x / 2 + s / 2
        want.append(round(s, 4))
    assert out == want


def test_bootstrap_ci_brackets_point_mean(spark):
    from bigdatagenomic_spark.operators.stats import bootstrap_ci_mean

    orders = spark.createDataFrame(
        [(i, 100.0 + (i % 7)) for i in range(300)],
        "o_orderkey LONG, o_totalprice DOUBLE",
    )
    a = bootstrap_ci_mean(orders).collect()[0]
    assert a.ci_lo < a.point_mean < a.ci_hi
    # tight data -> tight interval
    assert a.ci_hi - a.ci_lo < 2.0
    b = bootstrap_ci_mean(orders).collect()[0]
    assert (a.ci_lo, a.ci_hi) == (b.ci_lo, b.ci_hi)  # deterministic replay


def test_cms_never_undercounts_and_collides_when_narrow(spark):
    from bigdatagenomic_spark.operators.stats import cms_word_monitor

    docs = spark.createDataFrame(
        [(i, "alpha beta " + ("gamma " * (i % 3))) for i in range(30)],
        "doc_id LONG, text STRING",
    )
    # roomy sketch: exact
    wide = {r.word: r for r in cms_word_monitor(docs, width=1024).collect()}
    assert all(r.overestimate == 0 for r in wide.values())
    # 2-bucket rows force collisions: estimates may inflate, never deflate
    narrow = {r.word: r for r in cms_word_monitor(docs, width=2).collect()}
    assert all(r.cms_est >= r.exact_count for r in narrow.values())
    assert any(r.overestimate > 0 for r in narrow.values())


def test_impute_group_mean_exact(spark):
    from datetime import datetime

    from bigdatagenomic_spark.operators.relational_ext import impute_group_mean

    ts = datetime(2024, 1, 1)
    rows = [
        (1, ts, 0, "a", 10.0, "{}"),
        (2, ts, 0, "a", 20.01, "{}"),
        (7, ts, 0, "a", 99.0, "{}"),   # id % 7 == 0 -> planted null
        (14, ts, 0, "b", 5.0, "{}"),   # null; group b has no observed rows
    ]
    events = spark.createDataFrame(
        rows,
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING,"
        " value DOUBLE, props STRING",
    )
    out = {r.event_id: r for r in impute_group_mean(events).collect()}
    # mean of (10.00, 20.01) = 15.005 -> half-up to 15.01
    assert out[7].was_imputed and out[7].value_imputed == 15.01
    assert not out[1].was_imputed and out[1].value_imputed == 10.0
    # a group with zero observed rows stays NULL (nothing to impute from)
    assert out[14].was_imputed and out[14].value_imputed is None


def test_event_pattern_consecutive_only(spark):
    from datetime import datetime, timedelta

    from bigdatagenomic_spark.operators.relational_ext import (
        event_pattern_matches,
    )

    t0 = datetime(2024, 1, 1)
    seq_a = ["error", "error", "purchase", "view"]          # match at 0
    seq_b = ["error", "view", "error", "purchase"]          # broken run: none
    seq_c = ["error", "error", "error", "purchase"]         # match at 1 only
    rows = []
    eid = 0
    for uid, seq in [(1, seq_a), (2, seq_b), (3, seq_c)]:
        for i, et in enumerate(seq):
            rows.append((eid, t0 + timedelta(minutes=i), uid, et, 0.0, "{}"))
            eid += 1
    events = spark.createDataFrame(
        rows,
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING,"
        " value DOUBLE, props STRING",
    )
    out = {(r.user_id, r.match_at) for r in event_pattern_matches(events).collect()}
    assert out == {(1, 0), (3, 1)}


def test_golden_records_survivorship_rules(spark):
    from bigdatagenomic_spark.operators.relational_ext import golden_records

    rows = [
        (1, "Customer#1", 100.0, "AUTO"),
        (2, "  CUSTOMER#1  ", 250.0, "DUPFEED"),  # normalizes equal to id 1
        (3, "Customer#3", 50.0, "HOUSE"),
    ]
    df = spark.createDataFrame(
        rows, "c_custkey LONG, c_name STRING, c_acctbal DOUBLE, c_mktsegment STRING"
    )
    out = {r.cluster: r for r in golden_records(df).collect()}
    assert set(out) == {1, 3}
    g = out[1]
    assert g.n_members == 2
    assert g.golden_name == "Customer#1"       # canonical id's fields
    assert g.golden_segment == "AUTO"
    assert g.golden_acctbal == 250.0           # max balance survives
    assert out[3].n_members == 1


def test_er_hub_key_blocks_stay_bounded(spark):
    """A 1k-record hub key (every record normalizes to the same name)
    must NOT self-join quadratically: oversized blocks refine to
    (norm, segment); refined blocks still over the cap are routed out
    of linking as singletons."""
    from bigdatagenomic_spark.functions import normalize_text
    from bigdatagenomic_spark.operators.relational_ext import (
        er_candidate_edges,
        golden_records,
    )
    from pyspark.sql import functions as F

    # hub A: 1000 records over 100 segments (10 each) -> refinement
    # splits it into linkable blocks; hub B: 1000 records over 2
    # segments (500 each) -> still oversized after refinement -> no
    # links; plus one normal duplicate pair.
    rows = (
        [(i, "ACME Corp", 1.0 * i, f"SEG{i % 100}") for i in range(1000)]
        + [(2000 + i, "Hub B Inc", 1.0, f"S{i % 2}") for i in range(1000)]
        + [(5001, "Solo Ltd", 10.0, "AUTO"), (5002, " solo  ltd ", 20.0, "WEB")]
    )
    df = spark.createDataFrame(
        rows, "c_custkey LONG, c_name STRING, c_acctbal DOUBLE, c_mktsegment STRING"
    )
    base = df.select(
        F.col("c_custkey").alias("id"),
        normalize_text(F.col("c_name")).alias("norm"),
        F.col("c_mktsegment").alias("segment"),
    )
    edges = er_candidate_edges(base).collect()
    # hub A: 100 refined blocks x C(10,2) = 4500 pairs, not C(1000,2);
    # hub B: zero pairs; solo pair: 1
    a_edges = [e for e in edges if e.src < 1000]
    b_edges = [e for e in edges if 2000 <= e.src < 3000]
    assert len(a_edges) == 4500
    assert len(b_edges) == 0
    assert len(edges) == 4501
    out = golden_records(df).collect()
    # hub A -> 100 clusters, hub B -> 1000 singletons, solo -> 1 cluster
    assert len(out) == 100 + 1000 + 1
    solo = [r for r in out if r.cluster == 5001]
    assert solo and solo[0].n_members == 2


def test_volume_anomalies_flags_planted_spike(spark):
    from datetime import datetime

    from bigdatagenomic_spark.operators.stats import volume_anomalies

    rows = []
    eid = 0
    # 10 steady days of 10 events, then one day with 100 (a 3-sigma spike)
    for d in range(1, 11):
        for _ in range(10):
            rows.append((eid, datetime(2024, 1, d, 12), 0, "click", 0.0, "{}")); eid += 1
    for _ in range(100):
        rows.append((eid, datetime(2024, 1, 11, 12), 0, "click", 0.0, "{}")); eid += 1
    events = spark.createDataFrame(
        rows,
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING,"
        " value DOUBLE, props STRING",
    )
    out = {str(r.day): r.is_anomaly for r in volume_anomalies(events).collect()}
    assert out["2024-01-11"] is True
    assert sum(out.values()) == 1  # steady days stay quiet


def test_bootstrap_ci_ranks_derive_from_n_reps(spark):
    from bigdatagenomic_spark.operators.stats import bootstrap_ci_mean

    orders = spark.createDataFrame(
        [(i, 100.0 + (i % 7)) for i in range(120)],
        "o_orderkey LONG, o_totalprice DOUBLE",
    )
    # n_reps=2: the old hardcoded rank 3 never matched -> NULL ci_lo.
    # Derived ranks give (lo=1, hi=2) = (min, max) replica mean.
    tiny = bootstrap_ci_mean(orders, n_reps=2).collect()[0]
    assert tiny.ci_lo is not None and tiny.ci_hi is not None
    assert tiny.ci_lo <= tiny.ci_hi
    # n_reps=200 stays a 95% CI (ranks 5/196), not a ~99.5% one: the
    # interval must still bracket the point mean and stay tight.
    wide = bootstrap_ci_mean(orders, n_reps=200).collect()[0]
    assert wide.ci_lo < wide.point_mean < wide.ci_hi
    assert wide.ci_hi - wide.ci_lo < 2.0


def test_theil_sen_span_guard_fails_loudly(spark, tmp_path):
    """VERDICT r13 #4: a series wider than the documented 10-year
    O(days^2) contract must raise before any pair table is built —
    a 100-year calendar would mean ~670M pairs per type."""
    import pytest

    from bigdatagenomic_spark.operators.stats import q_x_theil_sen

    rows = [
        (1, datetime(1970, 1, 1, 12, 0, 0), 1, "click", 1.0, "{}"),
        (2, datetime(2070, 1, 1, 12, 0, 0), 2, "click", 1.0, "{}"),
    ]
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    spark.createDataFrame(rows, schema).write.parquet(
        str(tmp_path / "events.parquet")
    )
    with pytest.raises(ValueError, match="10-year"):
        q_x_theil_sen(spark, str(tmp_path))


def test_theil_sen_span_guard_passes_at_contract_boundary(spark, tmp_path):
    """Just-inside-contract series (< 10 years) must run normally."""
    from bigdatagenomic_spark.operators.stats import q_x_theil_sen

    rows = [
        (1, datetime(2020, 1, 1, 12, 0, 0), 1, "click", 1.0, "{}"),
        (2, datetime(2020, 1, 2, 12, 0, 0), 2, "click", 1.0, "{}"),
        (3, datetime(2029, 1, 1, 12, 0, 0), 3, "click", 1.0, "{}"),
    ]
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    spark.createDataFrame(rows, schema).write.parquet(
        str(tmp_path / "events.parquet")
    )
    out = q_x_theil_sen(spark, str(tmp_path)).collect()
    assert len(out) == 1 and out[0]["n_days"] == 3 and out[0]["n_pairs"] == 3
