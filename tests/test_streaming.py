"""Streaming batch-equivalence tests (SURVEY.md §5.2 item 5, S01-S07).

Every streaming op is the SAME plan as its batch form (unified
transformations); these tests replay the events table as a chunked file
stream and assert the streaming result equals the batch result, plus
one synthetic-late-data test proving the watermark actually drops.
"""

from __future__ import annotations

from datetime import datetime

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from bigdatagenomic_spark.sources.tables import load_table
from bigdatagenomic_spark.streaming import (
    dedup_events,
    enrich_with_nation,
    run_to_memory,
    running_user_totals,
    session_agg,
    sliding_agg,
    tumbling_agg,
)
from bigdatagenomic_spark.streaming.replay import (
    read_event_stream,
    write_chunks,
    write_event_chunks,
)

SF_DIR = "/root/testdata/sf0.001"

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


@pytest.fixture(scope="module")
def replay_dir(spark, tmp_path_factory):
    ev = load_table(spark, SF_DIR, "events").select(*[f.name for f in EVENT_SCHEMA])
    out = str(tmp_path_factory.mktemp("event_chunks"))
    write_event_chunks(ev, out, n_chunks=4)
    return out


def _batch_events(spark):
    return load_table(spark, SF_DIR, "events").select(*[f.name for f in EVENT_SCHEMA])


def _stream_events(spark, replay_dir):
    return read_event_stream(spark, replay_dir, EVENT_SCHEMA)


def _as_map(df, key_cols, val_cols):
    return {
        tuple(r[k] for k in key_cols): tuple(r[v] for v in val_cols)
        for r in df.collect()
    }


def _assert_equal_aggs(stream_df, batch_df, key_cols, exact_cols, approx_cols=()):
    s = _as_map(stream_df, key_cols, list(exact_cols) + list(approx_cols))
    b = _as_map(batch_df, key_cols, list(exact_cols) + list(approx_cols))
    assert set(s) == set(b)
    n_exact = len(exact_cols)
    for k in b:
        assert s[k][:n_exact] == b[k][:n_exact], f"key {k}: {s[k]} != {b[k]}"
        for sv, bv in zip(s[k][n_exact:], b[k][n_exact:]):
            # incremental double summation can land on the other side of a
            # .xx5 rounding boundary — allow one ulp of the 2-dec rounding
            assert abs(sv - bv) <= 0.011, f"key {k}: {s[k]} != {b[k]}"


def test_s02_tumbling_stream_equals_batch(spark, replay_dir):
    got = run_to_memory(tumbling_agg(_stream_events(spark, replay_dir)), "complete")
    want = tumbling_agg(_batch_events(spark))
    _assert_equal_aggs(
        got, want, ["w_start", "event_type"], ["n_events"], ["sum_value"]
    )


def test_s02_sliding_stream_equals_batch(spark, replay_dir):
    got = run_to_memory(sliding_agg(_stream_events(spark, replay_dir)), "complete")
    want = sliding_agg(_batch_events(spark))
    _assert_equal_aggs(got, want, ["w_start", "event_type"], ["n_events"])


def test_s03_session_stream_equals_batch(spark, replay_dir):
    got = run_to_memory(session_agg(_stream_events(spark, replay_dir)), "complete")
    want = session_agg(_batch_events(spark))
    _assert_equal_aggs(
        got, want, ["user_id", "s_start"], ["s_end", "n_events"], ["sum_value"]
    )


def test_s04_watermark_drops_late_rows(spark, tmp_path):
    """Synthetic replay: a row arriving after the watermark passed (and
    evicted) its window must be excluded from the appended result.

    Note Spark's exact semantics (verified empirically): window eviction
    at the end of batch N uses the watermark derived from batches ≤ N-1,
    while the late-row drop filter in batch N uses the watermark that was
    in force DURING batch N-1 — one batch older. So the late row must
    arrive two batches after the window's data to be provably dropped.
    """

    def ev(eid, hh, mm, val):
        return (eid, datetime(2024, 3, 1, hh, mm, 0), 1, "view", val, "{}")

    c1 = spark.createDataFrame([ev(1, 5, 10, 1.0), ev(2, 10, 0, 1.0)], EVENT_SCHEMA)
    # batch 1 raises the in-force watermark to 09:30 and evicts [05,06)
    c2 = spark.createDataFrame([ev(4, 11, 0, 1.0)], EVENT_SCHEMA)
    # event 3 is late: its window [05:00,06:00) was evicted a batch ago
    c3 = spark.createDataFrame([ev(3, 5, 20, 100.0), ev(5, 11, 10, 1.0)], EVENT_SCHEMA)
    chunk_dir = str(tmp_path / "late_chunks")
    write_chunks([c1, c2, c3], chunk_dir)

    stream = read_event_stream(spark, chunk_dir, EVENT_SCHEMA)
    got = run_to_memory(
        tumbling_agg(stream, duration="1 hour", watermark="30 minutes"), "append"
    ).collect()

    # only [05:00,06:00) is finalized (final wm 10:40 < later window
    # ends); it holds event 1 alone — late event 3 was dropped, not merged
    assert len(got) == 1
    (row,) = got
    assert row.w_start == int(datetime(2024, 3, 1, 5, 0).timestamp())
    assert row.n_events == 1
    assert row.sum_value == 1.0


def test_s05_stateful_dedup(spark, tmp_path):
    """Duplicate event_ids across chunks (within the watermark) are
    dropped; streaming output matches batch dropDuplicates."""
    ev = _batch_events(spark)
    doubled = ev.union(ev)  # every event arrives twice
    chunk_dir = str(tmp_path / "dup_chunks")
    write_event_chunks(doubled, chunk_dir, n_chunks=4)

    stream = read_event_stream(spark, chunk_dir, EVENT_SCHEMA)
    got = run_to_memory(dedup_events(stream), "append")
    want_n = dedup_events(ev).count()
    assert ev.count() == want_n  # event_id unique in source data
    assert got.select("event_id").distinct().count() == want_n
    assert got.count() == want_n


def test_s06_stream_static_join(spark, replay_dir):
    customer = load_table(spark, SF_DIR, "customer")
    nation = load_table(spark, SF_DIR, "nation")
    got = run_to_memory(
        enrich_with_nation(_stream_events(spark, replay_dir), customer, nation),
        "append",
    )
    want = enrich_with_nation(_batch_events(spark), customer, nation)
    assert got.count() == want.count()
    g = _as_map(got, ["event_id"], ["nation_name"])
    w = _as_map(want, ["event_id"], ["nation_name"])
    assert g == w


def test_s07_custom_stateful_running_totals(spark, replay_dir):
    """applyInPandasWithState accumulator: the last update per user must
    equal the batch per-user aggregate."""
    got = run_to_memory(
        running_user_totals(_stream_events(spark, replay_dir)), "update"
    )
    # update-mode memory sink appends every refresh; the running count is
    # monotone, so max(n_events) per user is the final state
    final = got.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max("total_value").alias("total_value"),
    )
    want = (
        _batch_events(spark)
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
    )
    g = _as_map(final, ["user_id"], ["n_events", "total_value"])
    w = _as_map(want, ["user_id"], ["n_events", "total_value"])
    assert set(g) == set(w)
    for k in w:
        assert g[k][0] == w[k][0]
        assert abs(g[k][1] - w[k][1]) < 1e-6


def test_s01_parquet_sink_roundtrip(spark, replay_dir, tmp_path):
    """S01's durable half: stream -> parquet sink with checkpoint; the
    files read back must equal the batch aggregate."""
    out = str(tmp_path / "agg_parquet")
    ckpt = str(tmp_path / "ckpt")
    q = (
        tumbling_agg(_stream_events(spark, replay_dir))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    got = spark.read.parquet(out)
    # append mode only emits watermark-finalized windows; every emitted
    # row must match the batch result exactly
    want = _as_map(
        tumbling_agg(_batch_events(spark)),
        ["w_start", "event_type"],
        ["n_events", "sum_value"],
    )
    assert got.count() > 0
    for k, v in _as_map(got, ["w_start", "event_type"], ["n_events", "sum_value"]).items():
        assert k in want
        assert v[0] == want[k][0]
        assert abs(v[1] - want[k][1]) <= 0.011


@pytest.mark.slow  # round 15: driver-budget cut (see pytest.ini)
def test_s08_stream_stream_join(spark, replay_dir):
    """Stream-stream interval join equals the batch join over the same
    events (both sides replayed from the same chunked stream)."""
    from bigdatagenomic_spark.streaming.ops import stream_stream_click_view_join

    def split(ev):
        return (
            ev.where(F.col("event_type") == "click"),
            ev.where(F.col("event_type") == "view"),
        )

    sc, sv = split(_stream_events(spark, replay_dir))
    got = run_to_memory(stream_stream_click_view_join(sc, sv), "append")
    bc, bv = split(_batch_events(spark))
    want = stream_stream_click_view_join(bc, bv)
    g = {(r.click_id, r.view_id) for r in got.collect()}
    w = {(r.click_id, r.view_id) for r in want.collect()}
    assert g == w
    assert len(w) > 0


@pytest.mark.slow  # round 15: driver-budget cut (see pytest.ini)
def test_s09_foreach_batch_upsert_sink(spark, replay_dir, tmp_path):
    """S09: update-mode agg drained through the partition-overwrite
    upsert sink must equal the batch aggregation — including windows
    whose value was rewritten across several micro-batches."""
    from bigdatagenomic_spark.streaming.sinks import read_upserted, run_upsert_sink

    target = str(tmp_path / "upserted")
    ckpt = str(tmp_path / "ckpt")
    agg = tumbling_agg(_stream_events(spark, replay_dir))
    run_upsert_sink(agg, target, ["w_start", "event_type"], ckpt)
    got = read_upserted(spark, target)
    want = tumbling_agg(_batch_events(spark))
    _assert_equal_aggs(got, want, ["w_start", "event_type"], ["n_events"], ["sum_value"])
    # idempotency: draining the SAME replay again into the same target
    # (fresh checkpoint = full replay = worst-case duplicate delivery)
    # must not change the sink contents
    run_upsert_sink(
        tumbling_agg(_stream_events(spark, replay_dir)),
        target,
        ["w_start", "event_type"],
        str(tmp_path / "ckpt2"),
    )
    again = read_upserted(spark, target)
    _assert_equal_aggs(again, want, ["w_start", "event_type"], ["n_events"], ["sum_value"])


def _has_protobuf() -> bool:
    # transformWithStateInPandas speaks protobuf to the state server; the
    # container may not ship google.protobuf (no pip install allowed)
    try:
        import google.protobuf  # noqa: F401
        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithStateInPandas requires google.protobuf at runtime",
)
def test_s10_transform_with_state_running_totals(spark, replay_dir):
    """transformWithStateInPandas (Spark 4 arbitrary-state API) running
    per-event-type totals: the last update per type equals the batch
    aggregate. Needs the RocksDB state store provider + protobuf."""
    from bigdatagenomic_spark.streaming import running_type_totals_tws

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    saved = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        got = run_to_memory(
            running_type_totals_tws(_stream_events(spark, replay_dir)), "update"
        )
        final = got.groupBy("event_type").agg(
            F.max("n_events").alias("n_events"),
            F.max("total_value").alias("total_value"),
        )
        want = (
            _batch_events(spark)
            .groupBy("event_type")
            .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        )
        g = _as_map(final, ["event_type"], ["n_events", "total_value"])
        w = _as_map(want, ["event_type"], ["n_events", "total_value"])
        assert set(g) == set(w)
        for k in w:
            assert g[k][0] == w[k][0]
            assert abs(g[k][1] - w[k][1]) < 1e-6
    finally:
        if saved is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, saved)


def test_s11_lsh_index_maintenance_matches_batch_candidates(spark, tmp_path):
    """S11: replaying the corpus as a 3-chunk doc stream through the
    foreachBatch index-maintenance pipeline must (a) emit exactly the
    full-corpus LSH candidate set, once per pair, and (b) leave the
    stored band index equal to the batch band table."""
    from bigdatagenomic_spark.operators.dedup import (
        lsh_band_table,
        lsh_candidate_pairs,
    )
    from bigdatagenomic_spark.streaming.ops import run_lsh_index_maintenance
    from bigdatagenomic_spark.streaming.replay import (
        read_event_stream,
        write_chunks,
    )

    docs = (
        load_table(spark, "/root/testdata/sf0.01", "documents")
        .where(F.col("doc_id") < 400)
        .select("doc_id", "text")
    )
    chunks = [
        docs.where((F.col("doc_id") % 3) == i).orderBy("doc_id")
        for i in range(3)
    ]
    stream_dir = str(tmp_path / "docstream")
    write_chunks(chunks, stream_dir)
    stream = read_event_stream(spark, stream_dir, docs.schema)
    try:
        run_lsh_index_maintenance(
            stream,
            str(tmp_path / "s11_idx"),
            "t_s11_band_index",
            str(tmp_path / "s11_pairs"),
            str(tmp_path / "s11_ckpt"),
        )
        emitted = [
            (r.a_id, r.b_id)
            for r in spark.read.parquet(str(tmp_path / "s11_pairs")).collect()
        ]
        want = {
            (r.a_id, r.b_id) for r in lsh_candidate_pairs(docs).collect()
        }
        assert len(want) > 0
        assert len(emitted) == len(set(emitted))  # exactly once per pair
        assert set(emitted) == want
        # the maintained index equals the batch band table
        idx = {
            (r.doc_id, r.band, r.bkey)
            for r in spark.table("t_s11_band_index").collect()
        }
        full = {
            (r.doc_id, r.band, r.bkey) for r in lsh_band_table(docs).collect()
        }
        assert idx == full
    finally:
        spark.sql("DROP TABLE IF EXISTS t_s11_band_index")


def test_s12_streaming_pii_scrub_equals_batch(spark, replay_dir):
    """Map-only curation ops drop into a stream untouched: scrub_pii on
    the props JSON column over the replayed file stream must produce
    exactly the batch result (same rows, same redactions)."""
    from bigdatagenomic_spark.operators.curation import scrub_pii

    def dirty(df):
        # plant an email on every 5th event, derived from the row itself
        return df.select(
            "event_id",
            F.when(
                F.col("event_id") % 5 == 0,
                F.concat(
                    F.col("props"), F.lit(" user"),
                    F.col("event_id").cast("string"), F.lit("@mail.test"),
                ),
            ).otherwise(F.col("props")).alias("text"),
        )

    got = run_to_memory(
        scrub_pii(dirty(_stream_events(spark, replay_dir))), "append"
    )
    want = scrub_pii(dirty(_batch_events(spark)))
    s = {r.event_id: (r.n_email, r.clean_text) for r in got.collect()}
    b = {r.event_id: (r.n_email, r.clean_text) for r in want.collect()}
    assert s == b
    assert any(v[0] == 1 for v in b.values())  # redactions actually happened
    assert all("@" not in v[1] for v in b.values() if v[0])


def test_s13_incremental_agg_maintenance_equals_batch(spark, replay_dir, tmp_path):
    """S13: the materialized-view merge (q_x_incremental_agg's null-safe
    full-outer + summed partials) driven by foreachBatch over the
    replayed stream: after draining, the maintained state table equals
    the one-pass batch aggregate — delta-cost view upkeep, streamed."""
    import os

    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    cents = F.round(F.col("value") * 100).cast("long")

    def agg(df):
        return df.groupBy("user_id", "event_type").agg(
            F.count("*").alias("n"), F.sum(cents).alias("cents")
        )

    def merge_batch(batch_df, batch_id):
        delta = agg(batch_df)
        sess = batch_df.sparkSession
        if os.path.exists(os.path.join(state_dir, "_SUCCESS")):
            state = sess.read.parquet(state_dir)
        else:
            state = delta.limit(0)
        s, d = state.alias("s"), delta.alias("d")
        merged = s.join(
            d,
            F.col("s.user_id").eqNullSafe(F.col("d.user_id"))
            & F.col("s.event_type").eqNullSafe(F.col("d.event_type")),
            "full_outer",
        ).select(
            F.coalesce("s.user_id", "d.user_id").alias("user_id"),
            F.coalesce("s.event_type", "d.event_type").alias("event_type"),
            (F.coalesce("s.n", F.lit(0)) + F.coalesce("d.n", F.lit(0))).alias("n"),
            (F.coalesce("s.cents", F.lit(0)) + F.coalesce("d.cents", F.lit(0))).alias("cents"),
        )
        rows = merged.collect()  # tiny state in tests; prod writes a temp dir + swap
        sess.createDataFrame(rows, merged.schema).write.mode("overwrite").parquet(state_dir)

    q = (
        _stream_events(spark, replay_dir)
        .writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.event_type): (r.n, r.cents)
        for r in spark.read.parquet(state_dir).collect()
    }
    want = {
        (r.user_id, r.event_type): (r.n, r.cents)
        for r in agg(_batch_events(spark)).collect()
    }
    assert got == want


def test_s14_trending_topk_stream_equals_batch(spark, replay_dir):
    """S14: the streaming side emits the incremental windowed counts;
    ranking runs per window downstream (here: on the completed count
    state, the foreachBatch position). The ranked result must equal
    the batch-shape plan end to end."""
    from pyspark.sql import Window as W

    from bigdatagenomic_spark.streaming.ops import trending_topk

    counts = run_to_memory(
        trending_topk(_stream_events(spark, replay_dir)), "complete"
    )
    rk = W.partitionBy("w_start").orderBy(
        F.desc("n_events"), F.asc("event_type")
    )
    got = (
        counts.select(
            "w_start", "event_type", "n_events",
            F.row_number().over(rk).alias("rank"),
        )
        .where(F.col("rank") <= 3)
    )
    want = trending_topk(_batch_events(spark), "1 hour", k=3)
    _assert_equal_aggs(
        got, want, ["w_start", "rank"], ["event_type", "n_events"]
    )


def test_sssp_hand_computed(spark):
    """Bellman-Ford on a 5-vertex weighted graph with a tempting-but-
    longer direct edge: 0→1 (w=10), 0→2 (w=1), 2→1 (w=2) → dist(1)=3;
    plus an unreachable vertex (absent from the result) and a relaxation
    chain 1→3 (w=1) → dist(3)=4."""
    from bigdatagenomic_spark.operators.graph import sssp_bellman_ford

    e = spark.createDataFrame(
        [(0, 1, 10), (0, 2, 1), (2, 1, 2), (1, 3, 1), (7, 8, 1)],
        "src LONG, dst LONG, w LONG",
    )
    got = {(r.id, r.dist) for r in sssp_bellman_ford(e, source=0).collect()}
    assert got == {(0, 0), (2, 1), (1, 3), (3, 4)}


@pytest.mark.slow  # round 15: driver-budget cut (see pytest.ini)
def test_s15_stream_stream_left_outer_join(spark, replay_dir):
    """S15: the LEFT OUTER stream-stream interval join. Matched rows
    emit eagerly and equal the inner join's; NULL rows emit only for
    clicks whose eviction horizon passed before the stream ended
    (watermark semantics), each exactly once, and only for clicks the
    batch left join also leaves unmatched."""
    from bigdatagenomic_spark.streaming.ops import stream_stream_click_view_join

    def split(ev):
        return (
            ev.where(F.col("event_type") == "click"),
            ev.where(F.col("event_type") == "view"),
        )

    sc, sv = split(_stream_events(spark, replay_dir))
    got = run_to_memory(
        stream_stream_click_view_join(sc, sv, how="left_outer"), "append"
    ).collect()

    bc, bv = split(_batch_events(spark))
    batch = stream_stream_click_view_join(bc, bv, how="left_outer").collect()
    batch_matched = {(r.click_id, r.view_id) for r in batch if r.view_id is not None}
    batch_unmatched = {r.click_id for r in batch if r.view_id is None}

    got_matched = {(r.click_id, r.view_id) for r in got if r.view_id is not None}
    got_null = [r.click_id for r in got if r.view_id is None]

    # inner part: stream == batch exactly
    assert got_matched == batch_matched
    # null part: subset of the batch's unmatched clicks (end-of-stream
    # rows may stay buffered), each emitted at most once, and non-empty
    # (events span ~30 days vs a 1h watermark, so most horizons pass)
    assert set(got_null) <= batch_unmatched
    assert len(got_null) == len(set(got_null))
    assert len(got_null) > 0


@pytest.mark.slow  # round 15: driver-budget cut (see pytest.ini)
def test_s16_cascaded_funnel_join_stream_equals_batch(spark, replay_dir):
    """S16: the cascaded view→click→purchase stream-stream join chain
    equals the batch chain over the same events (inner joins emit
    eagerly, so end-of-stream buffering cannot drop matches whose
    horizon passed — and the 30-day replay vs 1h watermark means the
    chain has real eviction pressure)."""
    from bigdatagenomic_spark.streaming.ops import stream_funnel_join

    def split(ev):
        return (
            ev.where(F.col("event_type") == "view"),
            ev.where(F.col("event_type") == "click"),
            ev.where(F.col("event_type") == "purchase"),
        )

    got = run_to_memory(
        stream_funnel_join(*split(_stream_events(spark, replay_dir))), "append"
    ).collect()
    want = stream_funnel_join(*split(_batch_events(spark))).collect()
    key = lambda r: (r.view_id, r.click_id, r.purchase_id)  # noqa: E731
    assert {key(r) for r in got} == {key(r) for r in want}
    assert len(want) > 0
