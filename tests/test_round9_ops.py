"""Behavioral pins for the round-9 operators (BM25, MMR, range search,
PPR, OLS trend, TTR, fuzzy decontam) — semantics the DuckDB hash parity
can't express: planted-pair recovery, mass conservation, diversity
invariants. Oracle parity itself is covered registry-wide by
tests/test_relational_oracle.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _q(name):
    import __spark_entry__ as e

    return e.queries()[name]


def test_decontam_fuzzy_flags_planted_pair(spark):
    rows = _q("q_x_decontam_fuzzy")(spark, SF).collect()
    from bigdatagenomic_spark.operators.llm_prep import (
        DECON_FUZZY_MOD,
        DECON_FUZZY_THRESHOLD,
    )

    assert rows, "expected contaminated pairs in the planted-dup testdata"
    # the known cross-split near-dups must be recovered (mod-19 split)
    assert any(r.train_id == 50 and r.eval_id == 0 for r in rows)
    assert any(r.train_id == 89 and r.eval_id == 114 for r in rows)
    for r in rows:
        assert r.train_id % DECON_FUZZY_MOD != 0  # train side only
        assert r.eval_id % DECON_FUZZY_MOD == 0   # eval side only
        assert r.jacc >= DECON_FUZZY_THRESHOLD


def test_mmr_first_pick_is_relevance_argmax_and_selection_valid(spark):
    from bigdatagenomic_spark.operators.similarity import (
        MMR_K,
        MMR_N_QUERIES,
        MMR_W_REL,
    )

    sel = _q("q_sim_mmr")(spark, SF).collect()
    by_q: dict = {}
    for r in sel:
        by_q.setdefault(r.query_id, []).append(r)
    assert len(by_q) == MMR_N_QUERIES
    # exact cosine top-k gives the relevance argmax per query
    top1 = {
        r.query_id: (r.vec_id, r.sim)
        for r in _q("q26_cosine_topk")(spark, SF).collect()
        if r.rn == 1
        if r.query_id < MMR_N_QUERIES
    }
    for qid, picks in by_q.items():
        assert sorted(p.pick for p in picks) == list(range(1, MMR_K + 1))
        assert len({p.vec_id for p in picks}) == MMR_K  # no repeats
        p1 = next(p for p in picks if p.pick == 1)
        assert p1.vec_id == top1[qid][0]
        # pick 1's mmr is pure relevance on the micro grid
        assert p1.mmr_m == MMR_W_REL * round(top1[qid][1] * 10000)


def test_mmr_diversifies_vs_pure_topk(spark):
    """On the planted near-dup embeddings, at least one query's MMR set
    must differ from its pure relevance top-5 (otherwise the redundancy
    term did nothing on data with duplicate-heavy neighborhoods)."""
    from bigdatagenomic_spark.operators.similarity import MMR_N_QUERIES

    sel = _q("q_sim_mmr")(spark, SF).collect()
    topk = _q("q26_cosine_topk")(spark, SF).collect()
    diffs = 0
    for qid in range(MMR_N_QUERIES):
        mmr_set = {r.vec_id for r in sel if r.query_id == qid}
        top_set = {r.vec_id for r in topk if r.query_id == qid}
        if mmr_set != top_set:
            diffs += 1
    assert diffs >= 1


def test_ppr_mass_conservation_and_source_locality(spark):
    from bigdatagenomic_spark.operators.graph import PPR_N_SOURCES

    rows = _q("q_graph_ppr")(spark, SF).collect()
    total = sum(r.rank for r in rows)
    # mass 1 by construction (teleport + dangling both renormalize to
    # the source set); rounding at 1e-4 x |V| bounds the drift
    assert total == pytest.approx(1.0, abs=1e-3 + 1e-4 * len(rows))
    srcs = sorted(r.id for r in rows)[:PPR_N_SOURCES]
    src_mass = sum(r.rank for r in rows if r.id in set(srcs))
    # walks restart at the sources: they must hold well above the
    # uniform share of the mass
    assert src_mass > PPR_N_SOURCES / len(rows) * 5


def test_bm25_returns_full_topn_with_positive_scores(spark):
    from bigdatagenomic_spark.operators.text import BM25_TOP_N

    rows = _q("q_text_bm25")(spark, SF).collect()
    assert len(rows) == BM25_TOP_N
    for r in rows:
        assert r.score > 0 and r.n_match >= 1
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_range_search_threshold_and_topk_consistency(spark):
    """Every range hit at t must also appear in exact top-k when the
    top-k's k-th sim clears t — the two retrieval modes agree."""
    from bigdatagenomic_spark.operators.similarity import RANGE_THRESHOLD

    hits = _q("q_sim_range_search")(spark, SF).collect()
    assert hits, "planted near-dup embeddings guarantee range hits"
    for r in hits:
        assert r.sim >= RANGE_THRESHOLD
    topk = _q("q26_cosine_topk")(spark, SF).collect()
    topk_pairs = {(r.query_id, r.vec_id) for r in topk}
    by_q_hits: dict = {}
    for r in hits:
        by_q_hits.setdefault(r.query_id, []).append(r)
    for qid, qhits in by_q_hits.items():
        ksims = sorted(
            (r.sim for r in topk if r.query_id == qid), reverse=True
        )
        if not ksims:
            continue
        kth = ksims[-1]
        for r in qhits:
            if r.sim > kth:
                assert (qid, r.vec_id) in topk_pairs


def test_linreg_recovers_planted_line(spark):
    """Exact-moment OLS on a planted y = 2x + 300 line (cents) must
    recover slope/intercept exactly on the micro grid."""
    import bigdatagenomic_spark.operators.stats as ST

    rows = [(i, "G", 2 * i + 300) for i in range(-50, 51)]
    df = spark.createDataFrame(rows, "x long, grp string, y long")
    dec = "decimal(38,0)"
    s = df.groupBy("grp").agg(
        F.count("*").cast(dec).alias("n"),
        F.sum(F.col("x").cast(dec)).cast(dec).alias("sx"),
        F.sum(F.col("y").cast(dec)).cast(dec).alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast(dec)).cast(dec).alias("sxx"),
        F.sum((F.col("x") * F.col("y")).cast(dec)).cast(dec).alias("sxy"),
    )
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    ) / den
    icept = (F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy")).cast(
        "double"
    ) / den
    r = s.select(slope.alias("m"), icept.alias("b")).collect()[0]
    assert r.m == pytest.approx(2.0, abs=1e-12)
    assert r.b == pytest.approx(300.0, abs=1e-9)
    # and the registered query is sane on testdata: one row per priority
    out = _q("q_x_linreg")(spark, SF).collect()
    assert len(out) == 5 and all(o.n > 0 for o in out)


def test_ttr_bounds(spark):
    rows = _q("q_text_ttr")(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 < r.n_types <= r.n_tokens
        assert 0 < r.ttr_micro <= 1_000_000
        assert r.ttr_micro == r.n_types * 1_000_000 // r.n_tokens


def test_cdc_chunks_reassemble_and_dedupe(spark):
    """CDC invariants: per-doc chunks tile the document exactly
    (contiguous, full cover), and the planted near-dup docs share
    chunk hashes (the dedupable-bytes signal)."""
    rows = _q("q_text_cdc_chunks")(spark, SF).collect()
    assert rows
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    from bigdatagenomic_spark.sources.tables import load_table

    lens = {
        r.doc_id: r.n
        for r in load_table(spark, SF, "documents")
        .where(F.col("text").isNotNull())
        .select("doc_id", F.length("text").alias("n"))
        .collect()
    }
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_idx)
        pos = 1
        for c in chunks:
            assert c.start == pos, (doc_id, c.chunk_idx)
            assert c.clen >= 1
            pos += c.clen
        assert pos - 1 == lens[doc_id]  # full cover, no gaps/overlap
    assert any(r.n_dup > 1 for r in rows)  # near-dups share chunks


def test_ivf_recall_bounds_and_agreement(spark):
    rows = _q("q_sim_ivf_recall")(spark, SF).collect()
    from bigdatagenomic_spark.operators.similarity import N_QUERIES, TOP_K

    assert len(rows) == N_QUERIES
    for r in rows:
        assert r.n_exact == TOP_K
        assert 0 <= r.n_hit <= r.n_exact
        assert r.recall == round(r.n_hit / r.n_exact, 4)
    # the probe set covers most of the exact neighbors on testdata
    assert sum(r.n_hit for r in rows) / sum(r.n_exact for r in rows) >= 0.5


def test_attribution_credits_within_lookback(spark):
    from bigdatagenomic_spark.operators.relational_ext import (
        ATTR_LOOKBACK_SEC,
        ATTR_TOUCH_TYPES,
    )

    rows = _q("q_x_attribution")(spark, SF).collect()
    assert rows  # every purchase appears, attributed or not
    attributed = [r for r in rows if r.attributed]
    unattributed = [r for r in rows if not r.attributed]
    assert attributed and unattributed  # both outcomes occur on testdata
    for r in attributed:
        assert r.touch_type in ATTR_TOUCH_TYPES
        assert 0 <= r.secs_since_touch <= ATTR_LOOKBACK_SEC
    for r in unattributed:
        assert r.touch_event_id is None and r.secs_since_touch is None


def test_linkpred_scores_are_valid_jaccards(spark):
    rows = _q("q_graph_linkpred")(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.a_id < r.b_id
        assert r.n_common >= 1
        assert 0 < r.jacc <= 1.0


def test_cdc_boundaries_stable_under_prefix_edit(spark):
    """THE content-defined-chunking guarantee (vs fixed-size blocks): an
    edit only disturbs the chunks it touches. Prepending text to a
    document must leave every chunk that starts after the edit's last
    affected window with an IDENTICAL hash — that's why near-duplicate
    docs share storage."""
    from bigdatagenomic_spark.operators.llm_prep import CDC_W

    base = (
        "the quick brown fox jumps over the lazy dog while the merge "
        "window stream sort join table scan batch value key part column "
        "agg group row data line query fast slow small big customer "
        "order filter hash spark dup error view click signup purchase"
    )
    edited = "PREFIX EDIT INSERTED HERE " + base
    df = spark.createDataFrame(
        [(0, base), (1, edited)], "doc_id long, text string"
    )
    # run the same chunking expressions via a temp view + the operator's
    # internal pipeline (reuse the registered query's logic by pointing
    # load_table at a temp dir would be heavier; instead replicate via
    # the oracle on DuckDB AND spark expressions through a local table)
    import duckdb

    import bigdatagenomic_spark.operators.llm_prep as LP

    con = duckdb.connect()
    con.register("docs", df.toPandas())
    sql = LP.Q_TEXT_CDC_CHUNKS_SQL.replace("FROM documents", "FROM docs")
    rows = con.sql(sql).fetchall()
    by_doc = {0: [], 1: []}
    for doc_id, idx, start, clen, chash, _ in rows:
        by_doc[doc_id].append((start, clen, chash))
    h0 = {h for (_, _, h) in by_doc[0]}
    h1 = {h for (_, _, h) in by_doc[1]}
    shared = h0 & h1
    # all chunks of the ORIGINAL doc that begin after the first cut
    # must reappear verbatim in the edited doc (the prefix edit can
    # only disturb chunks up to the first boundary after the edit)
    tail_chunks = [h for (s, _, h) in by_doc[0] if s > CDC_W]
    assert tail_chunks, "fixture must produce multiple chunks"
    missing = [h for h in tail_chunks[1:] if h not in h1]
    assert not missing, f"CDC stability violated: {len(missing)} lost"
    assert shared, "edited doc shares no chunks with the original"


def test_cdc_kernel_matches_sql_spec(spark):
    """The Arrow-batched boundary kernel (_cdc_cuts_udf) and the
    pure-SQL expression spec (CDC_CODES_EXPR + CDC_CUTS_EXPR) must
    produce identical cut positions — on the real sf0.001 corpus AND
    on strings that cross the BMP/astral codepoint seam, where
    ascii(substring(...)) and the kernel's utf-32 decode could drift
    apart."""
    import bigdatagenomic_spark.operators.llm_prep as LP
    from bigdatagenomic_spark.sources.tables import load_table

    corpus = (
        load_table(spark, SF, "documents")
        .where(F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    extra = spark.createDataFrame(
        [
            (100001, "café naïve 中文 text mixed in " * 8),
            (100002, "astral \U0001f680\U0001f9ec plane codepoints " * 10),
            (100003, "x" * LP.CDC_W),  # minimum-length doc
        ],
        "doc_id long, text string",
    )
    both = corpus.unionByName(extra).withColumn("tlen", F.length("text"))
    got = (
        both.where(F.col("tlen") >= LP.CDC_W)
        .withColumn("kernel_cuts", LP._cdc_cuts_udf()(F.col("text")))
        .withColumn("codes", F.expr(LP.CDC_CODES_EXPR))
        .withColumn("spec_cuts", F.expr(LP.CDC_CUTS_EXPR))
        .select("doc_id", "kernel_cuts", "spec_cuts")
        .collect()
    )
    assert got
    for r in got:
        assert list(r.kernel_cuts) == list(r.spec_cuts), r.doc_id
