"""k-means parity: the Spark implementation must match a pure-numpy
Lloyd's run with the same deterministic init, iteration count, and
lowest-cluster tie-break."""

from __future__ import annotations

import numpy as np

from bigdatagenomic_spark.operators.clustering import kmeans
from bigdatagenomic_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _numpy_kmeans(ids, X, k, n_iter):
    order = np.argsort(ids)
    init = X[order[:k]]
    C = init.copy()
    assign = None
    for _ in range(n_iter):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)  # argmin takes the lowest index on ties
        for c in range(k):
            members = X[assign == c]
            if len(members):
                C[c] = members.mean(axis=0)
    d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    return d.argmin(axis=1), d.min(axis=1), C


def test_kmeans_matches_numpy_reference(spark):
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    rows = emb.collect()
    ids = np.array([r.vec_id for r in rows])
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    want_assign, want_dist, _ = _numpy_kmeans(ids, X, k=4, n_iter=3)
    want = {int(i): int(a) for i, a in zip(ids, want_assign)}
    wdist = {int(i): float(d) for i, d in zip(ids, want_dist)}

    assigned, centroids = kmeans(emb, k=4, n_iter=3)
    got = {r.vec_id: (r.cluster, r.dist) for r in assigned.collect()}
    assert got.keys() == want.keys()
    for vid in want:
        assert got[vid][0] == want[vid], f"vec {vid}: {got[vid][0]} != {want[vid]}"
        assert abs(got[vid][1] - wdist[vid]) < 1e-6
    assert centroids.count() == 4


def test_kmeans_dispersion_decreases(spark):
    """More Lloyd's iterations must not increase total within-cluster
    dispersion (monotone convergence)."""
    from pyspark.sql import functions as F

    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    a1, _ = kmeans(emb, k=4, n_iter=1)
    a3, _ = kmeans(emb, k=4, n_iter=3)
    s1 = a1.agg(F.sum("dist")).collect()[0][0]
    s3 = a3.agg(F.sum("dist")).collect()[0][0]
    assert s3 <= s1 + 1e-9


def test_nearest_centroid_eval_separable_fixture(spark):
    """Perfectly separated labels -> diagonal confusion matrix; an
    off-center vector near the wrong class -> off-diagonal cell."""
    from bigdatagenomic_spark.operators.clustering import nearest_centroid_eval

    def vec(base, eps):
        return [float(base)] * 4 + [eps] * 0  # 4-dim

    rows = [
        (1, vec(0.0, 0), 0), (2, [0.1, 0.0, 0.0, 0.0], 0),
        (3, [5.0, 5.0, 5.0, 5.0], 1), (4, [5.1, 5.0, 5.0, 5.0], 1),
        # label-0 vector sitting on top of class 1's centroid
        (5, [5.0, 5.0, 5.0, 5.1], 0),
    ]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>, label INT")
    out = {(r.label, r.pred): r.n for r in nearest_centroid_eval(df).collect()}
    assert out[(1, 1)] == 2
    assert out[(0, 1)] == 1  # the planted confusion
    assert out[(0, 0)] == 2


def test_hard_negatives_exclude_same_label(spark):
    from bigdatagenomic_spark.operators.similarity import hard_negatives

    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.99, 0.1], 0),   # same label, most similar -> must be excluded
        (2, [0.9, 0.3], 1),    # different label, next most similar
        (3, [0.0, 1.0], 1),
    ]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>, label INT")
    out = [r for r in hard_negatives(df, n_queries=1, k=2).collect()]
    assert all(r.neg_label != r.query_label for r in out)
    assert out[0].vec_id == 2  # hardest negative first
    assert [r.rn for r in out] == [1, 2]
