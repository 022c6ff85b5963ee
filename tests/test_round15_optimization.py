"""Round-15 optimization pins.

Each optimization that changed an operator's internals gets an
equivalence or plan-shape regression net here:

* the joint multi-span k-means trainer (similarity._train_joint_lit)
  must produce the exact codebooks/centroids the per-slice
  clustering.kmeans runs produce;
* the literal IVF list assignment (similarity._ivf_assign_lit) must
  match the broadcast crossJoin + max_by form row for row;
* q_tpch_q21_shape's lineitem⋈orders subtree is pinned once — the
  returned plan must root at the checkpoint with only the supplier
  parquet scan left downstream.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _vecs(spark):
    from bigdatagenomic_spark.sources.tables import load_table

    return (
        load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .localCheckpoint(eager=False)
    )


def test_joint_trainer_matches_per_slice_kmeans(spark):
    from bigdatagenomic_spark.operators import similarity as S
    from bigdatagenomic_spark.operators.clustering import kmeans

    vecs = _vecs(spark)
    dim = S.PQ_M * S.PQ_SUBDIM
    spans = [(0, dim)] + [(m * S.PQ_SUBDIM, S.PQ_SUBDIM) for m in range(S.PQ_M)]
    cbs = S._train_joint_lit(vecs, spans, k=S.N_CENTROIDS, n_iter=S.PQ_ITER)

    for s, (off, width) in enumerate(spans):
        sub = vecs.select(
            "vec_id", F.slice("v", off + 1, width).alias("embedding")
        )
        _, cents = kmeans(
            sub, k=S.N_CENTROIDS, n_iter=S.PQ_ITER, round_decimals=S.PQ_ROUND
        )
        want = [(r.cluster, list(r.centroid)) for r in cents.orderBy("cluster").collect()]
        got = [(cid, list(vec)) for cid, vec in cbs[s]]
        assert got == want, f"span {s} (off={off}, width={width}) diverged"


def test_ivf_assign_lit_matches_crossjoin_form(spark):
    from bigdatagenomic_spark.operators import similarity as S

    vecs = _vecs(spark)
    cbs = S._train_joint_lit(
        vecs, [(0, S.PQ_M * S.PQ_SUBDIM)], k=S.N_CENTROIDS, n_iter=S.PQ_ITER
    )
    cent_df = F.broadcast(S._centroid_table(spark, cbs[0]))
    want = {
        r.vec_id: r.centroid_id
        for r in S._ivf_assign(vecs, cent_df).select("vec_id", "centroid_id").collect()
    }
    got = {
        r.vec_id: r.centroid_id
        for r in S._ivf_assign_lit(vecs, cbs[0]).select("vec_id", "centroid_id").collect()
    }
    assert got == want


def test_q21_join_subtree_pinned_once(spark):
    from bigdatagenomic_spark import queries as Q

    df = Q.queries()["q_tpch_q21_shape"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_parquet = plan.count("Scan parquet")
    n_rdd = plan.count("Scan ExistingRDD")
    # only the supplier dimension still reads parquet downstream of the
    # pinned lineitem⋈orders subtree (before the pin: 2 lineitem +
    # 2 orders + 1 supplier scans)
    assert n_parquet == 1, f"expected 1 parquet scan (supplier), got {n_parquet}"
    assert n_rdd >= 2, f"expected the pinned lo subtree on both sides, got {n_rdd}"


def test_bpe_lazy_checkpoint_still_truncates_lineage(spark):
    from bigdatagenomic_spark.operators.bpe import bpe_train
    from bigdatagenomic_spark.sources.tables import load_table

    out = bpe_train(load_table(spark, SF_DIR, "documents"), n_merges=2)
    plan = out._jdf.queryExecution().analyzed().toString()
    # the returned plan roots at the last merge round's checkpoint —
    # no parquet relation may remain in the lineage
    assert "LogicalRDD" in plan
    assert "parquet" not in plan.lower()
