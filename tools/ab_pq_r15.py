"""Interleaved A/B for the PQ/IVF-PQ training rewrite (round 15).

NEW arm = current registry (joint literal-codebook trainer
_train_joint_lit; ivfpq additionally fuses coarse+PQ training and uses
the map-only literal list assign). OLD arm = the round-14 shapes,
reconstructed inline: per-subspace clustering-style kmeans (broadcast
crossJoin + groupBy(vec_id) argmin + join-back per round) and the
crossJoin+groupBy _ivf_assign. Oracle equivalence of both arms is
pinned by the registry's own spot-checks (both were green at their
HEADs); this tool times.

Usage: python tools/ab_pq_r15.py [--rounds N] [--sf DIR]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import Window as W  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def kmeans_r14(vectors, k=8, n_iter=5, round_decimals=None):
    from bigdatagenomic_spark.operators.clustering import assign_clusters

    vectors = vectors.localCheckpoint(eager=False)
    emb_d = F.transform("embedding", lambda x: x.cast("double"))
    centroids = (
        vectors.orderBy("vec_id")
        .limit(k)
        .select(
            (F.row_number().over(W.orderBy("vec_id")) - 1).alias("cluster"),
            emb_d.alias("centroid"),
        )
    )
    mean_expr = F.avg("val")
    if round_decimals is not None:
        scale = 10 ** round_decimals
        mean_expr = F.floor(mean_expr * scale + F.lit(0.5)) / scale
    for _ in range(n_iter):
        assigned = assign_clusters(vectors, centroids)
        dims = (
            vectors.join(assigned.select("vec_id", "cluster"), "vec_id")
            .select("cluster", F.posexplode(emb_d).alias("dim", "val"))
            .groupBy("cluster", "dim")
            .agg(mean_expr.alias("mean"))
        )
        centroids = dims.groupBy("cluster").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "mean"))),
                lambda s: s["mean"],
            ).alias("centroid")
        )
    return assign_clusters(vectors, centroids), centroids


def main() -> int:
    argv = list(sys.argv[1:])
    rounds = 3
    if "--rounds" in argv:
        i = argv.index("--rounds")
        rounds = int(argv[i + 1])
        del argv[i : i + 2]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in argv:
        i = argv.index("--sf")
        sf_dir = argv[i + 1]
        del argv[i : i + 2]

    from bigdatagenomic_spark import queries as registry
    from bigdatagenomic_spark.operators import similarity as S
    from bigdatagenomic_spark.session import get_spark

    spark = get_spark(app_name="ab-pq-r15")
    qs = registry.queries()

    def pq_codebook_r14(vecs, n_iter=S.PQ_ITER):
        cb = []
        for m in range(S.PQ_M):
            sub = vecs.select(
                "vec_id",
                F.slice("v", m * S.PQ_SUBDIM + 1, S.PQ_SUBDIM).alias("embedding"),
            )
            _, cents = kmeans_r14(
                sub, k=S.PQ_K, n_iter=n_iter, round_decimals=S.PQ_ROUND
            )
            cb.append([list(r.centroid) for r in cents.orderBy("cluster").collect()])
        return cb

    def ivf_centroids_r14(candidates, n_centroids=S.N_CENTROIDS, n_iter=S.PQ_ITER):
        _, cents = kmeans_r14(
            candidates.select("vec_id", F.col("v").alias("embedding")),
            k=n_centroids,
            n_iter=n_iter,
            round_decimals=S.PQ_ROUND,
        )
        return F.broadcast(
            cents.select(
                F.col("cluster").cast("long").alias("centroid_id"),
                F.col("centroid").alias("cvec"),
            )
        )

    def ivfpq_r14(spark, sf_dir):
        vecs = S._vecs(spark, sf_dir).localCheckpoint(eager=False)
        cb = pq_codebook_r14(vecs)
        cent = ivf_centroids_r14(vecs)
        assigned = S._ivf_assign(vecs, cent)
        enc = S.pq_encode(assigned, cb, keep=("centroid_id",))
        probes = S._ivf_probes(vecs.where(F.col("vec_id") < S.N_QUERIES), cent).select(
            "query_id", "centroid_id"
        )
        qtabs = S.pq_query_tables(vecs, cb)
        scored = (
            enc.join(F.broadcast(probes), "centroid_id")
            .join(F.broadcast(qtabs), "query_id")
            .select("query_id", "cand_id", S._pq_adc_expr().alias("approx"))
        )
        return S._pq_rank(scored)

    new_cb = S.pq_codebook_kmeans

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    def t(builder):
        t0 = time.time()
        force(builder(spark, sf_dir))
        return time.time() - t0

    def q08():
        return t(lambda s, d: qs["q08_agg_tpch_q1"](s, d))

    q08()
    print(f"control q08 min: {min(q08() for _ in range(3)):.3f}")

    cases = [
        ("q_sim_pq_recall", qs["q_sim_pq_recall"], "patch_cb"),
        ("q_sim_pq_topk", qs["q_sim_pq_topk"], "patch_cb"),
        ("q_sim_ivfpq_topk", qs["q_sim_ivfpq_topk"], ivfpq_r14),
    ]
    for name, new_fn, old in cases:
        spark.sparkContext.setJobDescription(f"ab-pq:{name}")
        if old == "patch_cb":
            def run_new(s, d, f=new_fn):
                S.pq_codebook_kmeans = new_cb
                return f(s, d)

            def run_old(s, d, f=new_fn):
                S.pq_codebook_kmeans = pq_codebook_r14
                return f(s, d)
        else:
            def run_new(s, d, f=new_fn):
                return f(s, d)

            run_old = old
        t(run_new); t(run_old)
        new_runs, old_runs = [], []
        for _ in range(rounds):
            new_runs.append(t(run_new))
            old_runs.append(t(run_old))
        S.pq_codebook_kmeans = new_cb
        print(
            f"{name}: NEW min {min(new_runs):.3f} {[round(r, 2) for r in new_runs]}"
            f" | OLD min {min(old_runs):.3f} {[round(r, 2) for r in old_runs]}"
        )
    print(f"control q08 min: {min(q08() for _ in range(3)):.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
