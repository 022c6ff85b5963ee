"""Interleaved A/B: literal-centroid kmeans (round 15) vs the round-14
broadcast-crossJoin + groupBy(vec_id) + join-back form, on the k-means
consumers (PQ codebook training dominates q_sim_pq_recall /
q_sim_ivfpq_topk — VERDICT r14 #3's heaviest-registry-path item).

Patches clustering.kmeans between arms (both pq_codebook_kmeans and
ivf_centroids_kmeans import it function-locally, so the patch reaches
them). Equivalence is pinned by tests/test_clustering.py (numpy parity)
and the oracle spot-checks; this tool only times.

Usage: python tools/ab_kmeans_r15.py [--rounds N] [--sf DIR] [q ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import Window as W  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def kmeans_r14(
    vectors: DataFrame,
    k: int = 8,
    n_iter: int = 5,
    round_decimals: int | None = None,
):
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
    names = argv or ["q_cluster_kmeans", "q_sim_pq_recall", "q_sim_ivfpq_topk"]

    from bigdatagenomic_spark import queries as registry
    from bigdatagenomic_spark.operators import clustering
    from bigdatagenomic_spark.session import get_spark

    spark = get_spark(app_name="ab-kmeans-r15")
    qs = registry.queries()
    new_form = clustering.kmeans

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(name: str) -> float:
        t0 = time.time()
        force(qs[name](spark, sf_dir))
        return time.time() - t0

    timed("q08_agg_tpch_q1")
    print(f"control q08 min: {min(timed('q08_agg_tpch_q1') for _ in range(3)):.3f}")
    for name in names:
        spark.sparkContext.setJobDescription(f"ab-kmeans:{name}")
        clustering.kmeans = new_form
        timed(name)
        clustering.kmeans = kmeans_r14
        timed(name)
        new_runs, old_runs = [], []
        for _ in range(rounds):
            clustering.kmeans = new_form
            new_runs.append(timed(name))
            clustering.kmeans = kmeans_r14
            old_runs.append(timed(name))
        clustering.kmeans = new_form
        print(
            f"{name}: NEW min {min(new_runs):.3f} {[round(r, 2) for r in new_runs]}"
            f" | OLD min {min(old_runs):.3f} {[round(r, 2) for r in old_runs]}"
        )
    print(f"control q08 min: {min(timed('q08_agg_tpch_q1') for _ in range(3)):.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
