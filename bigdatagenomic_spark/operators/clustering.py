"""Embedding clustering: Lloyd's k-means (north star; partner to the
IVF ANN index in operators/similarity.py, which consumes exactly this
kind of centroid assignment).

Spark-first shape, all JVM expressions:
  * assignment: centroids live in a K-row DataFrame that is BROADCAST
    and cross-joined — each executor scores its vectors against all K
    centroids locally (squared-L2 via zip_with/aggregate), argmin via
    min_by. No shuffle of the big side.
  * update: posexplode the 64-dim vectors to (cluster, dim, val), one
    map-side-combined groupBy(cluster, dim) avg, re-assemble arrays
    with array_sort(collect_list(struct(dim, mean))). The shuffled data
    is K×64 partial means per map task — tiny regardless of input size.
  * deterministic: init = the K lowest vec_ids' embeddings; fixed
    iteration count; ties in argmin break to the lowest cluster id.
    Retry-safe (no rand()), which also makes it testable bit-for-bit
    against a numpy reference (tests/test_clustering.py).

At 100 TB the per-iteration cost is one scan + one tiny shuffle; the
driver loop localCheckpoints nothing because each iteration's output is
just the K×64 centroid table (collected to the driver implicitly via
broadcast — the classic small-model/big-data iteration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from bigdatagenomic_spark.sources.tables import load_table


def _sq_l2(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def assign_clusters(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, cluster, dist) — nearest centroid per vector.

    vectors: (vec_id, embedding array<float>); centroids: (cluster,
    centroid array<double>). Broadcast cross join + min_by argmin;
    deterministic tie-break to the lowest cluster id.
    """
    emb_d = F.transform("embedding", lambda x: x.cast("double"))
    scored = vectors.select("vec_id", emb_d.alias("e")).crossJoin(
        F.broadcast(centroids)
    )
    d = _sq_l2(F.col("e"), F.col("centroid"))
    return (
        scored.select("vec_id", "cluster", d.alias("dist"))
        .groupBy("vec_id")
        .agg(
            F.min_by(
                "cluster", F.struct(F.col("dist"), F.col("cluster"))
            ).alias("cluster"),
            F.min("dist").alias("dist"),
        )
    )


def kmeans(
    vectors: DataFrame,
    k: int = 8,
    n_iter: int = 5,
    round_decimals: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Returns (assignments(vec_id, cluster, dist), centroids(cluster,
    centroid)). Deterministic init from the k lowest vec_ids.

    ``round_decimals`` quantizes each updated centroid component with
    half-up ``floor(x*10^d + 0.5)/10^d``. Consumers that re-embed the
    trained centroids as plan literals AND replay training in a second
    engine (the PQ codebook oracle, operators/similarity.py) need this:
    the per-dim ``avg`` is the one place the two engines can diverge in
    summation order at the last ulp, and quantizing after every update
    stops that ulp from compounding into a flipped argmin downstream.
    ``None`` (default) keeps raw doubles.
    """
    # pin the working set once: every iteration references `vectors`
    # twice (assign + update) and without the pin each reference
    # re-derives from the source scan — 2*n_iter corpus reads for an
    # iterative algorithm that should read its input once (the same
    # .cache() Spark ML's KMeans does before its loop).
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
    assigned = None
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


def q_cluster_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster sizes + within-cluster dispersion after 3 rounds, k=4.
    Fixed-iteration → hash-checked against a loop-unrolled CTE oracle;
    exact parity with numpy is pinned in tests/test_clustering.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    assigned, _ = kmeans(emb.select("vec_id", "embedding"), k=4, n_iter=3)
    return (
        assigned.groupBy("cluster")
        .agg(
            F.count("*").alias("n_vecs"),
            (F.floor(F.avg("dist") * 10000 + F.lit(0.5)) / 10000).alias("mean_sq_dist"),
        )
        .orderBy("cluster")
    )


def _kmeans_oracle_sql(k: int = 4, n_iter: int = 3, dims: int = 64) -> str:
    """Loop-unrolled Lloyd's oracle: one assign + one update CTE pair per
    iteration (fixed iteration count needs no recursion). Distances use
    the same left-to-right list fold as the Spark plan, so they agree
    bit-for-bit; the only cross-engine float divergence is the avg
    summation order in the centroid update, absorbed by the final
    4-decimal floor rounding. ``dims`` pins the embedding width
    (TESTDATA.md: 64)."""
    d2 = (
        f"list_sum(list_transform(range(1, {dims + 1}), "
        "i -> (v.e[i] - c.centroid[i]) * (v.e[i] - c.centroid[i])))"
    )
    parts = [
        f"""
  v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
  c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cluster,
                e AS centroid
         FROM (SELECT vec_id, e FROM v ORDER BY vec_id LIMIT {k}))"""
    ]
    for it in range(1, n_iter + 1):
        parts.append(f"""
  a{it} AS (
    SELECT vec_id, cluster, dist FROM (
      SELECT vec_id, cluster, dist,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY dist, cluster) AS rn
      FROM (SELECT v.vec_id, c.cluster, {d2} AS dist
            FROM v CROSS JOIN c{it - 1} c))
    WHERE rn = 1),
  c{it} AS (
    SELECT cluster, list(mean ORDER BY dim) AS centroid FROM (
      SELECT a.cluster, t.dim, avg(v.e[t.dim]) AS mean
      FROM a{it} a JOIN v USING (vec_id)
      CROSS JOIN (SELECT unnest(range(1, {dims + 1})) AS dim) t
      GROUP BY a.cluster, t.dim)
    GROUP BY cluster)""")
    parts.append(f"""
  afinal AS (
    SELECT vec_id, cluster, dist FROM (
      SELECT vec_id, cluster, dist,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY dist, cluster) AS rn
      FROM (SELECT v.vec_id, c.cluster, {d2} AS dist
            FROM v CROSS JOIN c{n_iter} c))
    WHERE rn = 1)""")
    return (
        "WITH" + ",".join(parts)
        + """
SELECT cluster, count(*) AS n_vecs,
       floor(avg(dist) * 10000 + 0.5) / 10000 AS mean_sq_dist
FROM afinal GROUP BY cluster ORDER BY cluster"""
    )


Q_CLUSTER_KMEANS_SQL = _kmeans_oracle_sql()


# --------------------------------------------------------------------------
# nearest-centroid classifier evaluation (confusion matrix)
# --------------------------------------------------------------------------
NCC_ROUND = 6  # centroid quantization decimals (see kmeans round_decimals)


def nearest_centroid_eval(vectors: DataFrame) -> DataFrame:
    """(label, pred, n) — confusion matrix of the nearest-centroid
    classifier: fit one centroid per TRUE label (per-dim mean, half-up
    quantized at NCC_ROUND decimals — same ulp-compounding defense as
    kmeans' round_decimals), then re-assign every vector to its nearest
    centroid and cross-tabulate truth vs prediction. The standard
    eval-loop readout (accuracy/per-class recall derive from this
    table), and a leak-check on the embedding space: a label whose own
    centroid does not reclaim its vectors is not linearly separated.

    Scale: one per-(label, dim) mean aggregate, a broadcast of the
    |labels| x dims centroid table, and one count aggregate — the same
    shapes as kmeans' update + assign, no iteration.
    """
    v = vectors.select(
        "vec_id",
        F.col("label").cast("int").alias("label"),
        F.transform("embedding", lambda x: x.cast("double")).alias("e"),
    ).localCheckpoint(eager=False)
    scale = 10 ** NCC_ROUND
    dims = (
        v.select("label", F.posexplode("e").alias("dim", "val"))
        .groupBy("label", "dim")
        .agg((F.floor(F.avg("val") * scale + F.lit(0.5)) / scale).alias("mean"))
    )
    centroids = dims.groupBy(F.col("label").alias("cluster")).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "mean"))),
            lambda s: s["mean"],
        ).alias("centroid")
    )
    assigned = assign_clusters(
        v.select("vec_id", F.col("e").alias("embedding")), centroids
    )
    return (
        v.select("vec_id", "label")
        .join(assigned.select("vec_id", F.col("cluster").alias("pred")), "vec_id")
        .groupBy("label", "pred")
        .agg(F.count("*").cast("long").alias("n"))
    )


def q_x_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return nearest_centroid_eval(emb).orderBy("label", "pred")


def _ncc_oracle_sql(dims: int = 64) -> str:
    d2 = (
        f"list_sum(list_transform(range(1, {dims + 1}), "
        "i -> (v.e[i] - c.centroid[i]) * (v.e[i] - c.centroid[i])))"
    )
    return f"""
WITH v AS (
  SELECT vec_id, CAST(label AS INT) AS label,
         CAST(embedding AS DOUBLE[]) AS e
  FROM embeddings),
cent AS (
  SELECT label AS cluster, list(mean ORDER BY dim) AS centroid FROM (
    SELECT v.label, t.dim,
           floor(avg(v.e[t.dim]) * 1e{NCC_ROUND} + 0.5) / 1e{NCC_ROUND}
             AS mean
    FROM v CROSS JOIN (SELECT unnest(range(1, {dims + 1})) AS dim) t
    GROUP BY v.label, t.dim)
  GROUP BY label),
assigned AS (
  SELECT vec_id, cluster AS pred FROM (
    SELECT v.vec_id, c.cluster, {d2} AS dist,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {d2}, c.cluster) AS rn
    FROM v CROSS JOIN cent c)
  WHERE rn = 1)
SELECT v.label, a.pred, CAST(count(*) AS BIGINT) AS n
FROM v JOIN assigned a USING (vec_id)
GROUP BY v.label, a.pred
ORDER BY v.label, a.pred
"""


Q_X_CONFUSION_SQL = _ncc_oracle_sql()
