"""Multi-join analytical query shapes (SURVEY.md §2.B composition of
Q03/Q04/Q08/Q15 into full TPC-H-style plans).

The reference has no relational layer at all (SURVEY.md §4.1,
/root/reference/assembly_final.cpp has a single hand-sequenced pipeline
at :711-737); these queries exercise the engine capabilities the
single-op Q-checks cover in isolation, composed the way a real warehouse
workload composes them: multi-way joins + selective filters + hash
aggregation + top-k.

Scale notes (100 TB): these shapes are exactly where Catalyst earns its
keep — filter pushdown into the parquet scans shrinks the fact table
before any join; `region`/`nation`/`customer`-sized dims get broadcast
(AQE picks this from runtime stats, and we hint the always-tiny ones
explicitly); the surviving fact-fact join is a shuffle on the join key
that AQE coalesces/skew-splits. The top-k is TakeOrderedAndProject —
per-partition heaps, no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from bigdatagenomic_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# TPC-H Q3 shape: segment-filtered customer ⋈ orders ⋈ lineitem,
# revenue per order, top-10. Filters on both fact scans cut the join
# inputs before the shuffle; the date literals sit inside the scanned
# range (orders 1995-2001, TESTDATA.md driver data).
def q_tpch_q3_shape(spark, sf_dir):
    cutoff = F.to_timestamp(F.lit("1998-01-01"))
    c = _t(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff).select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


Q_TPCH_Q3_SQL = """
SELECT l.l_orderkey, o.o_orderdate,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
  AND l.l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, l.l_orderkey
LIMIT 10
"""


# TPC-H Q5 shape: 6-way join (region→nation→customer→orders→lineitem
# ⋈ supplier with the co-nation constraint), revenue by nation.
# region/nation are broadcast-hinted (always tiny); customer/supplier
# are left to AQE, which broadcasts them at small SF and shuffles at
# 100 TB. The c_nationkey = s_nationkey residual runs as a post-join
# filter on the supplier hash join — no extra shuffle.
def q_tpch_q5_shape(spark, sf_dir):
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(
            s,
            (li["l_suppkey"] == s["s_suppkey"])
            & (c["c_nationkey"] == s["s_nationkey"]),
        )
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


Q_TPCH_Q5_SQL = """
SELECT n.n_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
ORDER BY revenue DESC, n.n_name
"""


# CUBE with grouping markers: all 4 grouping-set combinations in one
# pass (partial aggregation happens once; the expand operator fans each
# input row to its grouping sets before the single shuffle).
def q_x_cube(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("cnt"),
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_prio"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


Q_X_CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
       CAST(grouping(o_orderstatus) AS INT) AS g_status,
       CAST(grouping(o_orderpriority) AS INT) AS g_prio
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


# RANGE window frame: value-based frame (all orders within 500 of the
# current price), vs the ROWS frames used by Q14. Peers (equal
# o_totalprice) get identical frame results, so the output is
# deterministic even with ties.
def q_x_range_frame(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-500, W.currentRow)
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.count("*").over(w).alias("peers_within_500"),
            F.round(F.sum("o_totalprice").over(w), 2).alias("sum_within_500"),
        )
        .orderBy("o_custkey", "o_totalprice", "o_orderkey")
    )


Q_X_RANGE_FRAME_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice,
       count(*) OVER w AS peers_within_500,
       round(sum(o_totalprice) OVER w, 2) AS sum_within_500
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice
             RANGE BETWEEN 500 PRECEDING AND CURRENT ROW)
ORDER BY o_custkey, o_totalprice, o_orderkey
"""


# Explicit GROUPING SETS (non-hierarchical — neither rollup nor cube):
# per-status and per-priority marginals in one pass over orders.
def q_x_grouping_sets(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
               round(sum(o_totalprice), 2) AS sum_price
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
        """
    )


Q_X_GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
       round(sum(o_totalprice), 2) AS sum_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""
