"""Declared relational operator surface (SURVEY.md §2.B, Q01-Q23).

Each function is ``(spark, sf_dir) -> DataFrame`` over the driver test
tables and has a matching ANSI-SQL oracle string in
``bigdatagenomic_spark.queries`` that DuckDB runs on the same parquet.
Conventions (SURVEY.md §2.B): total ORDER BY, DOUBLE aggregates rounded
to 2 decimals, explicit NULL ordering, every computed column aliased
identically on both sides.

All of these are thin declarative wrappers — the point is that Catalyst
provides the physical strategy (pushdown, pruning, join selection, AQE)
with no custom engine code. The reference has no relational layer at
all (SURVEY.md §4.1); this is the north-star general surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from bigdatagenomic_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# Q01 — parquet scan + projection + filter (pushdown-verified in plans/)
def q01_scan_filter(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_quantity") > 45)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    )


# Q02 — predicate combinators
def q02_predicates(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.where(
            F.col("o_orderstatus").isin("F", "O")
            & F.col("o_totalprice").between(1000, 5000)
            & F.col("o_orderpriority").like("1%")
        )
        .select("o_orderkey")
        .orderBy("o_orderkey")
    )


# Q03 — inner equi-join
def q03_inner_join(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "inner")
        .select("c_custkey", "o_orderkey")
        .orderBy("c_custkey", "o_orderkey")
    )


# Q04 — broadcast join (small dim explicitly hinted)
def q04_broadcast_join(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(F.count("*").alias("cnt"))
        .orderBy("n_name")
    )


# Q05 — left outer join
def q05_outer_join(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .select("c_custkey", "o_orderkey")
        .orderBy(F.col("c_custkey"), F.col("o_orderkey").asc_nulls_first())
    )


# Q06 — anti join (NOT EXISTS)
def q06_anti_join(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
        .select("c_custkey")
        .orderBy("c_custkey")
    )


# Q07 — theta/range join (equi on computed key + range residual)
def q07_range_join(spark, sf_dir):
    p1 = _t(spark, sf_dir, "part").alias("p1")
    p2 = _t(spark, sf_dir, "part").alias("p2")
    cond = (F.col("p1.p_size") < F.col("p2.p_size")) & (
        F.col("p1.p_partkey") + 100 == F.col("p2.p_partkey")
    )
    return (
        p1.join(p2, cond)
        .select(
            F.col("p1.p_partkey").alias("k1"), F.col("p2.p_partkey").alias("k2")
        )
        .orderBy("k1", "k2")
    )


# Q08 — hash aggregation, TPC-H Q1 shape
def q08_agg_tpch_q1(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            round2_portable(F.sum("l_extendedprice")).alias("sum_base_price"),
            round2_portable(F.avg("l_quantity")).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# Q09 — count distinct
def q09_count_distinct(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.agg(F.countDistinct("o_custkey").alias("n_custkeys"))


# Q10 — approx count distinct (no oracle hash — approximate by contract)
def q10_approx_count_distinct(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.agg(F.approx_count_distinct("o_custkey").alias("approx_custkeys"))


# Q11 — rollup / grouping sets
def q11_rollup(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("cnt"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


# Q12 — per-group argmax (reference R5 shape; deterministic tie-break)
def q12_argmax(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.max_by(
                "o_orderkey",
                F.struct(F.col("o_totalprice"), (-F.col("o_orderkey")).alias("nk")),
            ).alias("best_order")
        )
        .orderBy("o_custkey")
    )


# Q13 — ranking window functions
def q13_rank_window(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select(
            "o_custkey", "o_orderkey", F.row_number().over(w).alias("rn")
        )
        .orderBy("o_custkey", "rn")
    )


# Q14 — analytic window: running aggregate with frame spec.
# (l_orderkey, l_linenumber) is NOT unique in the driver data (the
# generator emits duplicate linenumbers), so a ROWS frame ordered by
# linenumber alone is nondeterministic — the window order includes
# enough columns to be total (verified unique at sf0.1).
def q14_running_sum(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    tiebreak = ["l_linenumber", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"]
    w = (
        W.partitionBy("l_orderkey")
        .orderBy(*tiebreak)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            "l_partkey",
            "l_suppkey",
            F.round(F.sum("l_quantity").over(w), 2).alias("running_qty"),
        )
        .orderBy("l_orderkey", *tiebreak)
    )


# Q15 — global top-k (Spark plans TakeOrderedAndProject — no full sort)
def q15_topk(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


# Q16 — set ops
def q16_intersect(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s).orderBy("nationkey")


# Q17 — string functions
def q17_string_funcs(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return (
        p.select(
            "p_partkey",
            F.upper(F.substring("p_name", 1, 5)).alias("name5"),
            F.length("p_name").alias("name_len"),
            F.concat(F.col("p_brand"), F.lit("#"), F.col("p_type")).alias("brand_type"),
        )
        .orderBy("p_partkey")
    )


# Q18 — date/timestamp functions
def q18_date_funcs(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("int").alias("y"),
            F.month("o_orderdate").cast("int").alias("m"),
        )
        .agg(F.count("*").alias("cnt"))
        .orderBy("y", "m")
    )


def round2_portable(col: "F.Column") -> "F.Column":
    """Engine-portable HALF_UP 2-decimal rounding for positive doubles.

    Spark's round() converts the double through its shortest decimal
    repr (6126.6449999999995 -> "6126.645" -> .65) while DuckDB rounds
    the binary value (-> .64). floor(x*100 + 0.5)/100 is pure double
    arithmetic, bit-identical in both engines.
    """
    return F.floor(col * 100 + F.lit(0.5)).cast("double") / 100


# Q19 — math functions
def q19_math_funcs(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    charge = F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            round2_portable(charge).alias("charge"),
            F.floor(F.sqrt(F.abs(F.col("l_extendedprice")))).cast("long").alias("sqrt_floor"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


# Q20 — conditional / null functions
def q20_case_when(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.when(F.col("o_totalprice") > 10000, "big")
            .otherwise("small")
            .alias("bucket"),
        )
        .orderBy("o_orderkey")
    )


# Q21 — array higher-order functions (squared L2 norm of the embedding)
def q21_array_l2norm(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    sq = F.transform(F.col("embedding").cast("array<double>"), lambda x: x * x)
    return (
        e.select(
            "vec_id",
            F.round(
                F.aggregate(sq, F.lit(0.0), lambda a, x: a + x), 2
            ).alias("l2sq"),
        )
        .orderBy("vec_id")
    )


# Q22 — JSON extraction
def q22_json_extract(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(
            "event_id", F.get_json_object("props", "$.k").alias("k_val")
        )
        .orderBy("event_id")
    )


# Q23 — scalar subquery (decorrelated by Catalyst)
def q23_subquery(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_q23")
    return spark.sql(
        """
        SELECT o_orderkey FROM orders_q23
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders_q23)
        ORDER BY o_orderkey
        """
    )
