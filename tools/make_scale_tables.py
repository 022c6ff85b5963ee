"""Scaled fact tables for the relational scale validation (SCALING.md
part 2): lineitem / orders / events replicated 1x/10x/100x with
key-disjoint offsets, dimension tables (part, supplier, nation,
customer, region) symlinked unchanged — the realistic growth shape
(facts grow, dims don't).

Replication reseeds the join/window keys so work grows linearly and
honestly:
  * orders/lineitem: o_orderkey/l_orderkey shifted by rep * 2^24 — the
    Q9 join fan-out per key is unchanged, there are just R times more
    keys;
  * events: event_id shifted, ts shifted by rep * 366 days — sessions
    and follow-windows stay disjoint across replicas (no artificial
    100-deep stacking of identical timestamps).

Usage: python tools/make_scale_tables.py [out_dir]  (default /tmp/scale_rel)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bigdatagenomic_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
REPLICAS = (1, 10, 100)
KEY_STRIDE = 1 << 24
DIMS = ("part", "supplier", "nation", "customer", "region")


def build(out_dir: str) -> None:
    spark = get_spark(app_name="make-scale-tables")
    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    orders = spark.read.parquet(f"{SRC}/orders.parquet")
    events = spark.read.parquet(f"{SRC}/events.parquet")
    for r in REPLICAS:
        reps = F.broadcast(spark.range(r).select(F.col("id").alias("rep")))
        path = os.path.join(out_dir, f"x{r}")
        os.makedirs(path, exist_ok=True)
        (
            li.crossJoin(reps)
            .withColumn("l_orderkey", F.col("rep") * KEY_STRIDE + F.col("l_orderkey"))
            .drop("rep")
            .repartition(32)
            .write.mode("overwrite")
            .parquet(os.path.join(path, "lineitem.parquet"))
        )
        (
            orders.crossJoin(reps)
            .withColumn("o_orderkey", F.col("rep") * KEY_STRIDE + F.col("o_orderkey"))
            .drop("rep")
            .repartition(32)
            .write.mode("overwrite")
            .parquet(os.path.join(path, "orders.parquet"))
        )
        (
            events.crossJoin(reps)
            .withColumn("event_id", F.col("rep") * KEY_STRIDE + F.col("event_id"))
            .withColumn(
                "ts", F.col("ts") + F.col("rep") * F.expr("INTERVAL 366 DAYS")
            )
            .drop("rep")
            .repartition(32)
            .write.mode("overwrite")
            .parquet(os.path.join(path, "events.parquet"))
        )
        for d in DIMS:
            dst = os.path.join(path, f"{d}.parquet")
            if not os.path.exists(dst):
                os.symlink(f"{SRC}/{d}.parquet", dst)
        print(f"x{r} -> {path}", flush=True)


if __name__ == "__main__":
    build(sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_rel")
