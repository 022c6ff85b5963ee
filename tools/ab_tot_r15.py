"""Interleaved A/B: per-group total n derived from the EAGER grid
checkpoint (dv) + lazy cum pin (winsorize) vs the r13/r14 shape that
derived n = max(_cum) over the cumsum output (whose broadcast build
replays the per-partition window pass).

Usage: python tools/ab_tot_r15.py [--rounds N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def old_trimmed(spark, sf_dir):
    from bigdatagenomic_spark.operators.scale import two_phase_cumsum
    from bigdatagenomic_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("grp"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"))
    dv = li.groupBy("grp", "cents").agg(
        F.count("*").cast("long").alias("_cnt")).localCheckpoint(eager=True)
    cum = two_phase_cumsum(
        dv, "_cnt", [F.col("cents").asc()], group_cols=["grp"], out_col="_cum")
    tot = cum.groupBy("grp").agg(F.max("_cum").cast("long").alias("n"))
    base = cum.join(F.broadcast(tot), "grp").withColumn("_kept", F.expr(
        "CAST(greatest(0, least(_cum, n - n div 20)"
        " - greatest(_cum - _cnt, n div 20)) AS BIGINT)"))
    return (base.groupBy("grp", "n").agg(
        F.sum("_kept").cast("long").alias("n_kept"),
        F.expr("CAST(sum(CAST(cents AS DECIMAL(38,0)) * _kept) * 1000000"
               " div CAST(sum(_kept) AS DECIMAL(38,0)) AS BIGINT)"
               ).alias("trimmed_mean_micro")).orderBy("grp"))


def old_winsor(spark, sf_dir):
    from bigdatagenomic_spark.operators.scale import two_phase_cumsum
    from bigdatagenomic_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("grp"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"))
    dv = li.groupBy("grp", "cents").agg(
        F.count("*").cast("long").alias("_cnt")).localCheckpoint(eager=True)
    cum = two_phase_cumsum(
        dv, "_cnt", [F.col("cents").asc()], group_cols=["grp"], out_col="_cum")
    tot = cum.groupBy("grp").agg(F.max("_cum").cast("long").alias("n"))
    wide = cum.join(F.broadcast(tot), "grp")
    bounds = wide.groupBy("grp", "n").agg(
        F.min(F.when(F.expr("_cum >= n div 20 + 1"), F.col("cents"))).alias("lo"),
        F.min(F.when(F.expr("_cum >= n - n div 20"), F.col("cents"))).alias("hi"))
    base = wide.join(F.broadcast(bounds.drop("n")), "grp").withColumn(
        "_kept", F.expr(
            "CAST(greatest(0, least(_cum, n - n div 20)"
            " - greatest(_cum - _cnt, n div 20)) AS BIGINT)"))
    return (base.groupBy("grp", "n", "lo", "hi").agg(F.expr(
        "CAST((sum(CAST(cents AS DECIMAL(38,0)) * _kept)"
        " + CAST(n div 20 AS DECIMAL(38,0)) * (lo + hi)) * 1000000"
        " div CAST(n AS DECIMAL(38,0)) AS BIGINT)").alias("winsor_mean_micro")
    ).orderBy("grp"))


def main() -> int:
    argv = list(sys.argv[1:])
    rounds = 4
    if "--rounds" in argv:
        i = argv.index("--rounds")
        rounds = int(argv[i + 1])
        del argv[i : i + 2]

    from bigdatagenomic_spark import queries as registry
    from bigdatagenomic_spark.operators.scale import q_x_trimmed_mean, q_x_winsorize
    from bigdatagenomic_spark.session import get_spark

    spark = get_spark(app_name="ab-tot-r15")
    qs = registry.queries()
    sf = "/root/testdata/sf0.1"

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    def t(fn):
        t0 = time.time()
        force(fn(spark, sf))
        return time.time() - t0

    def q08():
        return t(lambda s, d: qs["q08_agg_tpch_q1"](s, d))

    q08()
    print(f"control q08 min: {min(q08() for _ in range(3)):.3f}")
    for name, new, old in (
        ("trimmed", q_x_trimmed_mean, old_trimmed),
        ("winsor", q_x_winsorize, old_winsor),
    ):
        t(new); t(old)
        nr, orr = [], []
        for _ in range(rounds):
            nr.append(t(new))
            orr.append(t(old))
        print(
            f"{name}: NEW min {min(nr):.3f} {[round(x, 2) for x in nr]}"
            f" | OLD min {min(orr):.3f} {[round(x, 2) for x in orr]}"
        )
    print(f"control q08 min: {min(q08() for _ in range(3)):.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
