"""Resumable multi-stage pipeline runner (materialize-per-stage).

The reference IS one fixed pipeline run as a single binary
(assembly_final.cpp:648-748: load -> three GAS phases -> write). The
engine-level analog for data curation is a DAG of stages where each
stage's output is MATERIALIZED to parquet before the next stage reads
it — the shape every production corpus pipeline takes, because:

* a 100 TB run that dies at stage 4 of 6 must resume at stage 4, not
  re-shuffle three finished stages (materialization = checkpoint);
* each stage boundary is an audit point (row counts in/out — the
  numbers a data lead reviews before a training run);
* downstream stages re-plan against the materialized parquet's real
  statistics instead of a 6-stage-deep lineage estimate.

Resume contract: a stage directory containing Spark's ``_SUCCESS``
marker is trusted and skipped (its parquet is read back instead of
recomputed); anything partial is overwritten. Stage functions are
``(spark, DataFrame) -> DataFrame`` and must be deterministic if the
audit trail is to be reproducible — every step shipped here is (they
are the oracle-checked operators from the registry).
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

StageFn = Callable[[SparkSession, DataFrame], Callable | DataFrame]


def _stage_done(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def run_pipeline(
    spark: SparkSession,
    source: DataFrame,
    stages: list[tuple[str, Callable[[SparkSession, DataFrame], DataFrame]]],
    workdir: str,
) -> tuple[DataFrame, list[dict]]:
    """Run ``stages`` in order, materializing each to
    ``workdir/<idx>_<name>``; returns (final DataFrame read from the
    last stage's parquet, per-stage audit list with rows/seconds/skip).

    Determinism note: a skipped stage contributes its MATERIALIZED
    rows, so a resumed run is byte-identical to the original by
    construction — the audit row says ``resumed`` instead of timing.
    """
    df = source
    audit: list[dict] = []
    for i, (name, fn) in enumerate(stages):
        path = os.path.join(workdir, f"{i:02d}_{name}")
        t0 = time.time()
        if _stage_done(path):
            df = spark.read.parquet(path)
            audit.append(
                {"stage": name, "rows": df.count(), "seconds": 0.0,
                 "resumed": True}
            )
            continue
        df = fn(spark, df)
        df.write.mode("overwrite").parquet(path)
        df = spark.read.parquet(path)
        audit.append(
            {"stage": name, "rows": df.count(),
             "seconds": round(time.time() - t0, 2), "resumed": False}
        )
    return df, audit


# --------------------------------------------------------------------------
# the default nightly curation pipeline, from registry-checked operators
# --------------------------------------------------------------------------
def _stage_quality(spark: SparkSession, docs: DataFrame) -> DataFrame:
    from bigdatagenomic_spark.operators.curation import curate

    return curate(docs).select("doc_id", "source", "q10k")


def _stage_scrub(spark: SparkSession, kept: DataFrame) -> DataFrame:
    # kept carries ids; the scrub re-joins the raw text it curated from
    from bigdatagenomic_spark.operators.curation import scrub_pii

    docs = kept.sparkSession.table("_pipeline_docs")
    joined = kept.join(docs.select("doc_id", "text"), "doc_id")
    return scrub_pii(joined, "text").select(
        "doc_id", "source", "q10k", "n_email", "n_phone", "n_ip",
        F.col("clean_text").alias("text"),
    )


def _stage_shards(spark: SparkSession, scrubbed: DataFrame) -> DataFrame:
    from bigdatagenomic_spark.operators.llm_prep import assign_shards

    shards = assign_shards(scrubbed.select("doc_id"), n_shards=4)
    return scrubbed.join(shards, "doc_id")


CURATION_STAGES = [
    ("quality_dedup_sample", _stage_quality),
    ("pii_scrub", _stage_scrub),
    ("shard_assign", _stage_shards),
]


def run_curation_pipeline(
    spark: SparkSession, sf_dir: str, workdir: str
) -> tuple[DataFrame, list[dict]]:
    from bigdatagenomic_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("_pipeline_docs")
    return run_pipeline(spark, docs, CURATION_STAGES, workdir)
