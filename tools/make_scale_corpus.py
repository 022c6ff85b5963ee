"""Synthesize scaled replicas of the sf0.1 documents table for the
empirical scale validation (VERDICT r6 #1).

Self-union + reseed, as the verdict prescribes: replica k of doc d is
  * VERBATIM when d % 10 == 0 — so 10% of the corpus forms R-deep exact
    near-dup clusters across replicas (the dedup pipeline has real work
    whose volume grows with scale), and
  * token-reseeded otherwise (every token gets a replica suffix, so all
    its shingles/spans differ from every other replica — unique content,
    like real corpus growth).

doc_id' = k * 2^20 + doc_id keeps ids disjoint at any replica count.
Writes <out>/x{R}/documents.parquet for R in REPLICAS. Nothing here is
test data for correctness — the oracle-checked tables remain
/root/testdata; this corpus exists only to measure wall-time scaling.

Usage: python tools/make_scale_corpus.py [out_dir]   (default /tmp/scale_corpus)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bigdatagenomic_spark.session import get_spark

SRC = "/root/testdata/sf0.1/documents.parquet"
REPLICAS = (1, 10, 100)
ID_STRIDE = 1 << 20


def build(out_dir: str) -> None:
    spark = get_spark(app_name="make-scale-corpus")
    docs = spark.read.parquet(SRC)
    for r in REPLICAS:
        reps = spark.range(r).select(F.col("id").alias("rep"))
        text = F.when(
            (F.col("doc_id") % 10 == 0) | (F.col("rep") == 0), F.col("text")
        ).otherwise(
            # reseed: suffix every token with the replica index — all
            # word shingles/spans change, so non-verbatim replicas are
            # genuinely new content to every dedup family
            F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda t: F.concat(t, F.col("rep").cast("string")),
                ),
                " ",
            )
        )
        out = (
            docs.crossJoin(F.broadcast(reps))
            .select(
                (F.col("rep") * ID_STRIDE + F.col("doc_id")).alias("doc_id"),
                text.alias("text"),
                "lang",
                "source",
                F.length(text).cast("long").alias("n_chars"),
            )
            .repartition(32)
        )
        path = os.path.join(out_dir, f"x{r}")
        out.write.mode("overwrite").parquet(os.path.join(path, "documents.parquet"))
        n = spark.read.parquet(os.path.join(path, "documents.parquet")).count()
        print(f"x{r}: {n} docs -> {path}")


if __name__ == "__main__":
    build(sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_corpus")
