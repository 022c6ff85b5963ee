"""Reader for the reference's whitespace-delimited read file (operator R1).

Input format (reference: comment at assembly_final.cpp:41, parser at
assembly_final.cpp:88-123, sample GraphLab_Input_short.txt):

    ReadID  Length  Content  MatchPosition  MatchScore  <successor-ids...>

One read per line; zero or more trailing successor vertex ids; arbitrary
whitespace between fields. The reference parses line-at-a-time on a single
rank with ``std::getline`` + ``stringstream`` — here the scan is a
distributed ``spark.read.text`` and the projection is pure Catalyst
(split + try_cast + slice/explode), so it parallelizes over file splits
and survives 100 TB inputs.

Divergence from the reference, by design (SURVEY.md §3.3): malformed
lines produce NULL fields (``try_cast``) and are surfaced via
``corrupt=True`` rows instead of silently defaulting to zero.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

READS_COLUMNS = ["read_id", "length", "content", "offset", "score", "end", "dest_ids"]


def parse_graphlab_lines(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """Project raw text lines into the ``reads`` schema (R1 + R2).

    ``end = offset + length`` mirrors assembly_final.cpp:100 (computed at
    load; note the reference's merge comparisons use the *inclusive* end
    ``offset + length - 1`` — see operators/assembly.py).
    """
    parts = F.split(F.trim(F.col(value_col)), r"\s+")
    df = lines.where(F.trim(F.col(value_col)) != "").select(
        F.element_at(parts, 1).try_cast("long").alias("read_id"),
        F.element_at(parts, 2).try_cast("int").alias("length"),
        F.element_at(parts, 3).alias("content"),
        F.element_at(parts, 4).try_cast("int").alias("offset"),
        F.element_at(parts, 5).try_cast("double").alias("score"),
        F.slice(
            parts, 6, F.greatest(F.size(parts) - F.lit(5), F.lit(0))
        ).try_cast("array<long>").alias("dest_ids"),
    )
    df = df.withColumn("end", F.col("offset") + F.col("length"))
    df = df.withColumn(
        "corrupt",
        F.col("read_id").isNull()
        | F.col("length").isNull()
        | F.col("offset").isNull()
        | F.col("score").isNull(),
    )
    return df.select(*READS_COLUMNS, "corrupt")


def read_graphlab_text(spark: SparkSession, path: str, strict: bool = True) -> DataFrame:
    """Distributed scan + parse of a GraphLab-format read file.

    With ``strict`` (default), corrupt lines are dropped after being
    counted; set ``strict=False`` to keep them (NULL fields) for
    inspection.
    """
    parsed = parse_graphlab_lines(spark.read.text(path))
    if strict:
        parsed = parsed.where(~F.col("corrupt"))
    return parsed.drop("corrupt")


def reads_to_edges(reads: DataFrame) -> DataFrame:
    """Explode per-read successor lists into an edge list (src, dst).

    Mirrors the reference's inline edge authoring (``graph.add_edge``
    loop, assembly_final.cpp:115-123). Self-loops are dropped, as
    GraphLab's ``add_edge`` would reject them.
    """
    return (
        reads.select(F.col("read_id").alias("src"), F.explode("dest_ids").alias("dst"))
        .where(F.col("src") != F.col("dst"))
    )
