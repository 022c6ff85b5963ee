"""Generic file sources/sinks beyond parquet (CSV, JSON, text).

The reference reads exactly one whitespace-delimited text format
(assembly_final.cpp:73-145; see ``graphlab_text``) and writes one text
block format (``writers``). The engine's general surface adds the
standard interchange formats. All are Spark built-ins — the value here
is pinning the engine's conventions:

* schemas are always explicit (``inferSchema`` does a second full read
  of the data — never acceptable at 100 TB);
* CSV/JSON are interchange formats, parquet is the engine-native store
  (columnar, splittable, predicate pushdown; CSV/JSON scans can prune
  columns but never push predicates);
* writes go through ``df.write`` (distributed, one file per partition),
  never a driver-side collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


CORRUPT_COL = "_corrupt_record"


def with_corrupt_capture(schema: StructType) -> StructType:
    """Schema + the corrupt-record column (PERMISSIVE mode lands
    unparseable rows there instead of silently defaulting them — the
    reference's loader silently zero-fills malformed lines,
    assembly_final.cpp:88-99; the engine surfaces them)."""
    from pyspark.sql.types import StringType, StructField

    return StructType(list(schema.fields) + [StructField(CORRUPT_COL, StringType())])


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
    sep: str = ",",
    mode: str = "PERMISSIVE",
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )


def read_json(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def write_csv(
    df: DataFrame, path: str, mode: str = "overwrite", header: bool = True
) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_orc(spark: SparkSession, path: str, schema: StructType | str | None = None) -> DataFrame:
    """ORC interchange source (columnar, predicate-pushdown-capable like
    parquet; schema optional — ORC files are self-describing)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(
    df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)
