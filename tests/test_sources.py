"""Source/sink round-trips: CSV and JSON interchange vs the parquet base.

The graphlab text reader (R1) is covered in test_assembly.py; this file
covers the general-format surface in sources.files.
"""

from __future__ import annotations

from bigdatagenomic_spark.sources.files import (
    read_csv,
    read_json,
    write_csv,
    write_json,
)
from bigdatagenomic_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_csv_roundtrip(spark, tmp_path):
    nation = load_table(spark, SF_DIR, "nation")
    path = str(tmp_path / "nation_csv")
    write_csv(nation, path)
    back = read_csv(spark, path, nation.schema)
    assert back.schema == nation.schema
    assert _rows(back) == _rows(nation)


def test_json_roundtrip(spark, tmp_path):
    orders = load_table(spark, SF_DIR, "orders")
    path = str(tmp_path / "orders_json")
    write_json(orders, path)
    back = read_json(spark, path, orders.schema)
    assert back.schema == orders.schema
    assert _rows(back) == _rows(orders)
