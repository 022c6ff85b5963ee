"""CLI surface tests (reference operator R9 + the query/sql/list
subcommands a reference user drives the engine with).

Each cmd_* builds its session via get_spark -> builder.getOrCreate(),
which reuses the test session, so these stay cheap."""

from __future__ import annotations

import os

from bigdatagenomic_spark.cli import main

SF_DIR = "/root/testdata/sf0.001"


def test_cli_list(spark, capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "q01_scan_filter" in out and "oracle" in out
    assert "q10_approx_count_distinct" in out and "rows-only" in out


def test_cli_query_runs_and_shows(spark, capsys):
    rc = main(["query", "q04_broadcast_join", "--sf-dir", SF_DIR, "--limit", "5"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "n_name" in out and "cnt" in out


def test_cli_query_unknown_name(spark, capsys):
    assert main(["query", "nope_not_a_query", "--sf-dir", SF_DIR]) == 2
    assert "unknown query" in capsys.readouterr().err


def test_cli_sql_over_views(spark, capsys):
    rc = main(["sql", "SELECT count(*) AS n FROM nation", "--sf-dir", SF_DIR])
    assert rc == 0
    assert "n" in capsys.readouterr().out


def test_cli_assemble_end_to_end(spark, tmp_path, capsys):
    out_dir = str(tmp_path / "asm")
    rc = main([
        "assemble", "--infile", "tests/data/smoke3.txt",
        "--outfile", out_dir, "--source", "33", "--destination", "38",
    ])
    assert rc == 0
    printed = capsys.readouterr().out
    assert "length=2719" in printed
    seq_path = os.path.join(out_dir, "assembled_sequence.txt")
    with open(seq_path) as fh:
        seq = fh.read().strip()
    assert len(seq) == 2719
    assert set(seq) <= set("ACGTN")


def test_cli_query_writes_result(spark, tmp_path, capsys):
    out = str(tmp_path / "q04_out")
    rc = main(
        ["query", "q04_broadcast_join", "--sf-dir", SF_DIR, "--out", out]
    )
    assert rc == 0
    back = spark.read.parquet(out)
    assert back.count() > 0 and set(back.columns) == {"n_name", "cnt"}


def test_cli_pipeline_runs_and_reports(spark, tmp_path, capsys):
    wd = str(tmp_path / "plwd")
    rc = main(["pipeline", "--sf-dir", "/root/testdata/sf0.001",
               "--workdir", wd])
    assert rc == 0
    out = capsys.readouterr().out
    assert "quality_dedup_sample" in out and "shard_assign" in out
    assert "final:" in out
    rc2 = main(["pipeline", "--sf-dir", "/root/testdata/sf0.001",
                "--workdir", wd])
    assert rc2 == 0
    assert "resumed" in capsys.readouterr().out
