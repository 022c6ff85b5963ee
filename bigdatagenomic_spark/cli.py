"""CLI driver (reference operator R9, assembly_final.cpp:648-748).

Mirrors the reference invocation (README:11):

    python -m bigdatagenomic_spark.cli assemble \\
        --infile GraphLab_Input.txt --outfile out --source 33 --destination 5

Differences from the reference, by design: ``--destination`` presence is
actually validated (the reference's duplicated ``source`` check at
assembly_final.cpp:692-699 never checks it), per-phase wall-clock is
printed like the reference's ``elapsed_seconds`` reporting
(:716/:725/:736), and the sink format is selectable (the reference only
writes per-vertex text blocks).
"""

from __future__ import annotations

import argparse
import sys
import time

from bigdatagenomic_spark.operators import assembly as asm
from bigdatagenomic_spark.session import get_spark
from bigdatagenomic_spark.sources.graphlab_text import read_graphlab_text, reads_to_edges
from bigdatagenomic_spark.sources.writers import write_best_path_text, write_parquet


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="bigdatagenomic-spark")
    sub = p.add_subparsers(dest="command", required=True)
    a = sub.add_parser("assemble", help="run the 3-phase assembly pipeline")
    a.add_argument("--infile", required=True, help="GraphLab-format read file")
    a.add_argument("--outfile", required=True, help="output directory")
    a.add_argument("--source", type=int, required=True, help="start vertex id")
    a.add_argument("--destination", type=int, required=True, help="exempt dead-end vertex id")
    a.add_argument("--bit-compat", action="store_true",
                   help="reproduce the reference's A3 1-base-overlap quirk")
    a.add_argument("--format", choices=["text", "parquet"], default="text",
                   help="sink format (text = reference per-vertex blocks)")
    a.add_argument("--cpus", type=int, default=None)

    q = sub.add_parser("query", help="run a registry query by name")
    q.add_argument("name", help="query name (see `list`)")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.01",
                   help="test-table directory")
    q.add_argument("--limit", type=int, default=20, help="rows to show")
    q.add_argument("--explain", action="store_true", help="print the plan too")
    q.add_argument("--out", default=None,
                   help="also write the FULL result to this directory")
    q.add_argument("--format", choices=["parquet", "csv", "json"],
                   default="parquet", help="sink format for --out")
    q.add_argument("--cpus", type=int, default=None)

    sub.add_parser("list", help="list every registry query")

    pl = sub.add_parser(
        "pipeline", help="run the resumable curation pipeline"
    )
    pl.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    pl.add_argument("--workdir", required=True,
                    help="stage materialization dir (resume point)")
    pl.add_argument("--cpus", type=int, default=None)

    s = sub.add_parser("sql", help="run ad-hoc SQL over the test tables")
    s.add_argument("statement", help="ANSI SQL; tables region..embeddings are views")
    s.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    s.add_argument("--limit", type=int, default=20, help="rows to show")
    s.add_argument("--explain", action="store_true", help="print the plan too")
    s.add_argument("--cpus", type=int, default=None)
    return p


def cmd_assemble(args: argparse.Namespace) -> int:
    spark = get_spark(app_name="bdg-assemble", cpus=args.cpus)
    t0 = time.time()
    reads = read_graphlab_text(spark, args.infile)
    edges = reads_to_edges(reads)
    n_reads, n_edges = reads.count(), edges.count()
    if n_reads == 0:
        print(f"error: no parseable reads in {args.infile}", file=sys.stderr)
        return 2
    print(f"loaded {n_reads} reads, {n_edges} edges in {time.time()-t0:.2f}s")

    t1 = time.time()
    annotated, assembled = asm.assemble(
        reads, edges, args.source, args.destination,
        bit_compat=args.bit_compat, n_reads_hint=n_reads,
    )
    result = assembled.collect()
    if not result or result[0].content is None:
        print(f"error: source vertex {args.source} not found in input", file=sys.stderr)
        return 2
    row = result[0]
    print(f"assembled in {time.time()-t1:.2f}s")
    print(f"sequence: offset={row.offset} length={row.length}")
    print(f"head: {row.content[:60]}")

    t2 = time.time()
    if args.format == "text":
        write_best_path_text(annotated, args.outfile)
    else:
        write_parquet(annotated, args.outfile)
    with open_sequence_path(args.outfile) as fh:
        fh.write(row.content + "\n")
    print(f"wrote {args.outfile} ({args.format}) in {time.time()-t2:.2f}s")
    return 0


def open_sequence_path(outdir: str):
    """The assembled sequence goes next to the per-vertex sink, like the
    reference's single-line ``result`` artifact."""
    import os

    os.makedirs(outdir, exist_ok=True)
    return open(os.path.join(outdir, "assembled_sequence.txt"), "w")


def cmd_query(args: argparse.Namespace) -> int:
    from bigdatagenomic_spark import queries as registry

    qs = registry.queries()
    if args.name not in qs:
        print(f"error: unknown query {args.name!r}; see `list`", file=sys.stderr)
        return 2
    spark = get_spark(app_name=f"bdg-{args.name}", cpus=args.cpus)
    t0 = time.time()
    df = qs[args.name](spark, args.sf_dir)
    if args.explain:
        df.explain(mode="formatted")
    df.show(args.limit, truncate=False)
    if args.out:
        from bigdatagenomic_spark.sources.files import write_csv, write_json

        if args.format == "parquet":
            write_parquet(df, args.out)
        elif args.format == "csv":
            write_csv(df, args.out)
        else:
            write_json(df, args.out)
        print(f"wrote {args.out} ({args.format})")
    print(f"{args.name} on {args.sf_dir}: {time.time()-t0:.2f}s")
    return 0


def cmd_list() -> int:
    from bigdatagenomic_spark import queries as registry

    oracles = registry.oracle_sql()
    for name in registry.queries():
        kind = "oracle" if name in oracles else "rows-only"
        print(f"{name:28s} {kind}")
    return 0


def cmd_sql(args: argparse.Namespace) -> int:
    from bigdatagenomic_spark.sources.tables import register_views

    spark = get_spark(app_name="bdg-sql", cpus=args.cpus)
    register_views(spark, args.sf_dir)
    t0 = time.time()
    df = spark.sql(args.statement)
    if args.explain:
        df.explain(mode="formatted")
    df.show(args.limit, truncate=False)
    print(f"sql on {args.sf_dir}: {time.time()-t0:.2f}s")
    return 0


def cmd_pipeline(args: argparse.Namespace) -> int:
    from bigdatagenomic_spark.pipelines import run_curation_pipeline

    spark = get_spark(app_name="bdg-pipeline", cpus=args.cpus)
    final, audit = run_curation_pipeline(spark, args.sf_dir, args.workdir)
    for a in audit:
        state = "resumed" if a["resumed"] else f"{a['seconds']}s"
        print(f"{a['stage']:24s} {a['rows']:>10d} rows  {state}")
    print(f"final: {final.count()} rows in {args.workdir}")
    return 0


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if args.command == "assemble":
        return cmd_assemble(args)
    if args.command == "query":
        return cmd_query(args)
    if args.command == "list":
        return cmd_list()
    if args.command == "sql":
        return cmd_sql(args)
    if args.command == "pipeline":
        return cmd_pipeline(args)
    return 1


if __name__ == "__main__":
    sys.exit(main())
