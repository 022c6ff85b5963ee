"""Central query registry: name -> (builder, oracle_sql | None).

The driver contract (``__spark_entry__.py``) and the test harness both
consume this registry. Every entry's builder is ``(spark, sf_dir) ->
DataFrame``; the oracle is ANSI SQL DuckDB runs on the same parquet
(views pre-registered: region nation customer supplier part orders
lineitem events documents embeddings). Column names/aliases match the
Spark output exactly; approximate operators carry ``None`` (rows-only
check).

DuckDB 1.0 portability notes (empirically validated):
  * ``list_reduce`` string-concat lambdas are buggy in DuckDB 1.0 (the
    accumulated string silently stops growing after a few iterations) —
    oracles that need an ordered string fold use a window/string_agg
    formulation instead (see q27_assembly).
  * ``round()`` half-way behavior matches Spark's HALF_UP for the
    2-decimal money values exercised here (validated by the harness).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from bigdatagenomic_spark.operators import relational as R

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, fn: QueryFn, oracle: str | None) -> None:
    _REGISTRY[name] = (fn, oracle)


def queries() -> dict[str, QueryFn]:
    return {k: v[0] for k, v in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {k: v[1] for k, v in _REGISTRY.items() if v[1] is not None}


# ---------------------------------------------------------------------------
# relational surface Q01-Q23 (SURVEY.md §2.B)
# ---------------------------------------------------------------------------

register(
    "q01_scan_filter",
    R.q01_scan_filter,
    """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
       WHERE l_quantity > 45 ORDER BY l_orderkey, l_linenumber""",
)

register(
    "q02_predicates",
    R.q02_predicates,
    """SELECT o_orderkey FROM orders
       WHERE o_orderstatus IN ('F','O') AND o_totalprice BETWEEN 1000 AND 5000
         AND o_orderpriority LIKE '1%' ORDER BY o_orderkey""",
)

register(
    "q03_inner_join",
    R.q03_inner_join,
    """SELECT c.c_custkey, o.o_orderkey FROM customer c
       JOIN orders o ON c.c_custkey = o.o_custkey
       ORDER BY c.c_custkey, o.o_orderkey""",
)

register(
    "q04_broadcast_join",
    R.q04_broadcast_join,
    """SELECT n.n_name, count(*) AS cnt FROM customer c
       JOIN nation n ON c.c_nationkey = n.n_nationkey
       GROUP BY n.n_name ORDER BY n.n_name""",
)

register(
    "q05_outer_join",
    R.q05_outer_join,
    """SELECT c.c_custkey, o.o_orderkey FROM customer c
       LEFT JOIN orders o ON c.c_custkey = o.o_custkey
       ORDER BY c.c_custkey, o.o_orderkey NULLS FIRST""",
)

register(
    "q06_anti_join",
    R.q06_anti_join,
    """SELECT c_custkey FROM customer c
       WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
       ORDER BY c_custkey""",
)

register(
    "q07_range_join",
    R.q07_range_join,
    """SELECT p1.p_partkey AS k1, p2.p_partkey AS k2 FROM part p1
       JOIN part p2 ON p1.p_size < p2.p_size AND p1.p_partkey + 100 = p2.p_partkey
       ORDER BY k1, k2""",
)

register(
    "q08_agg_tpch_q1",
    R.q08_agg_tpch_q1,
    """SELECT l_returnflag, l_linestatus,
              round(sum(l_quantity), 2) AS sum_qty,
              floor(sum(l_extendedprice) * 100 + 0.5) / 100 AS sum_base_price,
              floor(avg(l_quantity) * 100 + 0.5) / 100 AS avg_qty,
              count(*) AS count_order
       FROM lineitem GROUP BY l_returnflag, l_linestatus
       ORDER BY l_returnflag, l_linestatus""",
)

register(
    "q09_count_distinct",
    R.q09_count_distinct,
    "SELECT count(DISTINCT o_custkey) AS n_custkeys FROM orders",
)

register("q10_approx_count_distinct", R.q10_approx_count_distinct, None)

register(
    "q11_rollup",
    R.q11_rollup,
    """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt FROM orders
       GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
       ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",
)

register(
    "q12_argmax",
    R.q12_argmax,
    """SELECT o_custkey, o_orderkey AS best_order FROM (
         SELECT o_custkey, o_orderkey,
                row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_totalprice DESC, o_orderkey) AS rn
         FROM orders) WHERE rn = 1 ORDER BY o_custkey""",
)

register(
    "q13_rank_window",
    R.q13_rank_window,
    """SELECT o_custkey, o_orderkey,
              row_number() OVER (PARTITION BY o_custkey
                                 ORDER BY o_totalprice DESC, o_orderkey) AS rn
       FROM orders ORDER BY o_custkey, rn""",
)

register(
    "q14_running_sum",
    R.q14_running_sum,
    """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
              round(sum(l_quantity) OVER (PARTITION BY l_orderkey
                    ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity,
                             l_extendedprice
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty
       FROM lineitem
       ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity,
                l_extendedprice""",
)

register(
    "q15_topk",
    R.q15_topk,
    """SELECT o_orderkey, o_totalprice FROM orders
       ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""",
)

register(
    "q16_intersect",
    R.q16_intersect,
    """SELECT c_nationkey AS nationkey FROM customer
       INTERSECT SELECT s_nationkey AS nationkey FROM supplier ORDER BY nationkey""",
)

register(
    "q17_string_funcs",
    R.q17_string_funcs,
    """SELECT p_partkey, upper(substr(p_name, 1, 5)) AS name5,
              CAST(length(p_name) AS INT) AS name_len,
              p_brand || '#' || p_type AS brand_type
       FROM part ORDER BY p_partkey""",
)

register(
    "q18_date_funcs",
    R.q18_date_funcs,
    """SELECT CAST(year(o_orderdate) AS INT) AS y,
              CAST(month(o_orderdate) AS INT) AS m, count(*) AS cnt
       FROM orders GROUP BY 1, 2 ORDER BY y, m""",
)

register(
    "q19_math_funcs",
    R.q19_math_funcs,
    """SELECT l_orderkey, l_linenumber,
              floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100 + 0.5) / 100
                AS charge,
              CAST(floor(sqrt(abs(l_extendedprice))) AS BIGINT) AS sqrt_floor
       FROM lineitem ORDER BY l_orderkey, l_linenumber""",
)

register(
    "q20_case_when",
    R.q20_case_when,
    """SELECT o_orderkey,
              CASE WHEN o_totalprice > 10000 THEN 'big' ELSE 'small' END AS bucket
       FROM orders ORDER BY o_orderkey""",
)

register(
    "q21_array_l2norm",
    R.q21_array_l2norm,
    """SELECT vec_id,
              round(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)), 2)
                AS l2sq
       FROM embeddings ORDER BY vec_id""",
)

register(
    "q22_json_extract",
    R.q22_json_extract,
    """SELECT event_id, json_extract_string(props, '$.k') AS k_val
       FROM events ORDER BY event_id""",
)

register(
    "q23_subquery",
    R.q23_subquery,
    """SELECT o_orderkey FROM orders
       WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
       ORDER BY o_orderkey""",
)


# ---------------------------------------------------------------------------
# q27 — the assembly pipeline under the oracle gate
# ---------------------------------------------------------------------------
#
# The driver tables carry no reads/edges, so a deterministic read set is
# derived from `documents` (both engines derive it identically): 60 reads,
# content = ACGT-filtered text (rpad/truncated), interval layout chosen so
# consecutive reads exercise overlap (B), adjacency (C), containment (B')
# and gaps (D); per-vertex score strictly decreasing in doc_id so the
# argmax chain is 0->1->...->59 even with the decoy +2 edges. The Spark
# side runs the REAL pipeline (best-child argmax -> pointer-doubling path
# -> merge fold). The oracle is an independent *window* formulation of
# the same semantics (valid for forward chains: first covering read wins,
# gaps filled with N) — deliberately not a SQL transliteration of the
# fold, and immune to DuckDB 1.0's buggy string-building list_reduce.

def q27_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from bigdatagenomic_spark.operators import assembly as asm
    from bigdatagenomic_spark.sources.tables import load_table

    n = 60
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < n)
    length = (F.lit(13) + (F.col("doc_id") % 3) * 2).cast("int")
    cleaned = F.regexp_replace(F.upper("text"), "[^ACGT]", "")
    reads = docs.select(
        F.col("doc_id").alias("read_id"),
        length.alias("length"),
        F.substring(F.rpad(cleaned, 17, "A"), F.lit(1), length).alias("content"),
        (F.col("doc_id") * 12 + (F.col("doc_id") % 5) * 2).cast("int").alias("offset"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.col("doc_id")), 6).alias("score"),
    )
    edges = (
        reads.select(F.col("read_id").alias("src"))
        .select(
            "src",
            F.explode(
                F.filter(
                    F.array(F.col("src") + 1, F.col("src") + 2),
                    lambda d: d < F.lit(n),
                )
            ).alias("dst"),
        )
    )
    # n is a static upper bound on the successor count, so the hint
    # skips extract_path's sizing job, the driver-walk branch collects
    # the argmax subtree in ONE job, and with only one consumer left
    # the eager checkpoint job is pure overhead — three jobs become one
    with_next = asm.with_next_id(reads, edges)
    path = asm.extract_path(with_next, source=0, n_rows_hint=n)
    merged = asm.merge_path(path, reads)
    return merged.select(
        F.col("offset").cast("int").alias("offset"),
        F.col("length").cast("int").alias("length"),
        "content",
    )


register(
    "q27_assembly",
    q27_assembly,
    """
    WITH r AS (
      SELECT doc_id,
             CAST(12*doc_id + (doc_id%5)*2 AS INT) AS o,
             CAST(13 + (doc_id%3)*2 AS INT) AS l,
             substr(rpad(regexp_replace(upper(text), '[^ACGT]', '', 'g'), 17, 'A'),
                    1, CAST(13 + (doc_id%3)*2 AS INT)) AS c
      FROM documents WHERE doc_id < 60
    ), w AS (
      SELECT doc_id, o, l, c, o + l - 1 AS e,
             max(o + l - 1) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe
      FROM r
    ), contrib AS (
      SELECT doc_id, o, e,
             CASE
               WHEN pe IS NULL THEN c
               WHEN e <= pe THEN ''
               ELSE repeat('N', greatest(o - pe - 1, 0))
                    || substr(c, greatest(pe + 1 - o, 0) + 1, e - greatest(pe, o - 1))
             END AS piece
      FROM w
    )
    SELECT CAST(min(o) AS INT) AS offset,
           CAST(max(e) - min(o) + 1 AS INT) AS length,
           string_agg(piece, '' ORDER BY doc_id) AS content
    FROM contrib
    """,
)


def q_asm_kmer_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-mer (k=5) spectrum over the derived read set — the classic
    genomics counting kernel (coverage estimation, error detection,
    de Bruijn graph construction all start here; the reference's
    assembly consumes overlaps the k-mer spectrum would seed).

    Plan: map-only char-shingle per read (bounded by read length), one
    explode + one map-side-combined count shuffle on the k-mer key —
    at any corpus scale the shuffle carries at most 4^k distinct keys
    per partition after partial aggregation.
    """
    from pyspark.sql import functions as F

    from bigdatagenomic_spark.functions import char_shingles
    from bigdatagenomic_spark.sources.tables import load_table

    n, k = 60, 5
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < n)
    length = (F.lit(13) + (F.col("doc_id") % 3) * 2).cast("int")
    cleaned = F.regexp_replace(F.upper("text"), "[^ACGT]", "")
    reads = docs.select(
        F.substring(F.rpad(cleaned, 17, "A"), F.lit(1), length).alias("content")
    )
    kmers = reads.select(
        F.explode(
            F.filter(char_shingles(F.col("content"), k), lambda s: F.length(s) == k)
        ).alias("kmer")
    )
    return (
        kmers.groupBy("kmer")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), F.asc("kmer"))
    )


register(
    "q_asm_kmer_counts",
    q_asm_kmer_counts,
    """
    WITH r AS (
      SELECT substr(rpad(regexp_replace(upper(text), '[^ACGT]', '', 'g'), 17, 'A'),
                    1, CAST(13 + (doc_id%3)*2 AS INT)) AS content
      FROM documents WHERE doc_id < 60
    ), km AS (
      SELECT unnest(list_transform(range(1, greatest(length(content) - 4, 1) + 1),
                                   i -> substr(content, i, 5))) AS kmer
      FROM r
    )
    SELECT kmer, count(*) AS c FROM km
    WHERE length(kmer) = 5
    GROUP BY kmer ORDER BY c DESC, kmer
    """,
)


def _minimizer_reads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived long-read set for the minimizer kernels: same ACGT
    cleaning as q_asm_kmer_counts but longer reads (24-40 bp) so each
    carries enough (w,k)-windows to sketch."""
    from pyspark.sql import functions as F

    from bigdatagenomic_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    length = (F.lit(24) + (F.col("doc_id") % 5) * 4).cast("int")
    cleaned = F.regexp_replace(F.upper("text"), "[^ACGT]", "")
    return docs.select(
        F.col("doc_id").alias("read_id"),
        F.substring(F.rpad(cleaned, 40, "A"), F.lit(1), length).alias("content"),
    )


def _minimizers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(read_id, kmer, pos) — the (w=4, k=5) minimizer sketch of each
    derived read: for every window of 4 consecutive k-mer positions,
    keep the smallest (kmer, pos) pair; duplicates across overlapping
    windows collapse with DISTINCT. Minimizers are THE sequencing-scale
    sketch (minimap/minimap2 seeding, MashMap, modern assemblers): any
    two reads sharing a ≥ w+k-1 bp exact stretch share a minimizer, at
    ~2/(w+1) of the k-mer set's size.

    Plan: map-only shingle explode (bounded by read length), then one
    rows-frame window min per read — per-read slices are bounded, so no
    single-partition sort — and a DISTINCT bounded by the selected set.
    The (kmer,pos) argmin is encoded as ``kmer || zero-padded pos`` so
    the window aggregate is a plain ``min`` on one string in BOTH
    engines (identical tie semantics by construction).
    """
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from bigdatagenomic_spark.functions import char_shingles

    k, w = 5, 4
    reads = _minimizer_reads(spark, sf_dir)
    km = reads.select(
        "read_id",
        F.posexplode(
            F.filter(char_shingles(F.col("content"), k), lambda s: F.length(s) == k)
        ).alias("i", "kmer"),
    ).select(
        "read_id", (F.col("i") + 1).alias("pos"), "kmer"
    )
    win = (
        W.partitionBy("read_id")
        .orderBy("pos")
        .rowsBetween(W.currentRow, w - 1)
    )
    key = F.concat(F.col("kmer"), F.lpad(F.col("pos").cast("string"), 4, "0"))
    sel = km.select(
        "read_id",
        F.min(key).over(win).alias("mk"),
        F.count("*").over(win).alias("wn"),
    ).where(F.col("wn") == w)
    return sel.select(
        "read_id",
        F.substring("mk", 1, k).alias("kmer"),
        F.substring("mk", k + 1, 4).cast("int").alias("pos"),
    ).distinct()


def q_asm_minimizers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-read minimizer sketch itself (see :func:`_minimizers`)."""
    return _minimizers(spark, sf_dir).orderBy("read_id", "pos", "kmer")


# Shared CTE prefix: read derivation + windowed minimizer selection,
# mirroring _minimizers exactly (same string-encoded argmin).
_MINIMIZER_CTE = """
    r AS (
      SELECT doc_id AS read_id,
             substr(rpad(regexp_replace(upper(text), '[^ACGT]', '', 'g'), 40, 'A'),
                    1, CAST(24 + (doc_id%5)*4 AS INT)) AS content
      FROM documents WHERE doc_id < 200
    ), km AS (
      SELECT read_id, u.pos AS pos, u.kmer AS kmer FROM (
        SELECT read_id,
               unnest(list_transform(range(1, length(content) - 3),
                 i -> struct_pack(pos := i,
                                  kmer := substr(content, CAST(i AS INT), 5)))) AS u
        FROM r)
    ), sel AS (
      SELECT read_id,
             min(kmer || lpad(CAST(pos AS VARCHAR), 4, '0')) OVER
               (PARTITION BY read_id ORDER BY pos
                ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mk,
             count(*) OVER
               (PARTITION BY read_id ORDER BY pos
                ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wn
      FROM km
    ), mins AS (
      SELECT DISTINCT read_id, substr(mk, 1, 5) AS kmer,
             CAST(substr(mk, 6, 4) AS INT) AS pos
      FROM sel WHERE wn = 4
    )"""


register(
    "q_asm_minimizers",
    q_asm_minimizers,
    f"""
    WITH {_MINIMIZER_CTE}
    SELECT read_id, kmer, pos FROM mins ORDER BY read_id, pos, kmer
    """,
)


MINIMIZER_MAX_POSTING = 8


def q_asm_minimizer_overlaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimizer-seeded read-overlap candidates (minimap-style seeding):
    reads sharing >= 2 distinct minimizer k-mers, after masking
    minimizers present in more than MINIMIZER_MAX_POSTING reads —
    minimap2's high-frequency filter, and the same posting-list cap as
    the winnowing index (operators/text.py winnow pairs): repetitive
    seeds (here: the homopolymer padding runs) would otherwise create
    O(hub²) candidate pairs. The reference finds overlaps by exhaustive
    scoring of declared edges (assembly_final.cpp:251-325); minimizer
    seeding is how an assembler FINDS those edges at sequencing scale
    without all-pairs comparison.

    Scale shape: candidate generation is an equi-join on the minimizer
    key with per-key fan-out bounded by the posting cap, so the pair
    shuffle is O(n_minimizers x cap), never O(reads²).
    """
    from pyspark.sql import functions as F

    mins = _minimizers(spark, sf_dir).select("read_id", "kmer").distinct()
    rare = (
        mins.groupBy("kmer")
        .agg(F.count("*").alias("_df"))
        .where(F.col("_df") <= MINIMIZER_MAX_POSTING)
        .select("kmer")
    )
    m = mins.join(rare, "kmer")
    a = m.select(F.col("kmer"), F.col("read_id").alias("read_a"))
    b = m.select(F.col("kmer"), F.col("read_id").alias("read_b"))
    return (
        a.join(b, "kmer")
        .where(F.col("read_a") < F.col("read_b"))
        .groupBy("read_a", "read_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
        .where(F.col("n_shared") >= 2)
        .orderBy("read_a", "read_b")
    )


register(
    "q_asm_minimizer_overlaps",
    q_asm_minimizer_overlaps,
    f"""
    WITH {_MINIMIZER_CTE}, m AS (
      SELECT DISTINCT read_id, kmer FROM mins
    ), rare AS (
      SELECT kmer FROM m GROUP BY kmer
      HAVING count(*) <= {MINIMIZER_MAX_POSTING}
    ), mr AS (
      SELECT m.read_id, m.kmer FROM m JOIN rare USING (kmer)
    )
    SELECT m1.read_id AS read_a, m2.read_id AS read_b,
           CAST(count(*) AS BIGINT) AS n_shared
    FROM mr m1 JOIN mr m2
      ON m1.kmer = m2.kmer AND m1.read_id < m2.read_id
    GROUP BY 1, 2 HAVING count(*) >= 2
    ORDER BY read_a, read_b
    """,
)


def q_asm_coverage_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-position coverage depth of an aligned read set, as change
    points — the assembly QA profile (where the pileup is, where the
    gaps the merge pads with 'N' will be; the reference's merge-case
    analysis at assembly_final.cpp:469-595 is exactly a walk over this
    profile's 0/overlap transitions).

    Classic sweep-line: each read [start, start+len) contributes +1 at
    start and -1 at end; coverage after position p = prefix sum of
    deltas through p. Plan shape for 100 TB: deltas are 2 narrow rows
    per read, the per-position aggregate is one map-side-combined
    shuffle bounded by |distinct breakpoints|, and the prefix sum is
    two_phase_cumsum (range-partitioned partials + broadcast offsets —
    no global single-task window). Output is |breakpoints| rows, not
    genome length.
    """
    from pyspark.sql import functions as F

    from bigdatagenomic_spark.operators.scale import two_phase_cumsum
    from bigdatagenomic_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    base = docs.select(
        ((F.col("doc_id") * 37) % 1000).cast("long").alias("start"),
        (F.lit(20) + F.col("doc_id") % 31).cast("long").alias("len"),
    )
    deltas = (
        base.select(F.col("start").alias("pos"), F.lit(1).alias("d"))
        .unionByName(
            base.select((F.col("start") + F.col("len")).alias("pos"),
                        F.lit(-1).alias("d"))
        )
        .groupBy("pos")
        .agg(F.sum("d").cast("long").alias("delta"))
    )
    cov = two_phase_cumsum(
        deltas, "delta", [F.asc("pos")], out_col="coverage"
    )
    return cov.select("pos", "delta", "coverage").orderBy("pos")


register(
    "q_asm_coverage_depth",
    q_asm_coverage_depth,
    """
    WITH r AS (
      SELECT CAST((doc_id * 37) % 1000 AS BIGINT) AS start,
             CAST(20 + doc_id % 31 AS BIGINT) AS len
      FROM documents WHERE doc_id < 200
    ), deltas AS (
      SELECT pos, CAST(sum(d) AS BIGINT) AS delta FROM (
        SELECT start AS pos, 1 AS d FROM r
        UNION ALL
        SELECT start + len AS pos, -1 AS d FROM r)
      GROUP BY pos
    )
    SELECT pos, delta,
           CAST(sum(delta) OVER (ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS coverage
    FROM deltas ORDER BY pos
    """,
)


def q_asm_gc_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-read GC content over the derived ACGT read set (same
    derivation as q_asm_kmer_counts) — the base-composition QC every
    sequencing pipeline runs before assembly (GC bias skews coverage;
    the reference's input loader at assembly_final.cpp:73-145 ingests
    reads with no composition check at all).

    Map-only: two regexp strips and a length difference per read; no
    shuffle, no explode."""
    from pyspark.sql import functions as F

    from bigdatagenomic_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 60)
    length = (F.lit(13) + (F.col("doc_id") % 3) * 2).cast("int")
    cleaned = F.regexp_replace(F.upper("text"), "[^ACGT]", "")
    reads = docs.select(
        "doc_id",
        F.substring(F.rpad(cleaned, 17, "A"), F.lit(1), length).alias("content"),
    )
    gc = F.length(F.regexp_replace("content", "[AT]", ""))
    return reads.select(
        "doc_id",
        F.length("content").cast("long").alias("read_len"),
        gc.cast("long").alias("gc"),
        F.round(gc / F.length("content").cast("double"), 4).alias("gc_frac"),
    ).orderBy("doc_id")


register(
    "q_asm_gc_content",
    q_asm_gc_content,
    """
    WITH r AS (
      SELECT doc_id,
             substr(rpad(regexp_replace(upper(text), '[^ACGT]', '', 'g'),
                         17, 'A'),
                    1, CAST(13 + (doc_id%3)*2 AS INT)) AS content
      FROM documents WHERE doc_id < 60
    )
    SELECT doc_id,
           CAST(length(content) AS BIGINT) AS read_len,
           CAST(length(regexp_replace(content, '[AT]', '', 'g')) AS BIGINT)
             AS gc,
           round(length(regexp_replace(content, '[AT]', '', 'g'))
                 / CAST(length(content) AS DOUBLE), 4) AS gc_frac
    FROM r ORDER BY doc_id
    """,
)


def q_asm_kmer_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-read k-mer (k=3) Shannon entropy over the derived ACGT read
    set — the sequence-complexity screen that complements the DUST
    collision-mass test (q_asm_low_complexity): homopolymer runs and
    short-period repeats concentrate the k-mer distribution and score
    low; SDUST/BBDuk-style pipelines gate reads on exactly this
    statistic before assembly.

    Same row-local machinery as q_text_entropy: the k-mer list, sorted
    distinct k-mers, per-k-mer counts and the entropy fold are all
    single-row array expressions — map-only, no explode, no shuffle;
    both engines fold in the same sorted order and the transcendental
    is snapped at the 1e-4 grid.
    """
    from pyspark.sql import functions as F

    from bigdatagenomic_spark.functions import let_bound
    from bigdatagenomic_spark.sources.tables import load_table

    k = 3
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 60)
    length = (F.lit(13) + (F.col("doc_id") % 3) * 2).cast("int")
    cleaned = F.regexp_replace(F.upper("text"), "[^ACGT]", "")
    reads = docs.select(
        "doc_id",
        F.substring(F.rpad(cleaned, 17, "A"), F.lit(1), length).alias("content"),
    )

    def ent_cols(kl):
        types = F.array_sort(F.array_distinct(kl))
        counts = F.transform(
            types,
            lambda c: F.size(F.filter(kl, lambda x: x == c)).cast("double"),
        )
        n = F.size(kl).cast("double")
        s = F.aggregate(
            counts, F.lit(0.0), lambda acc, c: acc + c * F.log(c)
        )
        return F.struct(
            F.size(kl).cast("long").alias("n_kmers"),
            F.size(types).cast("long").alias("n_distinct"),
            (F.floor((F.log(n) - s / n) * 10000 + F.lit(0.5)) / 10000).alias(
                "ent"
            ),
        )

    # char_shingles emits ALL 1-based substrings incl. short tails;
    # keep only full-length k-mers (the kmer_counts contract), and keep
    # duplicates — entropy needs the multiset, so shingle positions are
    # enumerated directly (char_shingles dedups)
    pos = F.sequence(F.lit(1), F.length("content") - F.lit(k - 1))
    kmers = F.transform(pos, lambda i: F.substring("content", i, F.lit(k)))
    s1 = reads.select("doc_id", let_bound(kmers, ent_cols).alias("_e"))
    return s1.select(
        "doc_id", "_e.n_kmers", "_e.n_distinct", "_e.ent"
    ).orderBy("doc_id")


register(
    "q_asm_kmer_entropy",
    q_asm_kmer_entropy,
    """
    WITH r AS (
      SELECT doc_id,
             substr(rpad(regexp_replace(upper(text), '[^ACGT]', '', 'g'),
                         17, 'A'),
                    1, CAST(13 + (doc_id%3)*2 AS INT)) AS content
      FROM documents WHERE doc_id < 60
    ), kl AS (
      SELECT doc_id,
             list_transform(range(1, length(content) - 1),
                            i -> substr(content, CAST(i AS INT), 3)) AS km
      FROM r
    ), base AS (
      SELECT doc_id, CAST(len(km) AS BIGINT) AS n_kmers,
             list_transform(list_sort(list_distinct(km)),
                            c -> CAST(len(list_filter(km, x -> x = c))
                                      AS DOUBLE)) AS counts
      FROM kl
    )
    SELECT doc_id, n_kmers, CAST(len(counts) AS BIGINT) AS n_distinct,
           floor((ln(CAST(n_kmers AS DOUBLE))
                  - list_sum(list_transform(counts, c -> c * ln(c)))
                    / CAST(n_kmers AS DOUBLE)) * 10000 + 0.5) / 10000 AS ent
    FROM base ORDER BY doc_id
    """,
)


def q_asm_gc_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GC-skew profile over the derived read set: per-read
    ``(G-C)/(G+C)`` plus the CUMULATIVE G-C difference in read order —
    the classic replication-origin detector (the cumulative skew's
    minimum marks oriC in bacterial genomes; Lobry 1996). Per-read
    skew is the truncated integer micro-ratio; the cumulative track
    runs through :func:`two_phase_cumsum` (integral G-C values, total
    order on doc_id), so there is NO single-partition window at any
    read count — the same scale machinery as the coverage sweep-line.
    """
    from pyspark.sql import functions as F

    from bigdatagenomic_spark.operators.scale import two_phase_cumsum
    from bigdatagenomic_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 60)
    length = (F.lit(13) + (F.col("doc_id") % 3) * 2).cast("int")
    cleaned = F.regexp_replace(F.upper("text"), "[^ACGT]", "")
    reads = docs.select(
        "doc_id",
        F.substring(F.rpad(cleaned, 17, "A"), F.lit(1), length).alias("content"),
    )
    g = F.length("content") - F.length(F.regexp_replace("content", "G", ""))
    c = F.length("content") - F.length(F.regexp_replace("content", "C", ""))
    base = reads.select(
        "doc_id",
        g.cast("long").alias("g"),
        c.cast("long").alias("c"),
        (g - c).cast("long").alias("gc_diff"),
    )
    cum = two_phase_cumsum(
        base, "gc_diff", [F.col("doc_id").asc()], out_col="cum_gc_diff"
    )
    return cum.select(
        "doc_id",
        "g",
        "c",
        F.when(
            F.col("g") + F.col("c") > 0,
            F.expr("(g - c) * 1000000 div (g + c)"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("skew_micro"),
        "cum_gc_diff",
    ).orderBy("doc_id")


register(
    "q_asm_gc_skew",
    q_asm_gc_skew,
    """
    WITH r AS (
      SELECT doc_id,
             substr(rpad(regexp_replace(upper(text), '[^ACGT]', '', 'g'),
                         17, 'A'),
                    1, CAST(13 + (doc_id%3)*2 AS INT)) AS content
      FROM documents WHERE doc_id < 60
    ), base AS (
      SELECT doc_id,
             CAST(length(content)
                  - length(regexp_replace(content, 'G', '', 'g')) AS BIGINT) AS g,
             CAST(length(content)
                  - length(regexp_replace(content, 'C', '', 'g')) AS BIGINT) AS c
      FROM r
    )
    SELECT doc_id, g, c,
           CASE WHEN g + c > 0 THEN (g - c) * 1000000 // (g + c)
                ELSE 0 END AS skew_micro,
           CAST(sum(g - c) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_gc_diff
    FROM base ORDER BY doc_id
    """,
)


MASH_K = 5
MASH_GROUPS = 4
MASH_READS = 200


def q_asm_mash_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mash-style genome distance between read groups (Ondov et al.
    2016): canonical k-mer sets per group, pairwise Jaccard, and the
    Mash distance ``d = -ln(2j/(1+j)) / k`` — the sketch-based
    alternative to alignment for all-vs-all genome comparison. Groups
    here are the ``doc_id % 4`` read bins (4 pseudo-genomes over the
    derived read set); the Jaccard is EXACT (the MinHash estimator and
    its calibration live in q_dedup_minhash_est — this op pins the
    distance transform on the exact value).

    Plan shape: per-group distinct canonical k-mers (map-only shingles
    + one dedup shuffle on the (group, kmer) key), pair counts via ONE
    self-equi-join on the k-mer key (groups are bounded, k-mer space
    ≤ 4^k/2 — never an all-pairs read join), set sizes broadcast back.
    The transcendental snaps at the 1e-4 grid (the dsir pattern);
    every other column is an exact integer or a round-4 ratio.
    """
    from pyspark.sql import functions as F

    from bigdatagenomic_spark.functions import char_shingles
    from bigdatagenomic_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < MASH_READS
    )
    length = (F.lit(13) + (F.col("doc_id") % 3) * 2).cast("int")
    cleaned = F.regexp_replace(F.upper("text"), "[^ACGT]", "")
    reads = docs.select(
        (F.col("doc_id") % MASH_GROUPS).cast("int").alias("grp"),
        F.substring(F.rpad(cleaned, 17, "A"), F.lit(1), length).alias("content"),
    )
    km = reads.select(
        "grp",
        F.explode(
            F.filter(
                char_shingles(F.col("content"), MASH_K),
                lambda s: F.length(s) == MASH_K,
            )
        ).alias("kmer"),
    )
    rc = F.reverse(F.translate(F.col("kmer"), "ACGT", "TGCA"))
    sets = km.select("grp", F.least(F.col("kmer"), rc).alias("canon")).distinct()
    sizes = sets.groupBy("grp").agg(F.count("*").cast("long").alias("n"))
    a = sets.select(F.col("grp").alias("g_a"), "canon")
    b = sets.select(F.col("grp").alias("g_b"), "canon")
    common = (
        a.join(b, "canon")
        .where(F.col("g_a") < F.col("g_b"))
        .groupBy("g_a", "g_b")
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    j = F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    return (
        common.join(
            F.broadcast(sizes.select(F.col("grp").alias("g_a"), F.col("n").alias("n_a"))),
            "g_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("grp").alias("g_b"), F.col("n").alias("n_b"))),
            "g_b",
        )
        .select(
            "g_a",
            "g_b",
            "n_a",
            "n_b",
            "n_common",
            # Integer-exact Jaccard (codebase convention: *_micro BIGINTs,
            # never a float round at the engine/oracle boundary — a
            # representable tie like j = 1/32 rounds differently under
            # Spark HALF_UP vs CPython banker's rounding).
            F.expr(
                "n_common * 1000000L div (n_a + n_b - n_common)"
            ).alias("jacc_micro"),
            (
                F.floor(
                    (-F.log(F.lit(2.0) * j / (F.lit(1.0) + j)) / MASH_K) * 10000
                    + F.lit(0.5)
                )
                / 10000
            ).alias("mash_d"),
        )
        .orderBy("g_a", "g_b")
    )


register(
    "q_asm_mash_distance",
    q_asm_mash_distance,
    f"""
    WITH r AS (
      SELECT CAST(doc_id % {MASH_GROUPS} AS INT) AS grp,
             substr(rpad(regexp_replace(upper(text), '[^ACGT]', '', 'g'),
                         17, 'A'),
                    1, CAST(13 + (doc_id%3)*2 AS INT)) AS content
      FROM documents WHERE doc_id < {MASH_READS}
    ), km AS (
      SELECT grp,
             unnest(list_transform(
                 range(1, greatest(length(content) - {MASH_K - 1}, 1) + 1),
                 i -> substr(content, i, {MASH_K}))) AS kmer
      FROM r
    ), sets AS (
      SELECT DISTINCT grp,
             least(kmer, reverse(translate(kmer, 'ACGT', 'TGCA'))) AS canon
      FROM km WHERE length(kmer) = {MASH_K}
    ), sizes AS (
      SELECT grp, CAST(count(*) AS BIGINT) AS n FROM sets GROUP BY grp
    ), common AS (
      SELECT a.grp AS g_a, b.grp AS g_b, CAST(count(*) AS BIGINT) AS n_common
      FROM sets a JOIN sets b ON a.canon = b.canon AND a.grp < b.grp
      GROUP BY 1, 2
    )
    SELECT c.g_a, c.g_b, sa.n AS n_a, sb.n AS n_b, c.n_common,
           CAST(c.n_common * 1000000 // (sa.n + sb.n - c.n_common) AS BIGINT)
             AS jacc_micro,
           floor((-ln(2.0 * (c.n_common / CAST(sa.n + sb.n - c.n_common
                                                AS DOUBLE))
                      / (1.0 + c.n_common / CAST(sa.n + sb.n - c.n_common
                                                 AS DOUBLE)))
                  / {MASH_K}) * 10000 + 0.5) / 10000 AS mash_d
    FROM common c
    JOIN sizes sa ON c.g_a = sa.grp
    JOIN sizes sb ON c.g_b = sb.grp
    ORDER BY c.g_a, c.g_b
    """,
)


def q_asm_overlap_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of overlap lengths between consecutive aligned reads
    (reads sorted by alignment start; overlap = prev_end - start,
    negative = gap): the assembly pre-check that says whether a merge
    path can exist at all — the reference's merge cases A1-D
    (assembly_final.cpp:473-595) branch exactly on this sign. Same
    derived interval set as q_asm_coverage_depth.

    The adjacent-pair pass is a lag window over the BOUNDED 200-read
    sample (documented bounded-window contract); the production form
    partitions by contig/chromosome, which bounds every partition the
    same way.
    """
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from bigdatagenomic_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    iv = docs.select(
        "doc_id",
        ((F.col("doc_id") * 37) % 1000).cast("long").alias("start"),
        (F.lit(20) + F.col("doc_id") % 31).cast("long").alias("len"),
    )
    w = W.orderBy("start", "doc_id")
    adj = iv.select(
        "start",
        (F.lag(F.col("start") + F.col("len")).over(w) - F.col("start")).alias(
            "overlap"
        ),
    ).where(F.col("overlap").isNotNull())
    return (
        adj.groupBy(F.floor(F.col("overlap") / 10).cast("long").alias("bin"))
        .agg(
            F.count("*").alias("n_pairs"),
            F.min("overlap").cast("long").alias("min_ov"),
            F.max("overlap").cast("long").alias("max_ov"),
        )
        .orderBy("bin")
    )


register(
    "q_asm_overlap_hist",
    q_asm_overlap_hist,
    """
    WITH iv AS (
      SELECT doc_id, CAST((doc_id * 37) % 1000 AS BIGINT) AS start,
             CAST(20 + doc_id % 31 AS BIGINT) AS len
      FROM documents WHERE doc_id < 200
    ), adj AS (
      SELECT start,
             lag(start + len) OVER (ORDER BY start, doc_id) - start AS overlap
      FROM iv
    )
    SELECT CAST(floor(overlap / 10.0) AS BIGINT) AS bin,
           count(*) AS n_pairs,
           CAST(min(overlap) AS BIGINT) AS min_ov,
           CAST(max(overlap) AS BIGINT) AS max_ov
    FROM adj WHERE overlap IS NOT NULL
    GROUP BY 1 ORDER BY bin
    """,
)


def q_asm_kmer_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-mer multiplicity spectrum: how many distinct k-mers occur
    exactly m times — the coverage histogram every assembler inspects
    to separate sequencing errors (multiplicity 1 spike) from true
    coverage (the main mode); q_asm_error_correct's threshold is read
    off this plot. Second-order aggregate of q_asm_kmer_counts: two
    map-side-combined shuffles, output bounded by max multiplicity.
    """
    from pyspark.sql import functions as F

    counts = q_asm_kmer_counts(spark, sf_dir)
    return (
        counts.groupBy(F.col("c").alias("multiplicity"))
        .agg(F.count("*").cast("long").alias("n_kmers"))
        .orderBy("multiplicity")
    )


register(
    "q_asm_kmer_spectrum",
    q_asm_kmer_spectrum,
    """
    WITH r AS (
      SELECT substr(rpad(regexp_replace(upper(text), '[^ACGT]', '', 'g'), 17, 'A'),
                    1, CAST(13 + (doc_id%3)*2 AS INT)) AS content
      FROM documents WHERE doc_id < 60
    ), km AS (
      SELECT unnest(list_transform(range(1, greatest(length(content) - 4, 1) + 1),
                                   i -> substr(content, i, 5))) AS kmer
      FROM r
    ), kc AS (
      SELECT kmer, count(*) AS c FROM km WHERE length(kmer) = 5 GROUP BY kmer
    )
    SELECT c AS multiplicity, CAST(count(*) AS BIGINT) AS n_kmers
    FROM kc GROUP BY c ORDER BY multiplicity
    """,
)


def _derived_kmers(spark: SparkSession, sf_dir: str, n: int = 60, k: int = 5):
    """Shared k-mer derivation for the de Bruijn family (the same
    derived read set as q_asm_kmer_counts): map-only shingle per read,
    exact-length k-mers only."""
    from pyspark.sql import functions as F

    from bigdatagenomic_spark.functions import char_shingles
    from bigdatagenomic_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < n)
    length = (F.lit(13) + (F.col("doc_id") % 3) * 2).cast("int")
    cleaned = F.regexp_replace(F.upper("text"), "[^ACGT]", "")
    reads = docs.select(
        F.substring(F.rpad(cleaned, 17, "A"), F.lit(1), length).alias("content")
    )
    return reads.select(
        F.explode(
            F.filter(char_shingles(F.col("content"), k), lambda s: F.length(s) == k)
        ).alias("kmer")
    )


def q_asm_debruijn_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """de Bruijn graph construction over the derived read set: every
    k-mer contributes the edge (k-1-mer prefix) -> (k-1-mer suffix),
    weighted by multiplicity — the OTHER assembly paradigm next to the
    reference's overlap graph (assembly_final.cpp builds overlaps from
    aligned offsets; de Bruijn assemblers build this edge multiset and
    walk Eulerian paths). Same derived reads as q_asm_kmer_counts.

    Plan: map-only shingle per read, one map-side-combined count
    shuffle on the (prefix, suffix) key — at most 4^k distinct edges
    per partition after partial aggregation, any corpus size.
    """
    from pyspark.sql import functions as F

    k = 5
    kmers = _derived_kmers(spark, sf_dir, n=60, k=k)
    return (
        kmers.select(
            F.substring("kmer", 1, k - 1).alias("prefix"),
            F.substring("kmer", 2, k - 1).alias("suffix"),
        )
        .groupBy("prefix", "suffix")
        .agg(F.count("*").cast("long").alias("multiplicity"))
        .orderBy("prefix", "suffix")
    )


register(
    "q_asm_debruijn_edges",
    q_asm_debruijn_edges,
    """
    WITH r AS (
      SELECT substr(rpad(regexp_replace(upper(text), '[^ACGT]', '', 'g'), 17, 'A'),
                    1, CAST(13 + (doc_id%3)*2 AS INT)) AS content
      FROM documents WHERE doc_id < 60
    ), km AS (
      SELECT unnest(list_transform(range(1, greatest(length(content) - 4, 1) + 1),
                                   i -> substr(content, i, 5))) AS kmer
      FROM r
    )
    SELECT substr(kmer, 1, 4) AS prefix, substr(kmer, 2, 4) AS suffix,
           CAST(count(*) AS BIGINT) AS multiplicity
    FROM km WHERE length(kmer) = 5
    GROUP BY 1, 2 ORDER BY prefix, suffix
    """,
)


def q_asm_canonical_kmers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strand-neutral (canonical) k-mer spectrum: every k-mer is
    counted under min(kmer, reverse_complement(kmer)) — the universal
    convention of sequencing tools (Jellyfish, KMC, minimap2), since a
    read may come from either DNA strand and ACGTA and TACGT are the
    same molecule. Alongside the total, the per-strand split — a
    strongly skewed split flags strand-biased library prep.

    Plan: identical to q_asm_kmer_counts (map-only shingles, one
    map-side-combined count shuffle, ≤ 4^k/2 canonical keys) — the
    canonicalization is two string built-ins (translate + reverse),
    JVM-side, no UDF.
    """
    from pyspark.sql import functions as F

    kmers = _derived_kmers(spark, sf_dir, n=60, k=5)
    rc = F.reverse(F.translate(F.col("kmer"), "ACGT", "TGCA"))
    tagged = kmers.select(
        F.least(F.col("kmer"), rc).alias("canon"),
        (F.col("kmer") <= rc).cast("int").alias("is_fwd"),
    )
    return (
        tagged.groupBy("canon")
        .agg(
            F.count("*").cast("long").alias("n_total"),
            F.sum("is_fwd").cast("long").alias("n_fwd"),
            F.sum(1 - F.col("is_fwd")).cast("long").alias("n_rc"),
        )
        .orderBy(F.desc("n_total"), F.asc("canon"))
    )


register(
    "q_asm_canonical_kmers",
    q_asm_canonical_kmers,
    """
    WITH r AS (
      SELECT substr(rpad(regexp_replace(upper(text), '[^ACGT]', '', 'g'), 17, 'A'),
                    1, CAST(13 + (doc_id%3)*2 AS INT)) AS content
      FROM documents WHERE doc_id < 60
    ), km AS (
      SELECT unnest(list_transform(range(1, greatest(length(content) - 4, 1) + 1),
                                   i -> substr(content, i, 5))) AS kmer
      FROM r
    ), tagged AS (
      SELECT least(kmer, reverse(translate(kmer, 'ACGT', 'TGCA'))) AS canon,
             CASE WHEN kmer <= reverse(translate(kmer, 'ACGT', 'TGCA'))
                  THEN 1 ELSE 0 END AS is_fwd
      FROM km WHERE length(kmer) = 5
    )
    SELECT canon, CAST(count(*) AS BIGINT) AS n_total,
           CAST(sum(is_fwd) AS BIGINT) AS n_fwd,
           CAST(sum(1 - is_fwd) AS BIGINT) AS n_rc
    FROM tagged GROUP BY canon ORDER BY n_total DESC, canon
    """,
)


def q_asm_bubbles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SNP/error-bubble detection in the derived de Bruijn graph.

    A single-base difference between otherwise-identical sequences
    creates two parallel paths of exactly k edges between a shared
    (k-1)-mer src and dst (the divergent base rides through k-1
    intermediate nodes before washing out) — the structure an
    assembler's bubble-popping pass removes (the reference's merge
    handles only linear chains, assembly_final.cpp:402-624; bubbles
    are exactly what breaks that assumption). A length-2-path "simple
    bubble" over (k-1)-mer nodes is structurally IMPOSSIBLE (two mids
    from one src differ only in their last char, so their successors
    differ too) — the k-edge form is the real contract.

    The read set plants the structure deterministically: every derived
    read plus a copy with base 7 flipped (A↔C) — the controlled
    sequencing-error model, so the detector's output is non-degenerate
    at any SF. Detection = the distinct edge set chained through four
    self-joins (5 edges total), endpoints excluded from the interior,
    then one count-distinct-interior shuffle on (src, dst). Fan-out is
    bounded by the DNA alphabet: de Bruijn out-degree <= 4, so the
    path join emits at most 4^5 rows per src at ANY corpus scale —
    candidate generation stays an equi-join chain, never all-pairs.
    """
    from pyspark.sql import functions as F

    from bigdatagenomic_spark.functions import char_shingles
    from bigdatagenomic_spark.sources.tables import load_table

    k = 5
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 60)
    length = (F.lit(13) + (F.col("doc_id") % 3) * 2).cast("int")
    cleaned = F.regexp_replace(F.upper("text"), "[^ACGT]", "")
    base = docs.select(
        F.substring(F.rpad(cleaned, 17, "A"), F.lit(1), length).alias("content")
    )
    mutant = base.select(
        F.concat(
            F.substring("content", 1, 6),
            F.when(F.substring("content", 7, 1) == "A", F.lit("C")).otherwise(
                F.lit("A")
            ),
            F.expr("substring(content, 8)"),
        ).alias("content")
    )
    reads = base.unionByName(mutant)
    kmers = reads.select(
        F.explode(
            F.filter(char_shingles(F.col("content"), k), lambda s: F.length(s) == k)
        ).alias("kmer")
    )
    edges = (
        kmers.select(
            F.substring("kmer", 1, k - 1).alias("src"),
            F.substring("kmer", 2, k - 1).alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    hops = [edges.alias(f"e{i}") for i in range(1, 6)]
    p = (
        hops[0]
        .join(hops[1], F.col("e1.dst") == F.col("e2.src"))
        .join(hops[2], F.col("e2.dst") == F.col("e3.src"))
        .join(hops[3], F.col("e3.dst") == F.col("e4.src"))
        .join(hops[4], F.col("e4.dst") == F.col("e5.src"))
        .select(
            F.col("e1.src").alias("src"),
            F.col("e1.dst").alias("m1"),
            F.col("e2.dst").alias("m2"),
            F.col("e3.dst").alias("m3"),
            F.col("e4.dst").alias("m4"),
            F.col("e5.dst").alias("dst"),
        )
        .where(
            (F.col("src") != F.col("dst"))
            & (F.col("m1") != F.col("src")) & (F.col("m1") != F.col("dst"))
            & (F.col("m2") != F.col("src")) & (F.col("m2") != F.col("dst"))
            & (F.col("m3") != F.col("src")) & (F.col("m3") != F.col("dst"))
            & (F.col("m4") != F.col("src")) & (F.col("m4") != F.col("dst"))
        )
    )
    return (
        p.groupBy("src", "dst")
        .agg(
            F.countDistinct(
                F.struct("m1", "m2", "m3", "m4")
            ).cast("long").alias("n_paths")
        )
        .where(F.col("n_paths") >= 2)
        .orderBy("src", "dst")
    )


register(
    "q_asm_bubbles",
    q_asm_bubbles,
    """
    WITH r0 AS (
      SELECT substr(rpad(regexp_replace(upper(text), '[^ACGT]', '', 'g'), 17, 'A'),
                    1, CAST(13 + (doc_id%3)*2 AS INT)) AS content
      FROM documents WHERE doc_id < 60
    ), r AS (
      SELECT content FROM r0
      UNION ALL
      SELECT substr(content, 1, 6) ||
             CASE WHEN substr(content, 7, 1) = 'A' THEN 'C' ELSE 'A' END ||
             substr(content, 8) FROM r0
    ), km AS (
      SELECT unnest(list_transform(range(1, greatest(length(content) - 4, 1) + 1),
                                   i -> substr(content, i, 5))) AS kmer
      FROM r
    ), e AS (
      SELECT DISTINCT substr(kmer, 1, 4) AS src, substr(kmer, 2, 4) AS dst
      FROM km WHERE length(kmer) = 5 AND substr(kmer, 1, 4) <> substr(kmer, 2, 4)
    ), p AS (
      SELECT e1.src AS src, e1.dst AS m1, e2.dst AS m2, e3.dst AS m3,
             e4.dst AS m4, e5.dst AS dst
      FROM e e1 JOIN e e2 ON e1.dst = e2.src JOIN e e3 ON e2.dst = e3.src
           JOIN e e4 ON e3.dst = e4.src JOIN e e5 ON e4.dst = e5.src
      WHERE e1.src <> e5.dst
        AND m1 NOT IN (e1.src, e5.dst) AND m2 NOT IN (e1.src, e5.dst)
        AND m3 NOT IN (e1.src, e5.dst) AND m4 NOT IN (e1.src, e5.dst)
    )
    SELECT src, dst,
           CAST(count(DISTINCT (m1, m2, m3, m4)) AS BIGINT) AS n_paths
    FROM p GROUP BY src, dst HAVING count(DISTINCT (m1, m2, m3, m4)) >= 2
    ORDER BY 1, 2
    """,
)


def q_asm_low_complexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DUST-style low-complexity screening of the derived read set:
    per read, the triplet-multiset collision mass
    ``num = Σ c·(c−1)`` over 3-mer counts c and ``den = n_triplets − 1``
    (twice the classic DUST numerator — kept integer, no division),
    with the mask flag from the cross-multiplied threshold
    ``num·5 > den·7`` (== DUST score > 0.7). Low-complexity reads
    (homopolymer runs, short tandem repeats) are masked before
    overlap/alignment in every production pipeline (BLAST's DUST,
    minimap2's repeat masking) — left in, they create the hub k-mers
    the minimizer posting cap has to drop.

    Plan: map-only 3-mer shingle, one (read, tri) count shuffle, one
    per-read sum — all integer-exact, so the oracle hash-matches with
    no float tolerance games.
    """
    from pyspark.sql import functions as F

    from bigdatagenomic_spark.functions import char_shingles
    from bigdatagenomic_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 60)
    length = (F.lit(13) + (F.col("doc_id") % 3) * 2).cast("int")
    cleaned = F.regexp_replace(F.upper("text"), "[^ACGT]", "")
    reads = docs.select(
        F.col("doc_id").alias("read_id"),
        F.substring(F.rpad(cleaned, 17, "A"), F.lit(1), length).alias("content"),
    )
    tris = reads.select(
        "read_id",
        F.explode(
            F.filter(char_shingles(F.col("content"), 3), lambda s: F.length(s) == 3)
        ).alias("tri"),
    )
    tc = tris.groupBy("read_id", "tri").agg(F.count("*").alias("c"))
    sc = tc.groupBy("read_id").agg(
        F.sum(F.col("c") * (F.col("c") - 1)).cast("long").alias("dust_num"),
        (F.sum("c") - 1).cast("long").alias("dust_den"),
    )
    return sc.select(
        "read_id",
        "dust_num",
        "dust_den",
        F.when(
            F.col("dust_num") * 5 > F.col("dust_den") * 7, F.lit(1)
        ).otherwise(F.lit(0)).cast("int").alias("low_complexity"),
    ).orderBy("read_id")


register(
    "q_asm_low_complexity",
    q_asm_low_complexity,
    """
    WITH r AS (
      SELECT doc_id AS read_id,
             substr(rpad(regexp_replace(upper(text), '[^ACGT]', '', 'g'), 17, 'A'),
                    1, CAST(13 + (doc_id%3)*2 AS INT)) AS content
      FROM documents WHERE doc_id < 60
    ), km AS (
      SELECT read_id,
             unnest(list_transform(range(1, greatest(length(content) - 2, 1) + 1),
                                   i -> substr(content, i, 3))) AS tri
      FROM r
    ), tc AS (
      SELECT read_id, tri, count(*) AS c FROM km
      WHERE length(tri) = 3 GROUP BY 1, 2
    ), sc AS (
      SELECT read_id, CAST(sum(c * (c - 1)) AS BIGINT) AS dust_num,
             CAST(sum(c) - 1 AS BIGINT) AS dust_den
      FROM tc GROUP BY read_id
    )
    SELECT read_id, dust_num, dust_den,
           CAST(CASE WHEN dust_num * 5 > dust_den * 7 THEN 1 ELSE 0 END AS INT)
             AS low_complexity
    FROM sc ORDER BY read_id
    """,
)


def q_asm_tandem_repeats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-read tandem-repeat profile: the longest homopolymer run
    (period-1) and the longest period-2 chain (``s[i] == s[i-2]``,
    covering dinucleotide repeats AND homopolymers) in bases — the
    repeat QC that drives masking decisions and explains coverage
    anomalies (PCR slippage concentrates errors in exactly these
    runs).

    Plan: per-read char explode (bounded by read length), lag flags,
    then the gaps-and-islands run-length algebra (the q_x_error_runs
    pattern): one ``sum(not flag)`` window builds the run group id,
    one count per (read, group), one per-read max. All windows
    partition by read_id — per-read slices are bounded, no
    single-partition sort.
    """
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from bigdatagenomic_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 60)
    length = (F.lit(13) + (F.col("doc_id") % 3) * 2).cast("int")
    cleaned = F.regexp_replace(F.upper("text"), "[^ACGT]", "")
    reads = docs.select(
        F.col("doc_id").alias("read_id"),
        F.substring(F.rpad(cleaned, 17, "A"), F.lit(1), length).alias("content"),
    )
    chars = reads.select(
        "read_id",
        F.posexplode(F.split(F.col("content"), "")).alias("i", "ch"),
    ).where(F.col("ch") != "")
    w = W.partitionBy("read_id").orderBy("i")
    flagged = chars.select(
        "read_id",
        "i",
        (F.col("ch") == F.lag("ch", 1).over(w)).cast("int").alias("f1"),
        (F.col("ch") == F.lag("ch", 2).over(w)).cast("int").alias("f2"),
    ).select(
        "read_id",
        "i",
        F.coalesce("f1", F.lit(0)).alias("f1"),
        F.coalesce("f2", F.lit(0)).alias("f2"),
    )
    grp = flagged.select(
        "read_id",
        "f1",
        "f2",
        F.sum(1 - F.col("f1")).over(w.rowsBetween(W.unboundedPreceding, 0)).alias("g1"),
        F.sum(1 - F.col("f2")).over(w.rowsBetween(W.unboundedPreceding, 0)).alias("g2"),
    )
    r1 = (
        grp.where(F.col("f1") == 1)
        .groupBy("read_id", "g1")
        .agg(F.count("*").alias("n"))
        .groupBy("read_id")
        .agg(F.max("n").alias("m1"))
    )
    r2 = (
        grp.where(F.col("f2") == 1)
        .groupBy("read_id", "g2")
        .agg(F.count("*").alias("n"))
        .groupBy("read_id")
        .agg(F.max("n").alias("m2"))
    )
    return (
        reads.select("read_id")
        .join(r1, "read_id", "left")
        .join(r2, "read_id", "left")
        .select(
            "read_id",
            (F.coalesce("m1", F.lit(0)) + 1).cast("long").alias("max_homopolymer"),
            F.when(F.col("m2").isNull(), F.lit(0))
            .otherwise(F.col("m2") + 2)
            .cast("long")
            .alias("max_period2"),
        )
        .orderBy("read_id")
    )


register(
    "q_asm_tandem_repeats",
    q_asm_tandem_repeats,
    """
    WITH r AS (
      SELECT doc_id AS read_id,
             substr(rpad(regexp_replace(upper(text), '[^ACGT]', '', 'g'), 17, 'A'),
                    1, CAST(13 + (doc_id%3)*2 AS INT)) AS content
      FROM documents WHERE doc_id < 60
    ), chars AS (
      SELECT read_id, u.i AS i, u.ch AS ch FROM (
        SELECT read_id,
               unnest(list_transform(range(1, length(content) + 1),
                 i -> struct_pack(i := i, ch := substr(content, CAST(i AS INT), 1)))) AS u
        FROM r)
    ), flagged AS (
      SELECT read_id, i,
             coalesce(CAST(ch = lag(ch, 1) OVER (PARTITION BY read_id ORDER BY i) AS INT), 0) AS f1,
             coalesce(CAST(ch = lag(ch, 2) OVER (PARTITION BY read_id ORDER BY i) AS INT), 0) AS f2
      FROM chars
    ), grp AS (
      SELECT read_id, f1, f2,
             sum(1 - f1) OVER (PARTITION BY read_id ORDER BY i
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g1,
             sum(1 - f2) OVER (PARTITION BY read_id ORDER BY i
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g2
      FROM flagged
    ), r1 AS (
      SELECT read_id, max(n) AS m1 FROM (
        SELECT read_id, g1, count(*) AS n FROM grp WHERE f1 = 1 GROUP BY 1, 2)
      GROUP BY read_id
    ), r2 AS (
      SELECT read_id, max(n) AS m2 FROM (
        SELECT read_id, g2, count(*) AS n FROM grp WHERE f2 = 1 GROUP BY 1, 2)
      GROUP BY read_id
    )
    SELECT r.read_id,
           CAST(coalesce(r1.m1, 0) + 1 AS BIGINT) AS max_homopolymer,
           CAST(CASE WHEN r2.m2 IS NULL THEN 0 ELSE r2.m2 + 2 END AS BIGINT)
             AS max_period2
    FROM r LEFT JOIN r1 ON r.read_id = r1.read_id
           LEFT JOIN r2 ON r.read_id = r2.read_id
    ORDER BY r.read_id
    """,
)


def q_asm_unitigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unitig compaction over the derived de Bruijn graph — collapse
    every maximal non-branching path (and isolated cycle) of the
    (k-1)-mer graph into one labeled unitig, the core kernel a
    distributed de Bruijn assembler runs between graph construction
    and contig output (the de Bruijn analog of the reference's
    overlap-chain merge, assembly_final.cpp:402-624). Semantics and
    scale shape in operators/graph.py:unitig_compaction; the oracle
    replays it as a recursive-CTE min-label closure over the
    symmetrized unambiguous edge set plus singleton fill-in.
    """
    from pyspark.sql import functions as F

    from bigdatagenomic_spark.operators.graph import unitig_compaction

    k = 5
    kmers = _derived_kmers(spark, sf_dir, n=60, k=k)
    edges = kmers.select(
        F.substring("kmer", 1, k - 1).alias("src"),
        F.substring("kmer", 2, k - 1).alias("dst"),
    )
    return unitig_compaction(edges).orderBy("unitig_id")


register(
    "q_asm_unitigs",
    q_asm_unitigs,
    """
    WITH RECURSIVE r AS (
      SELECT substr(rpad(regexp_replace(upper(text), '[^ACGT]', '', 'g'), 17, 'A'),
                    1, CAST(13 + (doc_id%3)*2 AS INT)) AS content
      FROM documents WHERE doc_id < 60
    ), km AS (
      SELECT unnest(list_transform(range(1, greatest(length(content) - 4, 1) + 1),
                                   i -> substr(content, i, 5))) AS kmer
      FROM r
    ), e AS MATERIALIZED (
      SELECT DISTINCT substr(kmer, 1, 4) AS src, substr(kmer, 2, 4) AS dst
      FROM km WHERE length(kmer) = 5
    ), o1 AS (SELECT src FROM e GROUP BY src HAVING count(*) = 1
    ), i1 AS (SELECT dst FROM e GROUP BY dst HAVING count(*) = 1
    ), ue AS (SELECT e.src, e.dst FROM e
              JOIN o1 USING (src) JOIN i1 USING (dst)
    ), sym AS MATERIALIZED (
      -- Inside WITH RECURSIVE, DuckDB may inline plain-UNION CTEs without
      -- dedup (commit b453be9 gotcha); MATERIALIZED + DISTINCT pin the set
      -- semantics so correctness doesn't lean on the downstream GROUP BY.
      SELECT DISTINCT src, dst FROM
        (SELECT src, dst FROM ue UNION ALL SELECT dst AS src, src AS dst FROM ue)
    ), nodes AS (SELECT DISTINCT src AS id FROM e UNION SELECT dst AS id FROM e
    ), reach AS (
      SELECT id AS root, id AS node FROM nodes
      UNION
      SELECT reach.root, sym.dst AS node
      FROM reach JOIN sym ON sym.src = reach.node
    ), lab AS (SELECT root AS id, min(node) AS unitig_id FROM reach GROUP BY root)
    SELECT unitig_id, CAST(count(*) AS BIGINT) AS n_nodes,
           string_agg(id, ',' ORDER BY id) AS members
    FROM lab GROUP BY unitig_id ORDER BY unitig_id
    """,
)


def q_asm_contig_spell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contig spelling: turn each PATH unitig of the de Bruijn graph
    into its assembled sequence — head (k-1)-mer plus the last base of
    every subsequent node in chain order — the step that converts
    compacted paths into contig strings (the de Bruijn counterpart of
    the reference's per-vertex sequence stitching,
    assembly_final.cpp:402-624,631-645). Chain order + spelling live in
    operators/graph.py:spell_contigs (pointer-doubled head + depth;
    isolated cycles have no head and are excluded there — the contract
    is pinned by the planted chain+cycle parity test in test_graph.py).
    Oracle: recursive-CTE walk from the chain heads with an ordered
    string_agg.
    """
    from pyspark.sql import functions as F

    from bigdatagenomic_spark.operators.graph import spell_contigs

    k = 5
    kmers = _derived_kmers(spark, sf_dir, n=60, k=k)
    edges = kmers.select(
        F.substring("kmer", 1, k - 1).alias("src"),
        F.substring("kmer", 2, k - 1).alias("dst"),
    )
    return spell_contigs(edges, k).orderBy("unitig_id")


register(
    "q_asm_contig_spell",
    q_asm_contig_spell,
    """
    WITH RECURSIVE r AS (
      SELECT substr(rpad(regexp_replace(upper(text), '[^ACGT]', '', 'g'), 17, 'A'),
                    1, CAST(13 + (doc_id%3)*2 AS INT)) AS content
      FROM documents WHERE doc_id < 60
    ), km AS (
      SELECT unnest(list_transform(range(1, greatest(length(content) - 4, 1) + 1),
                                   i -> substr(content, i, 5))) AS kmer
      FROM r
    ), e AS MATERIALIZED (
      SELECT DISTINCT substr(kmer, 1, 4) AS src, substr(kmer, 2, 4) AS dst
      FROM km WHERE length(kmer) = 5
    ), o1 AS (SELECT src FROM e GROUP BY src HAVING count(*) = 1
    ), i1 AS (SELECT dst FROM e GROUP BY dst HAVING count(*) = 1
    ), ue AS MATERIALIZED (
      SELECT e.src, e.dst FROM e JOIN o1 USING (src) JOIN i1 USING (dst)
    ), nodes AS (SELECT src AS id FROM e UNION SELECT dst AS id FROM e
    ), heads AS (
      -- DuckDB recursive-CTE inlining gotcha (commit b453be9): inside a
      -- WITH RECURSIVE block, non-materialized plain-UNION CTEs can lose
      -- their dedup when inlined, so `nodes` may carry duplicate ids here.
      -- The walk below is UNION ALL (depth must not dedup), so duplicate
      -- heads would multiply every path -- DISTINCT is load-bearing.
      SELECT DISTINCT id FROM nodes WHERE id NOT IN (SELECT dst FROM ue)
    ), walk AS (
      SELECT id AS root, id AS node, 0 AS depth FROM heads
      UNION ALL
      SELECT walk.root, ue.dst AS node, walk.depth + 1
      FROM walk JOIN ue ON ue.src = walk.node
    )
    SELECT root AS unitig_id, CAST(count(*) AS BIGINT) AS n_nodes,
           string_agg(CASE WHEN depth = 0 THEN node
                           ELSE substr(node, 4, 1) END, '' ORDER BY depth)
             AS sequence,
           CAST(length(string_agg(CASE WHEN depth = 0 THEN node
                                       ELSE substr(node, 4, 1) END,
                                  '' ORDER BY depth)) AS BIGINT) AS seq_len
    FROM walk GROUP BY root ORDER BY unitig_id
    """,
)


def q_asm_tips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tip clipping over the derived de Bruijn graph: flag every short
    dead-end chain (exactly one dangling end, <= TIP_MAX_LEN nodes) —
    the error-artifact cleanup an assembler runs between graph build
    and unitig output. Semantics, contract, and scale shape in
    operators/graph.py:tip_unitigs (pinned there by a planted
    junction-tip test); oracle = the contig_spell head-anchored walk
    plus full-graph dangling-end flags.
    """
    from pyspark.sql import functions as F

    from bigdatagenomic_spark.operators.graph import tip_unitigs

    k = 5
    kmers = _derived_kmers(spark, sf_dir, n=60, k=k)
    edges = kmers.select(
        F.substring("kmer", 1, k - 1).alias("src"),
        F.substring("kmer", 2, k - 1).alias("dst"),
    )
    return tip_unitigs(edges).orderBy("unitig_id")


register(
    "q_asm_tips",
    q_asm_tips,
    """
    WITH RECURSIVE r AS (
      SELECT substr(rpad(regexp_replace(upper(text), '[^ACGT]', '', 'g'), 17, 'A'),
                    1, CAST(13 + (doc_id%3)*2 AS INT)) AS content
      FROM documents WHERE doc_id < 60
    ), km AS (
      SELECT unnest(list_transform(range(1, greatest(length(content) - 4, 1) + 1),
                                   i -> substr(content, i, 5))) AS kmer
      FROM r
    ), e AS MATERIALIZED (
      SELECT DISTINCT substr(kmer, 1, 4) AS src, substr(kmer, 2, 4) AS dst
      FROM km WHERE length(kmer) = 5
    ), o1 AS (SELECT src FROM e GROUP BY src HAVING count(*) = 1
    ), i1 AS (SELECT dst FROM e GROUP BY dst HAVING count(*) = 1
    ), ue AS MATERIALIZED (
      SELECT e.src, e.dst FROM e JOIN o1 USING (src) JOIN i1 USING (dst)
    ), nodes AS (SELECT src AS id FROM e UNION SELECT dst AS id FROM e
    ), heads AS (
      -- DISTINCT is load-bearing under DuckDB's recursive-CTE inlining
      -- (commit b453be9 gotcha; see q_asm_contig_spell)
      SELECT DISTINCT id FROM nodes WHERE id NOT IN (SELECT dst FROM ue)
    ), walk AS (
      SELECT id AS root, id AS node, 0 AS depth FROM heads
      UNION ALL
      SELECT walk.root, ue.dst AS node, walk.depth + 1
      FROM walk JOIN ue ON ue.src = walk.node
    ), ch AS (
      SELECT root, CAST(count(*) AS BIGINT) AS n_nodes,
             arg_max(node, depth) AS tail
      FROM walk GROUP BY root
    ), fl AS (
      SELECT root, n_nodes,
             root NOT IN (SELECT dst FROM e) AS hd,
             tail NOT IN (SELECT src FROM e) AS td
      FROM ch)
    SELECT root AS unitig_id, n_nodes,
           CASE WHEN hd THEN 'head' ELSE 'tail' END AS tip_end
    FROM fl WHERE hd <> td AND n_nodes <= 10
    ORDER BY unitig_id
    """,
)


def q_asm_n50(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contig-length statistics with N50 over the derived read set —
    the standard assembly-quality summary (the reference's `result`
    file is one assembled contig; a real assembler reports N50 over
    many: the largest length L such that contigs of length >= L hold
    at least half of all assembled bases).

    Scale shape: the contig set reduces to its LENGTH HISTOGRAM first
    (one map-side-combined shuffle on the length key), and the
    cumulative window runs over that histogram — distinct contig
    lengths are a bounded domain (max contig length), so the
    unpartitioned window sorts a bounded aggregate, the same
    documented class as q_x_ratio_to_report's 25-row window, never
    the contig set itself.
    """
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from bigdatagenomic_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 60)
    length = (F.lit(13) + (F.col("doc_id") % 3) * 2).cast("int")
    cleaned = F.regexp_replace(F.upper("text"), "[^ACGT]", "")
    reads = docs.select(
        F.substring(F.rpad(cleaned, 17, "A"), F.lit(1), length).alias("content")
    )
    hist = (
        reads.select(F.length("content").alias("len"))
        .groupBy("len")
        .agg(F.count("*").alias("n_at_len"))
    )
    desc = W.orderBy(F.desc("len"))
    running = desc.rowsBetween(W.unboundedPreceding, W.currentRow)
    whole = desc.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    bases = F.col("len") * F.col("n_at_len")
    cum = hist.select(
        "len",
        F.sum(bases).over(running).alias("cum_bases"),
        F.sum(bases).over(whole).alias("total_bases"),
        F.sum("n_at_len").over(whole).alias("total_contigs"),
        F.max("len").over(whole).alias("max_len"),
    )
    # N50 = the LARGEST length whose cumulative (desc) share reaches half
    return cum.where(F.col("cum_bases") * 2 >= F.col("total_bases")).agg(
        F.max("len").cast("int").alias("n50"),
        F.max("total_bases").cast("long").alias("total_bases"),
        F.max("total_contigs").cast("long").alias("n_contigs"),
        F.max("max_len").cast("int").alias("max_len"),
    )


register(
    "q_asm_n50",
    q_asm_n50,
    """
    WITH r AS (
      SELECT substr(rpad(regexp_replace(upper(text), '[^ACGT]', '', 'g'), 17, 'A'),
                    1, CAST(13 + (doc_id%3)*2 AS INT)) AS content
      FROM documents WHERE doc_id < 60
    ), hist AS (
      SELECT length(content) AS len, count(*) AS n_at_len
      FROM r GROUP BY len
    ), cum AS (
      SELECT len,
             sum(len * n_at_len) OVER (ORDER BY len DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_bases,
             sum(len * n_at_len) OVER () AS total_bases,
             sum(n_at_len) OVER () AS total_contigs,
             max(len) OVER () AS max_len
      FROM hist
    )
    SELECT CAST(max(len) AS INT) AS n50,
           CAST(max(total_bases) AS BIGINT) AS total_bases,
           CAST(max(total_contigs) AS BIGINT) AS n_contigs,
           CAST(max(max_len) AS INT) AS max_len
    FROM cum WHERE cum_bases * 2 >= total_bases
    """,
)


def q_asm_error_correct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-mer-spectrum read error correction kernel: every WEAK k-mer
    (count < 3 — likely a sequencing error) is mapped to its best
    Hamming-1 STRONG neighbor (count >= 3), the substitution a
    spectral corrector (Quake/BFC-style) would apply. The reference
    consumes pre-overlapped reads (assembly_final.cpp:73-145); real
    pipelines run exactly this correction pass first.

    Scale shape: the spectrum aggregate is the only corpus-sized
    shuffle; the variant fan-out is a bounded 3k-per-weak-kmer explode
    (k=5 -> 15), the strong-neighbor lookup is an equi-join on the
    variant string, and the per-kmer argmax is a window over <= 3k
    candidate rows. Weak k-mers with no strong neighbor are dropped
    (uncorrectable at this coverage). Ties break (count desc, variant
    asc), replayed verbatim in the oracle.
    """
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from bigdatagenomic_spark.functions import char_shingles
    from bigdatagenomic_spark.sources.tables import load_table

    n, k, min_count = 60, 5, 3
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < n)
    length = (F.lit(13) + (F.col("doc_id") % 3) * 2).cast("int")
    cleaned = F.regexp_replace(F.upper("text"), "[^ACGT]", "")
    reads = docs.select(
        F.substring(F.rpad(cleaned, 17, "A"), F.lit(1), length).alias("content")
    )
    spec = (
        reads.select(
            F.explode(
                F.filter(char_shingles(F.col("content"), k), lambda s: F.length(s) == k)
            ).alias("kmer")
        )
        .groupBy("kmer")
        .agg(F.count("*").alias("c"))
    )
    weak = spec.where(F.col("c") < min_count)
    strong = spec.where(F.col("c") >= min_count).select(
        F.col("kmer").alias("vkmer"), F.col("c").alias("vc")
    )
    var = (
        weak.select("kmer", "c", F.explode(F.sequence(F.lit(1), F.lit(k))).alias("p"))
        .select(
            "kmer", "c", "p",
            F.explode(F.array([F.lit(b) for b in "ACGT"])).alias("b"),
        )
        .where(F.expr("substring(kmer, p, 1)") != F.col("b"))
        .select(
            "kmer", "c",
            F.expr("concat(substring(kmer, 1, p - 1), b, substring(kmer, p + 1))")
            .alias("variant"),
        )
    )
    cand = var.join(strong, var["variant"] == strong["vkmer"])
    rn = F.row_number().over(
        W.partitionBy("kmer").orderBy(F.desc("vc"), F.asc("vkmer"))
    )
    return (
        cand.withColumn("rn", rn)
        .where(F.col("rn") == 1)
        .select(
            "kmer", "c",
            F.col("vkmer").alias("corrected"),
            F.col("vc").alias("corrected_c"),
        )
        .orderBy("kmer")
    )


register(
    "q_asm_error_correct",
    q_asm_error_correct,
    """
    WITH r AS (
      SELECT substr(rpad(regexp_replace(upper(text), '[^ACGT]', '', 'g'), 17, 'A'),
                    1, CAST(13 + (doc_id%3)*2 AS INT)) AS content
      FROM documents WHERE doc_id < 60
    ), km AS (
      SELECT unnest(list_transform(range(1, greatest(length(content) - 4, 1) + 1),
                                   i -> substr(content, i, 5))) AS kmer
      FROM r
    ), spec AS (
      SELECT kmer, count(*) AS c FROM km WHERE length(kmer) = 5 GROUP BY kmer
    ), weak AS (
      SELECT kmer, c FROM spec WHERE c < 3
    ), strong AS (
      SELECT kmer AS vkmer, c AS vc FROM spec WHERE c >= 3
    ), var AS (
      SELECT w.kmer, w.c,
             substr(w.kmer, 1, CAST(t.p AS INT) - 1) || u.b
               || substr(w.kmer, CAST(t.p AS INT) + 1) AS variant
      FROM weak w
      CROSS JOIN range(1, 6) AS t(p)
      CROSS JOIN (SELECT unnest(['A','C','G','T']) AS b) u
      WHERE substr(w.kmer, CAST(t.p AS INT), 1) <> u.b
    ), cand AS (
      SELECT v.kmer, v.c, s.vkmer AS corrected, s.vc AS corrected_c,
             row_number() OVER (PARTITION BY v.kmer
                                ORDER BY s.vc DESC, s.vkmer) AS rn
      FROM var v JOIN strong s ON v.variant = s.vkmer
    )
    SELECT kmer, c, corrected, corrected_c FROM cand WHERE rn = 1 ORDER BY kmer
    """,
)


# ---------------------------------------------------------------------------
# LLM-data-pipeline operators: text analysis, dedup, similarity search
# ---------------------------------------------------------------------------
#
# The md5-backed hash family makes minhash/simhash/fingerprints fully
# deterministic, so they are hash-checked like exact operators. DuckDB
# equivalences (validated in tests/test_llm_ops.py):
#   md5_long(x)  == CAST('0x' || substr(md5(x),1,15) AS BIGINT)
#   tokens(x)    == list_filter(string_split_regex(lower(x),'[^a-z0-9]+'),
#                               t -> t <> '')

from bigdatagenomic_spark.functions import MINHASH_COEFFS as _MH
from bigdatagenomic_spark.operators import dedup as D
from bigdatagenomic_spark.operators import similarity as S
from bigdatagenomic_spark.operators import text as T

_TOK = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')"
_H = "CAST(('0x' || substr(md5({x}),1,15)) AS BIGINT)"

register(
    "q24_dedup_exact",
    D.q24_dedup_exact,
    """SELECT min(doc_id) AS keep_id, count(*) AS group_size
       FROM documents GROUP BY md5(text) ORDER BY keep_id""",
)

register(
    "q25_term_counts",
    T.q25_term_counts,
    """SELECT w, count(*) AS c FROM (
         SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS w FROM documents)
       WHERE w <> '' GROUP BY w ORDER BY c DESC, w LIMIT 50""",
)

register(
    "q_text_tokens",
    T.q_text_tokens,
    f"""SELECT doc_id,
          CAST(len(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS INT)
            AS n_ws_tokens,
          CAST(len({_TOK}) AS INT) AS n_word_tokens,
          CAST(length(text) AS INT) AS len_chars
        FROM documents ORDER BY doc_id""",
)

register(
    "q_text_quality",
    T.q_text_quality,
    f"""WITH s AS (
          SELECT doc_id,
                 {_TOK} AS tok,
                 length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS alpha,
                 greatest(length(text), 1) AS nch
          FROM documents
        ), r AS (
          SELECT doc_id,
                 CAST(len(tok) AS INT) AS n_tokens,
                 len(list_filter(tok, x -> list_contains(
                     ['the','a','of','and','to','is','in','it'], x))) AS stop_cnt,
                 greatest(len(tok), 1) AS safe_n, alpha, nch
          FROM s
        )
        SELECT doc_id, n_tokens,
               round(stop_cnt / CAST(safe_n AS DOUBLE), 4) AS stop_ratio,
               round(alpha / CAST(nch AS DOUBLE), 4) AS alpha_ratio,
               round(0.5 * least(n_tokens, 100) / 100.0
                     + 0.3 * (alpha / CAST(nch AS DOUBLE))
                     + 0.2 * least((stop_cnt / CAST(safe_n AS DOUBLE)) * 5.0, 1.0),
                     4) AS quality
        FROM r ORDER BY doc_id""",
)

register(
    "q_text_quality_filter",
    T.q_text_quality_filter,
    f"""WITH s AS (
          SELECT doc_id, source,
                 {_TOK} AS tok,
                 length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS alpha,
                 greatest(length(text), 1) AS nch
          FROM documents
        ), r AS (
          SELECT doc_id, source,
                 CAST(len(tok) AS INT) AS n_tokens,
                 len(list_filter(tok, x -> list_contains(
                     ['the','a','of','and','to','is','in','it'], x))) AS stop_cnt,
                 greatest(len(tok), 1) AS safe_n, alpha, nch
          FROM s
        ), q AS (
          SELECT doc_id, source,
                 round(0.5 * least(n_tokens, 100) / 100.0
                       + 0.3 * (alpha / CAST(nch AS DOUBLE))
                       + 0.2 * least((stop_cnt / CAST(safe_n AS DOUBLE)) * 5.0, 1.0),
                       4) AS quality
          FROM r
        ), p AS (
          SELECT doc_id, source, quality,
                 floor(percent_rank() OVER (PARTITION BY source
                       ORDER BY quality, doc_id) * 1000000 + 0.5) / 1000000 AS q_pct
          FROM q
        )
        SELECT doc_id, source, quality, q_pct
        FROM p WHERE q_pct >= 0.1 ORDER BY doc_id""",
)

register(
    "q_text_bigram_logprob",
    T.q_text_bigram_logprob,
    """WITH tok AS (
         SELECT doc_id,
                list_filter(string_split_regex(lower(text), '[^a-z]+'),
                            x -> x <> '') AS t
         FROM documents
       ), uni AS (SELECT unnest(t) AS w FROM tok),
       cw AS (SELECT w, count(*) AS c_w FROM uni GROUP BY w),
       v AS (SELECT count(DISTINCT w) AS v FROM uni),
       bg AS (
         SELECT doc_id, unnest(list_transform(range(1, len(t)),
                                              i -> t[i] || ' ' || t[i+1])) AS bigram
         FROM tok WHERE len(t) >= 2
       ),
       cbg AS (SELECT bigram, count(*) AS c_bg FROM bg GROUP BY bigram)
       SELECT b.doc_id, count(*) AS n_bigrams,
              floor(avg(ln((c.c_bg + 1) / CAST(u.c_w + v.v AS DOUBLE)))
                    * 1000000 + 0.5) / 1000000 AS avg_logp
       FROM bg b
       JOIN cbg c USING (bigram)
       JOIN cw u ON u.w = split_part(b.bigram, ' ', 1)
       CROSS JOIN v
       GROUP BY b.doc_id ORDER BY b.doc_id""",
)

register(
    "q_text_pii_redact",
    T.q_text_pii_redact,
    """WITH s AS (
         SELECT doc_id,
                coalesce(text, '')
                || CASE WHEN doc_id % 7 = 0
                        THEN ' contact user' || CAST(doc_id AS VARCHAR)
                             || '@example.com' ELSE '' END
                || CASE WHEN doc_id % 11 = 0
                        THEN ' call +1 555 123 4567' ELSE '' END AS t
         FROM documents
       )
       SELECT doc_id,
              CAST(len(regexp_extract_all(t,
                   '(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}', 0)) AS INT)
                AS n_emails,
              CAST(len(regexp_extract_all(t,
                   '\\+\\d{1,2}[ -]\\d{3}[ -]\\d{3}[ -]\\d{4}', 0)) AS INT)
                AS n_phones,
              md5(regexp_replace(regexp_replace(t,
                   '(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}', '<EMAIL>', 'g'),
                   '\\+\\d{1,2}[ -]\\d{3}[ -]\\d{3}[ -]\\d{4}', '<PHONE>', 'g'))
                AS redacted_fp
       FROM s ORDER BY doc_id""",
)

_LANGSETS_SQL = {
    "en": "['the','a','of','and','to','is','in','it']",
    "de": "['der','die','das','und','ist','ein']",
    "fr": "['le','les','et','est','une','dans']",
    "es": "['el','los','y','es','una','en']",
}
_LANG_CNT = ",\n".join(
    f"CAST(len(list_filter(tok, x -> list_contains({lst}, x))) AS INT) AS {lang}_cnt"
    for lang, lst in _LANGSETS_SQL.items()
)
register(
    "q_text_langid",
    T.q_text_langid,
    f"""WITH s AS (SELECT doc_id, {_TOK} AS tok FROM documents),
        c AS (SELECT doc_id, {_LANG_CNT} FROM s)
        SELECT doc_id, en_cnt, de_cnt, fr_cnt, es_cnt,
               CASE WHEN en_cnt >= de_cnt AND en_cnt >= fr_cnt AND en_cnt >= es_cnt
                         AND en_cnt > 0 THEN 'en'
                    WHEN de_cnt >= fr_cnt AND de_cnt >= es_cnt AND de_cnt > 0 THEN 'de'
                    WHEN fr_cnt >= es_cnt AND fr_cnt > 0 THEN 'fr'
                    WHEN es_cnt > 0 THEN 'es'
                    ELSE 'und' END AS pred_lang
        FROM c ORDER BY doc_id""",
)

register(
    "q_text_fingerprint",
    T.q_text_fingerprint,
    f"""WITH s AS (
          SELECT doc_id,
                 trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
          FROM documents
        ), sh AS (
          SELECT doc_id, {_H.format(x='norm')} AS fp,
                 list_transform(
                   list_transform(range(1, greatest(length(norm) - 4, 1) + 1),
                                  i -> substr(norm, i, 5)),
                   g -> {_H.format(x='g')}) AS hs
          FROM s
        )
        SELECT doc_id, fp, list_min(hs) AS min_shingle_h, list_max(hs) AS max_shingle_h
        FROM sh ORDER BY doc_id""",
)

# shared oracle fragments for shingle-based dedup (doc_id < sample bound)
def _shingles_cte_for(bound: int) -> str:
    """The tok/sh/sizes/common shingle CTEs at an explicit doc bound —
    the 400-doc default below plus the 100-doc winnow-survivors oracle."""
    return f"""
  tok AS (SELECT doc_id, {_TOK} AS t
          FROM documents
          WHERE doc_id < {bound} AND text IS NOT NULL),
  sh AS (
    SELECT doc_id, unnest(list_distinct(
        list_transform(range(1, greatest(len(t) - 2, 1) + 1),
                       i -> concat_ws(' ', t[i], t[i+1], t[i+2])))) AS sh
    FROM tok),
  sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
  common AS (
    SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_common
    FROM sh a JOIN sh b USING (sh) WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
"""


_SHINGLES_CTE = _shingles_cte_for(D.PAIR_SAMPLE_DOCS)

register(
    "q_dedup_ngram_jaccard",
    D.q_dedup_ngram_jaccard,
    f"""WITH {_SHINGLES_CTE}
        SELECT a_id, b_id,
               round(n_common / CAST(n_a + n_b - n_common AS DOUBLE), 4) AS jacc
        FROM (SELECT c.a_id, c.b_id, c.n_common, sa.n_sh AS n_a, sb.n_sh AS n_b
              FROM common c
              JOIN sizes sa ON c.a_id = sa.doc_id
              JOIN sizes sb ON c.b_id = sb.doc_id)
        WHERE round(n_common / CAST(n_a + n_b - n_common AS DOUBLE), 4)
              >= {D.JACCARD_THRESHOLD}
        ORDER BY a_id, b_id""",
)

register(
    "q_dedup_containment",
    D.q_dedup_containment,
    # reuses the shingle CTEs but repairs with a!=b (both directions —
    # containment is asymmetric) and normalizes by the LEFT size only
    f"""WITH {_SHINGLES_CTE},
        common2 AS (
          SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_common
          FROM sh a JOIN sh b USING (sh) WHERE a.doc_id <> b.doc_id
          GROUP BY 1, 2)
        SELECT a_id, b_id,
               round(n_common / CAST(sa.n_sh AS DOUBLE), 4) AS containment
        FROM common2 c JOIN sizes sa ON c.a_id = sa.doc_id
        WHERE round(n_common / CAST(sa.n_sh AS DOUBLE), 4)
              >= {D.CONTAINMENT_THRESHOLD}
        ORDER BY a_id, b_id""",
)

_SIG_EXPRS = ",\n".join(
    f"min(({a} * h + {b}) % 2147483647) AS s{i}" for i, (a, b) in enumerate(_MH)
)
_SIG_CTE = f"""
  h AS (SELECT doc_id, {_H.format(x='sh')} % 2147483647 AS h FROM sh),
  sig AS (SELECT doc_id, {_SIG_EXPRS} FROM h GROUP BY doc_id)
"""

register(
    "q_dedup_minhash_sig",
    D.q_dedup_minhash_sig,
    f"""WITH {_SHINGLES_CTE}, {_SIG_CTE}
        SELECT * FROM sig ORDER BY doc_id""",
)

_BANDS_SQL = "\nUNION ALL\n".join(
    "SELECT doc_id, {band} AS band, md5(concat_ws(',', {cols})) AS bkey FROM sig".format(
        band=band, cols=", ".join(f"s{band * 4 + r}" for r in range(4))
    )
    for band in range(4)
)

register(
    "q_dedup_minhash_pairs",
    D.q_dedup_minhash_pairs,
    f"""WITH {_SHINGLES_CTE}, {_SIG_CTE},
        bands AS ({_BANDS_SQL}),
        cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
                 FROM bands a JOIN bands b USING (band, bkey)
                 WHERE a.doc_id < b.doc_id)
        SELECT c.a_id, c.b_id,
               round(coalesce(cm.n_common, 0)
                     / CAST(sa.n_sh + sb.n_sh - coalesce(cm.n_common, 0) AS DOUBLE),
                     4) AS jacc
        FROM cand c
        LEFT JOIN common cm ON c.a_id = cm.a_id AND c.b_id = cm.b_id
        JOIN sizes sa ON c.a_id = sa.doc_id
        JOIN sizes sb ON c.b_id = sb.doc_id
        ORDER BY c.a_id, c.b_id""",
)

def _lsh_tune_oracle_sql() -> str:
    """bands x rows sweep replay: each config re-bands the same 16-value
    signature; cand CTEs are MATERIALIZED (each is referenced twice —
    count + truth-join — and DuckDB 1.0 inlines plain CTEs)."""
    import bigdatagenomic_spark.operators.dedup as _D

    blocks, rows_sql = [], []
    for i, (bands, rows) in enumerate(_D.LSH_TUNE_CONFIGS):
        band_union = "\nUNION ALL\n".join(
            "SELECT doc_id, {b} AS band, md5(concat_ws(',', {cols})) AS bkey"
            " FROM sig".format(
                b=b, cols=", ".join(f"s{b * rows + r}" for r in range(rows))
            )
            for b in range(bands)
        )
        blocks.append(f"""
  bands{i} AS ({band_union}),
  cand{i} AS MATERIALIZED (
    SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
    FROM bands{i} a JOIN bands{i} b USING (band, bkey)
    WHERE a.doc_id < b.doc_id)""")
        rows_sql.append(
            f"SELECT {bands} AS bands, {rows} AS rows,"
            f" (SELECT count(*) FROM cand{i}) AS n_candidates,"
            f" (SELECT count(*) FROM cand{i} c"
            f"  JOIN truth t ON c.a_id = t.a_id AND c.b_id = t.b_id)"
            f" AS n_true_found"
        )
    swept = "\nUNION ALL\n".join(rows_sql)
    return f"""WITH {_SHINGLES_CTE}, {_SIG_CTE},
  truth AS MATERIALIZED (
    SELECT c.a_id, c.b_id
    FROM common c
    JOIN sizes sa ON c.a_id = sa.doc_id
    JOIN sizes sb ON c.b_id = sb.doc_id
    WHERE c.n_common / CAST(sa.n_sh + sb.n_sh - c.n_common AS DOUBLE)
          >= {_D.LSH_TUNE_JACC}),
  {','.join(blocks)},
  swept AS ({swept}),
  tot AS (SELECT count(*) AS n_true_total FROM truth)
SELECT CAST(bands AS BIGINT) AS bands, CAST(rows AS BIGINT) AS rows,
       CAST(n_candidates AS BIGINT) AS n_candidates,
       CAST(n_true_found AS BIGINT) AS n_true_found,
       CAST(tot.n_true_total AS BIGINT) AS n_true_total,
       CAST(CASE WHEN n_candidates = 0 THEN 0 ELSE
            (2 * n_true_found * 10000 + n_candidates)
            // (2 * n_candidates) END AS BIGINT) AS precision_bps,
       CAST(CASE WHEN tot.n_true_total = 0 THEN 0 ELSE
            (2 * n_true_found * 10000 + tot.n_true_total)
            // (2 * tot.n_true_total) END AS BIGINT) AS recall_bps
FROM swept, tot ORDER BY rows"""


register("q_dedup_lsh_tuning", D.q_dedup_lsh_tuning, _lsh_tune_oracle_sql())


def _lsh_autoconfig_oracle_sql() -> str:
    """Sweep + the picker's deterministic total order replayed in SQL:
    eligible configs (recall >= target) first by (n_candidates, bands);
    if none is eligible, highest recall then cheapest. Mirrors
    dedup.pick_lsh_config's order_key verbatim."""
    t = D.LSH_TARGET_RECALL_BPS
    return f"""SELECT CAST({t} AS BIGINT) AS target_recall_bps,
       bands, rows, n_candidates, recall_bps
FROM ({_lsh_tune_oracle_sql()}) sw
ORDER BY (recall_bps >= {t}) DESC,
         CASE WHEN recall_bps >= {t} THEN n_candidates ELSE 0 END,
         CASE WHEN recall_bps >= {t} THEN 0 ELSE -recall_bps END,
         n_candidates, bands
LIMIT 1"""


# sweep-driven banding choice (VERDICT r6 #3): the picker's decision is
# itself an oracle-checked row
register(
    "q_dedup_lsh_autoconfig", D.q_dedup_lsh_autoconfig, _lsh_autoconfig_oracle_sql()
)

register(
    "q_dedup_lsh_incremental",
    D.q_dedup_lsh_incremental,
    # full-corpus banding with the "higher id is new" filter: the pairs
    # a delta update must add == the full rebuild's pairs touching the
    # new batch (new ids are all above the split)
    f"""WITH {_SHINGLES_CTE}, {_SIG_CTE},
        bands AS ({_BANDS_SQL}),
        cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
                 FROM bands a JOIN bands b USING (band, bkey)
                 WHERE a.doc_id < b.doc_id
                   AND b.doc_id >= {D.LSH_INCR_SPLIT})
        SELECT c.a_id, c.b_id,
               round(coalesce(cm.n_common, 0)
                     / CAST(sa.n_sh + sb.n_sh - coalesce(cm.n_common, 0) AS DOUBLE),
                     4) AS jacc
        FROM cand c
        LEFT JOIN common cm ON c.a_id = cm.a_id AND c.b_id = cm.b_id
        JOIN sizes sa ON c.a_id = sa.doc_id
        JOIN sizes sb ON c.b_id = sb.doc_id
        ORDER BY c.a_id, c.b_id""",
)

register(
    "q_x_split_leakage",
    D.q_x_split_leakage,
    # deterministic hash split + full banding, keeping only pairs that
    # cross the split; common is keyed (lower id, higher id) so the
    # lookup goes through least/greatest
    f"""WITH {_SHINGLES_CTE}, {_SIG_CTE},
        bands AS ({_BANDS_SQL}),
        split AS (SELECT doc_id,
                    CAST(('0x' || substr(md5('split:' ||
                         CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                      % {D.VAL_SPLIT_MOD} = 0 AS is_val
                  FROM tok),
        cand AS (SELECT DISTINCT a.doc_id AS val_id, b.doc_id AS train_id
                 FROM bands a JOIN bands b USING (band, bkey)
                 JOIN split sa ON sa.doc_id = a.doc_id
                 JOIN split sb ON sb.doc_id = b.doc_id
                 WHERE sa.is_val AND NOT sb.is_val)
        SELECT c.val_id, c.train_id,
               round(coalesce(cm.n_common, 0)
                     / CAST(sa.n_sh + sb.n_sh - coalesce(cm.n_common, 0) AS DOUBLE),
                     4) AS jacc
        FROM cand c
        LEFT JOIN common cm
          ON least(c.val_id, c.train_id) = cm.a_id
         AND greatest(c.val_id, c.train_id) = cm.b_id
        JOIN sizes sa ON c.val_id = sa.doc_id
        JOIN sizes sb ON c.train_id = sb.doc_id
        ORDER BY c.val_id, c.train_id""",
)

register(
    "q_dedup_rate_report",
    D.q_dedup_rate_report,
    """WITH fp AS (
         SELECT source,
                CAST('0x' || substr(md5(trim(regexp_replace(lower(text),
                     '\\s+', ' ', 'g'))), 1, 15) AS BIGINT) AS fp
         FROM documents WHERE text IS NOT NULL
       ), per_group AS (
         SELECT source, fp, count(*) AS n FROM fp GROUP BY source, fp
       )
       SELECT source,
              CAST(sum(n) AS BIGINT) AS n_docs,
              CAST(sum(n) - count(*) AS BIGINT) AS n_dups,
              (2 * (CAST(sum(n) AS BIGINT) - count(*)) * 10000
               + CAST(sum(n) AS BIGINT)) // (2 * CAST(sum(n) AS BIGINT))
                AS dup_bps
       FROM per_group GROUP BY source ORDER BY source""",
)

_BITSUMS = ",\n".join(
    f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}" for b in range(32)
)
_SIMHASH_SUM = " + ".join(
    f"(CASE WHEN b{b} > 0 THEN CAST({2**b} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    for b in range(32)
)
register(
    "q_dedup_simhash",
    D.q_dedup_simhash,
    f"""WITH tok AS (
          SELECT doc_id, unnest({_TOK}) AS t
          FROM documents WHERE doc_id < {D.PAIR_SAMPLE_DOCS}),
        h AS (SELECT doc_id, {_H.format(x='t')} AS h FROM tok),
        bs AS (SELECT doc_id, {_BITSUMS} FROM h GROUP BY doc_id)
        SELECT doc_id, CAST({_SIMHASH_SUM} AS BIGINT) AS simhash
        FROM bs ORDER BY doc_id""",
)

_SIMHASH_CTE = f"""WITH tok AS (
          SELECT doc_id, unnest({_TOK}) AS t
          FROM documents WHERE doc_id < {D.PAIR_SAMPLE_DOCS}),
        h AS (SELECT doc_id, {_H.format(x='t')} AS h FROM tok),
        bs AS (SELECT doc_id, {_BITSUMS} FROM h GROUP BY doc_id),
        sig AS (SELECT doc_id, CAST({_SIMHASH_SUM} AS BIGINT) AS simhash FROM bs)"""

register(
    "q_dedup_simhash_pairs",
    D.q_dedup_simhash_pairs,
    f"""{_SIMHASH_CTE},
        chunks AS (
          SELECT doc_id, simhash, c.chunk,
                 (simhash >> (8 * c.chunk)) & 255 AS cval
          FROM sig, (SELECT unnest(range(0, {D.SIMHASH_CHUNKS})) AS chunk) c),
        cand AS (
          SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
                 a.simhash AS sig_a, b.simhash AS sig_b
          FROM chunks a JOIN chunks b USING (chunk, cval)
          WHERE a.doc_id < b.doc_id)
        SELECT a_id, b_id,
               CAST(bit_count(xor(sig_a, sig_b)) AS INT) AS hamming
        FROM cand
        WHERE bit_count(xor(sig_a, sig_b)) <= {D.SIMHASH_MAX_HAMMING}
        ORDER BY a_id, b_id""",
)

register("q_dedup_fuzzy", D.q_dedup_fuzzy, D.Q_DEDUP_FUZZY_SQL)

_COS = ("list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a}))"
        " * sqrt(list_dot_product({b}, {b})))")

register(
    "q_dedup_embcos",
    D.q_dedup_embcos,
    f"""WITH s AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings WHERE vec_id < {D.EMB_SAMPLE_VECS})
        SELECT a.vec_id AS a_id, b.vec_id AS b_id,
               round({_COS.format(a='a.v', b='b.v')}, 4) AS sim
        FROM s a JOIN s b ON a.vec_id < b.vec_id
        WHERE round({_COS.format(a='a.v', b='b.v')}, 4) >= {D.COSINE_DUP_THRESHOLD}
        ORDER BY a_id, b_id""",
)

_Q26_COSINE_TOPK_SQL = (
    f"""WITH s AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        q AS (SELECT vec_id AS query_id, v AS qv FROM s WHERE vec_id < {S.N_QUERIES}),
        sims AS (
          SELECT query_id, vec_id, round({_COS.format(a='qv', b='v')}, 4) AS sim
          FROM q CROSS JOIN s WHERE query_id <> vec_id),
        r AS (SELECT query_id, vec_id, sim,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY sim DESC, vec_id) AS rn
              FROM sims)
        SELECT query_id, vec_id, sim, CAST(rn AS INT) AS rn
        FROM r WHERE rn <= {S.TOP_K} ORDER BY query_id, rn"""
)

register("q26_cosine_topk", S.q26_cosine_topk, _Q26_COSINE_TOPK_SQL)

# SQ8 scalar-quantized top-k (serving companion of q_x_emb_quantize):
# per-vector scales cancel in cosine, so the oracle replays the search
# as exact integer dots over the same half-up int8 codes
_Q_SIM_SQ_TOPK_SQL = f"""
WITH m AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x)))
           AS ma
  FROM embeddings
), s AS MATERIALIZED (
  SELECT vec_id,
         list_transform(v, x -> floor(x * 127.0 / ma + 0.5)) AS qv,
         list_sum(list_transform(v,
            x -> floor(x * 127.0 / ma + 0.5) * floor(x * 127.0 / ma + 0.5)))
           AS nn
  FROM m
), q AS (SELECT vec_id AS query_id, qv AS qa, nn AS qq
         FROM s WHERE vec_id < {S.N_QUERIES}),
sims AS (
  SELECT query_id, vec_id,
         round(list_dot_product(qa, qv) / (sqrt(qq) * sqrt(nn)), 4) AS sim
  FROM q CROSS JOIN s WHERE query_id <> vec_id),
r AS (SELECT query_id, vec_id, sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, vec_id) AS rn
      FROM sims)
SELECT query_id, vec_id, sim, CAST(rn AS INT) AS rn
FROM r WHERE rn <= {S.TOP_K} ORDER BY query_id, rn
"""

register("q_sim_sq_topk", S.q_sim_sq_topk, _Q_SIM_SQ_TOPK_SQL)

# two-stage retrieval: SQ8 integer coarse shortlist (deterministic,
# exact-integer dots) -> exact float cosine re-rank of shortlist rows
# only. The oracle replays both stages verbatim.
_Q_SIM_RERANK_SQL = f"""
WITH m AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x)))
           AS ma
  FROM embeddings
), s AS MATERIALIZED (
  SELECT vec_id, v,
         list_transform(v, x -> floor(x * 127.0 / ma + 0.5)) AS qv,
         list_sum(list_transform(v,
            x -> floor(x * 127.0 / ma + 0.5) * floor(x * 127.0 / ma + 0.5)))
           AS nn
  FROM m
), q AS (SELECT vec_id AS query_id, v AS qfull, qv AS qa, nn AS qq
         FROM s WHERE vec_id < {S.N_QUERIES}),
coarse AS (
  SELECT query_id, vec_id, qfull, cfull FROM (
    SELECT query_id, s.vec_id, q.qfull, s.v AS cfull,
           row_number() OVER (PARTITION BY query_id
             ORDER BY round(list_dot_product(qa, s.qv)
                            / (sqrt(qq) * sqrt(s.nn)), 4) DESC,
                      s.vec_id) AS crn
    FROM q CROSS JOIN s WHERE query_id <> s.vec_id)
  WHERE crn <= {S.SHORTLIST}),
rescored AS (
  SELECT query_id, vec_id,
         round({_COS.format(a='qfull', b='cfull')}, 4) AS sim
  FROM coarse),
r AS (SELECT query_id, vec_id, sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, vec_id) AS rn
      FROM rescored)
SELECT query_id, vec_id, sim, CAST(rn AS INT) AS rn
FROM r WHERE rn <= {S.TOP_K} ORDER BY query_id, rn
"""

register("q_sim_rerank", S.q_sim_rerank, _Q_SIM_RERANK_SQL)

# contrastive hard negatives: top-k most-similar vectors of another label
register(
    "q_sim_hard_negatives",
    S.q_sim_hard_negatives,
    f"""WITH s AS (SELECT vec_id, CAST(label AS INT) AS label,
                          CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        q AS (SELECT vec_id AS query_id, label AS query_label, v AS qv
              FROM s WHERE vec_id < {S.HN_QUERIES}),
        sims AS (
          SELECT query_id, query_label, vec_id, label AS neg_label,
                 round({_COS.format(a='qv', b='v')}, 4) AS sim
          FROM q CROSS JOIN s WHERE query_label <> label),
        r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                           ORDER BY sim DESC, vec_id) AS rn
              FROM sims)
        SELECT query_id, query_label, vec_id, neg_label, sim,
               CAST(rn AS INT) AS rn
        FROM r WHERE rn <= {S.HN_K} ORDER BY query_id, rn""",
)

# approximate by contract: LSH bucketing changes the candidate set; checked
# rows-only by the driver, recall-vs-exact in tests
# approximate vs exact top-k, but deterministically computed (md5-derived
# hyperplanes embedded as literals in the oracle) -> full hash check
register("q_sim_lsh_topk", S.q_sim_lsh_topk, S.Q_SIM_LSH_TOPK_SQL)

# recall@k of the LSH index vs the exact top-k: both sides replayed as
# CTE subqueries (DuckDB supports WITH inside a parenthesized subquery),
# joined exactly like the Spark measurement
register(
    "q_sim_lsh_recall",
    S.q_sim_lsh_recall,
    f"""WITH exact AS (SELECT query_id, vec_id FROM ({_Q26_COSINE_TOPK_SQL}) ex),
        ann AS (SELECT query_id, vec_id FROM ({S.Q_SIM_LSH_TOPK_SQL}) an),
        hits AS (
          SELECT e.query_id, count(*) AS n_hit
          FROM exact e JOIN ann a
            ON e.query_id = a.query_id AND e.vec_id = a.vec_id
          GROUP BY e.query_id),
        base AS (SELECT query_id, count(*) AS n_exact
                 FROM exact GROUP BY query_id)
        SELECT b.query_id,
               CAST(b.n_exact AS INT) AS n_exact,
               CAST(coalesce(h.n_hit, 0) AS INT) AS n_hit,
               round(coalesce(h.n_hit, 0) / CAST(b.n_exact AS DOUBLE), 4)
                 AS recall
        FROM base b LEFT JOIN hits h USING (query_id)
        ORDER BY b.query_id""",
)


# ---------------------------------------------------------------------------
# streaming surface, batch-mode checks (SURVEY.md §2.B S02/S03)
# ---------------------------------------------------------------------------
#
# The streaming ops are unified batch/stream plans; here the batch mode is
# oracle-checked (window bounds as epoch seconds so both engines hash the
# same), while tests/test_streaming.py proves stream==batch equivalence.

from bigdatagenomic_spark.streaming import ops as STR

register(
    "q_s02_window_agg",
    STR.q_s02_window_agg,
    """SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS w_start,
              event_type, count(*) AS n_events,
              floor(sum(value) * 100 + 0.5) / 100 AS sum_value
       FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
)

# Spark session_window semantics: merge while ts - prev < gap; session end =
# last ts + gap. DuckDB oracle: gaps-and-islands with the same break rule.
register(
    "q_s03_session_agg",
    STR.q_s03_session_agg,
    """WITH o AS (
         SELECT user_id, ts, value,
                lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS pts
         FROM events),
       m AS (
         SELECT user_id, ts, value,
                CASE WHEN pts IS NULL OR ts - pts >= INTERVAL 30 MINUTE
                     THEN 1 ELSE 0 END AS brk
         FROM o),
       g AS (
         SELECT user_id, ts, value,
                sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS sid
         FROM m)
       SELECT user_id,
              CAST(floor(epoch(min(ts))) AS BIGINT) AS s_start,
              CAST(floor(epoch(max(ts) + INTERVAL 30 MINUTE)) AS BIGINT) AS s_end,
              count(*) AS n_events,
              floor(sum(value) * 100 + 0.5) / 100 AS sum_value
       FROM g GROUP BY user_id, sid
       ORDER BY user_id, s_start""",
)

register("q_s06_enrich_shape", STR.q_s06_enrich_shape, STR.Q_S06_ENRICH_SQL)
register("q_s07_clickview_shape", STR.q_s07_clickview_shape, STR.Q_S07_CLICKVIEW_SQL)
# S14: watermarked windowed counts (incremental) + per-closed-window
# top-k rank (foreachBatch stage); batch shape = agg + bounded window rank
register("q_s14_trending_shape", STR.q_s14_trending_shape, STR.Q_S14_TRENDING_SQL)


# ---------------------------------------------------------------------------
# multimodal columns (north star): binary payload + typed metadata
# ---------------------------------------------------------------------------
#
# Payloads are UTF-8 bytes of documents.text (driver data is pure ASCII,
# asserted in tests/test_multimodal.py, so byte and char offsets coincide
# and every non-stub op is oracle-checkable). decode_images is the stubbed
# codec boundary — no registry entry, exercised in tests with the fake
# decoder.

from bigdatagenomic_spark.operators import multimodal as MM

register(
    "q_mm_metadata",
    MM.q_mm_metadata,
    """SELECT doc_id, 'text/plain' AS mime,
              octet_length(encode(text)) AS n_bytes,
              sha256(text) AS sha256
       FROM documents ORDER BY doc_id""",
)

register(
    "q_mm_frame_sample",
    MM.q_mm_frame_sample,
    f"""WITH f AS (
          SELECT doc_id, text,
                 unnest(range(0, CAST(ceil(length(text) / {MM.FRAME_BYTES}.0) AS BIGINT),
                              {MM.FRAME_STRIDE})) AS frame_idx
          FROM documents)
        SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
               CAST(length(substring(text, frame_idx * {MM.FRAME_BYTES} + 1,
                                     {MM.FRAME_BYTES})) AS INT) AS frame_len,
               md5(substring(text, frame_idx * {MM.FRAME_BYTES} + 1,
                             {MM.FRAME_BYTES})) AS frame_md5
        FROM f ORDER BY doc_id, frame_idx""",
)

register(
    "q_mm_shot_bounds",
    MM.q_mm_shot_bounds,
    # frame mean-bytes are exact (int sum / int len), so the lag deltas
    # and the threshold compare identically in both engines; rounding is
    # display-only (floor half-up at 1e-4, the portable pattern)
    f"""WITH f AS (
          SELECT doc_id,
                 unnest(range(0, CAST(ceil(length(text) / {MM.FRAME_BYTES}.0)
                                      AS BIGINT))) AS frame_idx,
                 text
          FROM documents
        ), s AS (
          SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
                 list_aggregate(list_transform(
                     range(1, length(substring(text,
                         frame_idx * {MM.FRAME_BYTES} + 1,
                         {MM.FRAME_BYTES})) + 1),
                     i -> ascii(substring(text,
                         frame_idx * {MM.FRAME_BYTES} + i, 1))), 'avg') AS mb
          FROM f
        ), lagd AS (
          SELECT doc_id, frame_idx, mb,
                 lag(mb) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS pmb
          FROM s
        )
        SELECT doc_id, frame_idx,
               floor(pmb * 10000 + 0.5) / 10000 AS prev_mean,
               floor(mb * 10000 + 0.5) / 10000 AS mean_byte,
               floor(abs(mb - pmb) * 10000 + 0.5) / 10000 AS delta
        FROM lagd
        WHERE pmb IS NOT NULL AND abs(mb - pmb) >= {MM.SHOT_DELTA}
        ORDER BY doc_id, frame_idx""",
)

register(
    "q_mm_byte_features",
    MM.q_mm_byte_features,
    """WITH c AS (
         SELECT doc_id,
                list_transform(range(1, length(text) + 1),
                               i -> ascii(substring(text, i, 1))) AS codes
         FROM documents)
       SELECT doc_id,
              CAST(codes[1] AS INT) AS first_byte,
              CAST(list_max(codes) AS INT) AS max_byte,
              floor(list_aggregate(codes, 'avg') * 10000 + 0.5) / 10000 AS mean_byte
       FROM c ORDER BY doc_id""",
)

register(
    "q_mm_resize",
    MM.q_mm_resize,
    # mirrors fake_image_decoder byte-for-byte: md5 digest bytes 0/1 give
    # the fake dims, bytes 2..5 the pixel checksum; integer floor resize
    f"""WITH d AS (
          SELECT doc_id, md5(text) AS hx FROM documents
        ), dims AS (
          SELECT doc_id,
                 16 + CAST(('0x' || substr(hx, 1, 2)) AS INT) % 16 AS width,
                 16 + CAST(('0x' || substr(hx, 3, 2)) AS INT) % 16 AS height,
                 CAST(('0x' || substr(hx, 5, 8)) AS BIGINT) AS csum
          FROM d
        ), r AS (
          SELECT doc_id, width, height,
                 (width * {MM.THUMB_BOX}) // greatest(width, height) AS out_w,
                 (height * {MM.THUMB_BOX}) // greatest(width, height) AS out_h,
                 csum
          FROM dims
        )
        SELECT doc_id, CAST(width AS INT) AS width, CAST(height AS INT) AS height,
               CAST(out_w AS INT) AS out_w, CAST(out_h AS INT) AS out_h,
               CAST((csum * out_w + out_h) % 2147483647 AS BIGINT)
                 AS thumb_checksum
        FROM r ORDER BY doc_id""",
)

register(
    "q_mm_chunked_payload", MM.q_mm_chunked_payload, MM.Q_MM_CHUNKED_PAYLOAD_SQL
)

# IVF ANN: approximate by contract (probed buckets bound the candidate
# set); rows-only check here, recall-vs-exact measured in tests
# deterministic IVF pipeline (fixed centroids, single-bucket assignment)
# -> full hash check; the numpy rerank's 4-dec rounding is the contract
register("q_sim_ivf_topk", S.q_sim_ivf_topk, S.Q_SIM_IVF_TOPK_SQL)
register("q_sim_pq_topk", S.q_sim_pq_topk, S.Q_SIM_PQ_TOPK_SQL)
# IVF-PQ composition (coarse prune + ADC over codes): deterministic
# end-to-end -> full hash check against the replayed-training oracle
register("q_sim_ivfpq_topk", S.q_sim_ivfpq_topk, S.Q_SIM_IVFPQ_TOPK_SQL)
# recall monitor for the compressed index (parallel to q_sim_lsh_recall)
register("q_sim_pq_recall", S.q_sim_pq_recall, S.Q_SIM_PQ_RECALL_SQL)
register("q_x_emb_normalize", S.q_x_emb_normalize, S.Q_X_EMB_NORMALIZE_SQL)
register("q_x_emb_quantize", S.q_x_emb_quantize, S.Q_X_EMB_QUANTIZE_SQL)


# ---------------------------------------------------------------------------
# relational extensions (operators/relational_ext.py)
# ---------------------------------------------------------------------------

from bigdatagenomic_spark.operators import relational_ext as RX

# the custom Spark as-of operator is verified against DuckDB's NATIVE
# ASOF LEFT JOIN — two independent implementations of the semantics
register(
    "q_x_asof_join",
    RX.q_x_asof_join,
    """SELECT c.event_id AS click_id, c.user_id,
              CAST(floor(epoch(c.ts)) AS BIGINT) AS click_ts,
              v.event_id AS view_id,
              CAST(floor(epoch(v.ts)) AS BIGINT) AS view_ts
       FROM (SELECT * FROM events WHERE event_type = 'click') c
       ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
         ON c.user_id = v.user_id AND v.ts <= c.ts
       ORDER BY click_id""",
)

_PIVOT_COLS = ",\n".join(
    f'count(CASE WHEN event_type = \'{t}\' THEN 1 END) AS "{t}"'
    for t in RX.EVENT_TYPES
)
register(
    "q_x_pivot",
    RX.q_x_pivot,
    f"""SELECT user_id, {_PIVOT_COLS}
        FROM events GROUP BY user_id ORDER BY user_id""",
)

register(
    "q_x_percentiles",
    RX.q_x_percentiles,
    """SELECT l_returnflag,
              floor(quantile_cont(l_extendedprice, 0.25) * 100 + 0.5) / 100 AS p25,
              floor(quantile_cont(l_extendedprice, 0.50) * 100 + 0.5) / 100 AS p50,
              floor(quantile_cont(l_extendedprice, 0.90) * 100 + 0.5) / 100 AS p90
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
)

register(
    "q_x_sample_hash",
    RX.q_x_sample_hash,
    f"""SELECT doc_id FROM documents
        WHERE CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) % 100
              < {RX.SAMPLE_PCT}
        ORDER BY doc_id""",
)

register(
    "q_x_lag_lead",
    RX.q_x_lag_lead,
    """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
              lag(l_quantity, 1) OVER w AS prev_qty,
              lead(l_quantity, 1) OVER w AS next_qty
       FROM lineitem
       WINDOW w AS (PARTITION BY l_orderkey
                    ORDER BY l_linenumber, l_partkey, l_suppkey)
       ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""",
)

register(
    "q_x_time_rollup",
    RX.q_x_time_rollup,
    """WITH t AS (
         SELECT CAST(floor(epoch(date_trunc('month', ts))) AS BIGINT) AS month_start,
                CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS day_start,
                CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS hour_start,
                value
         FROM events)
       SELECT month_start, day_start, hour_start, count(*) AS n_events,
              floor(sum(value) * 100 + 0.5) / 100 AS sum_value
       FROM t GROUP BY ROLLUP(month_start, day_start, hour_start)
       ORDER BY month_start NULLS FIRST, day_start NULLS FIRST,
                hour_start NULLS FIRST""",
)


# ---------------------------------------------------------------------------
# scale utilities (operators/scale.py): the salted plan must hash-match
# the plain GROUP BY oracle — skew mitigation with zero semantic drift
# ---------------------------------------------------------------------------

from bigdatagenomic_spark.operators import scale as SC

register(
    "q_x_salted_agg",
    SC.q_x_salted_agg,
    """SELECT event_type, count(event_id) AS n_events,
              floor(sum(value) * 100 + 0.5) / 100 AS sum_value
       FROM events GROUP BY event_type ORDER BY event_type""",
)


# ---------------------------------------------------------------------------
# generic graph analytics (operators/graph.py)
# ---------------------------------------------------------------------------

from bigdatagenomic_spark.operators import graph as G

# iterative fixpoint algorithm, but the bounded co-purchase slice IS
# SQL-expressible via a recursive-CTE transitive closure — upgraded from
# rows-only to a full hash check (also union-find-matched in
# tests/test_graph.py)
register("q_graph_cc", G.q_graph_cc, G.Q_GRAPH_CC_SQL)
# synchronous least-label LPA community detection (loop-unrolled oracle)
register("q_graph_lpa", G.q_graph_lpa, G.Q_GRAPH_LPA_SQL)
# hierarchy closure (root + depth) via pointer doubling, recursive oracle
register("q_x_tree_closure", G.q_x_tree_closure, G.Q_X_TREE_CLOSURE_SQL)


# BPE-ish pretokenizer counts — same regex dialect subset (no lookaround,
# no backrefs) behaves identically in Java regex and RE2; validated by
# the oracle match itself
register(
    "q_text_bpe_tokens",
    T.q_text_bpe_tokens,
    r"""SELECT doc_id,
               CAST(len(regexp_extract_all(lower(text),
                    '''[a-z]+| ?[a-z]+| ?[0-9]+| ?[^\sa-z0-9'']+|\s+')) AS INT)
                 AS n_pretokens,
               CAST(len(regexp_extract_all(lower(text),
                    '''[a-z]+| ?[a-z]+')) AS INT) AS n_word_pieces
        FROM documents ORDER BY doc_id""",
)


register(
    "q_x_union_except",
    RX.q_x_union_except,
    """SELECT nationkey, 'customer_only' AS src FROM (
         SELECT DISTINCT c_nationkey AS nationkey FROM customer
         EXCEPT
         SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
       UNION ALL
       SELECT nationkey, 'n=' || CAST(n AS VARCHAR) AS src FROM (
         SELECT nationkey, count(*) AS n FROM (
           SELECT c_nationkey AS nationkey FROM customer
           UNION ALL SELECT s_nationkey AS nationkey FROM supplier)
         GROUP BY nationkey)
       ORDER BY nationkey, src""",
)

register(
    "q_x_string_regex",
    RX.q_x_string_regex,
    """SELECT p_partkey,
              regexp_replace(p_name, '[aeiou]', '_', 'g') AS consonants,
              coalesce(regexp_extract(p_type, '^([A-Z]+)', 1), '') AS type_head,
              trim(lower(p_brand)) AS brand_lc,
              CAST(len(string_split(p_name, ' ')) AS INT) AS n_name_words
       FROM part ORDER BY p_partkey""",
)


# survivorship over transitive near-dup clusters: the pair graph is tiny
# and deterministic, so the transitive closure is recursive-CTE
# expressible — full hash check (also union-find-matched in tests)
_SURVIVORS_SQL = f"""WITH RECURSIVE {_SHINGLES_CTE}, {_SIG_CTE},
  bands AS ({_BANDS_SQL}),
  cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
           FROM bands a JOIN bands b USING (band, bkey)
           WHERE a.doc_id < b.doc_id),
  pairs AS (
    SELECT c.a_id, c.b_id
    FROM cand c
    LEFT JOIN common cm ON c.a_id = cm.a_id AND c.b_id = cm.b_id
    JOIN sizes sa ON c.a_id = sa.doc_id
    JOIN sizes sb ON c.b_id = sb.doc_id
    WHERE round(coalesce(cm.n_common, 0)
                / CAST(sa.n_sh + sb.n_sh - coalesce(cm.n_common, 0) AS DOUBLE),
                4) >= {D.JACCARD_THRESHOLD}),
  undirected AS (SELECT a_id AS src, b_id AS dst FROM pairs
                 UNION SELECT b_id AS src, a_id AS dst FROM pairs),
  reach AS (SELECT src AS id, dst AS r FROM undirected
            UNION
            SELECT reach.id, u.dst AS r FROM reach
            JOIN undirected u ON reach.r = u.src),
  comp AS (SELECT id, least(id, min(r)) AS component FROM reach GROUP BY id),
  dropped AS (
    SELECT id FROM comp
    WHERE id NOT IN (SELECT min(id) FROM comp GROUP BY component))
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT id FROM dropped)
ORDER BY doc_id"""

register("q_dedup_survivors", D.q_dedup_survivors, _SURVIVORS_SQL)

# winnow-index near-dedup (VERDICT r6 #8): the MOSS fingerprint index as
# the candidate generator — winnow pair CTEs (shared with the standalone
# q_text_winnow_pairs oracle), the shingle-Jaccard verify at the winnow
# sample bound, and the same recursive-CTE transitive closure as
# _SURVIVORS_SQL
_WINNOW_SURVIVORS_SQL = f"""WITH RECURSIVE {T.winnow_pair_ctes_for(D.WINNOW_SURV_DOCS)},
  {_shingles_cte_for(D.WINNOW_SURV_DOCS).strip().rstrip()},
  pairs AS (
    SELECT c.a_id, c.b_id
    FROM (SELECT a_id, b_id FROM wpairs
          WHERE n_shared >= {D.WINNOW_MIN_SHARED}) c
    LEFT JOIN common cm ON c.a_id = cm.a_id AND c.b_id = cm.b_id
    JOIN sizes sa ON c.a_id = sa.doc_id
    JOIN sizes sb ON c.b_id = sb.doc_id
    WHERE round(coalesce(cm.n_common, 0)
                / CAST(sa.n_sh + sb.n_sh - coalesce(cm.n_common, 0) AS DOUBLE),
                4) >= {D.JACCARD_THRESHOLD}),
  undirected AS (SELECT a_id AS src, b_id AS dst FROM pairs
                 UNION SELECT b_id AS src, a_id AS dst FROM pairs),
  reach AS (SELECT src AS id, dst AS r FROM undirected
            UNION
            SELECT reach.id, u.dst AS r FROM reach
            JOIN undirected u ON reach.r = u.src),
  comp AS (SELECT id, least(id, min(r)) AS component FROM reach GROUP BY id),
  dropped AS (
    SELECT id FROM comp
    WHERE id NOT IN (SELECT min(id) FROM comp GROUP BY component))
SELECT doc_id FROM documents
WHERE doc_id < {D.WINNOW_SURV_DOCS}
  AND doc_id NOT IN (SELECT id FROM dropped)
ORDER BY doc_id"""

register(
    "q_dedup_winnow_survivors", D.q_dedup_winnow_survivors, _WINNOW_SURVIVORS_SQL
)


def _semantic_oracle_sql() -> str:
    """SemDeDup replay: loop-unrolled Lloyd's with per-update centroid
    quantization (floor(x*10^SEM_ROUND + 0.5) — the same half-up floor
    as clustering.kmeans(round_decimals=SEM_ROUND), which stops a
    last-ulp avg divergence from flipping an argmin), then the
    within-cluster cosine pairs and the same recursive-CTE closure as
    _SURVIVORS_SQL. ``norm`` is MATERIALIZED: it is referenced three
    times and each plain-CTE reference would re-run the whole unrolled
    k-means chain.

    k is ADAPTIVE, replayed exactly: the Spark side derives
    k = sem_k_for(n) = max(SEM_K_MIN, ceil(n / SEM_TARGET_BLOCK)) from
    a corpus count, and the seeding CTE here computes the same formula
    in a scalar-subquery LIMIT — only the seeding depends on k (the
    unrolled assign/update CTEs are k-agnostic), so one SQL string
    stays correct at every scale factor."""
    n_iter, dims = D.SEM_ITER, 64
    k_limit = (
        f"(SELECT greatest({D.SEM_K_MIN}, "
        f"CAST(ceil(count(*) / {D.SEM_TARGET_BLOCK}.0) AS BIGINT)) FROM v)"
    )
    scale = 10 ** D.SEM_ROUND
    d2 = (
        f"list_sum(list_transform(range(1, {dims + 1}), "
        "i -> (v.e[i] - c.centroid[i]) * (v.e[i] - c.centroid[i])))"
    )
    parts = [
        f"""
  v AS MATERIALIZED (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
  c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cluster,
                e AS centroid
         FROM (SELECT vec_id, e FROM v ORDER BY vec_id LIMIT {k_limit}))"""
    ]
    for it in range(1, n_iter + 1):
        parts.append(f"""
  a{it} AS (
    SELECT vec_id, cluster FROM (
      SELECT vec_id, cluster,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY dist, cluster) AS rn
      FROM (SELECT v.vec_id, c.cluster, {d2} AS dist
            FROM v CROSS JOIN c{it - 1} c))
    WHERE rn = 1),
  c{it} AS (
    SELECT cluster, list(mean ORDER BY dim) AS centroid FROM (
      SELECT a.cluster, t.dim,
             floor(avg(v.e[t.dim]) * {scale} + 0.5) / {scale} AS mean
      FROM a{it} a JOIN v USING (vec_id)
      CROSS JOIN (SELECT unnest(range(1, {dims + 1})) AS dim) t
      GROUP BY a.cluster, t.dim)
    GROUP BY cluster)""")
    parts.append(f"""
  afinal AS (
    SELECT vec_id, cluster FROM (
      SELECT vec_id, cluster,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY dist, cluster) AS rn
      FROM (SELECT v.vec_id, c.cluster, {d2} AS dist
            FROM v CROSS JOIN c{n_iter} c))
    WHERE rn = 1),
  norm AS MATERIALIZED (
    SELECT a.vec_id, a.cluster, v.e,
           sqrt(list_dot_product(v.e, v.e)) AS n
    FROM afinal a JOIN v USING (vec_id)),
  pairs AS (
    SELECT a.vec_id AS a_id, b.vec_id AS b_id
    FROM norm a JOIN norm b
      ON a.cluster = b.cluster AND a.vec_id < b.vec_id
    WHERE round(list_dot_product(a.e, b.e) / (a.n * b.n), 4)
          >= {D.COSINE_DUP_THRESHOLD}),
  undirected AS (SELECT a_id AS src, b_id AS dst FROM pairs
                 UNION SELECT b_id AS src, a_id AS dst FROM pairs),
  reach AS (SELECT src AS id, dst AS r FROM undirected
            UNION
            SELECT reach.id, u.dst AS r FROM reach
            JOIN undirected u ON reach.r = u.src),
  comp AS (SELECT id, least(id, min(r)) AS component FROM reach GROUP BY id),
  dropped AS (
    SELECT id FROM comp
    WHERE id NOT IN (SELECT min(id) FROM comp GROUP BY component))""")
    return (
        "WITH RECURSIVE" + ",".join(parts)
        + """
SELECT vec_id, cluster FROM norm
WHERE vec_id NOT IN (SELECT id FROM dropped)
ORDER BY vec_id"""
    )


# SemDeDup (Abbas et al. 2023): embedding k-means blocking -> in-cluster
# cosine near-dup pairs -> CC survivorship
register("q_dedup_semantic", D.q_dedup_semantic, _semantic_oracle_sql())

_MH_AGREE = " + ".join(
    f"(CASE WHEN a.s{i} = b.s{i} THEN 1 ELSE 0 END)" for i in range(16)
)

register(
    "q_dedup_minhash_est",
    D.q_dedup_minhash_est,
    f"""WITH {_SHINGLES_CTE}, {_SIG_CTE},
        bands AS ({_BANDS_SQL}),
        cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
                 FROM bands a JOIN bands b USING (band, bkey)
                 WHERE a.doc_id < b.doc_id),
        pj AS (
          SELECT c.a_id, c.b_id,
                 round(coalesce(cm.n_common, 0)
                       / CAST(sa.n_sh + sb.n_sh - coalesce(cm.n_common, 0)
                              AS DOUBLE), 4) AS jacc
          FROM cand c
          LEFT JOIN common cm ON c.a_id = cm.a_id AND c.b_id = cm.b_id
          JOIN sizes sa ON c.a_id = sa.doc_id
          JOIN sizes sb ON c.b_id = sb.doc_id),
        ag AS (
          SELECT p.a_id, p.b_id, p.jacc, ({_MH_AGREE}) / 16.0 AS est
          FROM pj p
          JOIN sig a ON p.a_id = a.doc_id
          JOIN sig b ON p.b_id = b.doc_id)
        SELECT a_id, b_id, jacc, round(est, 4) AS est,
               round(abs(est - jacc), 4) AS err
        FROM ag ORDER BY a_id, b_id""",
)

# same closure CTEs as _SURVIVORS_SQL, aggregated into the collapse profile
_CLUSTER_SIZES_SQL = (
    _SURVIVORS_SQL.split("  dropped AS (")[0]
    + """  szs AS (SELECT component, count(*) AS cluster_size
           FROM comp GROUP BY component)
SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
FROM szs GROUP BY cluster_size ORDER BY cluster_size"""
)

register("q_dedup_cluster_sizes", D.q_dedup_cluster_sizes, _CLUSTER_SIZES_SQL)


def _q_s08_interval_join(spark, sf_dir):
    from pyspark.sql import functions as F

    from bigdatagenomic_spark.sources.tables import load_table
    from bigdatagenomic_spark.streaming.ops import stream_stream_click_view_join

    ev = load_table(spark, sf_dir, "events")
    return stream_stream_click_view_join(
        ev.where(F.col("event_type") == "click"),
        ev.where(F.col("event_type") == "view"),
    ).orderBy("click_id", "view_id")


# batch mode of the S08 stream-stream interval join (same unified plan;
# streaming equivalence proven in tests/test_streaming.py)
register(
    "q_s08_interval_join",
    _q_s08_interval_join,
    """SELECT c.event_id AS click_id, c.user_id,
              CAST(floor(epoch(c.ts)) AS BIGINT) AS click_ts,
              v.event_id AS view_id,
              CAST(floor(epoch(v.ts)) AS BIGINT) AS view_ts
       FROM events c JOIN events v
         ON c.user_id = v.user_id
        AND v.ts <= c.ts AND v.ts >= c.ts - INTERVAL 30 MINUTE
       WHERE c.event_type = 'click' AND v.event_type = 'view'
       ORDER BY click_id, view_id""",
)


_STRATA_CASE = " ".join(
    f"WHEN lang = '{k}' THEN {v}" for k, v in RX.STRATA_PCT.items()
)
register(
    "q_x_stratified_sample",
    RX.q_x_stratified_sample,
    f"""SELECT doc_id, lang FROM documents
        WHERE CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) % 100
              < (CASE {_STRATA_CASE} ELSE 0 END)
        ORDER BY doc_id""",
)


register(
    "q_x_ntile_firstlast",
    RX.q_x_ntile_firstlast,
    """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
              ntile(4) OVER w AS quartile,
              first_value(l_quantity) OVER wf AS first_qty,
              last_value(l_quantity) OVER wf AS last_qty
       FROM lineitem
       WINDOW w AS (PARTITION BY l_orderkey
                    ORDER BY l_linenumber, l_partkey, l_suppkey),
              wf AS (PARTITION BY l_orderkey
                     ORDER BY l_linenumber, l_partkey, l_suppkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""",
)

register(
    "q_x_embedding_dim_stats",
    RX.q_x_embedding_dim_stats,
    """SELECT CAST(i AS INT) AS dim,
              floor(avg(v[i]) * 10000 + 0.5) / 10000 AS mean_val,
              round(min(v[i]), 4) AS min_val,
              round(max(v[i]), 4) AS max_val
       FROM (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
            range(1, 65) t(i)
       GROUP BY i ORDER BY dim""",
)

register("q_x_emb_centroids", S.q_x_emb_centroids, S.Q_X_EMB_CENTROIDS_SQL)


register(
    "q_x_percent_rank",
    RX.q_x_percent_rank,
    """SELECT o_orderkey, o_orderstatus,
              floor(percent_rank() OVER w * 10000 + 0.5) / 10000 AS pr,
              floor(cume_dist() OVER w * 10000 + 0.5) / 10000 AS cd
       FROM orders
       WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
       ORDER BY o_orderkey""",
)

register(
    "q_x_conditional_aggs",
    RX.q_x_conditional_aggs,
    """SELECT l_returnflag,
              count(*) FILTER (WHERE l_quantity > 25) AS n_heavy,
              bool_or(l_discount > 0.05) AS any_discounted,
              bool_and(l_tax >= 0) AS all_taxed,
              round(sum(DISTINCT l_quantity), 2) AS sum_dist_qty
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
)

register(
    "q_x_correlated_subquery",
    RX.q_x_correlated_subquery,
    """SELECT o_orderkey FROM orders o
       WHERE o_totalprice > 2 * (
         SELECT coalesce(sum(l_extendedprice), 0) FROM lineitem l
         WHERE l.l_orderkey = o.o_orderkey)
       ORDER BY o_orderkey""",
)


# ---------------------------------------------------------------------------
# multi-join analytical shapes + cube/range-frame (operators/analytics.py)
# ---------------------------------------------------------------------------
from bigdatagenomic_spark.operators import analytics as AN

register("q_tpch_q2_shape", AN.q_tpch_q2_shape, AN.Q_TPCH_Q2_SQL)
register("q_tpch_q3_shape", AN.q_tpch_q3_shape, AN.Q_TPCH_Q3_SQL)
register("q_tpch_q4_shape", AN.q_tpch_q4_shape, AN.Q_TPCH_Q4_SQL)
register("q_tpch_q6_shape", AN.q_tpch_q6_shape, AN.Q_TPCH_Q6_SQL)
register("q_tpch_q15_shape", AN.q_tpch_q15_shape, AN.Q_TPCH_Q15_SQL)
register("q_tpch_q5_shape", AN.q_tpch_q5_shape, AN.Q_TPCH_Q5_SQL)
register("q_tpch_q7_shape", AN.q_tpch_q7_shape, AN.Q_TPCH_Q7_SQL)
register("q_tpch_q10_shape", AN.q_tpch_q10_shape, AN.Q_TPCH_Q10_SQL)
register("q_tpch_q14_shape", AN.q_tpch_q14_shape, AN.Q_TPCH_Q14_SQL)
register("q_tpch_q16_shape", AN.q_tpch_q16_shape, AN.Q_TPCH_Q16_SQL)
register("q_tpch_q19_shape", AN.q_tpch_q19_shape, AN.Q_TPCH_Q19_SQL)
register("q_tpch_q18_shape", AN.q_tpch_q18_shape, AN.Q_TPCH_Q18_SQL)
# round 4: the remaining TPC-H shapes — full 22-query suite coverage
register("q_tpch_q8_shape", AN.q_tpch_q8_shape, AN.Q_TPCH_Q8_SQL)
register("q_tpch_q9_shape", AN.q_tpch_q9_shape, AN.Q_TPCH_Q9_SQL)
register("q_tpch_q11_shape", AN.q_tpch_q11_shape, AN.Q_TPCH_Q11_SQL)
register("q_tpch_q12_shape", AN.q_tpch_q12_shape, AN.Q_TPCH_Q12_SQL)
register("q_tpch_q13_shape", AN.q_tpch_q13_shape, AN.Q_TPCH_Q13_SQL)
register("q_tpch_q17_shape", AN.q_tpch_q17_shape, AN.Q_TPCH_Q17_SQL)
register("q_tpch_q20_shape", AN.q_tpch_q20_shape, AN.Q_TPCH_Q20_SQL)
register("q_tpch_q21_shape", AN.q_tpch_q21_shape, AN.Q_TPCH_Q21_SQL)
register("q_tpch_q22_shape", AN.q_tpch_q22_shape, AN.Q_TPCH_Q22_SQL)
register("q_x_cube", AN.q_x_cube, AN.Q_X_CUBE_SQL)
register("q_x_range_frame", AN.q_x_range_frame, AN.Q_X_RANGE_FRAME_SQL)

register(
    "q_x_salted_join",
    SC.q_x_salted_join,
    """SELECT c.c_mktsegment, count(*) AS n_orders,
              round(sum(o.o_totalprice), 2) AS sum_price
       FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
       GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""",
)


# ---------------------------------------------------------------------------
# TF-IDF + corpus curation pipeline (operators/text.py, operators/curation.py)
# ---------------------------------------------------------------------------
from bigdatagenomic_spark.operators import curation as CU

register(
    "q_text_tfidf",
    T.q_text_tfidf,
    """WITH tok AS (
         SELECT doc_id, w FROM (
           SELECT doc_id,
                  unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
           FROM documents)
         WHERE w <> ''
       ), tf AS (
         SELECT doc_id, w, count(*) AS tf FROM tok GROUP BY doc_id, w
       ), dfreq AS (
         SELECT w, count(*) AS df FROM tf GROUP BY w
       ), n AS (SELECT count(*) AS n FROM documents),
       scored AS (
         SELECT tf.doc_id, tf.w, tf.tf, dfreq.df,
                floor(tf.tf * ln(CAST(n.n AS DOUBLE) / CAST(dfreq.df AS DOUBLE))
                      * 10000 + 0.5) / 10000 AS tfidf
         FROM tf JOIN dfreq USING (w) CROSS JOIN n
       )
       SELECT doc_id, w, tf, df, tfidf, rnk FROM (
         SELECT *, row_number() OVER (
           PARTITION BY doc_id ORDER BY tfidf DESC, w ASC) AS rnk
         FROM scored)
       WHERE rnk <= 5 ORDER BY doc_id, rnk""",
)

register("q_pipeline_curation", CU.q_pipeline_curation, CU.Q_PIPELINE_CURATION_SQL)
# regex PII redaction (emails/phones/IPv4) with per-row audit counts
register("q_text_pii_scrub", CU.q_text_pii_scrub, CU.Q_TEXT_PII_SCRUB_SQL)
# quality-descending curriculum schedule in token-budget stages
register("q_x_curriculum", CU.q_x_curriculum, CU.Q_X_CURRICULUM_SQL)
# k-anonymity suppress-or-generalize release over (event_type, hour)
register("q_x_kanon_release", CU.q_x_kanon_release, CU.Q_X_KANON_RELEASE_SQL)

# distributed BPE tokenizer training (iterative pair-merge, unrolled oracle)
from bigdatagenomic_spark.operators import bpe as BPE  # noqa: E402

register("q_text_bpe_train", BPE.q_text_bpe_train, BPE.Q_TEXT_BPE_TRAIN_SQL)
register("q_text_bpe_encode", BPE.q_text_bpe_encode, BPE.Q_TEXT_BPE_ENCODE_SQL)

# variance-gated frame trimming (audio silence-removal shape); the
# integer cross-multiplied variance test is replayed on ascii codes
register(
    "q_mm_silence_trim",
    MM.q_mm_silence_trim,
    f"""WITH c AS (
          SELECT doc_id,
                 list_transform(range(1, length(text) + 1),
                                i -> ascii(substring(text, i, 1))) AS codes
          FROM documents),
        fr AS (
          SELECT doc_id, CAST(i AS INT) AS frame_idx,
                 codes[(i*{MM.TRIM_FRAME_BYTES}+1):((i+1)*{MM.TRIM_FRAME_BYTES})]
                   AS f
          FROM c, unnest(range(0, CAST(ceil(len(codes)
                   / {MM.TRIM_FRAME_BYTES}.0) AS BIGINT))) u(i)),
        stats AS (
          SELECT doc_id, frame_idx,
                 CAST(len(f) AS INT) AS frame_len,
                 CAST(len(f) * list_sum(list_transform(f, x -> x * x))
                      - list_sum(f) * list_sum(f) AS BIGINT) AS variance_num
          FROM fr)
        SELECT doc_id, frame_idx, frame_len, variance_num,
               variance_num > {MM.TRIM_VAR_T} * frame_len * frame_len AS kept
        FROM stats ORDER BY doc_id, frame_idx""",
)

# perceptual-hash (aHash) near-dup payload pairs; cell/global byte means
# are integer-valued sums so the oracle rebuilds the hash bit-for-bit,
# then replays the same 8-bit-chunk pigeonhole blocking as simhash
register(
    "q_mm_phash_pairs",
    MM.q_mm_phash_pairs,
    f"""WITH c AS (
          SELECT doc_id,
                 list_transform(range(1, length(text) + 1),
                                i -> ascii(substring(text, i, 1))) AS codes,
                 length(text) AS n
          FROM documents),
        m AS (
          SELECT doc_id, codes, n, list_aggregate(codes, 'avg') AS mean
          FROM c WHERE n > 0),
        sig AS (
          SELECT doc_id, CAST(coalesce(list_sum(list_transform(
                   range(0, {MM.PHASH_CELLS}), j ->
                   CASE WHEN (j * n) // {MM.PHASH_CELLS}
                             < ((j + 1) * n) // {MM.PHASH_CELLS}
                         AND list_aggregate(
                               codes[CAST((j * n) // {MM.PHASH_CELLS} + 1 AS BIGINT):
                                     CAST(((j + 1) * n) // {MM.PHASH_CELLS} AS BIGINT)],
                               'avg') > mean
                        THEN CAST(1 AS BIGINT) << j ELSE 0 END)), 0)
                 AS BIGINT) AS simhash
          FROM m),
        chunks AS (
          SELECT doc_id, simhash, c.chunk,
                 (simhash >> (8 * c.chunk)) & 255 AS cval
          FROM sig, (SELECT unnest(range(0, 4)) AS chunk) c),
        cand AS (
          SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
                 a.simhash AS sig_a, b.simhash AS sig_b
          FROM chunks a JOIN chunks b USING (chunk, cval)
          WHERE a.doc_id < b.doc_id)
        SELECT a_id, b_id,
               CAST(bit_count(xor(sig_a, sig_b)) AS INT) AS hamming
        FROM cand
        WHERE bit_count(xor(sig_a, sig_b)) <= {MM.PHASH_MAX_HAMMING}
        ORDER BY a_id, b_id""",
)


# ---------------------------------------------------------------------------
# iterative algorithms: PageRank + k-means (operators/graph.py, clustering.py)
# rows-only by contract — driver-loop iteration is not single-statement SQL;
# exact semantics pinned by python/numpy references in tests/.
# ---------------------------------------------------------------------------
from bigdatagenomic_spark.operators import clustering as CL
from bigdatagenomic_spark.operators.graph import q_graph_pagerank as _q_pr

from bigdatagenomic_spark.operators.graph import Q_GRAPH_PAGERANK_SQL

# fixed-iteration power method: loop-unrolled into chained CTEs -> full
# hash check (was rows-only)
register("q_graph_pagerank", _q_pr, Q_GRAPH_PAGERANK_SQL)
# fixed-iteration Lloyd's: loop-unrolled into chained CTEs -> full hash
# check (was rows-only); distances share the same left-to-right fold
register("q_cluster_kmeans", CL.q_cluster_kmeans, CL.Q_CLUSTER_KMEANS_SQL)
# nearest-centroid classifier confusion matrix (embedding-space eval)
register("q_x_confusion", CL.q_x_confusion, CL.Q_X_CONFUSION_SQL)
from bigdatagenomic_spark.operators.graph import Q_GRAPH_TRIANGLES_SQL, q_graph_triangles

# degree-oriented wedge closure: pure joins, replayed verbatim in SQL
register("q_graph_triangles", q_graph_triangles, Q_GRAPH_TRIANGLES_SQL)
from bigdatagenomic_spark.operators.graph import _kcore_oracle_sql, q_graph_kcore

# iterative peeling to fixpoint; oracle = unrolled-rounds replay
register("q_graph_kcore", q_graph_kcore, _kcore_oracle_sql())
from bigdatagenomic_spark.operators.graph import Q_GRAPH_SCC_SQL, q_graph_scc

# directed SCC via trim + coloring; oracle = exact transitive-closure
# mutual reachability on the bounded slice
register("q_graph_scc", q_graph_scc, Q_GRAPH_SCC_SQL)
from bigdatagenomic_spark.operators.graph import _hits_oracle_sql, q_graph_hits

# exact-integer fixed-iteration HITS; oracle = unrolled-rounds replay
register("q_graph_hits", q_graph_hits, _hits_oracle_sql())
from bigdatagenomic_spark.operators.graph import _sssp_oracle_sql, q_graph_sssp

# fixed-round integer Bellman-Ford; oracle = unrolled-rounds replay
register("q_graph_sssp", q_graph_sssp, _sssp_oracle_sql())
from bigdatagenomic_spark.operators.graph import Q_GRAPH_DEGREE_HIST_SQL, q_graph_degree_hist

register("q_graph_degree_hist", q_graph_degree_hist, Q_GRAPH_DEGREE_HIST_SQL)


register("q_x_interval_join", SC.q_x_interval_join, SC.Q_X_INTERVAL_JOIN_SQL)
register("q_x_zorder_value", SC.q_x_zorder_value, SC.Q_X_ZORDER_VALUE_SQL)

register(
    "q_x_budget_sample",
    SC.q_x_budget_sample,
    f"""WITH k AS (
          SELECT doc_id, source,
                 CAST('0x' || substr(md5(concat_ws(chr(1), source,
                      CAST(doc_id AS VARCHAR))), 1, 15) AS BIGINT) AS h
          FROM documents
        ), r AS (
          SELECT doc_id, source,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY h, doc_id) AS rk
          FROM k
        )
        SELECT doc_id, source, CAST(rk AS INT) AS rk
        FROM r WHERE rk <= {SC.N_BUDGET_PER_SOURCE}
        ORDER BY source, doc_id""",
)


register(
    "q_x_skew_report",
    SC.q_x_skew_report,
    """SELECT l_suppkey, count(*) AS n_rows,
              floor(count(*) * 1000000.0 / t._total + 0.5) / 10000 AS pct
       FROM lineitem, (SELECT count(*) AS _total FROM lineitem) t
       GROUP BY l_suppkey, t._total
       ORDER BY n_rows DESC, l_suppkey LIMIT 20""",
)

register(
    "q_text_bigrams",
    T.q_text_bigrams,
    """WITH tok AS (
         SELECT list_filter(string_split_regex(lower(text), '[^a-z]+'),
                            x -> x <> '') AS t
         FROM documents
       ), bg AS (
         SELECT unnest(list_transform(range(1, len(t)),
                                      i -> t[i] || ' ' || t[i+1])) AS bigram
         FROM tok WHERE len(t) >= 2
       )
       SELECT bigram, count(*) AS c FROM bg
       GROUP BY bigram ORDER BY c DESC, bigram LIMIT 40""",
)

register("q_text_pmi", T.q_text_pmi, T.Q_TEXT_PMI_SQL)
register(
    "q_text_unigram_logprob",
    T.q_text_unigram_logprob,
    T.Q_TEXT_UNIGRAM_LOGPROB_SQL,
)


register(
    "q_x_map_funcs",
    RX.q_x_map_funcs,
    """SELECT event_id,
              'k,kk' AS keys,
              CAST(v AS VARCHAR) || ',' || CAST(v*2 AS VARCHAR) AS vals,
              v*2 AS kk,
              2 AS n_entries
       FROM (SELECT event_id,
                    CAST(json_extract_string(props, '$.k') AS INT) AS v
             FROM events)
       ORDER BY event_id""",
)

register(
    "q_x_nth_value",
    RX.q_x_nth_value,
    """SELECT o_custkey, o_orderkey,
              nth_value(o_orderkey, 2) OVER (
                PARTITION BY o_custkey
                ORDER BY o_totalprice ASC, o_orderkey ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
              ) AS second_cheapest
       FROM orders ORDER BY o_custkey, o_orderkey""",
)


register("q_x_grouping_sets", AN.q_x_grouping_sets, AN.Q_X_GROUPING_SETS_SQL)


# ---------------------------------------------------------------------------
# statistics / reshaping / profiling surface (operators/stats.py)
# ---------------------------------------------------------------------------
from bigdatagenomic_spark.operators import stats as ST

register("q_x_stat_aggs", ST.q_x_stat_aggs, ST.Q_X_STAT_AGGS_SQL)
register("q_x_histogram", ST.q_x_histogram, ST.Q_X_HISTOGRAM_SQL)
register("q_x_unpivot", ST.q_x_unpivot, ST.Q_X_UNPIVOT_SQL)
register("q_x_exists_in", ST.q_x_exists_in, ST.Q_X_EXISTS_IN_SQL)
register("q_x_date_arith", ST.q_x_date_arith, ST.Q_X_DATE_ARITH_SQL)
register("q_x_collect_sorted", ST.q_x_collect_sorted, ST.Q_X_COLLECT_SORTED_SQL)
register("q_x_array_hof", ST.q_x_array_hof, ST.Q_X_ARRAY_HOF_SQL)
register("q_x_profile", ST.q_x_profile, ST.Q_X_PROFILE_SQL)
register("q_x_outlier_flags", ST.q_x_outlier_flags, ST.Q_X_OUTLIER_FLAGS_SQL)
# HLL++ sketch rollup: approximate by algorithm -> rows-only; tolerance
# + mergeability pinned in tests/test_scale.py
register("q_x_hll_rollup", ST.q_x_hll_rollup, None)
# Poisson bootstrap 95% CI for the mean (integer-threshold weights)
register("q_x_bootstrap_ci", ST.q_x_bootstrap_ci, ST.Q_X_BOOTSTRAP_CI_SQL)
# count-min sketch heavy-hitter monitor (deterministic grid, exact check)
register("q_x_cms_words", ST.q_x_cms_words, ST.Q_X_CMS_WORDS_SQL)
# pipeline volume anomaly monitor (integer-exact daily 3-sigma test)
register(
    "q_x_volume_anomalies", ST.q_x_volume_anomalies, ST.Q_X_VOLUME_ANOMALIES_SQL
)
register("q_x_benford", ST.q_x_benford, ST.Q_X_BENFORD_SQL)
register("q_x_dow_hour_heatmap", ST.q_x_dow_hour_heatmap, ST.Q_X_DOW_HOUR_HEATMAP_SQL)
register("q_x_dq_report", ST.q_x_dq_report, ST.Q_X_DQ_REPORT_SQL)
register("q_x_quantile_bins", ST.q_x_quantile_bins, ST.Q_X_QUANTILE_BINS_SQL)


# ---------------------------------------------------------------------------
# training-data preparation surface (operators/llm_prep.py)
# ---------------------------------------------------------------------------
from bigdatagenomic_spark.operators import llm_prep as LP

register("q_x_keep_latest", RX.q_x_keep_latest, RX.Q_X_KEEP_LATEST_SQL)
register("q_x_nullsafe_join", RX.q_x_nullsafe_join, RX.Q_X_NULLSAFE_JOIN_SQL)
register("q_x_setops_all", RX.q_x_setops_all, RX.Q_X_SETOPS_ALL_SQL)
register(
    "q_x_reservoir_sample", RX.q_x_reservoir_sample, RX.Q_X_RESERVOIR_SAMPLE_SQL
)
register("q_x_sessionize", RX.q_x_sessionize, RX.Q_X_SESSIONIZE_SQL)

register("q_text_chunks", LP.q_text_chunks, LP.Q_TEXT_CHUNKS_SQL)
register("q_text_pack", LP.q_text_pack, LP.Q_TEXT_PACK_SQL)
register("q_text_decontam", LP.q_text_decontam, LP.Q_TEXT_DECONTAM_SQL)
register("q_dedup_incremental", LP.q_dedup_incremental, LP.Q_DEDUP_INCREMENTAL_SQL)
# Bloom-filter membership pre-filter: bounded (<= M row) sketch of an
# unbounded corpus, broadcast to the probe batch
register("q_dedup_bloom", LP.q_dedup_bloom, LP.Q_DEDUP_BLOOM_SQL)
register("q_corpus_mix", LP.q_corpus_mix, LP.Q_CORPUS_MIX_SQL)
register("q_text_repetition", T.q_text_repetition, T.Q_TEXT_REPETITION_SQL)
register("q_text_kl_drift", T.q_text_kl_drift, T.Q_TEXT_KL_DRIFT_SQL)
register("q_text_zipf", T.q_text_zipf, T.Q_TEXT_ZIPF_SQL)
# winnowing fingerprints (MOSS): guaranteed-coverage selective shingles
register("q_text_winnow", T.q_text_winnow, T.Q_TEXT_WINNOW_SQL)
# the MOSS match step: pair candidates by shared winnow fingerprints
register("q_text_winnow_pairs", T.q_text_winnow_pairs, T.Q_TEXT_WINNOW_PAIRS_SQL)
register("q_text_vocab_prune", T.q_text_vocab_prune, T.Q_TEXT_VOCAB_PRUNE_SQL)
register("q_x_snapshot_diff", LP.q_x_snapshot_diff, LP.Q_X_SNAPSHOT_DIFF_SQL)
register("q_x_apply_changes", RX.q_x_apply_changes, RX.Q_X_APPLY_CHANGES_SQL)
register("q_x_variant_extract", RX.q_x_variant_extract, RX.Q_X_VARIANT_EXTRACT_SQL)
register("q_x_funnel", RX.q_x_funnel, RX.Q_X_FUNNEL_SQL)
register("q_x_cohort_retention", RX.q_x_cohort_retention, RX.Q_X_COHORT_RETENTION_SQL)
register("q_x_full_outer", RX.q_x_full_outer, RX.Q_X_FULL_OUTER_SQL)
register(
    "q_x_ratio_to_report", RX.q_x_ratio_to_report, RX.Q_X_RATIO_TO_REPORT_SQL
)
register("q_x_window_dedup", RX.q_x_window_dedup, RX.Q_X_WINDOW_DEDUP_SQL)
register(
    "q_x_rolling_window", RX.q_x_rolling_window, RX.Q_X_ROLLING_WINDOW_SQL
)
register("q_x_error_runs", RX.q_x_error_runs, RX.Q_X_ERROR_RUNS_SQL)
register("q_x_scd2_history", RX.q_x_scd2_history, RX.Q_X_SCD2_HISTORY_SQL)
register("q_x_calendar_dim", RX.q_x_calendar_dim, RX.Q_X_CALENDAR_DIM_SQL)
register("q_x_mode_per_group", RX.q_x_mode_per_group, RX.Q_X_MODE_PER_GROUP_SQL)
register("q_x_union_evolved", RX.q_x_union_evolved, RX.Q_X_UNION_EVOLVED_SQL)
register("q_x_pop_change", RX.q_x_pop_change, RX.Q_X_POP_CHANGE_SQL)
register("q_x_basket_pairs", RX.q_x_basket_pairs, RX.Q_X_BASKET_PAIRS_SQL)
register("q_x_rfm_segments", RX.q_x_rfm_segments, RX.Q_X_RFM_SEGMENTS_SQL)
register("q_x_markov_transitions", RX.q_x_markov_transitions, RX.Q_X_MARKOV_TRANSITIONS_SQL)
register("q_x_weighted_sample", RX.q_x_weighted_sample, RX.Q_X_WEIGHTED_SAMPLE_SQL)
register("q_x_incremental_agg", RX.q_x_incremental_agg, RX.Q_X_INCREMENTAL_AGG_SQL)
register("q_x_temporal_join", RX.q_x_temporal_join, RX.Q_X_TEMPORAL_JOIN_SQL)
register("q_x_cumulative_users", RX.q_x_cumulative_users, RX.Q_X_CUMULATIVE_USERS_SQL)
register("q_x_sequence_gaps", RX.q_x_sequence_gaps, RX.Q_X_SEQUENCE_GAPS_SQL)
register("q_x_funnel_rates", RX.q_x_funnel_rates, RX.Q_X_FUNNEL_RATES_SQL)
# hourly resample + forward fill (dense per-user grid, last-wins buckets)
register("q_x_resample_ffill", RX.q_x_resample_ffill, RX.Q_X_RESAMPLE_FFILL_SQL)
# A/B experiment readout: hash split, conversion lift, two-proportion z
register("q_x_abtest", RX.q_x_abtest, RX.Q_X_ABTEST_SQL)
# EWMA (alpha=1/2, power-of-two-exact) over the resampled grid
register("q_x_ewma", RX.q_x_ewma, RX.Q_X_EWMA_SQL)
# per-group mean imputation with integer-exact means
register("q_x_impute", RX.q_x_impute, RX.Q_X_IMPUTE_SQL)
# MATCH_RECOGNIZE-shape sequence pattern over per-user streams
register("q_x_event_pattern", RX.q_x_event_pattern, RX.Q_X_EVENT_PATTERN_SQL)
# entity resolution: normalize -> link -> CC closure -> golden records
register("q_x_golden_record", RX.q_x_golden_record, RX.Q_X_GOLDEN_RECORD_SQL)
register("q_x_revenue_deciles", RX.q_x_revenue_deciles, RX.Q_X_REVENUE_DECILES_SQL)
register("q_text_boilerplate", LP.q_text_boilerplate, LP.Q_TEXT_BOILERPLATE_SQL)
register("q_x_train_shards", LP.q_x_train_shards, LP.Q_X_TRAIN_SHARDS_SQL)
# per-source TOKEN-budget mixing over a two-phase cumulative sum
register(
    "q_x_token_budget_mix", LP.q_x_token_budget_mix, LP.Q_X_TOKEN_BUDGET_MIX_SQL
)
# ExactSubstr-style overlapping duplicated-span profiling (Lee et al. 2021)
register("q_text_dup_spans", LP.q_text_dup_spans, LP.Q_TEXT_DUP_SPANS_SQL)
# temperature-scaled (alpha=0.5) per-source sampling budgets
register(
    "q_x_temperature_mix", LP.q_x_temperature_mix, LP.Q_X_TEMPERATURE_MIX_SQL
)
# hashing-trick sparse features + frequency label indexing (ML prep)
register("q_x_feature_hash", LP.q_x_feature_hash, LP.Q_X_FEATURE_HASH_SQL)
# DSIR importance selection: hashed-unigram target-vs-raw log-ratio,
# integer micro-nat weights (64-row table), exact BIGINT doc sums
register("q_x_dsir_select", LP.q_x_dsir_select, LP.Q_X_DSIR_SELECT_SQL)
register("q_x_label_index", LP.q_x_label_index, LP.Q_X_LABEL_INDEX_SQL)
# length-bucketed token-budget batches (padding-efficient batching)
register("q_x_length_batches", LP.q_x_length_batches, LP.Q_X_LENGTH_BATCHES_SQL)


# ---------------------------------------------------------------------------
# round-9 additions
# ---------------------------------------------------------------------------

# per-doc lexical diversity (type-token ratio, integer-exact)
register("q_text_ttr", T.q_text_ttr, T.Q_TEXT_TTR_SQL)
# Okapi BM25 keyword retrieval (sparse baseline next to the dense stack)
register("q_text_bm25", T.q_text_bm25, T._bm25_oracle_sql())
# per-group closed-form OLS trend (exact DECIMAL/HUGEINT moment sums)
register("q_x_linreg", ST.q_x_linreg, ST.Q_X_LINREG_SQL)
# topic-sensitive (personalized) PageRank, loop-unrolled oracle
from bigdatagenomic_spark.operators.graph import (  # noqa: E402
    Q_GRAPH_PPR_SQL as _PPR_SQL,
    q_graph_ppr as _q_ppr,
)

register("q_graph_ppr", _q_ppr, _PPR_SQL)
# cosine range (threshold) retrieval for a bounded query set
register(
    "q_sim_range_search",
    S.q_sim_range_search,
    f"""WITH s AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        q AS (SELECT vec_id AS query_id, v AS qv FROM s WHERE vec_id < {S.N_QUERIES})
        SELECT query_id, vec_id, round({_COS.format(a='qv', b='v')}, 4) AS sim
        FROM q CROSS JOIN s
        WHERE query_id <> vec_id
          AND round({_COS.format(a='qv', b='v')}, 4) >= {S.RANGE_THRESHOLD}
        ORDER BY query_id, vec_id""",
)


def _mmr_oracle_sql() -> str:
    """Unrolled MMR replay: shortlist + pairwise micro-sims, then one
    MATERIALIZED CTE per greedy pick (each round references the prior
    selection set twice — DuckDB 1.0 inlines plain CTEs)."""
    cos_qv = _COS.format(a="qv", b="v")
    cos_ab = _COS.format(a="a.cv", b="b.cv")
    head = f"""
  s AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
  q AS (SELECT vec_id AS query_id, v AS qv FROM s
        WHERE vec_id < {S.MMR_N_QUERIES}),
  rel AS (
    SELECT query_id, vec_id, v AS cv,
           CAST(round(({cos_qv}) * 10000) AS BIGINT) AS rel_m
    FROM q CROSS JOIN s WHERE query_id <> vec_id),
  short AS MATERIALIZED (
    SELECT query_id, vec_id, cv, rel_m FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY rel_m DESC, vec_id) AS rn
      FROM rel) WHERE rn <= {S.MMR_SHORTLIST}),
  pr AS MATERIALIZED (
    SELECT a.query_id, a.vec_id AS c_id, b.vec_id AS s_id,
           CAST(round(({cos_ab}) * 10000) AS BIGINT) AS r_m
    FROM short a JOIN short b USING (query_id)
    WHERE a.vec_id <> b.vec_id),
  sel1 AS MATERIALIZED (
    SELECT query_id, vec_id, 1 AS pick, {S.MMR_W_REL} * rel_m AS mmr_m
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY rel_m DESC, vec_id) AS rn
          FROM short) WHERE rn = 1)"""
    steps = []
    for t in range(2, S.MMR_K + 1):
        prev = f"sel{t - 1}"
        steps.append(f"""
  red{t} AS (
    SELECT p.query_id, p.c_id AS vec_id, max(p.r_m) AS red_m
    FROM pr p JOIN {prev} w ON p.query_id = w.query_id AND p.s_id = w.vec_id
    WHERE NOT EXISTS (SELECT 1 FROM {prev} x
                      WHERE x.query_id = p.query_id AND x.vec_id = p.c_id)
    GROUP BY p.query_id, p.c_id),
  pick{t} AS (
    SELECT query_id, vec_id, {t} AS pick, mmr_m FROM (
      SELECT c.query_id, c.vec_id,
             {S.MMR_W_REL} * c.rel_m - {S.MMR_W_RED} * r.red_m AS mmr_m,
             row_number() OVER (
               PARTITION BY c.query_id
               ORDER BY {S.MMR_W_REL} * c.rel_m - {S.MMR_W_RED} * r.red_m DESC,
                        c.vec_id) AS rn
      FROM short c JOIN red{t} r
        ON c.query_id = r.query_id AND c.vec_id = r.vec_id)
    WHERE rn = 1),
  sel{t} AS MATERIALIZED (
    SELECT * FROM {prev} UNION ALL SELECT * FROM pick{t})""")
    return (
        "WITH" + head + "," + ",".join(steps)
        + f"""
SELECT query_id, vec_id, CAST(pick AS INT) AS pick, mmr_m
FROM sel{S.MMR_K} ORDER BY query_id, pick"""
    )


# MMR diversified re-ranking (integer micro-sim grid, greedy unrolled)
register("q_sim_mmr", S.q_sim_mmr, _mmr_oracle_sql())

# recall@k of the IVF index vs exact — completes the LSH/PQ/IVF monitor
# set; same CTE-subquery replay as q_sim_lsh_recall
register(
    "q_sim_ivf_recall",
    S.q_sim_ivf_recall,
    f"""WITH exact AS (SELECT query_id, vec_id FROM ({_Q26_COSINE_TOPK_SQL}) ex),
        ann AS (SELECT query_id, vec_id FROM ({S.Q_SIM_IVF_TOPK_SQL}) an),
        hits AS (
          SELECT e.query_id, count(*) AS n_hit
          FROM exact e JOIN ann a
            ON e.query_id = a.query_id AND e.vec_id = a.vec_id
          GROUP BY e.query_id),
        base AS (SELECT query_id, count(*) AS n_exact
                 FROM exact GROUP BY query_id)
        SELECT b.query_id,
               CAST(b.n_exact AS INT) AS n_exact,
               CAST(coalesce(h.n_hit, 0) AS INT) AS n_hit,
               round(coalesce(h.n_hit, 0) / CAST(b.n_exact AS DOUBLE), 4)
                 AS recall
        FROM base b LEFT JOIN hits h USING (query_id)
        ORDER BY b.query_id""",
)

# fuzzy train/eval decontamination: LSH candidates + exact-Jaccard verify
# over the mod-19 eval split. Reuses the unbounded shingle/sig CTEs (the
# unused `common` CTE inside _shingles_cte_for is lazy — never evaluated).
register(
    "q_x_decontam_fuzzy",
    LP.q_x_decontam_fuzzy,
    f"""WITH {_shingles_cte_for(10**18)}, {_SIG_CTE},
        bands AS ({_BANDS_SQL}),
        cand AS (
          SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
          FROM bands a JOIN bands b USING (band, bkey)
          WHERE a.doc_id % {LP.DECON_FUZZY_MOD} <> 0
            AND b.doc_id % {LP.DECON_FUZZY_MOD} = 0),
        common2 AS (
          SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_common
          FROM sh a JOIN sh b USING (sh)
          WHERE a.doc_id % {LP.DECON_FUZZY_MOD} <> 0
            AND b.doc_id % {LP.DECON_FUZZY_MOD} = 0
          GROUP BY 1, 2)
        SELECT c.a_id AS train_id, c.b_id AS eval_id,
               round(coalesce(cm.n_common, 0)
                     / CAST(sa.n_sh + sb.n_sh - coalesce(cm.n_common, 0)
                            AS DOUBLE), 4) AS jacc
        FROM cand c
        LEFT JOIN common2 cm ON c.a_id = cm.a_id AND c.b_id = cm.b_id
        JOIN sizes sa ON c.a_id = sa.doc_id
        JOIN sizes sb ON c.b_id = sb.doc_id
        WHERE round(coalesce(cm.n_common, 0)
                    / CAST(sa.n_sh + sb.n_sh - coalesce(cm.n_common, 0)
                           AS DOUBLE), 4) >= {LP.DECON_FUZZY_THRESHOLD}
        ORDER BY train_id, eval_id""",
)

# content-defined chunking: hash-stable chunk boundaries + dup counts
register("q_text_cdc_chunks", LP.q_text_cdc_chunks, LP.Q_TEXT_CDC_CHUNKS_SQL)

# last-touch attribution over the events stream (single user-keyed window)
register("q_x_attribution", RX.q_x_attribution, RX.Q_X_ATTRIBUTION_SQL)
# common-neighbor (Jaccard) link prediction with the posting-cap hub mask
from bigdatagenomic_spark.operators.graph import (  # noqa: E402
    Q_GRAPH_LINKPRED_SQL as _LINKPRED_SQL,
    q_graph_linkpred as _q_linkpred,
)

register("q_graph_linkpred", _q_linkpred, _LINKPRED_SQL)


# ---------------------------------------------------------------------------
# round-10 additions
# ---------------------------------------------------------------------------

# level-shift changepoint screen over per-type daily volumes (integer-exact
# cross-multiplied 30%-contrast test; the regime-change sibling of
# q_x_volume_anomalies)
register("q_x_level_shift", ST.q_x_level_shift, ST.Q_X_LEVEL_SHIFT_SQL)
# reliability-diagram calibration bins + integer ECE numerators
register("q_x_calibration", ST.q_x_calibration, ST.Q_X_CALIBRATION_SQL)
# SAX symbolization (PAA + rank breakpoints) of the daily order series
register("q_x_sax", ST.q_x_sax, ST.Q_X_SAX_SQL)
# row-local token-entropy quality screen (sorted fold, 1e-4 snap)
register("q_text_entropy", T.q_text_entropy, T.Q_TEXT_ENTROPY_SQL)
# corpus n-gram novelty per doc (hash-keyed df, integer-exact ratio)
register("q_text_novelty", T.q_text_novelty, T.Q_TEXT_NOVELTY_SQL)
# 2-layer GraphSAGE-mean feature propagation (integer-exact sums)
from bigdatagenomic_spark.operators.graph import (  # noqa: E402
    Q_GRAPH_NEIGHBOR_AGG_SQL as _NAGG_SQL,
    Q_GRAPH_WALKS_SQL as _WALKS_SQL,
    q_graph_neighbor_agg as _q_nagg,
    q_graph_walks as _q_walks,
)

register("q_graph_neighbor_agg", _q_nagg, _NAGG_SQL)
# deterministic hash-seeded fixed-length walks (node2vec sampling shape)
register("q_graph_walks", _q_walks, _WALKS_SQL)
# Bloom semi-join reduction (explicit runtime-filter pattern, exact result)
register("q_x_bloom_join", SC.q_x_bloom_join, SC.Q_X_BLOOM_JOIN_SQL)
# join-size/skew estimation from per-key counts (the join never runs)
register("q_x_join_size", SC.q_x_join_size, SC.Q_X_JOIN_SIZE_SQL)
# 2-D skyline (Pareto frontier) via two-phase exclusive prefix max
register("q_x_skyline", RX.q_x_skyline, RX.Q_X_SKYLINE_SQL)
# weekday seasonal decomposition (integer-exact seasonal + residual)
register(
    "q_x_seasonal_decompose",
    ST.q_x_seasonal_decompose,
    ST.Q_X_SEASONAL_DECOMPOSE_SQL,
)
# S15 stream-stream LEFT OUTER interval join, batch shape
from bigdatagenomic_spark.streaming.ops import (  # noqa: E402
    Q_S15_LEFTJOIN_SQL as _S15_SQL,
    q_s15_leftjoin_shape as _q_s15,
)

register("q_s15_leftjoin_shape", _q_s15, _S15_SQL)
# per-image pixel statistics through the injected-codec boundary
register("q_mm_pixel_stats", MM.q_mm_pixel_stats, MM.Q_MM_PIXEL_STATS_SQL)
# directed 3-motif census (feed-forward vs cycle triangles)
from bigdatagenomic_spark.operators.graph import (  # noqa: E402
    Q_GRAPH_MOTIFS_SQL as _MOTIFS_SQL,
    q_graph_motifs as _q_motifs,
)

register("q_graph_motifs", _q_motifs, _MOTIFS_SQL)
# autocorrelation function of the daily order series (one-pass, stack)
register("q_x_acf", ST.q_x_acf, ST.Q_X_ACF_SQL)
# per-doc sentence-shape statistics (row-local, integer-exact)
register("q_text_sentences", T.q_text_sentences, T.Q_TEXT_SENTENCES_SQL)
# metadata-filtered vector search (label-constrained exact top-k)
register(
    "q_sim_filtered_topk",
    S.q_sim_filtered_topk,
    f"""WITH s AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
                   FROM embeddings),
        q AS (SELECT vec_id AS query_id, label AS qlabel, v AS qv FROM s
              WHERE vec_id < {S.N_QUERIES}),
        sims AS (
          SELECT q.query_id, q.qlabel AS label, s.vec_id,
                 round({_COS.format(a='qv', b='v')}, 4) AS sim
          FROM q JOIN s ON s.label = q.qlabel
          WHERE q.query_id <> s.vec_id),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY sim DESC, vec_id) AS rn
          FROM sims)
        SELECT query_id, label, vec_id, sim, rn FROM ranked
        WHERE rn <= {S.TOP_K}
        ORDER BY query_id, rn""",
)
# fixed-round exact-integer Katz centrality (loop-unrolled oracle)
from bigdatagenomic_spark.operators.graph import (  # noqa: E402
    Q_GRAPH_KATZ_SQL as _KATZ_SQL,
    q_graph_katz as _q_katz,
)

register("q_graph_katz", _q_katz, _KATZ_SQL)
# per-vertex local clustering coefficient (integer-exact micro ratio)
from bigdatagenomic_spark.operators.graph import (  # noqa: E402
    Q_GRAPH_CLUSTERING_COEFF_SQL as _CCOEF_SQL,
    q_graph_clustering_coeff as _q_ccoef,
)

register("q_graph_clustering_coeff", _q_ccoef, _CCOEF_SQL)
# exact per-group median via two-phase rank (no single-partition sort)
register("q_x_exact_median", SC.q_x_exact_median, SC.Q_X_EXACT_MEDIAN_SQL)
# item-item co-occurrence cosine (embedding-free CF similarity)
register("q_x_item_cosine", RX.q_x_item_cosine, RX.Q_X_ITEM_COSINE_SQL)
# rolling 14-day click/purchase correlation (funnel co-movement monitor)
register("q_x_rolling_corr", RX.q_x_rolling_corr, RX.Q_X_ROLLING_CORR_SQL)
# S16 cascaded stream-stream funnel join, batch shape
from bigdatagenomic_spark.streaming.ops import (  # noqa: E402
    Q_S16_FUNNEL_JOIN_SQL as _S16_SQL,
    q_s16_funnel_join_shape as _q_s16,
)

register("q_s16_funnel_join_shape", _q_s16, _S16_SQL)

# ---------------------------------------------------------------------------
# round 11 additions
# ---------------------------------------------------------------------------
# hapax-legomena ratio (run-length counts reuse, integer-exact micro)
register("q_text_hapax", T.q_text_hapax, T.Q_TEXT_HAPAX_SQL)
# Flesch reading-ease (sentence split + vowel-group syllables, row-local)
register("q_text_readability", T.q_text_readability, T.Q_TEXT_READABILITY_SQL)
# PSI drift of the event-type mix (smoothed, per-type terms)
register("q_x_psi_drift", ST.q_x_psi_drift, ST.Q_X_PSI_DRIFT_SQL)
# chi-squared independence cells (event_type x iso_dow, per-cell micro)
register(
    "q_x_chi2_independence",
    ST.q_x_chi2_independence,
    ST.Q_X_CHI2_INDEPENDENCE_SQL,
)
# per-priority Gini concentration (two_phase_rank + decimal moments)
register("q_x_gini", RX.q_x_gini, RX.Q_X_GINI_SQL)
# degree assortativity of the co-purchase graph (moment-sum Pearson)
from bigdatagenomic_spark.operators.graph import (  # noqa: E402
    Q_GRAPH_DEGREE_ASSORTATIVITY_SQL as _ASSORT_SQL,
    q_graph_degree_assortativity as _q_assort,
)

register("q_graph_degree_assortativity", _q_assort, _ASSORT_SQL)
# tie-corrected Spearman rho via integer double-ranks (per return flag)
register("q_x_spearman_corr", ST.q_x_spearman_corr, ST.Q_X_SPEARMAN_CORR_SQL)
# Mann-Whitney U / AUC with tie-corrected z (clicks vs purchases)
register("q_x_mann_whitney", ST.q_x_mann_whitney, ST.Q_X_MANN_WHITNEY_SQL)
# two-sample Kolmogorov-Smirnov D, integer-exact cross-multiplied max
register("q_x_ks_test", ST.q_x_ks_test, ST.Q_X_KS_TEST_SQL)
# Welch unequal-variance t-test + Welch-Satterthwaite df
register("q_x_welch_ttest", ST.q_x_welch_ttest, ST.Q_X_WELCH_TTEST_SQL)
# one-way ANOVA variance decomposition, per-group terms
register("q_x_anova_decomp", ST.q_x_anova_decomp, ST.Q_X_ANOVA_DECOMP_SQL)
# pointwise mutual-information cells (event_type x iso_dow)
register("q_x_mutual_info", ST.q_x_mutual_info, ST.Q_X_MUTUAL_INFO_SQL)
# exact 5% two-sided trimmed mean via two_phase_rank (robust location)
register("q_x_trimmed_mean", SC.q_x_trimmed_mean, SC.Q_X_TRIMMED_MEAN_SQL)
# character-level edit-distance verification of shingle candidates
register(
    "q_dedup_editdist",
    D.q_dedup_editdist,
    f"""WITH tok AS (SELECT doc_id, text, {_TOK} AS t
          FROM documents
          WHERE doc_id < {D.PAIR_SAMPLE_DOCS} AND text IS NOT NULL
            AND n_chars <= {D.EDIST_MAX_CHARS}),
        sh AS (
          SELECT doc_id, unnest(list_distinct(
              list_transform(range(1, greatest(len(t) - 2, 1) + 1),
                             i -> concat_ws(' ', t[i], t[i+1], t[i+2])))) AS sh
          FROM tok),
        cand AS (
          SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
          FROM sh a JOIN sh b USING (sh) WHERE a.doc_id < b.doc_id),
        scored AS (
          SELECT c.a_id, c.b_id,
                 CAST(levenshtein(ta.text, tb.text) AS BIGINT) AS editdist,
                 CAST(greatest(len(ta.text), len(tb.text)) AS BIGINT) AS ml
          FROM cand c
          JOIN tok ta ON ta.doc_id = c.a_id
          JOIN tok tb ON tb.doc_id = c.b_id)
        SELECT a_id, b_id, editdist,
               CAST((ml - editdist) * 1000000 // ml AS BIGINT) AS sim_micro
        FROM scored
        WHERE (ml - editdist) * 1000000 // ml >= {D.EDIST_MIN_SIM_MICRO}
        ORDER BY a_id, b_id""",
)
# per-term burstiness (Church-Gale variance-to-mean over the corpus)
register("q_text_burstiness", T.q_text_burstiness, T.Q_TEXT_BURSTINESS_SQL)
# token-length (fertility) profile per language
register(
    "q_text_wordlen_profile",
    T.q_text_wordlen_profile,
    T.Q_TEXT_WORDLEN_PROFILE_SQL,
)
# association rules: support/confidence/lift over co-purchase pairs
register("q_x_lift_rules", RX.q_x_lift_rules, RX.Q_X_LIFT_RULES_SQL)

CODON_READS = 200  # derived-read sample bound (mash-sized)


def _codon_reads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared derived-read set (gc_skew pattern,
    assembly_final.cpp:73-145 lineage): ACGT-cleaned, fixed 13/15/17
    lengths so every read yields >= 4 whole frame-0 codons."""
    from pyspark.sql import functions as F

    from bigdatagenomic_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < CODON_READS
    )
    length = (F.lit(13) + (F.col("doc_id") % 3) * 2).cast("int")
    cleaned = F.regexp_replace(F.upper("text"), "[^ACGT]", "")
    return docs.select(
        "doc_id",
        F.substring(F.rpad(cleaned, 17, "A"), F.lit(1), length).alias("content"),
    )


_CODON_READS_CTE = f"""
  r AS (
    SELECT doc_id,
           substr(rpad(regexp_replace(upper(text), '[^ACGT]', '', 'g'),
                       17, 'A'),
                  1, CAST(13 + (doc_id%3)*2 AS INT)) AS content
    FROM documents WHERE doc_id < {CODON_READS})
"""


def q_asm_codon_usage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-0 codon usage table over the derived read set — the
    codon-bias profile behind expression-level prediction and
    pseudogene screens (and the classic sanity check that a claimed
    coding region matches the organism's tRNA pool). Per codon: count
    and corpus share on the integer micro grid.

    Scale shape: one row-local transform/explode (each read emits
    len/3 codons — no shuffle until the 64-key count), one map-side-
    combined aggregate, a 1-row total broadcast. At 100 TB the key
    space is still <= 64, so the final exchange is 64 rows.
    """
    from pyspark.sql import functions as F

    reads = _codon_reads(spark, sf_dir)
    codons = reads.select(
        F.explode(
            F.expr(
                "transform(sequence(1, CAST(length(content) / 3 AS INT)),"
                "          i -> substring(content, (i - 1) * 3 + 1, 3))"
            )
        ).alias("codon")
    )
    counts = codons.groupBy("codon").agg(F.count("*").cast("long").alias("n"))
    tot = counts.agg(F.sum("n").cast("long").alias("_t"))
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "codon",
            "n",
            F.expr("n * 1000000 div _t").cast("long").alias("share_micro"),
        )
        .orderBy("codon")
    )


register(
    "q_asm_codon_usage",
    q_asm_codon_usage,
    f"""WITH {_CODON_READS_CTE},
    codons AS (
      SELECT unnest(list_transform(
                 range(1, CAST(length(content) // 3 AS INT) + 1),
                 i -> substr(content, (i - 1) * 3 + 1, 3))) AS codon
      FROM r),
    counts AS (SELECT codon, CAST(count(*) AS BIGINT) AS n
               FROM codons GROUP BY codon),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM counts)
    SELECT codon, n, CAST(n * 1000000 // t.t AS BIGINT) AS share_micro
    FROM counts CROSS JOIN tot t
    ORDER BY codon""",
)


# time-decay (bucketed half-life) value aggregate per event type
register("q_x_decay_agg", ST.q_x_decay_agg, ST.Q_X_DECAY_AGG_SQL)
# winsorized mean per group (rank-based clamp bounds)
register("q_x_winsorize", SC.q_x_winsorize, SC.Q_X_WINSORIZE_SQL)
# declared-vs-predicted language confusion matrix
register(
    "q_text_lang_confusion",
    T.q_text_lang_confusion,
    f"""WITH s AS (SELECT doc_id, lang, {_TOK} AS tok FROM documents),
        c AS (SELECT doc_id, lang, {_LANG_CNT} FROM s),
        cells AS (
          SELECT lang,
                 CASE WHEN en_cnt >= de_cnt AND en_cnt >= fr_cnt
                           AND en_cnt >= es_cnt AND en_cnt > 0 THEN 'en'
                      WHEN de_cnt >= fr_cnt AND de_cnt >= es_cnt
                           AND de_cnt > 0 THEN 'de'
                      WHEN fr_cnt >= es_cnt AND fr_cnt > 0 THEN 'fr'
                      WHEN es_cnt > 0 THEN 'es'
                      ELSE 'und' END AS pred_lang
          FROM c),
        g AS (SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n
              FROM cells GROUP BY 1, 2),
        tot AS (SELECT lang, CAST(sum(n) AS BIGINT) AS tot FROM g GROUP BY 1)
        SELECT g.lang, g.pred_lang, g.n,
               CAST(g.n * 1000000 // t.tot AS BIGINT) AS share_micro
        FROM g JOIN tot t ON t.lang = g.lang
        ORDER BY g.lang, g.pred_lang""",
)
# per-vertex two-hop (friends-of-friends) reach on the bounded graph
from bigdatagenomic_spark.operators.graph import (  # noqa: E402
    Q_GRAPH_TWO_HOP_SQL as _TWOHOP_SQL,
    q_graph_two_hop as _q_twohop,
)

register("q_graph_two_hop", _q_twohop, _TWOHOP_SQL)
# Cramer's V effect size (bounded sorted-fold float total)
register("q_x_cramers_v", ST.q_x_cramers_v, ST.Q_X_CRAMERS_V_SQL)
# one-sided CUSUM drift track (closed scan form, prefix-min algebra)
register("q_x_cusum", ST.q_x_cusum, ST.Q_X_CUSUM_SQL)
# Wald-Wolfowitz runs test for daily-volume randomness
register("q_x_runs_test", ST.q_x_runs_test, ST.Q_X_RUNS_TEST_SQL)
# Nelson-Aalen cumulative hazard over user lifetimes
register("q_x_survival", ST.q_x_survival, ST.Q_X_SURVIVAL_SQL)
# Herfindahl supplier-concentration index per part
register("q_x_hhi", ST.q_x_hhi, ST.Q_X_HHI_SQL)
# daily event-mix Shannon entropy + evenness (sorted bounded fold)
register("q_x_mix_entropy", ST.q_x_mix_entropy, ST.Q_X_MIX_ENTROPY_SQL)
# Heaps-law vocabulary growth curve (first-seen + two-phase cumsums)
register("q_text_heaps_curve", T.q_text_heaps_curve, T.Q_TEXT_HEAPS_CURVE_SQL)
# exact multimodal payload dedup by content hash
register("q_mm_payload_dedup", MM.q_mm_payload_dedup, MM.Q_MM_PAYLOAD_DEDUP_SQL)


def q_asm_dinuc_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dinucleotide odds ratios rho(xy) = f(xy) / (f(x) * f(y)) pooled
    over the derived read set — the genome-signature statistic (Karlin
    & Burge 1995: dinucleotide relative abundance is a species-stable
    signature; CpG suppression is THE textbook case). rho lands
    integer-exact: rho_micro = n_xy * n_mono^2 * 1e6 div
    (n_di * n_x * n_y) via DECIMAL(38,0)/HUGEINT.

    Plan: two row-local explodes (overlapping 2-mers; single bases),
    two bounded aggregates (16 / 4 keys), broadcast joins of the
    4-row margins — after the scan nothing exceeds 16 rows.
    """
    from pyspark.sql import functions as F

    reads = _codon_reads(spark, sf_dir)
    di = reads.select(
        F.explode(
            F.expr(
                "transform(sequence(1, CAST(length(content) AS INT) - 1),"
                "          i -> substring(content, i, 2))"
            )
        ).alias("dinuc")
    )
    mono = reads.select(
        F.explode(
            F.expr(
                "transform(sequence(1, CAST(length(content) AS INT)),"
                "          i -> substring(content, i, 1))"
            )
        ).alias("base")
    )
    di_counts = di.groupBy("dinuc").agg(F.count("*").cast("long").alias("n_xy"))
    mono_counts = mono.groupBy("base").agg(F.count("*").cast("long").alias("n_b"))
    n_di = di_counts.agg(F.sum("n_xy").cast("long").alias("_ndi"))
    n_mono = mono_counts.agg(F.sum("n_b").cast("long").alias("_nmono"))
    mx = mono_counts.select(F.col("base").alias("_bx"), F.col("n_b").alias("n_x"))
    my = mono_counts.select(F.col("base").alias("_by"), F.col("n_b").alias("n_y"))
    return (
        di_counts.withColumn("_bx", F.substring("dinuc", 1, 1))
        .withColumn("_by", F.substring("dinuc", 2, 1))
        .join(F.broadcast(mx), "_bx")
        .join(F.broadcast(my), "_by")
        .crossJoin(F.broadcast(n_di))
        .crossJoin(F.broadcast(n_mono))
        .select(
            "dinuc",
            "n_xy",
            "n_x",
            "n_y",
            F.expr(
                "CAST(CAST(n_xy AS DECIMAL(38,0)) * _nmono * _nmono * 1000000"
                "     div (CAST(_ndi AS DECIMAL(38,0)) * n_x * n_y) AS BIGINT)"
            ).alias("rho_micro"),
        )
        .orderBy("dinuc")
    )


register(
    "q_asm_dinuc_bias",
    q_asm_dinuc_bias,
    f"""WITH {_CODON_READS_CTE},
    di AS (
      SELECT unnest(list_transform(
                 range(1, CAST(length(content) AS INT)),
                 i -> substr(content, i, 2))) AS dinuc
      FROM r),
    mono AS (
      SELECT unnest(list_transform(
                 range(1, CAST(length(content) AS INT) + 1),
                 i -> substr(content, i, 1))) AS base
      FROM r),
    dc AS (SELECT dinuc, CAST(count(*) AS BIGINT) AS n_xy FROM di GROUP BY 1),
    mc AS (SELECT base, CAST(count(*) AS BIGINT) AS n_b FROM mono GROUP BY 1),
    ndi AS (SELECT CAST(sum(n_xy) AS BIGINT) AS ndi FROM dc),
    nmono AS (SELECT CAST(sum(n_b) AS BIGINT) AS nmono FROM mc)
    SELECT d.dinuc, d.n_xy, mx.n_b AS n_x, my.n_b AS n_y,
           CAST(CAST(d.n_xy AS HUGEINT) * t2.nmono * t2.nmono * 1000000
                // (CAST(t1.ndi AS HUGEINT) * mx.n_b * my.n_b)
                AS BIGINT) AS rho_micro
    FROM dc d
    JOIN mc mx ON mx.base = substr(d.dinuc, 1, 1)
    JOIN mc my ON my.base = substr(d.dinuc, 2, 1)
    CROSS JOIN ndi t1 CROSS JOIN nmono t2
    ORDER BY d.dinuc""",
)


# -- round 11 session-2 wave 9: ORF finder ---------------------------------
ORF_MIN_READ = 30  # a read must clean to >= 30 bases to be scanned
ORF_PATTERN = "ATG(?:[ACGT]{3})*?(?:TAA|TAG|TGA)"


def q_asm_orf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-reading-frame finder over the FULL-LENGTH cleaned reads
    (not the 13-17 bp codon sample — ORFs need room): per read, the
    non-overlapping left-to-right ORFs ``ATG (codon)*? stop`` with the
    FIRST in-frame stop (TAA/TAG/TGA) closing each frame. NOTE: this
    is a single non-overlapping regex scan, NOT full NCBI-ORFfinder
    per-ATG semantics — an ATG inside an earlier match is never
    reconsidered, so nested/alternate-frame ORFs are skipped by
    design; the scan is deterministic and engine-identical, which is
    the contract that matters here. Emits per read the ORF count, the
    longest ORF length and total ORF bases.

    Engine-portable by regex contract: the lazy ``(?:[ACGT]{3})*?``
    quantifier means "shortest in-frame completion", and BOTH Java
    regex (Spark) and RE2 (DuckDB) implement leftmost-first lazy
    matching for backreference-free patterns, so the match sets are
    identical; all outputs are exact integers.

    Plan shape: map-only scan projection — one regexp_extract_all and
    two row-local array folds per read, no explode, no shuffle at any
    corpus size (the per-row cost is linear in read length).
    assembly_final.cpp:73-145 lineage for the read derivation.
    """
    from pyspark.sql import functions as F

    from bigdatagenomic_spark.functions import let_bound
    from bigdatagenomic_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    cleaned = F.regexp_replace(F.upper("text"), "[^ACGT]", "")
    reads = docs.select("doc_id", cleaned.alias("content")).where(
        F.length("content") >= ORF_MIN_READ
    )
    orfs = F.regexp_extract_all("content", F.lit(ORF_PATTERN), 0)

    def cols(o):
        lens = F.transform(o, F.length)
        return F.struct(
            F.size(o).cast("long").alias("n_orfs"),
            F.coalesce(F.array_max(lens), F.lit(0)).cast("long").alias(
                "max_orf_len"
            ),
            F.aggregate(
                lens, F.lit(0).cast("long"), lambda acc, x: acc + x
            ).alias("orf_bases"),
        )
    # let-bind the match list: the three folds reuse ONE regex scan
    s1 = reads.select(
        "doc_id",
        F.length("content").cast("long").alias("read_len"),
        let_bound(orfs, cols).alias("_o"),
    )
    return s1.select(
        "doc_id", "read_len", "_o.n_orfs", "_o.max_orf_len", "_o.orf_bases"
    ).orderBy("doc_id")



register(
    "q_asm_orf",
    q_asm_orf,
    f"""
    WITH r AS (
      SELECT doc_id,
             regexp_replace(upper(text), '[^ACGT]', '', 'g') AS content
      FROM documents WHERE text IS NOT NULL
    ), m AS (
      SELECT doc_id, CAST(length(content) AS BIGINT) AS read_len,
             regexp_extract_all(content,
                 'ATG(?:[ACGT]{{3}})*?(?:TAA|TAG|TGA)') AS orfs
      FROM r WHERE length(content) >= {ORF_MIN_READ}
    )
    SELECT doc_id, read_len,
           CAST(len(orfs) AS BIGINT) AS n_orfs,
           CAST(coalesce(list_max(list_transform(orfs, x -> length(x))), 0)
                AS BIGINT) AS max_orf_len,
           CAST(coalesce(list_sum(list_transform(orfs, x -> length(x))), 0)
                AS BIGINT) AS orf_bases
    FROM m ORDER BY doc_id
    """,
)


# -- round 12: per-read Burrows-Wheeler transform --------------------------
BWT_MIN_READ = 10
BWT_MAX_READ = 120  # rotation table is O(n²) chars/read — pushed-filter
                    # contract like q_dedup_editdist's 400-char bound


def q_asm_bwt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-read Burrows-Wheeler transform (Burrows & Wheeler 1994) with
    the '$' sentinel, plus run counts before/after — the
    compressibility/index primitive under BWA/Bowtie read aligners and
    bzip-family compressors (the reference pipeline aligns reads by
    direct overlap, assembly_final.cpp:100-145; BWT is the index those
    tools build instead at scale).

    Semantics: bwt(s) = last column of the lexicographically sorted
    rotation table of s||'$'. Both engines sort the rotation strings
    by BINARY byte order over the pure-ASCII {$,A,C,G,T} alphabet
    ('$'=0x24 sorts first), and the unique sentinel makes every
    rotation distinct — so the sorted order, hence the transform, is
    engine-identical with no collation caveat. Run counts fold
    adjacent-char inequality (1 + Σ [s[i] != s[i-1]]) — NOT a
    backreference regex, which RE2 (DuckDB) cannot run.

    Plan shape: map-only scan projection — the rotation table, its
    sort, and both run folds are row-local array expressions; no
    explode, no shuffle at any corpus size. Per-read cost is
    O(n² log n) chars bounded by the 10..120-length pushed-filter
    contract (avg cleaned read ~63 chars → ~4 KB sorted per read).
    """
    from pyspark.sql import functions as F

    from bigdatagenomic_spark.functions import let_bound
    from bigdatagenomic_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    cleaned = F.regexp_replace(F.upper("text"), "[^ACGT]", "")
    reads = docs.select("doc_id", cleaned.alias("content")).where(
        F.length("content").between(BWT_MIN_READ, BWT_MAX_READ)
    )

    def runs_of(s):
        # 1 + number of adjacent unequal pairs; row-local fold.
        # Explicit step 1 (ADVICE r12): for a length-1 string Spark's
        # two-arg sequence(2, 1) would infer step -1 and yield [2, 1]
        # — a silently-wrong run count; with step 1 it errors/empties
        # instead. Unreachable here anyway (BWT_MIN_READ=10 pushed
        # filter), but the helper now guards itself.
        n = F.length(s)
        return F.lit(1).cast("long") + F.aggregate(
            F.sequence(F.lit(2), n, F.lit(1)),
            F.lit(0).cast("long"),
            lambda acc, i: acc
            + F.when(s.substr(i, F.lit(1)) != s.substr(i - 1, F.lit(1)), 1)
            .otherwise(0)
            .cast("long"),
        )

    def bwt_cols(t):
        n = F.length(t)
        rots = F.transform(
            F.sequence(F.lit(0), n - 1),
            lambda i: F.concat(t.substr(i + 1, n - i), t.substr(F.lit(1), i)),
        )
        bwt = F.concat_ws(
            "",
            F.transform(F.array_sort(rots), lambda r: r.substr(n, F.lit(1))),
        )
        return F.struct(bwt.alias("bwt"))

    s1 = reads.select(
        "doc_id",
        F.length("content").cast("long").alias("read_len"),
        runs_of(F.col("content")).alias("runs_orig"),
        let_bound(
            F.concat(F.col("content"), F.lit("$")), bwt_cols
        ).alias("_b"),
    )
    return s1.select(
        "doc_id",
        "read_len",
        F.col("_b.bwt").alias("bwt"),
        "runs_orig",
        runs_of(F.col("_b.bwt")).alias("runs_bwt"),
    ).orderBy("doc_id")


Q_ASM_BWT_SQL = f"""
    WITH r AS (
      SELECT doc_id,
             regexp_replace(upper(text), '[^ACGT]', '', 'g') AS content
      FROM documents WHERE text IS NOT NULL
    ), b AS (
      SELECT doc_id, content, content || '$' AS t,
             length(content) + 1 AS n
      FROM r
      WHERE length(content) BETWEEN {BWT_MIN_READ} AND {BWT_MAX_READ}
    ), w AS (
      SELECT doc_id, content, n,
             array_to_string(
               list_transform(
                 list_sort(list_transform(range(0, n),
                     i -> substring(t, i + 1, n - i) || substring(t, 1, i))),
                 r -> substring(r, n, 1)), '') AS bwt
      FROM b
    )
    SELECT doc_id,
           CAST(length(content) AS BIGINT) AS read_len,
           bwt,
           CAST(1 + coalesce(list_sum(list_transform(
                 range(2, length(content) + 1),
                 i -> CASE WHEN substring(content, i, 1)
                             != substring(content, i - 1, 1)
                      THEN 1 ELSE 0 END)), 0) AS BIGINT) AS runs_orig,
           CAST(1 + coalesce(list_sum(list_transform(
                 range(2, n + 1),
                 i -> CASE WHEN substring(bwt, i, 1)
                             != substring(bwt, i - 1, 1)
                      THEN 1 ELSE 0 END)), 0) AS BIGINT) AS runs_bwt
    FROM w ORDER BY doc_id
    """

register("q_asm_bwt", q_asm_bwt, Q_ASM_BWT_SQL)


# -- round 11 session-2 wave 9: LLM-pipeline text screens ------------------
# Gopher-style n-gram repetition screens (top-2-gram coverage /
# duplicate-5-gram positions) — complements q_text_repetition's
# distinct-token/bigram ratios (Gopher rule 4-7 vs rule 1-2 families)
register(
    "q_text_gopher_repetition",
    T.q_text_gopher_repetition,
    T.Q_TEXT_GOPHER_REPETITION_SQL,
)
# RAKE keyword extraction (integer-exact degree/freq scoring)
# (a planned bigram-surprisal op was dropped here: q_text_bigram_logprob
# already covers the count-LM quality screen — no near-duplicate entries)
register("q_text_rake_keywords", T.q_text_rake_keywords, T.Q_TEXT_RAKE_SQL)
# KMV bottom-k sketch: per-source distinct estimate + pairwise Jaccard
register("q_dedup_kmv", D.q_dedup_kmv, D.Q_DEDUP_KMV_SQL)
# exact weighted median per group (two-phase cumulative weights)
register(
    "q_x_weighted_median", SC.q_x_weighted_median, SC.Q_X_WEIGHTED_MEDIAN_SQL
)
# -- round 12 additions (two; VERDICT r11 #2 caps the round at <= 5) -------
# length-2 sequential-pattern support via the (user,type) min/max grid
register("q_x_seq_patterns", RX.q_x_seq_patterns, RX.Q_X_SEQ_PATTERNS_SQL)
# q_asm_bwt is registered above with its oracle (genomics section)

# -- round 13 additions (<=5 cap, VERDICT r12 #2; rule-2 rotate-ins for
#    round 14's checked-50) --------------------------------------------
# Kendall tau-b on the contingency-cell grid (concordance companion to
# q_x_spearman_corr)
register("q_x_kendall_tau", ST.q_x_kendall_tau, ST.Q_X_KENDALL_TAU_SQL)
# Theil-Sen robust daily-volume slope (breakdown-point companion to
# q_x_linreg's OLS trend)
register("q_x_theil_sen", ST.q_x_theil_sen, ST.Q_X_THEIL_SEN_SQL)

# -- round 14 additions (<=5 cap, VERDICT r13 #2; rule-2 rotate-ins for
#    round 15's checked-50 — registered AFTER the round-14 checked-50
#    froze) ---------------------------------------------------------------
# Mann-Kendall monotone-trend test (significance companion to
# q_x_theil_sen's slope magnitude; same calendar-bounded day-pair grid
# and the same enforced 10-year span contract)
register("q_x_mann_kendall", ST.q_x_mann_kendall, ST.Q_X_MANN_KENDALL_SQL)
# Cohen's kappa agreement between two document-quality raters
# (above-chance agreement for the corpus-curation QA loop)
register("q_x_cohens_kappa", ST.q_x_cohens_kappa, ST.Q_X_COHENS_KAPPA_SQL)


# ---------------------------------------------------------------------------
# Registry ordering. The correctness driver checks registry entries in
# insertion order and may cap how many it runs (round 1 capped at 50), so
# contract-critical entries must come first:
#   1. every SURVEY.md §2 component (Q01-Q27 + S02/S03 batch shapes),
#   2. entries new or red in the previous round (so the fix gets a row),
#   3. everything else in original insertion order (still covered by the
#      sf0.001 pytest oracle suite every round).
# Registrations above stay grouped by module for readability; this block
# re-keys the dict into the contract order.
# ---------------------------------------------------------------------------
_PRIORITY_PREFIX = [
    # -- round 14 rule 2 FIRST (VERDICT r13 #1: the 10-deep backlog must
    #    re-earn driver rows before any sweep slot is spent): the two
    #    round-13 additions (property-tested at 200 examples until their
    #    rows land; theil_sen also behavior-changed this round — runtime
    #    day-span contract guard, VERDICT r13 #4):
    "q_x_kendall_tau", "q_x_theil_sen",
    # -- then the eight round-13 sampling-double-scan plan rewrites
    #    (grids checkpoint before the two-phase helpers, totals derive
    #    from the cumsum output; SCALING.md Part 14 addendum — outputs
    #    bit-identical but plan rewrites re-check, the r11 trimmed_mean
    #    precedent):
    "q_x_spearman_corr", "q_x_trimmed_mean", "q_x_winsorize",
    "q_x_weighted_median", "q_x_ks_test", "q_x_curriculum",
    "q_x_train_shards", "q_x_token_budget_mix",
    # -- SURVEY §2 contract SENTINEL subset (ROTATION.md round 14) --------
    # VERDICT r11 #2 adopted: the 29 permanently-pinned contract slots
    # (Q01-Q27 + q_s02 + q_s03) shrink to a rotating ~1/3 sentinel
    # subset so the freed ~19 slots clear the driver-row coverage debt
    # (177/311 never-checked at r11) in ~4-5 rounds instead of ~9.
    # Every contract entry STAYS hash-checked every round by the
    # sf0.001 pytest oracle suite AND the full-registry vanilla-session
    # preflight; the sentinel tranches round-robin so each contract
    # entry still earns a fresh driver row every ~3 rounds.
    # Round-14 tranche C (plans pinned r13, tests/test_plans.py):
    "q16_intersect", "q17_string_funcs", "q18_date_funcs",
    "q19_math_funcs", "q20_case_when", "q21_array_l2norm",
    "q22_json_extract", "q23_subquery",
    # Round-15 tranche A (scheduled): q01, q03, q08, q10, q13, q15,
    # q24-q27, q_s02.
    # -- LLM-pipeline core families (graded first-class alongside §2):
    #    dedup, text analysis, multimodal, ANN — one row each under the
    #    driver's 50-entry cap; everything rotated out stays hash-checked
    #    by the sf0.001 pytest oracle suite + the full-registry
    #    vanilla-session preflight (tools/preflight.py). The rotation
    #    schedule lives in ROTATION.md (VERDICT r6 #5).
    # Round 7 rotated OUT (>=4 green driver rounds each): q_x_asof_join,
    # q_x_salted_agg, q_sim_lsh_topk, q_text_tokens, q_text_quality,
    # q_text_langid, q_dedup_minhash_sig, q_dedup_simhash, q_mm_metadata.
    # Round 8 rotated OUT (ROTATION.md): q_dedup_minhash_pairs (5 green),
    # q_dedup_ngram_jaccard (5), q_mm_frame_sample (5), q_sim_ivf_topk (6),
    # plus the six round-7 rule-2 one-shots that earned their driver row
    # in CORRECTNESS_r07: q_dedup_lsh_autoconfig, q_dedup_winnow_survivors,
    # q_x_golden_record, q_x_bootstrap_ci, q_text_winnow_pairs,
    # q_x_curriculum. All stay hash-checked every round by the sf0.001
    # pytest oracle suite + the full-registry preflight.
    # Round 9 rotated OUT (ROTATION.md): the round-8 rule-2/tranche
    # one-shots that went green in CORRECTNESS_r08 (q_dedup_semantic,
    # q_asm_unitigs, q_asm_contig_spell, q_tpch_q9_shape,
    # q_text_bpe_encode, q_mm_resize, q_sim_pq_topk, q_x_cms_words,
    # q_x_token_budget_mix, q_pipeline_curation), q_dedup_survivors
    # (5 green), q_graph_cc (3 green, rule 4 satisfied), and the
    # round-6 flagship / round-5 tranche at >=3 green each
    # (q_sim_ivfpq_topk, q_text_boilerplate, q_x_train_shards,
    # q_x_split_leakage, q_text_bpe_train, q_text_dup_spans,
    # q_mm_phash_pairs, q_asm_kmer_counts, q_x_rfm_segments). All stay
    # hash-checked every round by the sf0.001 pytest oracle suite +
    # the full-registry preflight.
    # Round 10 rotated OUT (ROTATION.md): the round-9 rule-2 one-shots
    # (q_sim_sq_topk, q_mm_shot_bounds, q_dedup_bloom, q_graph_kcore,
    # q_graph_scc, q_graph_hits, q_graph_sssp, q_asm_minimizers,
    # q_asm_minimizer_overlaps, q_asm_canonical_kmers, q_asm_bubbles,
    # q_asm_low_complexity, q_asm_tandem_repeats, q_s14_trending_shape,
    # q_asm_tips, q_sim_rerank, q_x_dsir_select, q_tpch_q5_shape,
    # q_x_hll_rollup, q_graph_pagerank, q_cluster_kmeans), all verified
    # at sf0.01 by the vanilla-session preflight_r9.json (249/249) and
    # hash-checked every round by the sf0.001 pytest oracle suite.
    #
    # Round 11 rotated OUT (ROTATION.md): the round-10 rotate-ins, all
    # 21 hash-green in CORRECTNESS_r10 (q_text_ttr, q_text_bm25,
    # q_x_linreg, q_graph_ppr, q_sim_range_search, q_sim_mmr,
    # q_x_decontam_fuzzy, q_sim_ivf_recall, q_text_cdc_chunks,
    # q_x_attribution, q_graph_linkpred, q_tpch_q18_shape, q_text_tfidf,
    # q_dedup_lsh_incremental, q_x_kanon_release, q_x_abtest,
    # q_asm_coverage_depth, q_asm_n50, q_asm_debruijn_edges,
    # q_asm_kmer_spectrum, q_asm_error_correct). All stay hash-checked
    # every round by the sf0.001 pytest oracle suite + the
    # full-registry vanilla-session preflight.
    #
    # Round 12 rotated OUT (ROTATION.md): the 21 round-11 rotate-ins,
    # all hash-green in CORRECTNESS_r11 (q_asm_mash_distance, q_x_acf,
    # q_x_rolling_corr, q_text_entropy, q_x_bloom_join, q_x_level_shift,
    # q_x_sax, q_text_novelty, q_graph_neighbor_agg, q_graph_walks,
    # q_x_skyline, q_x_seasonal_decompose, q_s15_leftjoin_shape,
    # q_mm_pixel_stats, q_graph_motifs, q_text_sentences,
    # q_sim_filtered_topk, q_graph_katz, q_graph_clustering_coeff,
    # q_x_exact_median, q_s16_funnel_join_shape), plus the 18
    # non-sentinel contract entries (tranches B/C above — pytest +
    # preflight keep them hash-checked; they re-enter rounds 13/14).
    #
    # Round 13 rotated OUT (ROTATION.md): sentinel tranche A (q01, q03,
    # q08, q10, q13, q15, q24-q27, q_s02 — all green in CORRECTNESS_r12,
    # q10 rows-only by contract) and the 39 round-12 rotate-ins, all
    # hash-green in CORRECTNESS_r12 (wave 9: gopher_repetition,
    # rake_keywords, kmv, orf, weighted_median; wave 1: hapax,
    # readability, psi_drift, chi2_independence, gini,
    # degree_assortativity; statistics: spearman, mann_whitney, ks_test,
    # welch_ttest, anova_decomp, mutual_info, trimmed_mean, cusum,
    # runs_test, survival; TPC-H first-timers q3/q6/q8/q11/q12/q13/q15/
    # q17/q20/q21/q22; plus hhi, mix_entropy, winsorize, cramers_v,
    # editdist, burstiness, wordlen_profile). All stay hash-checked
    # every round by the sf0.001 pytest oracle suite + the
    # full-registry vanilla-session preflight.
    #
    # Round 13 rotated OUT (ROTATION.md): sentinel tranche B (q02,
    # q04-q07, q09, q11, q12, q14, q_s03 — all hash-green in
    # CORRECTNESS_r13) and the 40 round-13 rotate-ins, all hash-green
    # in CORRECTNESS_r13 (rule-2 pair q_x_seq_patterns + q_asm_bwt; the
    # 8 remaining round-11 additions lift_rules, heaps_curve, decay_agg,
    # codon_usage, dinuc_bias, lang_confusion, two_hop, payload_dedup;
    # the named queue kmer_entropy, gc_skew, calibration, item_cosine,
    # join_size, scd2_history, funnel, text_zipf, ewma, silence_trim;
    # and the 20-entry never-checked sweep head — the round-9 cohort
    # minimizers..tips, quality_filter, bigram_logprob, pii_redact,
    # containment, lsh_tuning, rate_report, simhash_pairs, sq_topk,
    # rerank, hard_negatives, lsh_recall). All stay hash-checked every
    # round by the sf0.001 pytest oracle suite + the full-registry
    # vanilla-session preflight.
    #
    # -- round 14 rotated IN (32 sweep slots, queue order from
    #    tools/coverage_report.py --list at the round-13 seal —
    #    pre-verified 32/32 green vs DuckDB at sf0.01 on the sealed
    #    round-13 HEAD; leads with the never-checked streaming batch
    #    shapes, VERDICT r13 #3):
    "q_s06_enrich_shape", "q_s07_clickview_shape", "q_s14_trending_shape",
    "q_mm_shot_bounds", "q_mm_chunked_payload", "q_sim_pq_recall",
    "q_graph_lpa", "q_x_tree_closure", "q_text_bpe_tokens",
    "q_x_union_except", "q_x_string_regex", "q_dedup_minhash_est",
    "q_dedup_cluster_sizes", "q_s08_interval_join",
    "q_x_stratified_sample", "q_x_ntile_firstlast",
    "q_x_embedding_dim_stats", "q_x_emb_centroids", "q_x_percent_rank",
    "q_x_conditional_aggs", "q_x_correlated_subquery", "q_tpch_q5_shape",
    "q_x_cube", "q_x_range_frame", "q_x_salted_join", "q_text_pii_scrub",
    "q_graph_pagerank", "q_cluster_kmeans", "q_x_confusion",
    "q_graph_triangles", "q_graph_kcore", "q_graph_scc",
]


def _apply_priority_order() -> None:
    global _REGISTRY
    ordered = {n: _REGISTRY[n] for n in _PRIORITY_PREFIX if n in _REGISTRY}
    ordered.update((n, v) for n, v in _REGISTRY.items() if n not in ordered)
    _REGISTRY = ordered


_apply_priority_order()
