"""Shared column-expression helpers (pure Catalyst expressions, no
UDFs; the engine-portable hash/token/vector vocabulary used across
SURVEY.md §2.B Q24-Q26 and the LLM-pipeline operators).

Everything here is engine-portable by construction: each helper has an
exact DuckDB-SQL equivalent used by the oracle strings in
``bigdatagenomic_spark.queries`` (e.g. ``md5_long`` ==
``CAST('0x' || substr(md5(x),1,15) AS BIGINT)``), validated byte-for-byte
in tests. This is what lets approximate-looking operators (minhash,
simhash, fingerprints) be *deterministic* and therefore sit under the
driver's hash-match gate instead of a weaker rows-only check.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 2^31 - 1 (Mersenne prime) — modulus for the minhash permutation family;
# keeps a*h+b products within int64 under ANSI overflow checking.
MERSENNE31 = 2_147_483_647

# fixed permutation family for minhash (seeded offline, hardcoded so the
# DuckDB oracle can embed the same literals)
MINHASH_COEFFS: list[tuple[int, int]] = [
    (1203077161, 723469752), (1610612741, 383845423), (805306457, 1102520059),
    (402653189, 1431655765), (201326611, 268435459), (100663319, 1077952576),
    (50331653, 1840700269), (25165843, 555555555), (12582917, 1987654321),
    (6291469, 123456789), (3145739, 987654321), (1572869, 192837465),
    (786433, 1029384756), (393241, 1122334455), (196613, 1357924680),
    (98317, 864197532),
]


def md5_long(col: Column | str) -> Column:
    """Deterministic 60-bit hash of a string, identical across engines.

    Spark: ``conv(substring(md5(x),1,15),16,10)`` cast to long.
    DuckDB: ``CAST('0x' || substr(md5(x),1,15) AS BIGINT)``.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def tokens(col: Column | str) -> Column:
    """Lowercase word tokens: split on non-alphanumeric, drop empties."""
    return F.filter(
        F.split(F.lower(col), "[^a-z0-9]+"), lambda t: t != F.lit("")
    )


def let_bound(expr: Column, body) -> Column:
    """Evaluate ``expr`` ONCE per row and pass the result to ``body``.

    Spark has no let-binding in the expression language: composing
    ``f(g(x))`` where ``f`` references its argument k times inlines the
    whole ``g(x)`` subtree at every reference site, and inside a
    higher-order function's lambda that means g(x) re-evaluates PER
    ARRAY ELEMENT (measured 17x slowdown on word-shingling, where the
    tokenizer re-split the document for every shingle). The standard
    trick: wrap the value in a 1-element array and bind it through a
    ``transform`` lambda variable — lambda variables are plain slot
    reads, so every reference inside ``body`` is O(1)."""
    return F.get(F.transform(F.array(expr), body), 0)


def word_shingles(tok: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a token array.

    ``tok`` may be an arbitrary composed expression (e.g.
    ``tokens(col)``): it is let-bound, never re-evaluated per element."""

    def body(t: Column) -> Column:
        idx = F.sequence(F.lit(1), F.greatest(F.size(t) - F.lit(n - 1), F.lit(1)))
        # try_element_at: ANSI mode errors on out-of-range element_at;
        # short docs (< n tokens) produce partial shingles via concat_ws
        # null-skip, matching the DuckDB oracle's NULL list indexing
        sh = F.transform(
            idx,
            lambda i: F.concat_ws(
                " ",
                *[F.try_element_at(t, (i + F.lit(j)).cast("int")) for j in range(n)],
            ),
        )
        return F.array_distinct(sh)

    return let_bound(tok, body)


def char_shingles(col: Column, n: int = 5) -> Column:
    """Character n-gram shingles (1-based substring positions).

    ``col`` is let-bound: a composed input (e.g. ``normalize_text(x)``)
    is evaluated once, not once per shingle position."""

    def body(s: Column) -> Column:
        idx = F.sequence(
            F.lit(1), F.greatest(F.length(s) - F.lit(n - 1), F.lit(1))
        )
        return F.transform(idx, lambda i: F.substring(s, i, n))

    return let_bound(col, body)


def normalize_text(col: Column | str) -> Column:
    """Canonical form for fingerprinting: lowercase, collapsed whitespace."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def dot(a: Column, b: Column) -> Column:
    """Sequential-order dot product of two numeric arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; both inputs cast to double arrays by the caller.

    ``try_divide``: a zero vector has no direction — similarity NULL,
    never an ANSI divide-by-zero job failure (Spark 4 ANSI errors on
    double/0 as well as int/0)."""
    return F.try_divide(dot(a, b), F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))
