"""Text-analysis operators over the ``documents`` table (north star;
SURVEY.md §2.B Q25 + the LLM-pipeline text ops — no reference counterpart,
the reference has no text analytics, SURVEY.md §0).

All pure Catalyst expressions (no UDFs): language-ID (stopword-set
scoring), quality scoring (length/stopword/alpha ratios), token counting
(whitespace + regex tokenizations), and document fingerprinting (md5
fingerprint of normalized text + winnowing-style min/max char-shingle
hashes). Each has an exact DuckDB oracle in
``bigdatagenomic_spark.queries`` — the rules are deterministic, so they
sit under the hash-match gate.

Note on the driver data: every `documents.text` is English word-soup
regardless of the `lang` label, so language-ID correctness here means
"both engines score the declared rule identically", not label recovery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatagenomic_spark.functions import (
    char_shingles,
    md5_long,
    normalize_text,
    tokens,
)
from bigdatagenomic_spark.sources.tables import load_table

# fixed stopword sets (mirrored as literals in the oracle SQL)
STOPSETS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "is", "in", "it"],
    "de": ["der", "die", "das", "und", "ist", "ein"],
    "fr": ["le", "les", "et", "est", "une", "dans"],
    "es": ["el", "los", "y", "es", "una", "en"],
}


def _stop_count(tok, words: list[str]):
    return F.size(F.filter(tok, lambda t: t.isin(words)))


def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens vs regex word tokens."""
    d = load_table(spark, sf_dir, "documents")
    ws = F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != F.lit(""))
    tok = tokens(F.col("text"))
    return (
        d.select(
            "doc_id",
            F.size(ws).alias("n_ws_tokens"),
            F.size(tok).alias("n_word_tokens"),
            F.length("text").cast("int").alias("len_chars"),
        )
        .orderBy("doc_id")
    )


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic quality score from token/stopword/alpha ratios."""
    d = load_table(spark, sf_dir, "documents")
    tok = tokens(F.col("text"))
    n_tok = F.size(tok)
    safe_n = F.greatest(n_tok, F.lit(1))
    stop = _stop_count(tok, STOPSETS["en"])
    alpha = F.length(F.regexp_replace(F.lower("text"), "[^a-z]", ""))
    n_chars = F.greatest(F.length("text"), F.lit(1))
    stop_ratio = stop.cast("double") / safe_n
    alpha_ratio = alpha.cast("double") / n_chars
    quality = (
        F.lit(0.5) * F.least(n_tok, F.lit(100)).cast("double") / 100.0
        + F.lit(0.3) * alpha_ratio
        + F.lit(0.2) * F.least(stop_ratio * 5.0, F.lit(1.0))
    )
    return (
        d.select(
            "doc_id",
            n_tok.alias("n_tokens"),
            F.round(stop_ratio, 4).alias("stop_ratio"),
            F.round(alpha_ratio, 4).alias("alpha_ratio"),
            F.round(quality, 4).alias("quality"),
        )
        .orderBy("doc_id")
    )


def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-set language scoring with a deterministic argmax."""
    d = load_table(spark, sf_dir, "documents")
    tok = tokens(F.col("text"))
    cnt = {lang: _stop_count(tok, words) for lang, words in STOPSETS.items()}
    en, de, fr, es = cnt["en"], cnt["de"], cnt["fr"], cnt["es"]
    pred = (
        F.when((en >= de) & (en >= fr) & (en >= es) & (en > 0), "en")
        .when((de >= fr) & (de >= es) & (de > 0), "de")
        .when((fr >= es) & (fr > 0), "fr")
        .when(es > 0, "es")
        .otherwise("und")
    )
    return (
        d.select(
            "doc_id",
            en.alias("en_cnt"),
            de.alias("de_cnt"),
            fr.alias("fr_cnt"),
            es.alias("es_cnt"),
            pred.alias("pred_lang"),
        )
        .orderBy("doc_id")
    )


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: md5-60bit of normalized text + winnowing-style
    min/max 5-gram shingle hashes (rolling-hash document sketch)."""
    d = load_table(spark, sf_dir, "documents")
    norm = normalize_text(F.col("text"))
    sh = char_shingles(norm, 5)
    hashes = F.transform(sh, md5_long)
    return (
        d.select(
            "doc_id",
            md5_long(norm).alias("fp"),
            F.array_min(hashes).alias("min_shingle_h"),
            F.array_max(hashes).alias("max_shingle_h"),
        )
        .orderBy("doc_id")
    )


def q25_term_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 term frequencies (tokenize + explode + count)."""
    d = load_table(spark, sf_dir, "documents")
    w = d.select(F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("w"))
    return (
        w.where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), F.asc("w"))
        .limit(50)
    )


# GPT-2-style pretokenizer shape: contraction | space-word | space-number
# | space-punct-run | whitespace-run. Counts pretokens (the unit BPE then
# splits further) without needing a vocab — the standard cheap proxy for
# "how many tokens will this document cost".
BPE_PATTERN = r"'[a-z]+| ?[a-z]+| ?[0-9]+| ?[^\sa-z0-9']+|\s+"


def q_text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish pretoken counts per document (JVM regexp, no UDF)."""
    d = load_table(spark, sf_dir, "documents")
    lowered = F.lower("text")
    return (
        d.select(
            "doc_id",
            F.regexp_count(lowered, F.lit(BPE_PATTERN)).alias("n_pretokens"),
            F.regexp_count(lowered, F.lit(r"'[a-z]+| ?[a-z]+")).alias("n_word_pieces"),
        )
        .orderBy("doc_id")
    )


def _round4(col):
    # engine-portable HALF_UP (see relational.round2_portable)
    return F.floor(col * 10000 + F.lit(0.5)).cast("double") / 10000


def q_text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF terms per document.

    Classic corpus weighting: tf(d,w) * ln(N/df(w)). All relational —
    one tokenize+explode, two hash aggregations, a 1-row broadcast for
    N, a per-doc top-k window. At 100 TB the (doc,w) and (w) aggs are
    map-side-combined shuffles on well-distributed keys; the top-k
    window shuffles on doc_id only.
    """
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("w")
    ).where(F.col("w") != "")
    tf = tok.groupBy("doc_id", "w").agg(F.count("*").alias("tf"))
    # df(w) as a window over the tf aggregate — rows per (doc,w) are
    # unique, so count over (partition by w) IS the document frequency.
    # One extra shuffle on w, but NO second scan+tokenize of the corpus
    # (the groupBy-dfreq + join formulation re-reads documents — at
    # 100 TB the re-scan dominates everything else in the query).
    dfreq_w = F.count("*").over(W.partitionBy("w"))
    # N: count(*) scans no columns (row-group counts only) — cheap
    n = d.agg(F.count("*").alias("n"))
    scored = (
        tf.withColumn("df", dfreq_w)
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            _round4(
                F.col("tf")
                * F.log(F.col("n").cast("double") / F.col("df").cast("double"))
            ),
        )
    )
    w5 = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("w"))
    return (
        scored.withColumn("rnk", F.row_number().over(w5))
        .where(F.col("rnk") <= 5)
        .select("doc_id", "w", "tf", "df", "tfidf", "rnk")
        .orderBy("doc_id", "rnk")
    )


def q_text_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-40 adjacent word pairs — the counting kernel of a BPE merge
    round / collocation mining. zip_with pairs each token with its
    successor JVM-side (no UDF), then one explode + count shuffle."""
    d = load_table(spark, sf_dir, "documents")
    tok = F.filter(F.split(F.lower("text"), "[^a-z]+"), lambda t: t != F.lit(""))
    pairs = F.zip_with(
        tok,
        F.slice(tok, 2, F.greatest(F.size(tok) - 1, F.lit(1))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    # zip_with pads the shorter side with NULL -> concat_ws drops the
    # null part; the trailing "lone word" entries are filtered out
    bg = d.select(F.explode(pairs).alias("bigram")).where(
        F.col("bigram").rlike("^[a-z]+ [a-z]+$")
    )
    return (
        bg.groupBy("bigram")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), F.asc("bigram"))
        .limit(40)
    )
