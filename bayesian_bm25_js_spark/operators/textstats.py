"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, fingerprinting. Pure Catalyst expressions —
no Python in the row path — so each scales to the full corpus as a
single narrow projection (plus one shuffle where an aggregate is
noted).
"""

from __future__ import annotations

from typing import Dict, List

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bayesian_bm25_js_spark.operators.tokenize import tokenize_column

# Tiny marker-word profiles (function words) for the n-gram-free
# heuristic language ID; extend per corpus. Deterministic and
# SQL-mirrorable (list_intersect in DuckDB).
LANG_MARKERS: Dict[str, List[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "for", "with"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "los"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "est", "dans"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "den", "ein", "zu"],
    "zh": ["de", "shi", "le", "wo", "ni", "ta", "men", "zai", "you", "he"],
}


def lang_id_column(tokens: Column) -> Column:
    """Marker-overlap language ID: argmax over languages of
    |tokens ∩ markers(lang)|; ties and zero overlap -> 'und'.
    Tie-break: language order in LANG_MARKERS (first wins)."""
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang, markers in LANG_MARKERS.items():
        score = F.size(
            F.array_intersect(
                tokens, F.array(*[F.lit(m) for m in markers])
            )
        )
        is_better = score > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, score).otherwise(best_score)
    return best_lang


STOPWORDS = LANG_MARKERS["en"]


def quality_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """-> (doc_id, n_chars, n_tokens, n_distinct, distinct_ratio,
    mean_tok_len, stopword_ratio, alnum_ratio, quality_score).

    quality_score is a simple monotone blend in [0,1]: favors docs with
    reasonable length, lexical diversity and sane punctuation load."""
    toks = tokenize_column(F.col(text_col))
    d = df.select(
        F.col(id_col).alias("doc_id"),
        F.length(text_col).alias("n_chars"),
        F.col(text_col).alias("__text"),
        toks.alias("toks"),
    )
    n_tokens = F.size("toks")
    n_distinct = F.size(F.array_distinct("toks"))
    sum_len = F.aggregate(
        F.transform("toks", lambda t: F.length(t).cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    alnum = F.length(F.regexp_replace(F.lower("__text"), "[^a-z0-9]", ""))
    stop = F.size(
        F.array_intersect("toks", F.array(*[F.lit(s) for s in STOPWORDS]))
    )
    out = d.select(
        "doc_id",
        "n_chars",
        n_tokens.alias("n_tokens"),
        n_distinct.alias("n_distinct"),
        F.when(n_tokens > 0, n_distinct / n_tokens).otherwise(0.0).alias("distinct_ratio"),
        F.when(n_tokens > 0, sum_len / n_tokens).otherwise(0.0).alias("mean_tok_len"),
        F.when(n_tokens > 0, stop / n_tokens).otherwise(0.0).alias("stopword_ratio"),
        F.when(F.col("n_chars") > 0, alnum / F.col("n_chars")).otherwise(0.0).alias("alnum_ratio"),
    )
    length_term = F.least(F.lit(1.0), F.col("n_tokens") / 100.0)
    quality = F.round(
        0.4 * length_term
        + 0.3 * F.col("distinct_ratio")
        + 0.3 * F.col("alnum_ratio"),
        6,
    )
    return out.withColumn("quality_score", quality)


def token_count_column(text: Column, bpe_like: bool = False) -> Column:
    """Token count: whitespace words, or a BPE-ish proxy that also
    splits camelCase/underscores/digit runs (code-aware estimate)."""
    if not bpe_like:
        return F.size(F.filter(F.split(text, r"\s+"), lambda t: t != ""))
    pieces = F.split(
        F.regexp_replace(text, r"([a-z])([A-Z])", r"$1 $2"),
        r"[\s_\W]+|(?<=[a-zA-Z])(?=[0-9])|(?<=[0-9])(?=[a-zA-Z])",
    )
    return F.size(F.filter(pieces, lambda t: t != ""))


def fingerprint_column(tokens: Column, shingle_k: int = 5) -> Column:
    """Document fingerprint: min xxhash64 over k-gram shingles (the
    1-permutation MinHash — a stable rolling-hash-style content id)."""
    from bayesian_bm25_js_spark.operators.dedup import shingle_column

    return F.array_min(shingle_column(tokens, shingle_k))


def text_stats_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass combined table: quality features + lang id + fingerprint."""
    toks = tokenize_column(F.col(text_col))
    q = quality_features(df, text_col)
    extra = df.select(
        "doc_id",
        lang_id_column(toks).alias("lang_pred"),
        fingerprint_column(toks).alias("fingerprint"),
        token_count_column(F.col(text_col)).alias("ws_tokens"),
        token_count_column(F.col(text_col), bpe_like=True).alias("bpe_tokens"),
    )
    return q.join(extra, "doc_id")
