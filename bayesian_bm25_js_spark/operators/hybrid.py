"""Hybrid sparse-dense fusion as a Spark dataflow.

balancedLogOddsFusion (fusion.ts:312-328) over DataFrames: per query,
min-max-normalize sparse logits and dense (cosine->probability) logits
across the candidate set, then blend. The normalization windows are
per-query (partitionBy query_id) — the reference's array-at-a-time
min/max generalizes to grouped windows, mirroring the per-`queryIds`
grouping of AttentionLogOddsWeights.fit (fusion.ts:950-968).

Everything is a column expression (clamp/logit/min/max/blend) —
whole-stage codegen, no Python. Degenerate ranges (< 1e-12) normalize
to all-zeros exactly like minMaxNormalize (fusion.ts:291-293).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

EPS = 1e-10


def clamp_col(p: Column) -> Column:
    return F.greatest(F.lit(EPS), F.least(F.lit(1.0 - EPS), p))


def logit_col(p: Column) -> Column:
    c = clamp_col(p)
    return F.log(c / (1.0 - c))


def cosine_to_probability_col(cos: Column) -> Column:
    return clamp_col((1.0 + cos) / 2.0)


def min_max_normalize_col(x: Column, partition_cols) -> Column:
    w = Window.partitionBy(*partition_cols)
    lo = F.min(x).over(w)
    hi = F.max(x).over(w)
    return F.when(hi - lo < 1e-12, F.lit(0.0)).otherwise((x - lo) / (hi - lo))


def balanced_fusion(
    candidates: DataFrame,
    sparse_col: str = "sparse_prob",
    dense_col: str = "cos",
    weight: float = 0.5,
    query_col: str = "query_id",
) -> DataFrame:
    """candidates (query_id, doc_id, sparse_prob, cos) ->
    + fusion_score = w·norm(logit(cos2prob(cos))) + (1-w)·norm(logit(sparse)).

    Returns fusion SCORES (not probabilities), higher = more relevant,
    matching the reference contract."""
    ls = logit_col(F.col(sparse_col))
    ld = logit_col(cosine_to_probability_col(F.col(dense_col)))
    ls_n = min_max_normalize_col(ls, [query_col])
    ld_n = min_max_normalize_col(ld, [query_col])
    return candidates.withColumn(
        "fusion_score", F.lit(weight) * ld_n + F.lit(1.0 - weight) * ls_n
    )


def log_odds_conjunction_col(
    prob_cols, alpha: float = 0.5, weights=None
) -> Column:
    """Unweighted/weighted log-odds conjunction of probability COLUMNS
    as a pure expression (fusion.ts:153-196): the JVM fast path used
    when the fusion runs inside a larger codegen'd projection. The
    Arrow kernel (operators/multi_field.py) remains the bit-parity
    path."""
    n = len(prob_cols)
    logits = [logit_col(F.col(c) if isinstance(c, str) else c) for c in prob_cols]
    if weights is not None:
        s = None
        for w, l in zip(weights, logits):
            term = F.lit(float(w)) * l
            s = term if s is None else s + term
        scaled = F.lit(float(n) ** alpha) * s
    else:
        s = None
        for l in logits:
            s = l if s is None else s + l
        scaled = (s / n) * F.lit(float(n) ** alpha)
    return F.when(
        scaled >= 0, 1.0 / (1.0 + F.exp(-scaled))
    ).otherwise(F.exp(scaled) / (1.0 + F.exp(scaled)))
