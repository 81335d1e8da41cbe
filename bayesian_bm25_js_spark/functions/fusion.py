"""Probabilistic score-fusion algebra (NumPy port of the reference fusion layer).

AND/OR/NOT in log-space, log-odds conjunction with n^alpha confidence
scaling and optional gating/weights, cosine->probability mapping,
balanced hybrid fusion, and stable softmax (reference fusion.ts:19-342).

Reduction order matters for float64 parity: the reference sums with
scalar loops (left-to-right), so reducers here use ``seq_sum``
(cumsum-based sequential sums), not np.sum's pairwise summation.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import numpy as np

from bayesian_bm25_js_spark.functions.kernel import (
    clamp_probability,
    logit,
    seq_sum,
    sigmoid,
)

ArrayLike = Union[float, Sequence[float], np.ndarray]

SQRT_N_ALPHA = 0.5  # alpha="auto" -> sqrt(n) scaling law (fusion.ts:99)


def cosine_to_probability(score: ArrayLike) -> ArrayLike:
    """P = clamp((1 + s) / 2), Definition 7.1.2 (fusion.ts:23-32)."""
    out = clamp_probability((1.0 + np.asarray(score, dtype=np.float64)) / 2.0)
    return float(out) if np.ndim(out) == 0 else out


def prob_not(prob: ArrayLike) -> ArrayLike:
    """P(NOT R) = clamp(1 - clamp(p)) — note the double clamp (fusion.ts:39-47)."""
    out = clamp_probability(1.0 - clamp_probability(np.asarray(prob, dtype=np.float64)))
    return float(out) if np.ndim(out) == 0 else out


def prob_and(probs: ArrayLike) -> ArrayLike:
    """Product rule in log-space, Eq. 33-34 (fusion.ts:53-74).

    1D input reduces to a scalar; 2D input reduces along the last axis.
    Empty input returns 0 like the reference.
    """
    a = np.asarray(probs, dtype=np.float64)
    if a.size == 0:
        return 0.0
    out = np.exp(seq_sum(np.log(clamp_probability(a)), axis=-1))
    return float(out) if np.ndim(out) == 0 else out


def prob_or(probs: ArrayLike) -> ArrayLike:
    """Complement rule in log-space, Eq. 36-37 (fusion.ts:76-97)."""
    a = np.asarray(probs, dtype=np.float64)
    if a.size == 0:
        return 0.0
    out = 1.0 - np.exp(seq_sum(np.log(1.0 - clamp_probability(a)), axis=-1))
    return float(out) if np.ndim(out) == 0 else out


def resolve_alpha(alpha, default_value: float) -> float:
    """"auto" -> 0.5 sqrt(n) scaling; None -> default (fusion.ts:102-118)."""
    if alpha is None:
        return default_value
    if alpha == "auto":
        return SQRT_N_ALPHA
    if isinstance(alpha, str):
        raise ValueError(
            f'alpha must be a number, None, or "auto", got "{alpha}"'
        )
    return float(alpha)


def apply_gating(
    logit_values: np.ndarray, gating: str, beta: float = 1.0
) -> np.ndarray:
    """Sparse-signal gating on logits (fusion.ts:131-151).

    none | relu max(0,l) | swish l*sigma(beta*l) | gelu l*sigma(1.702*l)
    (gelu ignores beta).
    """
    l = np.asarray(logit_values, dtype=np.float64)
    if gating == "none":
        return l
    if gating == "relu":
        return np.maximum(0.0, l)
    if gating == "swish":
        return l * sigmoid(beta * l)
    if gating == "gelu":
        return l * sigmoid(1.702 * l)
    raise ValueError(
        f'gating must be "none", "relu", "swish", or "gelu", got "{gating}"'
    )


def log_odds_conjunction(
    probs: ArrayLike,
    alpha=None,
    weights: Optional[Sequence[float]] = None,
    gating: str = "none",
    gating_beta: float = 1.0,
) -> ArrayLike:
    """Log-odds conjunction with n^alpha confidence scaling
    (fusion.ts:153-281; Paper 2 Section 4 / Theorem 8.3).

    Unweighted: sigma(mean(gated logits) * n^alpha), default alpha 0.5.
    Weighted (Log-OP): sigma(n^alpha * sum(w_i * gated logit_i)),
    default alpha 0.0; weights validated >= 0 and sum to 1 +- 1e-6.
    1D input -> scalar; 2D input -> per-row vector.
    """
    a = np.asarray(probs, dtype=np.float64)
    if a.size == 0:
        return 0.0
    was_1d = a.ndim == 1
    rows = a[None, :] if was_1d else a
    n = rows.shape[-1]

    clamped = clamp_probability(rows)
    raw_logits = np.log(clamped / (1.0 - clamped))
    gated = apply_gating(raw_logits, gating, gating_beta)

    if weights is not None:
        w = np.asarray(weights, dtype=np.float64)
        if np.any(w < 0):
            raise ValueError("weights must be non-negative")
        w_sum = float(seq_sum(w))
        if abs(w_sum - 1.0) > 1e-6:
            raise ValueError(f"weights must sum to 1, got {w_sum}")
        eff_alpha = resolve_alpha(alpha, 0.0)
        weighted = seq_sum(w * gated, axis=-1)
        out = sigmoid(float(n) ** eff_alpha * weighted)
    else:
        eff_alpha = resolve_alpha(alpha, 0.5)
        l_bar = seq_sum(gated, axis=-1) / n
        out = sigmoid(l_bar * float(n) ** eff_alpha)

    if was_1d:
        return float(np.asarray(out).reshape(-1)[0])
    return np.asarray(out)


def min_max_normalize(arr: ArrayLike) -> np.ndarray:
    """(x - min) / (max - min); all zeros when range < 1e-12 (fusion.ts:284-296)."""
    a = np.asarray(arr, dtype=np.float64)
    lo, hi = np.min(a), np.max(a)
    if hi - lo < 1e-12:
        return np.zeros_like(a)
    return (a - lo) / (hi - lo)


def balanced_log_odds_fusion(
    sparse_probs: ArrayLike,
    dense_similarities: ArrayLike,
    weight: float = 0.5,
) -> np.ndarray:
    """Hybrid sparse-dense fusion in normalized logit space (fusion.ts:312-328).

    Returns fusion SCORES (not probabilities):
    weight * norm(logit(cos2prob(dense))) + (1-weight) * norm(logit(sparse)).
    """
    logit_sparse = logit(clamp_probability(np.asarray(sparse_probs, dtype=np.float64)))
    logit_dense = logit(cosine_to_probability(np.asarray(dense_similarities, dtype=np.float64)))
    return weight * min_max_normalize(logit_dense) + (1.0 - weight) * min_max_normalize(logit_sparse)


def softmax(z: ArrayLike) -> np.ndarray:
    """Stable softmax, shift by max (fusion.ts:331-342)."""
    a = np.asarray(z, dtype=np.float64)
    e = np.exp(a - np.max(a))
    return e / seq_sum(e)


def softmax2d(z: ArrayLike) -> np.ndarray:
    """Row-wise stable softmax (fusion.ts:663-676)."""
    a = np.asarray(z, dtype=np.float64)
    e = np.exp(a - np.max(a, axis=-1, keepdims=True))
    return e / seq_sum(e, axis=-1)[..., None]
