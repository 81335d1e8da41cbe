"""Vectorized NumPy numeric kernel — the float64 heart of the engine.

Elementwise math mirroring the reference's probability layer
(probability.ts:13-272) with identical IEEE-754 float64 semantics:
stable branch sigmoid, epsilon clamping, composite priors, and the
two-step multiplicative Bayes posterior (Remark 4.4.5) — NOT the
logit/sigmoid form, because the two-step form is what the reference
executes and float64 addition/rounding differs between the two.

All functions accept scalars or ndarrays and return float64.
These kernels run (a) driver-side for parameter estimation and
(b) inside pandas/Arrow UDFs for distributed calibration, so Spark
results match the NumPy oracle bit-for-bit.
"""

from __future__ import annotations

from typing import Optional, Union

import numpy as np

ArrayLike = Union[float, np.ndarray]

EPSILON = 1e-10  # probability.ts:13


def clamp_probability(p: ArrayLike) -> ArrayLike:
    """Clip to [EPSILON, 1 - EPSILON] (probability.ts:15-17)."""
    return np.clip(p, EPSILON, 1.0 - EPSILON)


def sigmoid(x: ArrayLike) -> ArrayLike:
    """Numerically stable sigmoid, branch on sign (probability.ts:28-34)."""
    x = np.asarray(x, dtype=np.float64)
    with np.errstate(over="ignore"):
        pos = 1.0 / (1.0 + np.exp(-np.abs(x)))
        neg_exp = np.exp(-np.abs(x))
        neg = neg_exp / (1.0 + neg_exp)
    out = np.where(x >= 0, pos, neg)
    return float(out) if out.ndim == 0 else out


def logit(p: ArrayLike) -> ArrayLike:
    """log(p / (1 - p)) after epsilon clamp (probability.ts:45-48)."""
    c = clamp_probability(np.asarray(p, dtype=np.float64))
    out = np.log(c / (1.0 - c))
    return float(out) if np.ndim(out) == 0 else out


def likelihood(score: ArrayLike, alpha: float, beta: float) -> ArrayLike:
    """Sigmoid likelihood sigma(alpha * (s - beta)), Eq. 20 (probability.ts:162-169)."""
    return sigmoid(alpha * (np.asarray(score, dtype=np.float64) - beta))


def tf_prior(tf: ArrayLike) -> ArrayLike:
    """0.2 + 0.7 * min(1, tf / 10), Eq. 25 (probability.ts:172-179)."""
    t = np.asarray(tf, dtype=np.float64)
    out = 0.2 + 0.7 * np.minimum(1.0, t / 10.0)
    return float(out) if out.ndim == 0 else out


def norm_prior(doc_len_ratio: ArrayLike) -> ArrayLike:
    """0.3 + 0.6 * (1 - min(1, |r - 0.5| * 2)), Eq. 26 (probability.ts:187-198)."""
    r = np.asarray(doc_len_ratio, dtype=np.float64)
    out = 0.3 + 0.6 * (1.0 - np.minimum(1.0, np.abs(r - 0.5) * 2.0))
    return float(out) if out.ndim == 0 else out


def composite_prior(tf: ArrayLike, doc_len_ratio: ArrayLike) -> ArrayLike:
    """clamp(0.7 * P_tf + 0.3 * P_norm, 0.1, 0.9), Eq. 27 (probability.ts:201-219)."""
    out = np.clip(0.7 * tf_prior(tf) + 0.3 * norm_prior(doc_len_ratio), 0.1, 0.9)
    return float(out) if np.ndim(out) == 0 else out


def posterior(
    likelihood_val: ArrayLike,
    prior: ArrayLike,
    base_rate: Optional[float] = None,
) -> ArrayLike:
    """Two-step multiplicative Bayes update, Eq. 22 + Remark 4.4.5
    (probability.ts:231-272).

    Step 1: p1 = L*p / (L*p + (1-L)*(1-p)), clamped.
    Step 2 (if base_rate): P = p1*br / (p1*br + (1-p1)*(1-br)), clamped.

    Mathematically equal to sigmoid(logit L + logit p + logit br) but
    kept in the multiplicative form for float64 rounding parity.
    """
    lv = np.asarray(likelihood_val, dtype=np.float64)
    p = np.asarray(prior, dtype=np.float64)
    numerator = lv * p
    result = clamp_probability(numerator / (numerator + (1.0 - lv) * (1.0 - p)))
    if base_rate is not None:
        num_br = result * base_rate
        result = clamp_probability(
            num_br / (num_br + (1.0 - result) * (1.0 - base_rate))
        )
    return float(result) if np.ndim(result) == 0 else result


def score_to_probability(
    score: ArrayLike,
    tf: ArrayLike,
    doc_len_ratio: ArrayLike,
    alpha: float,
    beta: float,
    base_rate: Optional[float] = None,
    mode: str = "balanced",
    prior_fn=None,
) -> ArrayLike:
    """Full pipeline: BM25 score -> calibrated probability
    (probability.ts:283-344).

    ``tf`` here is the reference's (misnamed) distinct-query-term overlap
    count, NOT term frequency (scorer.ts:549-564).
    mode='prior_free' uses prior=0.5; ``prior_fn(score, tf, dlr)`` is the
    user prior hook, clamped like the reference.
    """
    score = np.asarray(score, dtype=np.float64)
    l_val = likelihood(score, alpha, beta)
    if mode == "prior_free":
        prior = np.full_like(score, 0.5) if score.ndim else 0.5
    elif prior_fn is not None:
        custom = prior_fn(score, tf, doc_len_ratio)
        custom = np.broadcast_to(
            np.asarray(custom, dtype=np.float64), np.shape(score)
        )
        prior = clamp_probability(custom)
    else:
        prior = composite_prior(tf, doc_len_ratio)
    return posterior(l_val, prior, base_rate)


def wand_upper_bound(
    bm25_upper_bound: ArrayLike,
    alpha: float,
    beta: float,
    base_rate: Optional[float] = None,
) -> ArrayLike:
    """Safe Bayesian WAND bound, Theorem 6.1.2 (probability.ts:346-368).

    posterior(sigma(alpha*(ub-beta)), pMax=0.9, base_rate); pMax is
    hardcoded to 0.9 in the reference.
    """
    l_max = likelihood(bm25_upper_bound, alpha, beta)
    return posterior(l_max, 0.9, base_rate)


def seq_sum(a: np.ndarray, axis: int = -1) -> np.ndarray:
    """Strictly sequential (left-to-right) float64 sum along an axis.

    The reference accumulates with scalar `+=` loops; np.sum uses pairwise
    summation whose rounding differs. cumsum is sequential by definition,
    so its last element reproduces the reference's accumulation order.
    """
    a = np.asarray(a, dtype=np.float64)
    if a.size == 0:
        return np.zeros(a.sum(axis=axis).shape)
    return np.take(np.cumsum(a, axis=axis), -1, axis=axis)
