"""Bayesian probability transform — driver-side state, NumPy math.

Port of the reference's BayesianProbabilityTransform and
TemporalBayesianTransform (probability.ts:97-785): batch gradient-descent
fit in three modes (balanced C1 / prior_aware C2 / prior_free C3), online
SGD update with EMA + bias correction + L2 clip + lr decay + Polyak
averaging, and time-weighted fitting.

Training state is inherently sequential and tiny -> lives on the driver.
Inference (score_to_probability) is delegated to the vectorized kernel
and is what runs inside pandas UDFs at scale.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import numpy as np

from bayesian_bm25_js_spark.functions.kernel import (
    clamp_probability,
    composite_prior,
    likelihood as _likelihood,
    posterior as _posterior,
    score_to_probability as _score_to_probability,
    sigmoid,
    wand_upper_bound as _wand_upper_bound,
)

VALID_MODES = ("balanced", "prior_aware", "prior_free")


def _check_mode(mode: str) -> None:
    if mode not in VALID_MODES:
        raise ValueError(
            'mode must be one of "balanced", "prior_aware", "prior_free", '
            f'got "{mode}"'
        )


class BayesianProbabilityTransform:
    """Transforms raw BM25 scores into calibrated probabilities
    (probability.ts:97-603).

    alpha: sigmoid steepness; beta: sigmoid midpoint;
    base_rate: corpus-level relevance base rate in (0,1) or None.
    prior_fn: optional (score, tf, doc_len_ratio) -> prior hook.
    """

    def __init__(
        self,
        alpha: float = 1.0,
        beta: float = 0.0,
        base_rate: Optional[float] = None,
        prior_fn=None,
    ) -> None:
        if base_rate is not None and not (0.0 < base_rate < 1.0):
            raise ValueError(f"baseRate must be in (0, 1), got {base_rate}")
        self.alpha = float(alpha)
        self.beta = float(beta)
        self.base_rate = base_rate
        self._prior_fn = prior_fn
        self._training_mode = "balanced"
        self._n_updates = 0
        self._grad_alpha_ema = 0.0
        self._grad_beta_ema = 0.0
        self._alpha_avg = float(alpha)
        self._beta_avg = float(beta)

    # -- read-only views ---------------------------------------------------
    @property
    def averaged_alpha(self) -> float:
        return self._alpha_avg

    @property
    def averaged_beta(self) -> float:
        return self._beta_avg

    @property
    def n_updates(self) -> int:
        return self._n_updates

    @property
    def grad_alpha_ema(self) -> float:
        return self._grad_alpha_ema

    @property
    def training_mode(self) -> str:
        return self._training_mode

    # -- inference ---------------------------------------------------------
    def likelihood(self, score):
        return _likelihood(score, self.alpha, self.beta)

    @staticmethod
    def tf_prior(tf):
        from bayesian_bm25_js_spark.functions.kernel import tf_prior

        return tf_prior(tf)

    @staticmethod
    def norm_prior(ratio):
        from bayesian_bm25_js_spark.functions.kernel import norm_prior

        return norm_prior(ratio)

    @staticmethod
    def composite_prior(tf, ratio):
        return composite_prior(tf, ratio)

    @staticmethod
    def posterior(likelihood_val, prior, base_rate: Optional[float] = None):
        return _posterior(likelihood_val, prior, base_rate)

    def score_to_probability(self, score, tf, doc_len_ratio):
        return _score_to_probability(
            score,
            tf,
            doc_len_ratio,
            self.alpha,
            self.beta,
            self.base_rate,
            mode=self._training_mode,
            prior_fn=self._prior_fn,
        )

    def wand_upper_bound(self, bm25_upper_bound):
        return _wand_upper_bound(
            bm25_upper_bound, self.alpha, self.beta, self.base_rate
        )

    # -- training ----------------------------------------------------------
    def _gradients(
        self,
        scores: np.ndarray,
        labels: np.ndarray,
        alpha: float,
        beta: float,
        mode: str,
        priors: Optional[np.ndarray],
        sample_weights: Optional[np.ndarray] = None,
    ):
        """Per-batch (grad_alpha, grad_beta) averaged over samples
        (probability.ts:417-450, 716-739)."""
        l_val = clamp_probability(sigmoid(alpha * (scores - beta)))
        w = sample_weights if sample_weights is not None else 1.0
        if mode == "prior_aware":
            p = priors
            denom = l_val * p + (1.0 - l_val) * (1.0 - p)
            predicted = clamp_probability((l_val * p) / denom)
            d_p_d_l = (p * (1.0 - p)) / (denom * denom)
            d_l_d_alpha = l_val * (1.0 - l_val) * (scores - beta)
            d_l_d_beta = -l_val * (1.0 - l_val) * alpha
            error = predicted - labels
            grad_alpha = float(np.sum(w * error * d_p_d_l * d_l_d_alpha))
            grad_beta = float(np.sum(w * error * d_p_d_l * d_l_d_beta))
        else:
            error = l_val - labels
            grad_alpha = float(np.sum(w * error * (scores - beta)))
            grad_beta = float(np.sum(w * error * -alpha))
        n = scores.shape[0]
        return grad_alpha / n, grad_beta / n

    def fit(
        self,
        scores: Sequence[float],
        labels: Sequence[float],
        learning_rate: float = 0.01,
        max_iterations: int = 1000,
        tolerance: float = 1e-6,
        mode: str = "balanced",
        tfs: Optional[Sequence[float]] = None,
        doc_len_ratios: Optional[Sequence[float]] = None,
        sample_weights: Optional[np.ndarray] = None,
    ) -> None:
        """Batch GD on alpha/beta, Algorithm 8.3.1 (probability.ts:383-477)."""
        _check_mode(mode)
        if mode == "prior_aware" and (tfs is None or doc_len_ratios is None):
            raise ValueError(
                "tfs and docLenRatios are required when mode='prior_aware'"
            )
        scores = np.asarray(scores, dtype=np.float64)
        labels = np.asarray(labels, dtype=np.float64)
        priors = (
            np.asarray(composite_prior(tfs, doc_len_ratios), dtype=np.float64)
            if mode == "prior_aware"
            else None
        )

        alpha, beta = self.alpha, self.beta
        for _ in range(max_iterations):
            grad_alpha, grad_beta = self._gradients(
                scores, labels, alpha, beta, mode, priors, sample_weights
            )
            new_alpha = alpha - learning_rate * grad_alpha
            new_beta = beta - learning_rate * grad_beta
            converged = (
                abs(new_alpha - alpha) < tolerance
                and abs(new_beta - beta) < tolerance
            )
            alpha, beta = new_alpha, new_beta
            if converged:
                break

        self.alpha, self.beta = alpha, beta
        self._training_mode = mode
        self._n_updates = 0
        self._grad_alpha_ema = 0.0
        self._grad_beta_ema = 0.0
        self._alpha_avg = alpha
        self._beta_avg = beta

    def update(
        self,
        score,
        label,
        learning_rate: float = 0.01,
        momentum: float = 0.9,
        decay_tau: float = 1000.0,
        max_grad_norm: float = 1.0,
        avg_decay: float = 0.995,
        mode: Optional[str] = None,
        tf=None,
        doc_len_ratio=None,
    ) -> None:
        """Online SGD with EMA smoothing, bias correction, L2 clipping,
        lr decay, alpha floor, Polyak averaging (probability.ts:487-602)."""
        effective_mode = mode if mode is not None else self._training_mode
        _check_mode(effective_mode)
        if effective_mode == "prior_aware" and (tf is None or doc_len_ratio is None):
            raise ValueError(
                "tf and docLenRatio are required when mode='prior_aware'"
            )

        scores = np.atleast_1d(np.asarray(score, dtype=np.float64))
        labels = np.atleast_1d(np.asarray(label, dtype=np.float64))
        priors = None
        if effective_mode == "prior_aware":
            tfs = np.atleast_1d(np.asarray(tf, dtype=np.float64))
            dlrs = np.atleast_1d(np.asarray(doc_len_ratio, dtype=np.float64))
            priors = np.asarray(composite_prior(tfs, dlrs), dtype=np.float64)

        grad_alpha, grad_beta = self._gradients(
            scores, labels, self.alpha, self.beta, effective_mode, priors
        )

        if mode is not None:
            self._training_mode = effective_mode

        self._grad_alpha_ema = (
            momentum * self._grad_alpha_ema + (1 - momentum) * grad_alpha
        )
        self._grad_beta_ema = (
            momentum * self._grad_beta_ema + (1 - momentum) * grad_beta
        )

        self._n_updates += 1
        correction = 1.0 - momentum**self._n_updates
        corrected_alpha = self._grad_alpha_ema / correction
        corrected_beta = self._grad_beta_ema / correction

        grad_norm = math.sqrt(corrected_alpha**2 + corrected_beta**2)
        if grad_norm > max_grad_norm:
            scale = max_grad_norm / grad_norm
            corrected_alpha *= scale
            corrected_beta *= scale

        effective_lr = learning_rate / (1.0 + self._n_updates / decay_tau)
        self.alpha -= effective_lr * corrected_alpha
        self.beta -= effective_lr * corrected_beta

        ALPHA_MIN = 0.01
        if self.alpha < ALPHA_MIN:
            self.alpha = ALPHA_MIN

        self._alpha_avg = avg_decay * self._alpha_avg + (1.0 - avg_decay) * self.alpha
        self._beta_avg = avg_decay * self._beta_avg + (1.0 - avg_decay) * self.beta


class TemporalBayesianTransform(BayesianProbabilityTransform):
    """Time-weighted variant (probability.ts:614-785).

    fit(): sample weights exp(-ln2/halfLife * (maxTs - ts)), normalized to
    sum to n. update(): increments an internal timestamp and shrinks the
    Polyak avg_decay by (1 - 1/(1+t)).
    """

    def __init__(
        self,
        alpha: float = 1.0,
        beta: float = 0.0,
        base_rate: Optional[float] = None,
        decay_half_life: float = 1000.0,
    ) -> None:
        if decay_half_life <= 0.0:
            raise ValueError(
                f"decayHalfLife must be positive, got {decay_half_life}"
            )
        super().__init__(alpha, beta, base_rate)
        self._decay_half_life = float(decay_half_life)
        self._decay_rate = math.log(2.0) / decay_half_life
        self._timestamp = 0

    @property
    def decay_half_life(self) -> float:
        return self._decay_half_life

    @property
    def timestamp(self) -> int:
        return self._timestamp

    def fit(
        self,
        scores,
        labels,
        learning_rate: float = 0.01,
        max_iterations: int = 1000,
        tolerance: float = 1e-6,
        mode: str = "balanced",
        tfs=None,
        doc_len_ratios=None,
        timestamps: Optional[Sequence[float]] = None,
        sample_weights=None,
    ) -> None:
        scores_arr = np.asarray(scores, dtype=np.float64)
        if timestamps is not None:
            ts = np.asarray(timestamps, dtype=np.float64)
            w = np.exp(-self._decay_rate * (np.max(ts) - ts))
            w = w * (scores_arr.shape[0] / float(np.sum(w)))
        else:
            w = np.ones_like(scores_arr)
        super().fit(
            scores,
            labels,
            learning_rate=learning_rate,
            max_iterations=max_iterations,
            tolerance=tolerance,
            mode=mode,
            tfs=tfs,
            doc_len_ratios=doc_len_ratios,
            sample_weights=w,
        )

    def update(self, score, label, avg_decay: float = 0.995, **kwargs) -> None:
        self._timestamp += 1
        effective_avg_decay = avg_decay * (1.0 - 1.0 / (1.0 + self._timestamp))
        super().update(score, label, avg_decay=effective_avg_decay, **kwargs)
