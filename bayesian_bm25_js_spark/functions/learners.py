"""Learnable fusion-weight layers (driver-side training, kernel inference).

Ports of the reference's LearnableLogOddsWeights,
AttentionLogOddsWeights and MultiHeadAttentionLogOddsWeights
(fusion.ts:354-1576): softmax-parameterized per-signal weights with a
Hebbian BCE gradient, query-feature attention weights with seeded
Xavier init, and multi-head log-odds averaging — plus the
upper-bound/prune operators (Theorems 8.7.1, Corollary 8.7.2).

Training state is tiny and sequential -> driver NumPy. `combine` /
`compute_upper_bounds` are vectorized and safe to call inside pandas
UDFs for distributed scoring.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from bayesian_bm25_js_spark.functions.fusion import (
    log_odds_conjunction,
    min_max_normalize,
    resolve_alpha,
    softmax,
    softmax2d,
)
from bayesian_bm25_js_spark.functions.kernel import (
    clamp_probability,
    logit,
    seq_sum,
    sigmoid,
)
from bayesian_bm25_js_spark.functions.prng import mulberry32, rand_normal


def _as_2d(a) -> np.ndarray:
    arr = np.asarray(a, dtype=np.float64)
    return arr[None, :] if arr.ndim == 1 else arr


class LearnableLogOddsWeights:
    """Per-signal reliability weights for log-odds conjunction
    (fusion.ts:354-660, Remark 5.3.2).

    Weights are softmax(logits); zeros init -> uniform 1/n (Naive Bayes).
    Gradient dL/dz_j = n^alpha * (p - y) * w_j * (x_j - x_bar_w).
    """

    def __init__(self, n_signals: int, alpha=0.0, base_rate: Optional[float] = None):
        if n_signals < 1:
            raise ValueError(f"n_signals must be >= 1, got {n_signals}")
        if base_rate is not None and not (0.0 < base_rate < 1.0):
            raise ValueError(f"base_rate must be in (0, 1), got {base_rate}")
        self._n_signals = n_signals
        self._alpha = resolve_alpha(alpha, 0.0)
        self._base_rate = base_rate
        self._logit_base_rate = float(logit(base_rate)) if base_rate is not None else None
        self._logits = np.zeros(n_signals)
        self._n_updates = 0
        self._grad_logits_ema = np.zeros(n_signals)
        self._weights_avg = np.full(n_signals, 1.0 / n_signals)

    @property
    def n_signals(self) -> int:
        return self._n_signals

    @property
    def alpha(self) -> float:
        return self._alpha

    @property
    def base_rate(self) -> Optional[float]:
        return self._base_rate

    @property
    def weights(self) -> np.ndarray:
        return softmax(self._logits)

    @property
    def averaged_weights(self) -> np.ndarray:
        return self._weights_avg.copy()

    def combine(self, probs, use_averaged: bool = False):
        w = self._weights_avg if use_averaged else self.weights
        if self._logit_base_rate is None:
            return log_odds_conjunction(probs, self._alpha, w)
        was_1d = np.ndim(probs) == 1
        x = logit(clamp_probability(_as_2d(probs)))
        scale = float(self._n_signals) ** self._alpha
        l_weighted = scale * seq_sum(w * x, axis=-1) + self._logit_base_rate
        out = sigmoid(l_weighted)
        return float(np.asarray(out).reshape(-1)[0]) if was_1d else np.asarray(out)

    def _gradient(self, x: np.ndarray, labels: np.ndarray, w: np.ndarray):
        """Mean Hebbian gradient over samples (fusion.ts:494-539)."""
        scale = float(self._n_signals) ** self._alpha
        x_bar_w = x @ w
        l_weighted = scale * x_bar_w
        if self._logit_base_rate is not None:
            l_weighted = l_weighted + self._logit_base_rate
        p = sigmoid(l_weighted)
        error = p - labels
        grad = scale * (error[:, None] * w[None, :] * (x - x_bar_w[:, None]))
        return grad.mean(axis=0)

    def fit(
        self,
        probs: Sequence[Sequence[float]],
        labels: Sequence[float],
        learning_rate: float = 0.01,
        max_iterations: int = 1000,
        tolerance: float = 1e-6,
    ) -> None:
        probs = _as_2d(probs)
        if probs.shape[1] != self._n_signals:
            raise ValueError(
                f"probs last dimension {probs.shape[1]} != n_signals {self._n_signals}"
            )
        labels = np.asarray(labels, dtype=np.float64)
        x = logit(clamp_probability(probs))
        for _ in range(max_iterations):
            w = softmax(self._logits)
            grad = self._gradient(x, labels, w)
            change = learning_rate * grad
            self._logits = self._logits - change
            if float(np.max(np.abs(change))) < tolerance:
                break
        self._n_updates = 0
        self._grad_logits_ema = np.zeros(self._n_signals)
        self._weights_avg = softmax(self._logits).copy()

    def update(
        self,
        probs,
        label,
        learning_rate: float = 0.01,
        momentum: float = 0.9,
        decay_tau: float = 1000.0,
        max_grad_norm: float = 1.0,
        avg_decay: float = 0.995,
    ) -> None:
        x = logit(clamp_probability(_as_2d(probs)))
        if x.shape[1] != self._n_signals:
            raise ValueError(
                f"probs last dimension {x.shape[1]} != n_signals {self._n_signals}"
            )
        labels = np.atleast_1d(np.asarray(label, dtype=np.float64))
        w = softmax(self._logits)
        grad = self._gradient(x, labels, w)

        self._grad_logits_ema = momentum * self._grad_logits_ema + (1.0 - momentum) * grad
        self._n_updates += 1
        correction = 1.0 - momentum**self._n_updates
        corrected = self._grad_logits_ema / correction

        grad_norm = float(np.sqrt(np.sum(corrected**2)))
        if grad_norm > max_grad_norm:
            corrected = corrected * (max_grad_norm / grad_norm)

        effective_lr = learning_rate / (1.0 + self._n_updates / decay_tau)
        self._logits = self._logits - effective_lr * corrected

        raw = softmax(self._logits)
        self._weights_avg = avg_decay * self._weights_avg + (1.0 - avg_decay) * raw


class AttentionLogOddsWeights:
    """Query-dependent attention fusion weights (fusion.ts:705-1351,
    Paper 2 Section 8): w(q) = softmax(W @ query_features + b).
    """

    def __init__(
        self,
        n_signals: int,
        n_query_features: int,
        alpha=0.5,
        normalize: bool = False,
        seed: int = 0,
        base_rate: Optional[float] = None,
    ):
        if n_signals < 1:
            raise ValueError(f"n_signals must be >= 1, got {n_signals}")
        if n_query_features < 1:
            raise ValueError(
                f"n_query_features must be >= 1, got {n_query_features}"
            )
        if base_rate is not None and not (0.0 < base_rate < 1.0):
            raise ValueError(f"base_rate must be in (0, 1), got {base_rate}")
        self._n_signals = n_signals
        self._n_query_features = n_query_features
        self._alpha = resolve_alpha(alpha, 0.5)
        self._normalize = normalize
        self._base_rate = base_rate
        self._logit_base_rate = float(logit(base_rate)) if base_rate is not None else None

        # Xavier init: row-major sequential Box-Muller draws from
        # mulberry32(seed), scale 1/sqrt(nQF) (fusion.ts:753-764).
        scale = 1.0 / np.sqrt(n_query_features)
        rng = mulberry32(seed)
        self._W = np.array(
            [
                [rand_normal(rng) * scale for _ in range(n_query_features)]
                for _ in range(n_signals)
            ],
            dtype=np.float64,
        )
        self._b = np.zeros(n_signals)

        self._n_updates = 0
        self._grad_w_ema = np.zeros((n_signals, n_query_features))
        self._grad_b_ema = np.zeros(n_signals)
        self._w_avg = self._W.copy()
        self._b_avg = self._b.copy()

    @property
    def n_signals(self) -> int:
        return self._n_signals

    @property
    def n_query_features(self) -> int:
        return self._n_query_features

    @property
    def alpha(self) -> float:
        return self._alpha

    @property
    def base_rate(self) -> Optional[float]:
        return self._base_rate

    @property
    def normalize(self) -> bool:
        return self._normalize

    @property
    def weights_matrix(self) -> np.ndarray:
        return self._W.copy()

    @staticmethod
    def _normalize_logits(x: np.ndarray) -> np.ndarray:
        """Per-column min-max normalization (fusion.ts:802-814)."""
        if x.shape[0] == 0:
            return x
        out = x.copy()
        for col in range(x.shape[1]):
            out[:, col] = min_max_normalize(x[:, col])
        return out

    def _compute_weights(self, query_features: np.ndarray, use_averaged: bool = False) -> np.ndarray:
        W = self._w_avg if use_averaged else self._W
        b = self._b_avg if use_averaged else self._b
        z = query_features @ W.T + b
        return softmax2d(z)

    def combine(self, probs, query_features, use_averaged: bool = False):
        qf2d = _as_2d(query_features)
        w = self._compute_weights(qf2d, use_averaged)
        scale = float(self._n_signals) ** self._alpha

        if np.ndim(probs) == 1:
            # Single sample: normalization cannot apply (fusion.ts:872-888).
            x = logit(clamp_probability(np.asarray(probs, dtype=np.float64)))
            l_weighted = scale * float(seq_sum(w[0] * x))
            if self._logit_base_rate is not None:
                l_weighted += self._logit_base_rate
            return float(sigmoid(l_weighted))

        x = logit(clamp_probability(_as_2d(probs)))
        if self._normalize:
            x = self._normalize_logits(x)
        m = x.shape[0]
        idx = np.minimum(np.arange(m), w.shape[0] - 1)
        weighted = seq_sum(w[idx] * x, axis=-1)
        l_weighted = scale * weighted
        if self._logit_base_rate is not None:
            l_weighted = l_weighted + self._logit_base_rate
        return np.asarray(sigmoid(l_weighted))

    def _grads(self, x, labels, qf):
        """(gradW, gradB) means over the batch (fusion.ts:1007-1043)."""
        m = x.shape[0]
        scale = float(self._n_signals) ** self._alpha
        z = qf @ self._W.T + self._b
        w = softmax2d(z)
        x_bar_w = np.sum(w * x, axis=1)
        l_weighted = scale * x_bar_w
        if self._logit_base_rate is not None:
            l_weighted = l_weighted + self._logit_base_rate
        p = sigmoid(l_weighted)
        error = p - labels
        grad_z = scale * error[:, None] * w * (x - x_bar_w[:, None])
        grad_w = grad_z.T @ qf / m
        grad_b = grad_z.mean(axis=0)
        return grad_w, grad_b

    def fit(
        self,
        probs,
        labels,
        query_features,
        query_ids: Optional[Sequence[int]] = None,
        learning_rate: float = 0.01,
        max_iterations: int = 1000,
        tolerance: float = 1e-6,
    ) -> None:
        probs = _as_2d(probs)
        labels = np.asarray(labels, dtype=np.float64)
        qf = _as_2d(query_features)
        x = logit(clamp_probability(probs))
        if self._normalize:
            if query_ids is not None:
                query_ids = np.asarray(query_ids)
                x = x.copy()
                # Per-query-group normalization in first-seen order
                # (fusion.ts:950-968).
                seen = []
                for qid in query_ids:
                    if qid not in seen:
                        seen.append(qid)
                for qid in seen:
                    mask = query_ids == qid
                    x[mask] = self._normalize_logits(x[mask])
            else:
                x = self._normalize_logits(x)

        for _ in range(max_iterations):
            grad_w, grad_b = self._grads(x, labels, qf)
            change_w = learning_rate * grad_w
            change_b = learning_rate * grad_b
            self._W = self._W - change_w
            self._b = self._b - change_b
            max_change = max(
                float(np.max(np.abs(change_w))), float(np.max(np.abs(change_b)))
            )
            if max_change < tolerance:
                break

        self._n_updates = 0
        self._grad_w_ema = np.zeros_like(self._W)
        self._grad_b_ema = np.zeros_like(self._b)
        self._w_avg = self._W.copy()
        self._b_avg = self._b.copy()

    def update(
        self,
        probs,
        label,
        query_features,
        learning_rate: float = 0.01,
        momentum: float = 0.9,
        decay_tau: float = 1000.0,
        max_grad_norm: float = 1.0,
        avg_decay: float = 0.995,
    ) -> None:
        x = logit(clamp_probability(_as_2d(probs)))
        labels = np.atleast_1d(np.asarray(label, dtype=np.float64))
        qf = _as_2d(query_features)
        if self._normalize and x.shape[0] > 0:
            x = self._normalize_logits(x)

        grad_w, grad_b = self._grads(x, labels, qf)

        self._grad_w_ema = momentum * self._grad_w_ema + (1.0 - momentum) * grad_w
        self._grad_b_ema = momentum * self._grad_b_ema + (1.0 - momentum) * grad_b
        self._n_updates += 1
        correction = 1.0 - momentum**self._n_updates
        corrected_w = self._grad_w_ema / correction
        corrected_b = self._grad_b_ema / correction

        grad_norm = float(
            np.sqrt(np.sum(corrected_w**2) + np.sum(corrected_b**2))
        )
        if grad_norm > max_grad_norm:
            clip = max_grad_norm / grad_norm
            corrected_w = corrected_w * clip
            corrected_b = corrected_b * clip

        effective_lr = learning_rate / (1.0 + self._n_updates / decay_tau)
        self._W = self._W - effective_lr * corrected_w
        self._b = self._b - effective_lr * corrected_b

        self._w_avg = avg_decay * self._w_avg + (1.0 - avg_decay) * self._W
        self._b_avg = avg_decay * self._b_avg + (1.0 - avg_decay) * self._b

    def compute_upper_bounds(
        self, upper_bound_probs, query_features, use_averaged: bool = False
    ) -> np.ndarray:
        """Fused probability upper bounds, Theorem 8.7.1 (fusion.ts:1265-1301)."""
        qf2d = _as_2d(query_features)
        ub = clamp_probability(_as_2d(upper_bound_probs))
        w = self._compute_weights(qf2d, use_averaged)
        x = logit(ub)
        if self._normalize:
            x = self._normalize_logits(x)
        scale = float(self._n_signals) ** self._alpha
        m = x.shape[0]
        idx = np.minimum(np.arange(m), w.shape[0] - 1)
        l_weighted = scale * seq_sum(w[idx] * x, axis=-1)
        if self._logit_base_rate is not None:
            l_weighted = l_weighted + self._logit_base_rate
        return np.asarray(sigmoid(l_weighted))

    def prune(
        self,
        probs,
        query_features,
        threshold: float,
        upper_bound_probs=None,
        use_averaged: bool = False,
    ):
        """Drop candidates whose fused upper bound < threshold
        (fusion.ts:1303-1350)."""
        probs = _as_2d(probs)
        ub_probs = upper_bound_probs if upper_bound_probs is not None else probs
        bounds = self.compute_upper_bounds(ub_probs, query_features, use_averaged)
        surviving = [i for i in range(len(bounds)) if bounds[i] >= threshold]
        if not surviving:
            return [], np.array([])
        qf2d = _as_2d(query_features)
        surv_probs = probs[surviving]
        surv_qf = qf2d[surviving] if qf2d.shape[0] > 1 else qf2d
        fused = self.combine(surv_probs, surv_qf, use_averaged)
        return surviving, np.asarray(fused)


class MultiHeadAttentionLogOddsWeights:
    """Multi-head attention fusion (fusion.ts:1360-1576, Remark 8.6).

    Heads are AttentionLogOddsWeights seeded 0..n_heads-1; combine
    averages head log-odds then applies sigmoid.
    """

    def __init__(
        self,
        n_heads: int,
        n_signals: int,
        n_query_features: int,
        alpha=0.5,
        normalize: bool = False,
    ):
        if n_heads < 1:
            raise ValueError(f"n_heads must be >= 1, got {n_heads}")
        self._n_heads = n_heads
        self._heads = [
            AttentionLogOddsWeights(
                n_signals, n_query_features, alpha, normalize, seed=h
            )
            for h in range(n_heads)
        ]

    @property
    def n_heads(self) -> int:
        return self._n_heads

    @property
    def heads(self):
        return list(self._heads)

    def combine(self, probs, query_features, use_averaged: bool = False):
        single = np.ndim(probs) == 1
        head_results = []
        for head in self._heads:
            r = head.combine(probs, query_features, use_averaged)
            head_results.append(np.atleast_1d(np.asarray(r, dtype=np.float64)))
        stacked = np.stack(head_results)  # (h, m)
        logits = logit(clamp_probability(stacked))
        avg = seq_sum(logits, axis=0) / self._n_heads
        out = sigmoid(avg)
        return float(np.asarray(out).reshape(-1)[0]) if single else np.asarray(out)

    def fit(self, probs, labels, query_features, **options) -> None:
        for head in self._heads:
            head.fit(probs, labels, query_features, **options)

    def update(self, probs, label, query_features, **options) -> None:
        for head in self._heads:
            head.update(probs, label, query_features, **options)

    def compute_upper_bounds(
        self, upper_bound_probs, query_features, use_averaged: bool = False
    ) -> np.ndarray:
        head_bounds = np.stack(
            [
                head.compute_upper_bounds(
                    upper_bound_probs, query_features, use_averaged
                )
                for head in self._heads
            ]
        )
        logits = logit(clamp_probability(head_bounds))
        return np.asarray(sigmoid(seq_sum(logits, axis=0) / self._n_heads))

    def prune(
        self,
        probs,
        query_features,
        threshold: float,
        upper_bound_probs=None,
        use_averaged: bool = False,
    ):
        probs = _as_2d(probs)
        ub_probs = upper_bound_probs if upper_bound_probs is not None else probs
        bounds = self.compute_upper_bounds(ub_probs, query_features, use_averaged)
        surviving = [i for i in range(len(bounds)) if bounds[i] >= threshold]
        if not surviving:
            return [], np.array([])
        qf2d = _as_2d(query_features)
        surv_probs = probs[surviving]
        surv_qf = qf2d[surviving] if qf2d.shape[0] > 1 else qf2d
        fused = self.combine(surv_probs, surv_qf, use_averaged)
        return surviving, np.asarray(fused)
