"""Neural score calibrators: Platt (sigmoid) and Isotonic (PAVA).

Port of the reference calibration layer (calibration.ts:21-214).
Fitting is driver-side (tiny, sequential); `calibrate` is vectorized
NumPy suitable for pandas-UDF application at scale.
"""

from __future__ import annotations

from bisect import bisect_left
from typing import Sequence

import numpy as np

from bayesian_bm25_js_spark.functions.kernel import clamp_probability, sigmoid


class PlattCalibrator:
    """P = sigmoid(a * score + b); a, b learned via BCE GD
    (calibration.ts:21-106)."""

    def __init__(self, a: float = 1.0, b: float = 0.0) -> None:
        self._a = float(a)
        self._b = float(b)

    @property
    def a(self) -> float:
        return self._a

    @property
    def b(self) -> float:
        return self._b

    def fit(
        self,
        scores: Sequence[float],
        labels: Sequence[float],
        learning_rate: float = 0.01,
        max_iterations: int = 1000,
        tolerance: float = 1e-6,
    ) -> None:
        s = np.asarray(scores, dtype=np.float64)
        y = np.asarray(labels, dtype=np.float64)
        m = s.shape[0]
        a, b = self._a, self._b
        for _ in range(max_iterations):
            predicted = clamp_probability(sigmoid(a * s + b))
            error = predicted - y
            grad_a = float(np.sum(error * s)) / m
            grad_b = float(np.sum(error)) / m
            new_a = a - learning_rate * grad_a
            new_b = b - learning_rate * grad_b
            converged = (
                abs(new_a - a) < tolerance and abs(new_b - b) < tolerance
            )
            a, b = new_a, new_b
            if converged:
                break
        self._a, self._b = a, b

    def calibrate(self, scores):
        out = sigmoid(self._a * np.asarray(scores, dtype=np.float64) + self._b)
        return float(out) if np.ndim(out) == 0 else out


class IsotonicCalibrator:
    """Monotone calibration via Pool Adjacent Violators
    (calibration.ts:114-214).

    fit(): PAVA block merge over score-sorted labels; breakpoints are
    per-block mean score -> mean label.
    calibrate(): binary search + linear interpolation; midpoint when
    adjacent breakpoints share (within 1e-12) the same x; clamped at the
    ends; epsilon-clamped output.
    """

    def __init__(self) -> None:
        self._x = None
        self._y = None

    def fit(self, scores: Sequence[float], labels: Sequence[float]) -> None:
        scores = list(map(float, scores))
        labels = list(map(float, labels))
        # Stable sort by score (JS Array.sort with numeric comparator is
        # stable in V8, matching Python's sorted).
        order = sorted(range(len(scores)), key=lambda i: scores[i])
        x_sorted = [scores[i] for i in order]
        y_sorted = [labels[i] for i in order]
        n = len(x_sorted)

        block_sums = list(y_sorted)
        block_counts = [1] * n
        block_x_sums = list(x_sorted)
        active = list(range(n))

        merged = True
        while merged:
            merged = False
            new_active = [active[0]]
            for j in range(1, len(active)):
                prev = new_active[-1]
                curr = active[j]
                if block_sums[prev] / block_counts[prev] > block_sums[curr] / block_counts[curr]:
                    block_sums[prev] += block_sums[curr]
                    block_counts[prev] += block_counts[curr]
                    block_x_sums[prev] += block_x_sums[curr]
                    merged = True
                else:
                    new_active.append(curr)
            active = new_active

        self._x = [block_x_sums[i] / block_counts[i] for i in active]
        self._y = [block_sums[i] / block_counts[i] for i in active]

    def calibrate(self, scores):
        if self._x is None or self._y is None:
            raise RuntimeError("Call fit() before calibrate().")
        if np.ndim(scores) == 0:
            return self._calibrate_single(float(scores))
        return np.array(
            [self._calibrate_single(float(s)) for s in np.asarray(scores)],
            dtype=np.float64,
        )

    def _calibrate_single(self, score: float) -> float:
        x, y = self._x, self._y
        idx = bisect_left(x, score)
        if idx == 0:
            result = y[0]
        elif idx >= len(x):
            result = y[-1]
        else:
            x0, x1 = x[idx - 1], x[idx]
            y0, y1 = y[idx - 1], y[idx]
            if x1 - x0 < 1e-12:
                result = (y0 + y1) / 2.0
            else:
                t = (score - x0) / (x1 - x0)
                result = y0 + t * (y1 - y0)
        return float(clamp_probability(result))
