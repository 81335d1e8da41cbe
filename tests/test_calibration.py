"""Platt / Isotonic calibrator tests (fixtures from tests/calibration.test.ts)."""

import numpy as np
import pytest

from bayesian_bm25_js_spark.functions.calibration import (
    IsotonicCalibrator,
    PlattCalibrator,
)
from bayesian_bm25_js_spark.functions.kernel import sigmoid
from bayesian_bm25_js_spark.functions.prng import mulberry32


def test_platt_monotonic():
    cal = PlattCalibrator(1.5, -0.5)
    scores = [-5.0 + 10.0 * i / 99 for i in range(100)]
    out = cal.calibrate(scores)
    assert (np.diff(out) > 0).all()


def test_platt_parameter_recovery():
    """mulberry32(42), 2000 samples, s in U[-3,3], true (a=2, b=-1)
    (tests/calibration.test.ts:56-80)."""
    rng = mulberry32(42)
    scores, labels = [], []
    for _ in range(2000):
        s = (rng() - 0.5) * 6
        scores.append(s)
        p = float(sigmoid(2.0 * s - 1.0))
        labels.append(1.0 if rng() < p else 0.0)
    cal = PlattCalibrator(0.5, 0.0)
    cal.fit(scores, labels, learning_rate=0.01, max_iterations=5000, tolerance=1e-8)
    assert abs(cal.a - 2.0) < 0.5
    assert abs(cal.b - (-1.0)) < 0.5


def test_platt_outputs_in_bounds():
    cal = PlattCalibrator(2.0, -1.0)
    rng = mulberry32(42)
    out = cal.calibrate([(rng() - 0.5) * 20 for _ in range(200)])
    assert ((out > 0) & (out < 1)).all()
    assert isinstance(cal.calibrate(0.5), float)


def test_isotonic_monotone_output():
    rng = mulberry32(42)
    scores, labels = [], []
    for _ in range(200):
        s = rng() * 5
        scores.append(s)
        labels.append(1.0 if rng() < s / 5 else 0.0)
    cal = IsotonicCalibrator()
    cal.fit(scores, labels)
    test_scores = sorted(rng() * 5 for _ in range(50))
    out = cal.calibrate(test_scores)
    assert (np.diff(out) >= -1e-12).all()


def test_isotonic_perfect_data():
    cal = IsotonicCalibrator()
    cal.fit([1.0, 2.0, 3.0, 4.0], [0.0, 0.0, 1.0, 1.0])
    assert cal.calibrate(1.0) == pytest.approx(0.0, abs=1e-9)
    assert cal.calibrate(4.0) == pytest.approx(1.0, abs=1e-9)
    # interpolation between breakpoints (block means at x=1.5 -> 0, x=3.5 -> 1)
    mid = cal.calibrate(2.5)
    assert 0.0 < mid < 1.0


def test_isotonic_endpoint_clamping():
    cal = IsotonicCalibrator()
    cal.fit([1.0, 2.0, 3.0], [0.0, 0.5, 1.0])
    assert cal.calibrate(-100.0) == pytest.approx(cal.calibrate(1.0), abs=1e-9)
    assert cal.calibrate(100.0) == pytest.approx(cal.calibrate(3.0), abs=1e-9)


def test_isotonic_violator_pooling():
    # Decreasing labels must be pooled into one block = mean
    cal = IsotonicCalibrator()
    cal.fit([1.0, 2.0, 3.0], [1.0, 0.5, 0.0])
    for s in [0.0, 1.5, 2.0, 5.0]:
        assert cal.calibrate(s) == pytest.approx(0.5, abs=1e-9)


def test_isotonic_equal_x_midpoint():
    cal = IsotonicCalibrator()
    # two breakpoints with (near-)identical x -> midpoint of y
    cal._x = [1.0, 1.0 + 1e-13]
    cal._y = [0.2, 0.8]
    assert cal.calibrate(1.0) == pytest.approx(0.2)  # bisect hits idx 0
    assert cal.calibrate(1.0 + 5e-14) == pytest.approx(0.5)


def test_isotonic_requires_fit():
    with pytest.raises(RuntimeError, match="fit"):
        IsotonicCalibrator().calibrate(1.0)
