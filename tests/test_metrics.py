"""Metrics parity tests (fixtures from tests/metrics.test.ts:41-182)."""

import pytest

from bayesian_bm25_js_spark.functions.metrics import (
    brier_score,
    calibration_report,
    expected_calibration_error,
    reliability_diagram,
)


def test_ece_perfect():
    assert expected_calibration_error([0.0, 0.0, 1.0, 1.0], [0, 0, 1, 1]) == pytest.approx(0.0, abs=1e-9)


def test_ece_inverted():
    ece = expected_calibration_error([0.9, 0.9, 0.1, 0.1], [0, 0, 1, 1])
    assert ece > 0.5


def test_ece_constant_half_one_bin():
    # constant 0.5 with 1 bin, labels 40% positive -> |0.5 - 0.4| = 0.1
    ece = expected_calibration_error([0.5] * 10, [1, 1, 1, 1, 0, 0, 0, 0, 0, 0], n_bins=1)
    assert ece == pytest.approx(0.1, abs=1e-9)


def test_brier_values():
    assert brier_score([0.0, 0.0, 1.0, 1.0], [0, 0, 1, 1]) == pytest.approx(0.0)
    assert brier_score([1.0, 1.0, 0.0, 0.0], [0, 0, 1, 1]) == pytest.approx(1.0)
    assert brier_score([0.5, 0.5, 0.5, 0.5], [0, 0, 1, 1]) == pytest.approx(0.25)


def test_reliability_bins():
    # bin 0 is inclusive [0, w]; others (lo, hi]; empty bins omitted;
    # counts sum to n.
    probs = [0.0, 0.05, 0.1, 0.15, 0.95, 1.0]
    labels = [0, 0, 0, 0, 1, 1]
    bins = reliability_diagram(probs, labels, n_bins=10)
    total = sum(b[2] for b in bins)
    assert total == len(probs)
    # p=0.1 is exactly the bin-0 upper edge -> inclusive in bin 0
    assert bins[0][2] == 3  # 0.0, 0.05, 0.1
    # p=1.0 lands in the last bin
    assert bins[-1][2] == 2


def test_boundary_bin_assignment():
    # p = 0.2 is the upper edge of bin 1 -> (0.1, 0.2]
    bins = reliability_diagram([0.2], [1], n_bins=10)
    assert len(bins) == 1
    assert bins[0] == (0.2, 1.0, 1)


def test_calibration_report():
    rep = calibration_report([0.1, 0.9], [0, 1], n_bins=5)
    assert rep.n_samples == 2
    assert rep.n_bins == 5
    text = rep.summary()
    assert "ECE" in text and "Brier" in text and "Reliability" in text
