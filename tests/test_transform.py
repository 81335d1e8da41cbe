"""BayesianProbabilityTransform / TemporalBayesianTransform training tests.

Synthetic data generation ports the reference tests bit-exactly via the
LCG-A / mulberry32 PRNGs (tests/probability.test.ts:201-280,
tests/temporal.test.ts:167-211)."""

import numpy as np
import pytest

from bayesian_bm25_js_spark.functions.kernel import sigmoid
from bayesian_bm25_js_spark.functions.prng import lcg_a, mulberry32
from bayesian_bm25_js_spark.functions.transform import (
    BayesianProbabilityTransform,
    TemporalBayesianTransform,
)


def _synth(seed, n, true_alpha=2.0, true_beta=1.0, scale=3.0):
    rng = lcg_a(seed)
    scores, labels = [], []
    for _ in range(n):
        s = rng() * scale
        scores.append(s)
        p = float(sigmoid(true_alpha * (s - true_beta)))
        labels.append(1.0 if rng() < p else 0.0)
    return scores, labels


def test_fit_recovers_parameters():
    scores, labels = _synth(42, 200)
    t = BayesianProbabilityTransform(0.5, 0.0)
    t.fit(scores, labels, learning_rate=0.05, max_iterations=5000)
    assert abs(t.alpha - 2.0) < 1.0
    assert abs(t.beta - 1.0) < 1.0


def test_fit_converges_simple():
    t = BayesianProbabilityTransform(0.1, 0.0)
    t.fit([0, 1, 2, 3, 4], [0, 0, 0.5, 1, 1], learning_rate=0.01, max_iterations=2000)
    pred = sigmoid(t.alpha * (np.arange(5.0) - t.beta))
    assert pred[0] < pred[4]


def test_online_update_converges():
    scores, labels = _synth(123, 500)
    t = BayesianProbabilityTransform(0.5, 0.0)
    for s, y in zip(scores, labels):
        t.update(s, y, learning_rate=0.05, momentum=0.9)
    assert abs(t.alpha - 2.0) < 1.5
    assert abs(t.beta - 1.0) < 1.0


def test_update_state_machine():
    t = BayesianProbabilityTransform(1.0, 0.0)
    t.update(1.0, 1.0)
    assert t.n_updates == 1
    assert t.grad_alpha_ema != 0.0
    t.fit([1.0, 2.0], [0.0, 1.0], max_iterations=5)
    assert t.n_updates == 0
    assert t.grad_alpha_ema == 0.0


def test_alpha_floor():
    t = BayesianProbabilityTransform(0.02, 0.0)
    for _ in range(50):
        t.update(5.0, 0.0, learning_rate=1.0)  # push alpha down hard
    assert t.alpha >= 0.01


def test_prior_aware_requires_tfs():
    t = BayesianProbabilityTransform()
    with pytest.raises(ValueError, match="prior_aware"):
        t.fit([1.0], [1.0], mode="prior_aware")
    with pytest.raises(ValueError, match="prior_aware"):
        t.update(1.0, 1.0, mode="prior_aware")


def test_invalid_mode():
    t = BayesianProbabilityTransform()
    with pytest.raises(ValueError, match="mode"):
        t.fit([1.0], [1.0], mode="bogus")


def test_prior_aware_fit_runs():
    scores, labels = _synth(42, 100)
    t = BayesianProbabilityTransform(1.0, 0.0)
    t.fit(
        scores,
        labels,
        mode="prior_aware",
        tfs=[3.0] * 100,
        doc_len_ratios=[0.5] * 100,
        max_iterations=200,
    )
    assert t.training_mode == "prior_aware"


def test_prior_free_inference():
    t = BayesianProbabilityTransform(1.0, 0.0)
    t.fit([0.0, 2.0], [0.0, 1.0], mode="prior_free", max_iterations=10)
    p = t.score_to_probability(1.5, 5.0, 0.5)
    lik = float(t.likelihood(1.5))
    assert p == pytest.approx(lik, abs=1e-12)


def test_base_rate_validation():
    with pytest.raises(ValueError, match="baseRate"):
        BayesianProbabilityTransform(1.0, 0.0, base_rate=1.5)
    t = BayesianProbabilityTransform(1.0, 0.0, base_rate=0.01)
    assert t.base_rate == 0.01


def test_temporal_half_life():
    """Short half-life adapts to the recent regime
    (tests/temporal.test.ts:167-211)."""
    rng = mulberry32(99)
    scores, labels, timestamps = [], [], []
    for i in range(150):
        s = rng() * 4
        scores.append(s)
        labels.append(1.0 if rng() < float(sigmoid(2.0 * (s - 1.0))) else 0.0)
        timestamps.append(i)
    for i in range(150):
        s = rng() * 6
        scores.append(s)
        labels.append(1.0 if rng() < float(sigmoid(2.0 * (s - 3.0))) else 0.0)
        timestamps.append(150 + i)

    t_short = TemporalBayesianTransform(1.0, 0.0, None, 30.0)
    t_short.fit(scores, labels, timestamps=timestamps, learning_rate=0.05, max_iterations=3000)
    t_long = TemporalBayesianTransform(1.0, 0.0, None, 1e8)
    t_long.fit(scores, labels, timestamps=timestamps, learning_rate=0.05, max_iterations=3000)
    assert abs(t_short.beta - 3.0) < abs(t_long.beta - 3.0)


def test_temporal_update_increments_timestamp():
    t = TemporalBayesianTransform()
    t.update(1.0, 1.0)
    t.update(2.0, 0.0)
    assert t.timestamp == 2


def test_temporal_validation():
    with pytest.raises(ValueError, match="decayHalfLife"):
        TemporalBayesianTransform(decay_half_life=0.0)
