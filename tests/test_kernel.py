"""Kernel parity tests — fixtures from the reference test suite.

Expected values come from /root/reference/tests/probability.test.ts and
tests/paper_theorems.test.ts (hand-computed constants in the reference).
"""

import numpy as np
import pytest

from bayesian_bm25_js_spark.functions.kernel import (
    EPSILON,
    clamp_probability,
    composite_prior,
    logit,
    norm_prior,
    posterior,
    score_to_probability,
    sigmoid,
    tf_prior,
    wand_upper_bound,
)
from bayesian_bm25_js_spark.functions.prng import lcg_a, mulberry32


def test_sigmoid_basics():
    assert sigmoid(0.0) == pytest.approx(0.5)
    assert sigmoid(1000.0) == pytest.approx(1.0)
    assert sigmoid(-1000.0) == pytest.approx(0.0, abs=1e-15)
    # no overflow warnings / NaN at extremes
    assert np.isfinite(sigmoid(np.array([-1e6, -745.0, 745.0, 1e6]))).all()


def test_sigmoid_symmetry_seeded():
    rng = mulberry32(42)
    for _ in range(10000):
        x = -100 + rng() * 200
        assert abs(sigmoid(x) + sigmoid(-x) - 1.0) <= 1e-12


def test_logit_inverse_and_finite_at_bounds():
    assert logit(0.5) == pytest.approx(0.0)
    for p in [0.1, 0.25, 0.5, 0.75, 0.99]:
        assert sigmoid(logit(p)) == pytest.approx(p)
    assert np.isfinite(logit(0.0))
    assert np.isfinite(logit(1.0))


def test_clamp():
    assert clamp_probability(-1.0) == EPSILON
    assert clamp_probability(2.0) == 1.0 - EPSILON
    assert clamp_probability(0.5) == 0.5


def test_tf_prior_values():
    assert tf_prior(0) == pytest.approx(0.2)
    assert tf_prior(5) == pytest.approx(0.55)
    assert tf_prior(10) == pytest.approx(0.9)
    assert tf_prior(100) == pytest.approx(0.9)
    np.testing.assert_allclose(tf_prior(np.array([0, 5, 100])), [0.2, 0.55, 0.9])


def test_norm_prior_values():
    assert norm_prior(0.5) == pytest.approx(0.9)
    assert norm_prior(0.0) == pytest.approx(0.3)
    assert norm_prior(1.0) == pytest.approx(0.3)


def test_composite_prior_bounds():
    for tf in [0, 1, 5, 10, 100]:
        for r in [0.0, 0.25, 0.5, 1.0, 2.0]:
            p = composite_prior(tf, r)
            assert 0.1 <= p <= 0.9


def test_posterior_neutral_prior_is_identity():
    # P = L*0.5 / (L*0.5 + (1-L)*0.5) = L
    for l in [0.1, 0.3, 0.5, 0.9]:
        assert posterior(l, 0.5) == pytest.approx(l, abs=1e-12)


def test_posterior_two_step_equals_logit_form():
    """Remark 4.4.5: two-step == sigmoid(logit L + logit p + logit br)
    (verified in tests/paper_theorems.test.ts:157-190)."""
    rng = mulberry32(7)
    for _ in range(500):
        l = 0.01 + rng() * 0.98
        p = 0.01 + rng() * 0.98
        br = 0.01 + rng() * 0.48
        two_step = posterior(l, p, br)
        logit_form = sigmoid(logit(l) + logit(p) + logit(br))
        assert two_step == pytest.approx(logit_form, abs=1e-10)


def test_section_11_1_ordering():
    """Paper 1 Section 11.1 fixture (tests/paper_theorems.test.ts:338-354)."""
    scores = [1.0464478, 0.56150854, 1.1230172]
    tfs = [5.0, 3.0, 7.0]
    ratios = [0.5, 0.5, 0.5]
    probs = score_to_probability(
        np.array(scores), np.array(tfs), np.array(ratios), alpha=1.0, beta=0.0
    )
    assert ((probs > 0) & (probs < 1)).all()
    assert probs[2] > probs[1]
    assert probs[0] > probs[1]


def test_prior_free_mode_equals_likelihood():
    s = np.array([0.2, 1.0, 3.0])
    probs = score_to_probability(
        s, np.array([5.0] * 3), np.array([0.5] * 3),
        alpha=1.0, beta=0.5, mode="prior_free",
    )
    lik = sigmoid(1.0 * (s - 0.5))
    np.testing.assert_allclose(probs, np.clip(lik, EPSILON, 1 - EPSILON), atol=1e-12)


def test_prior_fn_hook():
    probs = score_to_probability(
        np.array([1.0, 2.0]), np.array([1.0, 1.0]), np.array([0.5, 0.5]),
        alpha=1.0, beta=0.0, prior_fn=lambda s, tf, r: 0.5,
    )
    lik = sigmoid(np.array([1.0, 2.0]))
    np.testing.assert_allclose(probs, lik, atol=1e-12)


def test_monotonic_with_fixed_prior():
    scores = np.array([0.2, 0.5, 1.0, 2.0, 3.0])
    probs = score_to_probability(
        scores, np.full(5, 5.0), np.full(5, 0.5), alpha=1.0, beta=0.5
    )
    assert (np.diff(probs) > 0).all()


def test_wand_upper_bound_safety():
    """WAND safety invariant (tests/wand.test.ts:91-123): for any
    (score, tf, ratio) with score <= ub, bound >= actual - 1e-10."""
    for alpha, beta, br in [(1.5, 1.0, None), (2.0, 0.5, 0.05)]:
        rng = lcg_a(42)
        for _ in range(500):
            score = rng() * 10
            tf = rng() * 20
            ratio = 0.1 + rng() * 2
            actual = score_to_probability(
                score, tf, ratio, alpha=alpha, beta=beta, base_rate=br
            )
            bound = wand_upper_bound(score, alpha, beta, br)
            assert bound >= actual - 1e-10


def test_base_rate_reduces_probability():
    p_none = posterior(0.8, 0.6)
    p_low = posterior(0.8, 0.6, 0.01)
    assert p_low < p_none
