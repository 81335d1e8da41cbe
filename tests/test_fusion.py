"""Fusion algebra parity tests — fixtures from tests/fusion.test.ts,
tests/paper_theorems.test.ts and tests/gelu_gating.test.ts."""

import numpy as np
import pytest

from bayesian_bm25_js_spark.functions.fusion import (
    apply_gating,
    balanced_log_odds_fusion,
    cosine_to_probability,
    log_odds_conjunction,
    min_max_normalize,
    prob_and,
    prob_not,
    prob_or,
    resolve_alpha,
    softmax,
    softmax2d,
)
from bayesian_bm25_js_spark.functions.kernel import EPSILON, logit, sigmoid
from bayesian_bm25_js_spark.functions.prng import mulberry32


def test_prob_and_basic():
    assert prob_and([0.8, 0.9]) == pytest.approx(0.72)
    assert prob_and([]) == 0
    # 2D row-reduce
    np.testing.assert_allclose(
        prob_and([[0.8, 0.9], [0.5, 0.5]]), [0.72, 0.25], atol=1e-12
    )


def test_prob_or_basic():
    assert prob_or([0.8, 0.9]) == pytest.approx(0.98)
    assert prob_or([]) == 0


def test_prob_not_involution_and_double_clamp():
    assert prob_not(0.8) == pytest.approx(0.2)
    assert prob_not(prob_not(0.3)) == pytest.approx(0.3)
    # clamped input: 1 - clamp(1.5) = EPSILON-ish
    assert prob_not(1.5) == pytest.approx(EPSILON, abs=1e-12)


def test_de_morgan():
    probs = [0.3, 0.6, 0.8]
    lhs = prob_not(prob_or(probs))
    rhs = prob_and([prob_not(p) for p in probs])
    assert lhs == pytest.approx(rhs, abs=1e-10)


def test_cosine_to_probability():
    got = cosine_to_probability(np.array([-1.0, -0.5, 0.0, 0.5, 1.0]))
    np.testing.assert_allclose(
        got, [EPSILON, 0.25, 0.5, 0.75, 1 - EPSILON], atol=1e-12
    )


def test_resolve_alpha():
    assert resolve_alpha(None, 0.5) == 0.5
    assert resolve_alpha("auto", 0.0) == 0.5
    assert resolve_alpha(1.25, 0.5) == 1.25
    with pytest.raises(ValueError):
        resolve_alpha("bogus", 0.5)


def test_log_odds_conjunction_table():
    """Paper 2 Section 4.5 table (tests/paper_theorems.test.ts:443-478)."""
    table = [
        (0.9, 0.9, 0.81, 0.96),
        (0.7, 0.7, 0.49, 0.77),
        (0.7, 0.3, 0.21, 0.50),
        (0.3, 0.3, 0.09, 0.23),
    ]
    for p1, p2, want_and, want_conj in table:
        assert prob_and([p1, p2]) == pytest.approx(want_and, abs=0.05)
        assert log_odds_conjunction([p1, p2]) == pytest.approx(want_conj, abs=0.05)
    # exact identities
    assert log_odds_conjunction([0.9, 0.9]) == pytest.approx(
        sigmoid(logit(0.9) * np.sqrt(2)), abs=1e-10
    )
    assert log_odds_conjunction([0.7, 0.3]) == pytest.approx(0.5, abs=1e-10)


def test_scale_neutrality_alpha0():
    """Theorem 4.1.2: identical signals, alpha=0 -> passthrough."""
    for p in [0.1, 0.3, 0.5, 0.7, 0.9]:
        for n in [1, 2, 3, 5, 10]:
            assert log_odds_conjunction([p] * n, 0.0) == pytest.approx(p, abs=1e-8)


def test_sqrt_n_amplification():
    for p in [0.6, 0.7, 0.8, 0.9]:
        for n in [2, 3, 5]:
            got = log_odds_conjunction([p] * n, 0.5)
            want = sigmoid(logit(p) * np.sqrt(n))
            assert got == pytest.approx(want, abs=1e-10)


def test_weighted_log_odds():
    # weights [1, 0] -> result is sigmoid(n^0 * logit(p1)) = p1
    got = log_odds_conjunction([0.8, 0.3], weights=[1.0, 0.0])
    assert got == pytest.approx(0.8, abs=1e-9)
    # default alpha for weighted is 0.0
    got_w = log_odds_conjunction([0.8, 0.6], weights=[0.5, 0.5])
    want = sigmoid(0.5 * logit(0.8) + 0.5 * logit(0.6))
    assert got_w == pytest.approx(want, abs=1e-12)


def test_weight_validation():
    with pytest.raises(ValueError, match="non-negative"):
        log_odds_conjunction([0.5, 0.5], weights=[-0.5, 1.5])
    with pytest.raises(ValueError, match="sum to 1"):
        log_odds_conjunction([0.5, 0.5], weights=[0.5, 0.6])


def test_gating_variants():
    l = np.array([-2.0, -0.5, 0.0, 0.5, 2.0])
    np.testing.assert_allclose(apply_gating(l, "none"), l)
    np.testing.assert_allclose(apply_gating(l, "relu"), np.maximum(0, l))
    np.testing.assert_allclose(
        apply_gating(l, "swish", 1.0), l * sigmoid(l), atol=1e-15
    )
    # GELU == swish with beta=1.702 (tests/gelu_gating.test.ts:37-53)
    np.testing.assert_allclose(
        apply_gating(l, "gelu"), apply_gating(l, "swish", 1.702), atol=1e-10
    )
    with pytest.raises(ValueError):
        apply_gating(l, "bogus")


def test_min_max_normalize_degenerate():
    np.testing.assert_allclose(min_max_normalize([3.0, 3.0, 3.0]), [0, 0, 0])
    np.testing.assert_allclose(min_max_normalize([1.0, 2.0, 3.0]), [0, 0.5, 1.0])


def test_balanced_log_odds_fusion():
    sparse = [0.9, 0.5, 0.1]
    dense = [0.8, 0.0, -0.8]
    out = balanced_log_odds_fusion(sparse, dense, weight=0.5)
    # both signals agree on ordering -> fused scores strictly decreasing
    assert out[0] > out[1] > out[2]
    # weight=1 -> pure dense normalized logits
    out_dense = balanced_log_odds_fusion(sparse, dense, weight=1.0)
    np.testing.assert_allclose(
        out_dense, min_max_normalize(logit(cosine_to_probability(np.array(dense)))),
        atol=1e-12,
    )


def test_softmax_stability():
    w = softmax([1000.0, 1000.0, 1000.0])
    np.testing.assert_allclose(w, [1 / 3] * 3, atol=1e-12)
    z2 = softmax2d([[0.0, 0.0], [10.0, -10.0]])
    np.testing.assert_allclose(z2[0], [0.5, 0.5], atol=1e-12)
    assert z2[1][0] > 0.999


def test_sign_preservation_seeded():
    """Theorem 4.2.2 over seeded random draws."""
    rng = mulberry32(42)
    for _ in range(1000):
        n = 2 + int(rng() * 4)
        probs = [0.55 + rng() * 0.44 for _ in range(n)]
        assert log_odds_conjunction(probs) > 0.5
        probs_low = [0.01 + rng() * 0.44 for _ in range(n)]
        assert log_odds_conjunction(probs_low) < 0.5
