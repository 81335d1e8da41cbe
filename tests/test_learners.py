"""Learnable / Attention / MultiHead fusion-weight tests
(fixtures from tests/fusion.test.ts:370-660, tests/multi_head.test.ts)."""

import numpy as np
import pytest

from bayesian_bm25_js_spark.functions.fusion import log_odds_conjunction
from bayesian_bm25_js_spark.functions.learners import (
    AttentionLogOddsWeights,
    LearnableLogOddsWeights,
    MultiHeadAttentionLogOddsWeights,
)
from bayesian_bm25_js_spark.functions.prng import lcg_b, mulberry32


def test_learnable_init_uniform():
    learner = LearnableLogOddsWeights(4)
    np.testing.assert_allclose(learner.weights, [0.25] * 4, atol=1e-12)
    np.testing.assert_allclose(learner.averaged_weights, [0.25] * 4, atol=1e-12)
    assert learner.alpha == 0.0
    assert learner.base_rate is None


def test_learnable_validation():
    with pytest.raises(ValueError, match="n_signals"):
        LearnableLogOddsWeights(0)
    with pytest.raises(ValueError, match="base_rate"):
        LearnableLogOddsWeights(2, base_rate=1.5)
    learner = LearnableLogOddsWeights(3)
    with pytest.raises(ValueError, match="n_signals"):
        learner.fit([[0.5, 0.5]], [1.0])


def test_learnable_combine_uniform_equals_conjunction():
    learner = LearnableLogOddsWeights(2, alpha=0.0)
    probs = [0.8, 0.6]
    got = learner.combine(probs)
    want = log_odds_conjunction(probs, 0.0, [0.5, 0.5])
    assert got == pytest.approx(want, abs=1e-12)


def test_learnable_fit_prefers_reliable_signal():
    """LCG-B seed 42: reliable 0.85/0.15 vs noisy U[0.3,0.7]
    (tests/fusion.test.ts:436-469)."""
    rng = lcg_b(42)
    labels, probs = [], []
    for _ in range(500):
        label = 1.0 if rng() > 0.5 else 0.0
        labels.append(label)
        s0 = 0.85 if label == 1.0 else 0.15
        s1 = 0.3 + rng() * 0.4
        probs.append([s0, s1])
    learner = LearnableLogOddsWeights(2, 0.0)
    learner.fit(probs, labels, learning_rate=0.1, max_iterations=2000)
    w = learner.weights
    assert w[0] > w[1]
    assert w[0] > 0.6


def test_learnable_weights_stay_simplex():
    learner = LearnableLogOddsWeights(3)
    rng = lcg_b(7)
    for _ in range(50):
        learner.update([rng(), rng(), rng()], 1.0 if rng() > 0.5 else 0.0)
    w = learner.weights
    assert (w >= 0).all()
    assert float(np.sum(w)) == pytest.approx(1.0, abs=1e-10)


def test_learnable_base_rate_shifts_output():
    plain = LearnableLogOddsWeights(2)
    low_br = LearnableLogOddsWeights(2, base_rate=0.01)
    p = [0.7, 0.8]
    assert low_br.combine(p) < plain.combine(p)


def test_attention_xavier_init_deterministic():
    a1 = AttentionLogOddsWeights(3, 4, seed=0)
    a2 = AttentionLogOddsWeights(3, 4, seed=0)
    np.testing.assert_array_equal(a1.weights_matrix, a2.weights_matrix)
    a3 = AttentionLogOddsWeights(3, 4, seed=1)
    assert not np.array_equal(a1.weights_matrix, a3.weights_matrix)
    # Xavier scale: std ~ 1/sqrt(nQF)
    assert np.abs(a1.weights_matrix).max() < 5.0 / np.sqrt(4)


def test_attention_validation():
    with pytest.raises(ValueError, match="n_signals"):
        AttentionLogOddsWeights(0, 2)
    with pytest.raises(ValueError, match="n_query_features"):
        AttentionLogOddsWeights(2, 0)
    with pytest.raises(ValueError, match="base_rate"):
        AttentionLogOddsWeights(2, 2, base_rate=0.0)


def test_attention_combine_shapes():
    att = AttentionLogOddsWeights(2, 3, seed=0)
    single = att.combine([0.7, 0.6], [1.0, 0.0, 0.5])
    assert isinstance(single, float) and 0 < single < 1
    batch = att.combine(
        [[0.7, 0.6], [0.2, 0.3]], [[1.0, 0.0, 0.5], [0.0, 1.0, 0.5]]
    )
    assert batch.shape == (2,)


def test_attention_fit_learns_gate():
    """Feature selects which signal is reliable; attention should route."""
    rng = mulberry32(42)
    probs, labels, qfs = [], [], []
    for i in range(400):
        label = 1.0 if rng() > 0.5 else 0.0
        feature_on = i % 2 == 0
        if feature_on:
            sig = [0.9 if label else 0.1, 0.3 + rng() * 0.4]
            qf = [1.0, 0.0]
        else:
            sig = [0.3 + rng() * 0.4, 0.9 if label else 0.1]
            qf = [0.0, 1.0]
        probs.append(sig)
        labels.append(label)
        qfs.append(qf)
    att = AttentionLogOddsWeights(2, 2, alpha=0.0, seed=0)
    att.fit(probs, labels, qfs, learning_rate=0.5, max_iterations=2000)
    w_on = att._compute_weights(np.array([[1.0, 0.0]]))[0]
    w_off = att._compute_weights(np.array([[0.0, 1.0]]))[0]
    assert w_on[0] > w_on[1]
    assert w_off[1] > w_off[0]


def test_attention_upper_bound_dominates_combine():
    att = AttentionLogOddsWeights(2, 2, seed=3)
    qf = [[0.5, 0.5], [0.1, 0.9]]
    probs = [[0.6, 0.7], [0.2, 0.4]]
    ubs = [[0.9, 0.9], [0.5, 0.6]]
    fused = att.combine(probs, qf)
    bounds = att.compute_upper_bounds(ubs, qf)
    assert (bounds >= fused - 1e-10).all()


def test_attention_prune():
    att = AttentionLogOddsWeights(2, 2, seed=0)
    qf = [[1.0, 0.0]] * 3
    probs = [[0.9, 0.9], [0.5, 0.5], [0.1, 0.1]]
    surviving, fused = att.prune(probs, qf, threshold=0.5)
    assert 0 in surviving
    assert 2 not in surviving
    assert len(fused) == len(surviving)
    # empty survivors
    s2, f2 = att.prune([[0.01, 0.01]], [[1.0, 0.0]], threshold=0.999)
    assert s2 == [] and len(f2) == 0


def test_multi_head_seeds_and_combine():
    mh = MultiHeadAttentionLogOddsWeights(3, 2, 2)
    assert mh.n_heads == 3
    # heads are seeded 0..h-1 -> head 0 equals a fresh seed-0 attention
    solo = AttentionLogOddsWeights(2, 2, seed=0)
    np.testing.assert_array_equal(mh.heads[0].weights_matrix, solo.weights_matrix)
    out = mh.combine([0.7, 0.6], [1.0, 0.0])
    assert isinstance(out, float) and 0 < out < 1
    batch = mh.combine([[0.7, 0.6], [0.3, 0.2]], [[1.0, 0.0], [0.0, 1.0]])
    assert batch.shape == (2,)


def test_multi_head_single_head_equals_attention():
    mh = MultiHeadAttentionLogOddsWeights(1, 2, 2)
    att = AttentionLogOddsWeights(2, 2, seed=0)
    p, qf = [[0.7, 0.6]], [[1.0, 0.0]]
    np.testing.assert_allclose(mh.combine(p, qf), [att.combine([0.7, 0.6], [1.0, 0.0])], atol=1e-12)


def test_multi_head_prune_and_bounds():
    mh = MultiHeadAttentionLogOddsWeights(2, 2, 2)
    qf = [[1.0, 0.0]] * 2
    probs = [[0.9, 0.9], [0.05, 0.05]]
    bounds = mh.compute_upper_bounds(probs, qf)
    fused = mh.combine(probs, qf)
    assert (bounds >= fused - 1e-10).all()
    surviving, _ = mh.prune(probs, qf, threshold=0.5)
    assert surviving == [0]


def test_multi_head_validation():
    with pytest.raises(ValueError, match="n_heads"):
        MultiHeadAttentionLogOddsWeights(0, 2, 2)
