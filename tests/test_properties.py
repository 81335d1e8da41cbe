"""Property-based tests (hypothesis) for the numeric kernel.

The reference pins its paper theorems with hand-picked cases
(paper_theorems.test.ts); these sweep the same invariants over
generated inputs:

* Theorem 4.3.x range/monotonicity of the posterior pipeline
* Theorem 6.1.2 WAND bound safety (bound ≥ any achievable probability)
* fusion algebra bounds (Eq. 33-37) and conjunction symmetry

Pure NumPy — no SparkSession, so the whole file runs in milliseconds
per example.
"""

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from bayesian_bm25_js_spark.functions import fusion
from bayesian_bm25_js_spark.functions import kernel

finite = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e6, max_value=1e6
)
score_s = st.floats(min_value=0.0, max_value=100.0)
tf_s = st.floats(min_value=0.0, max_value=50.0)
dlr_s = st.floats(min_value=0.01, max_value=10.0)
alpha_s = st.floats(min_value=0.01, max_value=10.0)
beta_s = st.floats(min_value=-10.0, max_value=10.0)
rate_s = st.floats(min_value=1e-6, max_value=1.0 - 1e-6)
prob_s = st.floats(min_value=1e-9, max_value=1.0 - 1e-9)


@given(finite)
def test_clamp_probability_range(x):
    p = float(kernel.clamp_probability(x))
    assert 1e-10 <= p <= 1.0 - 1e-10


@given(finite, finite)
def test_sigmoid_range_and_monotone(a, b):
    sa, sb = float(kernel.sigmoid(a)), float(kernel.sigmoid(b))
    assert 0.0 <= sa <= 1.0
    if a < b:
        assert sa <= sb


@given(st.floats(min_value=-15.0, max_value=15.0))
def test_logit_inverts_sigmoid(x):
    # beyond |x|~23 sigmoid saturates into the 1e-10 clamp by design
    assert math.isclose(
        float(kernel.logit(kernel.sigmoid(x))), x, rel_tol=1e-6, abs_tol=1e-6
    )


@given(score_s, tf_s, dlr_s, alpha_s, beta_s, rate_s)
@settings(max_examples=200)
def test_score_to_probability_is_probability(score, tf, dlr, alpha, beta, rate):
    for mode in ("balanced", "prior_aware", "prior_free"):
        p = float(
            kernel.score_to_probability(
                score, tf, dlr, alpha, beta, base_rate=rate, mode=mode
            )
        )
        assert 0.0 <= p <= 1.0 and not math.isnan(p)


@given(
    st.tuples(score_s, score_s), tf_s, dlr_s, alpha_s, beta_s, rate_s
)
@settings(max_examples=200)
def test_probability_monotone_in_score(scores, tf, dlr, alpha, beta, rate):
    """Fixed priors: a higher BM25 score can never yield a lower
    probability (likelihood is monotone in score, Eq. 20)."""
    lo, hi = sorted(scores)
    p_lo = float(
        kernel.score_to_probability(lo, tf, dlr, alpha, beta, base_rate=rate)
    )
    p_hi = float(
        kernel.score_to_probability(hi, tf, dlr, alpha, beta, base_rate=rate)
    )
    assert p_hi >= p_lo - 1e-12


@given(score_s, tf_s, dlr_s, alpha_s, beta_s, rate_s)
@settings(max_examples=200)
def test_wand_bound_is_safe(ub, tf, dlr, alpha, beta, rate):
    """Thm 6.1.2: the bound computed from a score upper bound dominates
    the probability of ANY document whose score ≤ that bound —
    here checked at the bound itself and below it."""
    bound = float(kernel.wand_upper_bound(ub, alpha, beta, base_rate=rate))
    for frac in (1.0, 0.5, 0.0):
        p = float(
            kernel.score_to_probability(
                ub * frac, tf, dlr, alpha, beta, base_rate=rate
            )
        )
        assert bound >= p - 1e-9


@given(st.lists(prob_s, min_size=1, max_size=6))
def test_prob_and_or_bounds(ps):
    a = float(fusion.prob_and(np.array(ps)))
    o = float(fusion.prob_or(np.array(ps)))
    eps = 1e-9
    assert a <= min(ps) + eps
    assert o >= max(ps) - eps
    assert a <= o + eps


@given(prob_s)
def test_prob_not_involution(p):
    assert math.isclose(
        float(fusion.prob_not(fusion.prob_not(p))), p, rel_tol=1e-6, abs_tol=1e-9
    )


@given(st.lists(prob_s, min_size=2, max_size=5), st.randoms())
@settings(max_examples=100)
def test_log_odds_conjunction_symmetric(ps, rnd):
    """Unweighted conjunction (signals on the last axis) is invariant
    under signal permutation up to the ordered-sum float tolerance."""
    perm = ps[:]
    rnd.shuffle(perm)
    a = float(fusion.log_odds_conjunction(np.array(ps)))
    b = float(fusion.log_odds_conjunction(np.array(perm)))
    assert math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12)


@given(st.lists(st.floats(min_value=-50.0, max_value=50.0), min_size=1, max_size=8))
def test_softmax_is_distribution(z):
    s = fusion.softmax(np.array(z))
    assert np.all(s >= 0.0)
    assert math.isclose(float(s.sum()), 1.0, rel_tol=1e-9)


@given(st.lists(finite, min_size=2, max_size=10))
def test_min_max_normalize_range(xs):
    out = fusion.min_max_normalize(np.array(xs))
    assert np.all(out >= -1e-12) and np.all(out <= 1.0 + 1e-12)
    if max(xs) - min(xs) >= 1e-12:  # below: all-zeros guard (fusion.ts:284-296)
        assert math.isclose(float(out.max()), 1.0, rel_tol=1e-9)
        assert math.isclose(float(out.min()), 0.0, abs_tol=1e-12)
    else:
        assert np.all(out == 0.0)


@given(prob_s, st.floats(min_value=-1.0, max_value=1.0), st.floats(min_value=0.0, max_value=1.0))
def test_balanced_fusion_is_probability(sp, cos, w):
    out = float(
        np.asarray(fusion.balanced_log_odds_fusion(np.array([sp]), np.array([cos]), w))[0]
    )
    assert 0.0 <= out <= 1.0 and not math.isnan(out)


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=2**62), max_size=40),
        min_size=1,
        max_size=12,
    )
)
@settings(max_examples=150, deadline=None)  # first call pays module import
def test_batched_varint_matches_scalar_codec(rows):
    """_encode_rows/_decode_rows (the whole-Arrow-batch vectorized
    codec inside pack/unpack) are byte- and value-identical to the
    public per-block varint functions."""
    from bayesian_bm25_js_spark.operators.compression import (
        _decode_rows,
        _encode_rows,
        varint_decode,
        varint_encode,
    )

    lens = np.array([len(r) for r in rows], dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    flat = np.array([v for r in rows for v in r], dtype=np.uint64)

    blobs = _encode_rows(flat, starts, lens)
    assert blobs == [varint_encode(np.array(r, dtype=np.uint64)) for r in rows]

    vals, counts = _decode_rows(blobs)
    assert counts.tolist() == [len(r) for r in rows]
    assert [int(v) for v in vals] == [v for r in rows for v in r]
    for blob, r in zip(blobs, rows):
        assert varint_decode(blob) == list(r)
