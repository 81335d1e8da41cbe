"""FusionDebugger trace parity: every traced intermediate equals the
direct kernel/fusion call (the reference asserts the same in
tests/debug.test.ts:54-148, 1164-1369)."""

import pytest

from bayesian_bm25_js_spark.functions.debug import FusionDebugger
from bayesian_bm25_js_spark.functions.fusion import (
    cosine_to_probability,
    log_odds_conjunction,
    prob_and,
    prob_not,
    prob_or,
)
from bayesian_bm25_js_spark.functions.kernel import (
    composite_prior,
    likelihood,
    logit,
    norm_prior,
    posterior,
    tf_prior,
)
from bayesian_bm25_js_spark.functions.transform import (
    BayesianProbabilityTransform,
)


@pytest.fixture
def dbg():
    return FusionDebugger(BayesianProbabilityTransform(1.5, 1.0, 0.05))


def test_trace_bm25_matches_direct_calls(dbg):
    t = dbg.trace_bm25(2.5, 4.0, 0.8)
    assert t.likelihood == pytest.approx(float(likelihood(2.5, 1.5, 1.0)), abs=1e-15)
    assert t.tf_prior == pytest.approx(float(tf_prior(4.0)), abs=1e-15)
    assert t.norm_prior == pytest.approx(float(norm_prior(0.8)), abs=1e-15)
    assert t.composite_prior == pytest.approx(float(composite_prior(4.0, 0.8)), abs=1e-15)
    assert t.posterior == pytest.approx(
        float(posterior(t.likelihood, t.composite_prior, 0.05)), abs=1e-15
    )
    assert t.logit_likelihood == pytest.approx(float(logit(t.likelihood)), abs=1e-12)
    assert t.logit_base_rate == pytest.approx(float(logit(0.05)), abs=1e-12)
    assert (t.alpha, t.beta, t.base_rate) == (1.5, 1.0, 0.05)


def test_trace_vector(dbg):
    v = dbg.trace_vector(0.6)
    assert v.probability == pytest.approx(float(cosine_to_probability(0.6)), abs=1e-15)
    assert v.logit_probability == pytest.approx(float(logit(0.8)), abs=1e-12)


def test_trace_not(dbg):
    n = dbg.trace_not(0.8, name="BM25")
    assert n.complement == pytest.approx(float(prob_not(0.8)), abs=1e-15)
    # sign flip in logit space
    assert n.logit_complement == pytest.approx(-n.logit_input, abs=1e-9)


@pytest.mark.parametrize(
    "method,oracle",
    [
        ("prob_and", prob_and),
        ("prob_or", prob_or),
    ],
)
def test_trace_fusion_and_or(dbg, method, oracle):
    probs = [0.8, 0.6, 0.9]
    tr = dbg.trace_fusion(probs, method=method)
    assert tr.fused_probability == pytest.approx(float(oracle(probs)), abs=1e-12)
    assert tr.method == method
    assert tr.signal_names == ["signal_0", "signal_1", "signal_2"]


def test_trace_fusion_log_odds(dbg):
    probs = [0.8, 0.6]
    tr = dbg.trace_fusion(probs, method="log_odds", alpha=0.5)
    assert tr.fused_probability == pytest.approx(
        float(log_odds_conjunction(probs, 0.5)), abs=1e-12
    )
    tr_w = dbg.trace_fusion(probs, method="log_odds", weights=[0.3, 0.7])
    assert tr_w.fused_probability == pytest.approx(
        float(log_odds_conjunction(probs, None, [0.3, 0.7])), abs=1e-12
    )
    assert tr_w.weights == [0.3, 0.7]
    with pytest.raises(ValueError, match="method"):
        dbg.trace_fusion(probs, method="bogus")


def test_trace_document_and_compare(dbg):
    a = dbg.trace_document(bm25_score=3.0, tf=5, doc_len_ratio=0.9,
                           cosine_score=0.7, doc_id="a")
    b = dbg.trace_document(bm25_score=1.0, tf=1, doc_len_ratio=1.5,
                           cosine_score=0.9, doc_id="b")
    assert set(a.signals) == {"BM25", "Vector"}
    assert a.final_probability == a.fusion.fused_probability

    cmp = dbg.compare(a, b)
    assert cmp.dominant_signal == "BM25"  # biggest delta
    # vector favors b while fused favors a -> crossover on Vector
    assert cmp.crossover_stage == "Vector"
    assert cmp.signal_deltas["BM25"] > 0 > cmp.signal_deltas["Vector"]

    with pytest.raises(ValueError, match="tf and doc_len_ratio"):
        dbg.trace_document(bm25_score=1.0)
    with pytest.raises(ValueError, match="At least one"):
        dbg.trace_document()


def test_formatting(dbg):
    tr = dbg.trace_document(bm25_score=2.0, tf=3, doc_len_ratio=0.7,
                            cosine_score=0.5, doc_id=7)
    text = dbg.format_trace(tr)
    for frag in ["Document: 7", "[BM25]", "[Vector]", "[Fusion]",
                 "composite_prior", "base_rate", "-> final="]:
        assert frag in text, frag
    summary = dbg.format_summary(tr)
    assert summary.startswith("7: BM25=") and "Fused=" in summary


def test_format_not(dbg):
    """formatNot layout (debug.ts:229-240): complement arithmetic shown
    inline, explicit '+' on non-negative logits, sign-flip note."""
    out = dbg.format_not(dbg.trace_not(0.8, name="vec"))
    lines = out.split("\n")
    assert lines[0] == "  [NOT vec]"
    assert lines[1] == "    P(vec) = 0.800"
    assert lines[2] == "    P(NOT vec) = 1 - 0.800 = 0.200"
    assert lines[3].startswith("    logit(0.800) = +1.386")
    assert lines[4].startswith("    logit(0.200) = -1.386")
    assert lines[4].endswith("(sign flipped)")


def test_format_comparison(dbg):
    """formatComparison (debug.ts:753-829): table with per-signal rows,
    dominant marker, fused row, rank order, and the crossover note."""
    a = dbg.trace_document(bm25_score=3.0, tf=5, doc_len_ratio=0.9,
                           cosine_score=0.7, doc_id="a")
    b = dbg.trace_document(bm25_score=1.0, tf=1, doc_len_ratio=1.5,
                           cosine_score=0.9, doc_id="b")
    cmp = dbg.compare(a, b)
    out = dbg.format_comparison(cmp)
    lines = out.split("\n")
    assert lines[0] == "Comparison: a vs b"
    assert "Signal" in lines[1] and "dominant" in lines[1]
    bm25_row = next(l for l in lines if l.strip().startswith("BM25"))
    assert "<-- largest" in bm25_row
    assert any(l.strip().startswith("Fused") for l in lines)
    assert any(l.startswith("  Rank order: a > b (by +") for l in lines)
    assert any(l.startswith("  Dominant signal: BM25 (+") for l in lines)
    # crossover: Vector favored b but BM25 outweighed it
    assert any(
        l == "  Note: Vector favored b, but BM25 signal outweighed it"
        for l in lines
    )
    # tied branch
    cmp_self = dbg.compare(a, a)
    assert "Rank order: tied" in dbg.format_comparison(cmp_self)
