"""Hybrid fusion operator + distributed fit tests."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from bayesian_bm25_js_spark.functions.fusion import (
    balanced_log_odds_fusion,
    log_odds_conjunction,
)
from bayesian_bm25_js_spark.functions.prng import lcg_a, mulberry32
from bayesian_bm25_js_spark.functions.kernel import sigmoid
from bayesian_bm25_js_spark.functions.transform import (
    BayesianProbabilityTransform,
)
from bayesian_bm25_js_spark.operators.distributed_fit import fit_distributed
from bayesian_bm25_js_spark.operators.hybrid import (
    balanced_fusion,
    log_odds_conjunction_col,
)


def test_balanced_fusion_matches_kernel(spark):
    rng = mulberry32(21)
    rows = []
    for q in range(3):
        for d in range(15):
            rows.append((q, d, 0.05 + rng() * 0.9, rng() * 2 - 1))
    df = spark.createDataFrame(
        rows, "query_id long, doc_id long, sparse_prob double, cos double"
    )
    out = balanced_fusion(df, weight=0.3)
    got = {
        (r["query_id"], r["doc_id"]): r["fusion_score"]
        for r in out.collect()
    }
    # oracle per query via the NumPy kernel
    by_q = {}
    for q, d, sp, cos in rows:
        by_q.setdefault(q, []).append((d, sp, cos))
    for q, entries in by_q.items():
        want = balanced_log_odds_fusion(
            [e[1] for e in entries], [e[2] for e in entries], weight=0.3
        )
        for (d, _, _), w in zip(entries, want):
            assert got[(q, d)] == pytest.approx(w, rel=1e-9, abs=1e-12)


def test_balanced_fusion_degenerate_range(spark):
    df = spark.createDataFrame(
        [(0, d, 0.5, 0.8) for d in range(4)],
        "query_id long, doc_id long, sparse_prob double, cos double",
    )
    out = balanced_fusion(df).collect()
    for r in out:
        assert r["fusion_score"] == 0.0  # both signals constant -> zeros


def test_log_odds_conjunction_col_matches_kernel(spark):
    rng = mulberry32(33)
    rows = [(i, 0.05 + rng() * 0.9, 0.05 + rng() * 0.9) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, p1 double, p2 double")
    got = df.select(
        "id",
        log_odds_conjunction_col(["p1", "p2"], alpha=0.5).alias("fused"),
        log_odds_conjunction_col(["p1", "p2"], alpha=0.0, weights=[0.7, 0.3]).alias("fused_w"),
    ).collect()
    for r, (i, p1, p2) in zip(sorted(got, key=lambda r: r["id"]), rows):
        assert r["fused"] == pytest.approx(
            float(log_odds_conjunction([p1, p2], 0.5)), rel=1e-9
        )
        assert r["fused_w"] == pytest.approx(
            float(log_odds_conjunction([p1, p2], 0.0, [0.7, 0.3])), rel=1e-9
        )


def test_fit_distributed_matches_driver_fit(spark):
    rng = lcg_a(42)
    rows = []
    for _ in range(400):
        s = rng() * 3
        y = 1.0 if rng() < float(sigmoid(2.0 * (s - 1.0))) else 0.0
        rows.append((s, y))
    df = spark.createDataFrame(rows, "score double, label double")

    t_driver = BayesianProbabilityTransform(0.5, 0.0)
    t_driver.fit(
        [r[0] for r in rows], [r[1] for r in rows],
        learning_rate=0.05, max_iterations=60,
    )
    t_dist = BayesianProbabilityTransform(0.5, 0.0)
    fit_distributed(t_dist, df, learning_rate=0.05, max_iterations=60)
    assert t_dist.alpha == pytest.approx(t_driver.alpha, rel=1e-6)
    assert t_dist.beta == pytest.approx(t_driver.beta, rel=1e-6)


def test_fit_distributed_prior_aware(spark):
    rng = lcg_a(7)
    rows = [(rng() * 3, 1.0 if rng() > 0.5 else 0.0, 3.0, 0.5) for _ in range(100)]
    df = spark.createDataFrame(rows, "score double, label double, tf double, doc_len_ratio double")
    t = BayesianProbabilityTransform(1.0, 0.0)
    fit_distributed(t, df, mode="prior_aware", max_iterations=20)
    t2 = BayesianProbabilityTransform(1.0, 0.0)
    t2.fit(
        [r[0] for r in rows], [r[1] for r in rows],
        mode="prior_aware", tfs=[r[2] for r in rows],
        doc_len_ratios=[r[3] for r in rows], max_iterations=20,
    )
    assert t.alpha == pytest.approx(t2.alpha, rel=1e-6)
    assert t.beta == pytest.approx(t2.beta, rel=1e-6)
