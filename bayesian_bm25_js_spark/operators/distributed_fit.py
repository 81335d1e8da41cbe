"""Distributed gradient computation for transform fitting.

The reference fits on in-memory arrays (probability.ts:383-477); when
the labeled feedback set is too large for the driver, each GD iteration
becomes one JVM-side aggregate over a cached DataFrame: the per-sample
gradient terms are column expressions and the mean-reduce is a
map-side-combined agg (a treeAggregate equivalent). Parameters stay on
the driver; only two doubles cross the boundary per iteration.

Use driver-side `transform.fit` for ≤ ~10M samples; this path beyond.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bayesian_bm25_js_spark.functions.transform import (
    BayesianProbabilityTransform,
    _check_mode,
)

EPS = 1e-10


def _sigmoid_col(x):
    return F.when(x >= 0, 1.0 / (1.0 + F.exp(-x))).otherwise(
        F.exp(x) / (1.0 + F.exp(x))
    )


def fit_distributed(
    transform: BayesianProbabilityTransform,
    feedback: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    learning_rate: float = 0.01,
    max_iterations: int = 100,
    tolerance: float = 1e-6,
    mode: str = "balanced",
    tf_col: str = "tf",
    dlr_col: str = "doc_len_ratio",
) -> BayesianProbabilityTransform:
    """Batch GD where each iteration is one Spark aggregate."""
    _check_mode(mode)
    s = F.col(score_col)
    y = F.col(label_col)

    df = feedback
    if mode == "prior_aware":
        tfp = 0.2 + 0.7 * F.least(F.lit(1.0), F.col(tf_col) / 10.0)
        npr = 0.3 + 0.6 * (
            1.0 - F.least(F.lit(1.0), F.abs(F.col(dlr_col) - 0.5) * 2.0)
        )
        prior = F.greatest(F.lit(0.1), F.least(F.lit(0.9), 0.7 * tfp + 0.3 * npr))
        df = df.withColumn("__prior", prior)
    df = df.persist()
    try:
        alpha, beta = transform.alpha, transform.beta
        for _ in range(max_iterations):
            x = F.lit(alpha) * (s - F.lit(beta))
            l_val = F.greatest(
                F.lit(EPS), F.least(F.lit(1.0 - EPS), _sigmoid_col(x))
            )
            if mode == "prior_aware":
                p = F.col("__prior")
                denom = l_val * p + (1.0 - l_val) * (1.0 - p)
                predicted = F.greatest(
                    F.lit(EPS), F.least(F.lit(1.0 - EPS), l_val * p / denom)
                )
                dp_dl = (p * (1.0 - p)) / (denom * denom)
                ga = (predicted - y) * dp_dl * l_val * (1.0 - l_val) * (s - F.lit(beta))
                gb = (predicted - y) * dp_dl * (-l_val * (1.0 - l_val) * F.lit(alpha))
            else:
                ga = (l_val - y) * (s - F.lit(beta))
                gb = (l_val - y) * F.lit(-alpha)
            row = df.agg(
                F.avg(ga).alias("ga"), F.avg(gb).alias("gb")
            ).collect()[0]
            new_alpha = alpha - learning_rate * row["ga"]
            new_beta = beta - learning_rate * row["gb"]
            converged = (
                abs(new_alpha - alpha) < tolerance
                and abs(new_beta - beta) < tolerance
            )
            alpha, beta = new_alpha, new_beta
            if converged:
                break
    finally:
        df.unpersist()

    transform.alpha = alpha
    transform.beta = beta
    transform._training_mode = mode
    transform._n_updates = 0
    transform._grad_alpha_ema = 0.0
    transform._grad_beta_ema = 0.0
    transform._alpha_avg = alpha
    transform._beta_avg = beta
    return transform
