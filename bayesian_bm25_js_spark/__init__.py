"""bayesian_bm25_js_spark — a PySpark-native inverted-index + Bayesian-BM25 engine.

A from-scratch Spark engine with the query and data-processing
capabilities of the reference library cognica-io/bayesian-bm25-js
(studied read-only at /root/reference): BM25 full-text retrieval with
Bayesian probability calibration, score fusion, WAND/BMW pruning,
neural-score calibrators, calibration metrics, multi-field search and
explanation tracing — re-expressed Spark-first (DataFrame/Catalyst for
the relational dataflow, vectorized NumPy/Arrow kernels for the
numeric layer, driver-side state for the tiny sequential learners).

Layout:
  functions/  pure NumPy numeric kernels + driver-side learners
              (bit-parity ports of the reference formulas)
  operators/  Spark DataFrame operators: index build, scoring, top-k,
              WAND, multi-field, dedup, similarity, text stats
  sources/    corpus synthesis/readers, index persistence, checkpoints
  plans/      plan inspection helpers (explain/shuffle audits)
  streaming/  foreachBatch online-update wiring + incremental index
              maintenance over a document stream (epoch delta piles)
"""

__version__ = "0.1.0"

from bayesian_bm25_js_spark.functions.kernel import (  # noqa: F401
    EPSILON,
    clamp_probability,
    sigmoid,
    logit,
    tf_prior,
    norm_prior,
    composite_prior,
    posterior,
)
from bayesian_bm25_js_spark.functions.transform import (  # noqa: F401
    BayesianProbabilityTransform,
    TemporalBayesianTransform,
)
from bayesian_bm25_js_spark.functions.fusion import (  # noqa: F401
    balanced_log_odds_fusion,
    cosine_to_probability,
    log_odds_conjunction,
    prob_and,
    prob_not,
    prob_or,
    resolve_alpha,
)
from bayesian_bm25_js_spark.functions.calibration import (  # noqa: F401
    IsotonicCalibrator,
    PlattCalibrator,
)
from bayesian_bm25_js_spark.functions.metrics import (  # noqa: F401
    CalibrationReport,
    brier_score,
    calibration_report,
    expected_calibration_error,
    reliability_diagram,
)
from bayesian_bm25_js_spark.functions.xxh64 import spark_xxhash64  # noqa: F401
from bayesian_bm25_js_spark.functions.learners import (  # noqa: F401
    AttentionLogOddsWeights,
    LearnableLogOddsWeights,
    MultiHeadAttentionLogOddsWeights,
)
from bayesian_bm25_js_spark.functions.debug import FusionDebugger  # noqa: F401


def __getattr__(name):
    # Spark-dependent facades imported lazily so `import
    # bayesian_bm25_js_spark` works without a JVM on the path.
    if name == "BayesianBM25SparkScorer":
        from bayesian_bm25_js_spark.operators.scorer import (
            BayesianBM25SparkScorer,
        )

        return BayesianBM25SparkScorer
    if name == "MultiFieldSparkScorer":
        from bayesian_bm25_js_spark.operators.multi_field import (
            MultiFieldSparkScorer,
        )

        return MultiFieldSparkScorer
    if name in (
        "build_positional_index",
        "phrase_match",
        "phrase_topk",
        "proximity_match",
        "proximity_topk",
    ):
        from bayesian_bm25_js_spark.operators import phrase

        return getattr(phrase, name)
    raise AttributeError(name)
