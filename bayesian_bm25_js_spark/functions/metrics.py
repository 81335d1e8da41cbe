"""Calibration metrics: ECE, Brier score, reliability diagram.

NumPy ports of the reference (metrics.ts:17-172) plus Spark DataFrame
equivalents that compute the same statistics as distributed aggregates.

Bin rule parity: bin 0 is inclusive [0, w]; bins b>0 are (lo, hi] with
lo = b*w, hi = (b+1)*w computed in float64 exactly as the reference does
(metrics.ts:26-37).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def _bin_masks(probabilities: np.ndarray, n_bins: int):
    bin_width = 1.0 / n_bins
    for b in range(n_bins):
        lo = b * bin_width
        hi = (b + 1) * bin_width
        if b == 0:
            yield (probabilities >= lo) & (probabilities <= hi)
        else:
            yield (probabilities > lo) & (probabilities <= hi)


def expected_calibration_error(
    probabilities: Sequence[float],
    labels: Sequence[float],
    n_bins: int = 10,
) -> float:
    """Weighted mean |avgPred - avgActual| over non-empty bins
    (metrics.ts:17-52)."""
    p = np.asarray(probabilities, dtype=np.float64)
    y = np.asarray(labels, dtype=np.float64)
    total = p.shape[0]
    ece = 0.0
    for mask in _bin_masks(p, n_bins):
        count = int(np.count_nonzero(mask))
        if count == 0:
            continue
        avg_prob = float(np.sum(p[mask])) / count
        avg_label = float(np.sum(y[mask])) / count
        ece += (count / total) * abs(avg_prob - avg_label)
    return ece


def brier_score(
    probabilities: Sequence[float], labels: Sequence[float]
) -> float:
    """Mean squared error between probabilities and labels (metrics.ts:58-68)."""
    p = np.asarray(probabilities, dtype=np.float64)
    y = np.asarray(labels, dtype=np.float64)
    return float(np.sum((p - y) ** 2)) / p.shape[0]


def reliability_diagram(
    probabilities: Sequence[float],
    labels: Sequence[float],
    n_bins: int = 10,
) -> List[Tuple[float, float, int]]:
    """[ (avgPredicted, avgActual, count) ] per non-empty bin
    (metrics.ts:73-105)."""
    p = np.asarray(probabilities, dtype=np.float64)
    y = np.asarray(labels, dtype=np.float64)
    bins: List[Tuple[float, float, int]] = []
    for mask in _bin_masks(p, n_bins):
        count = int(np.count_nonzero(mask))
        if count == 0:
            continue
        bins.append(
            (float(np.sum(p[mask])) / count, float(np.sum(y[mask])) / count, count)
        )
    return bins


class CalibrationReport:
    """Bundled ECE + Brier + reliability with a text summary
    (metrics.ts:111-153)."""

    def __init__(self, ece, brier, reliability, n_samples, n_bins) -> None:
        self.ece = ece
        self.brier = brier
        self.reliability = reliability
        self.n_samples = n_samples
        self.n_bins = n_bins

    def summary(self) -> str:
        lines = [
            "Calibration Report",
            "==================",
            f"  Samples : {self.n_samples}",
            f"  Bins    : {self.n_bins}",
            f"  ECE     : {self.ece:.6f}",
            f"  Brier   : {self.brier:.6f}",
            "",
            "  Reliability Diagram",
            "  -------------------",
            f"  {'Predicted':>10}  {'Actual':>10}  {'Count':>6}",
        ]
        for avg_pred, avg_actual, count in self.reliability:
            lines.append(
                f"  {avg_pred:>10.4f}  {avg_actual:>10.4f}  {count:>6}"
            )
        return "\n".join(lines)


def calibration_report(
    probabilities, labels, n_bins: int = 10
) -> CalibrationReport:
    return CalibrationReport(
        expected_calibration_error(probabilities, labels, n_bins),
        brier_score(probabilities, labels),
        reliability_diagram(probabilities, labels, n_bins),
        len(probabilities),
        n_bins,
    )


# ---------------------------------------------------------------------------
# Spark DataFrame equivalents (distributed aggregates over (prob, label))
# ---------------------------------------------------------------------------

def _with_bin(df, prob_col: str, n_bins: int):
    from pyspark.sql import functions as F

    bin_width = 1.0 / n_bins
    # bin 0 is [0, w]; others (lo, hi]. ceil(p/w)-1 assigns p=lo to the
    # lower bin, matching the (lo, hi] rule; the explicit <= w guard
    # reproduces the inclusive bin-0 lower edge.
    p = F.col(prob_col)
    bin_col = F.when(p <= bin_width, F.lit(0)).otherwise(
        F.ceil(p / bin_width).cast("int") - 1
    )
    return df.withColumn("__bin", bin_col)


def reliability_diagram_df(df, prob_col: str, label_col: str, n_bins: int = 10):
    """Per-bin (avg_pred, avg_actual, count) as a DataFrame.

    One shuffle on the tiny bin key (<= n_bins groups); map-side partial
    aggregation makes this scale-independent of row count.
    """
    from pyspark.sql import functions as F

    return (
        _with_bin(df, prob_col, n_bins)
        .groupBy("__bin")
        .agg(
            F.avg(prob_col).alias("avg_pred"),
            F.avg(label_col).alias("avg_actual"),
            F.count(F.lit(1)).alias("count"),
        )
        .orderBy("__bin")
        .select("__bin", "avg_pred", "avg_actual", "count")
    )


def ece_df(df, prob_col: str, label_col: str, n_bins: int = 10):
    """ECE (metrics.ts:17-52) as a pure dataflow: bin → per-bin
    (avg_pred, avg_actual, count) → Σ (count/total)·|pred−actual|.
    Returns a 1-row DataFrame (ece double); two tiny aggregations, no
    driver materialization — the distributed twin of
    expected_calibration_error_df (which returns a Python float)."""
    from pyspark.sql import functions as F

    bins = (
        _with_bin(df, prob_col, n_bins)
        .groupBy("__bin")
        .agg(
            F.avg(prob_col).alias("avg_pred"),
            F.avg(label_col).alias("avg_actual"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )
    return bins.agg(
        (
            F.sum(F.col("cnt") * F.abs(F.col("avg_pred") - F.col("avg_actual")))
            / F.sum("cnt")
        ).alias("ece")
    )


def expected_calibration_error_df(
    df, prob_col: str, label_col: str, n_bins: int = 10
) -> float:
    from pyspark.sql import functions as F

    rows = (
        _with_bin(df, prob_col, n_bins)
        .groupBy("__bin")
        .agg(
            F.avg(prob_col).alias("avg_pred"),
            F.avg(label_col).alias("avg_actual"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .collect()
    )
    total = sum(r["cnt"] for r in rows)
    return sum(
        (r["cnt"] / total) * abs(r["avg_pred"] - r["avg_actual"]) for r in rows
    )


def brier_score_df(df, prob_col: str, label_col: str) -> float:
    from pyspark.sql import functions as F

    return df.select(
        F.avg(
            (F.col(prob_col) - F.col(label_col))
            * (F.col(prob_col) - F.col(label_col))
        ).alias("brier")
    ).collect()[0]["brier"]
