"""Online calibration updates from a relevance-feedback stream.

The reference's `update()` (probability.ts:487-602) is an inherently
sequential driver-side state machine (EMA, bias correction, Polyak
averaging). Its streaming embodiment: a Structured Streaming feedback
source (score, label[, tf, doc_len_ratio, ts]) consumed with
foreachBatch — each micro-batch is collected (feedback streams are
tiny relative to the corpus) and applied as one mini-batch `update()`,
exactly matching the reference's mini-batch semantics.

Also provides a watermarked event-time aggregation of feedback for
drift monitoring (late data beyond the watermark is dropped by Spark's
standard semantics).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bayesian_bm25_js_spark.functions.transform import (
    BayesianProbabilityTransform,
)


class OnlineCalibrationUpdater:
    """foreachBatch sink applying feedback micro-batches to a transform."""

    def __init__(
        self,
        transform: BayesianProbabilityTransform,
        learning_rate: float = 0.01,
        momentum: float = 0.9,
        mode: Optional[str] = None,
        max_batch_rows: int = 100_000,
    ) -> None:
        self.transform = transform
        self.learning_rate = learning_rate
        self.momentum = momentum
        self.mode = mode
        self.max_batch_rows = max_batch_rows
        self.batches_applied = 0
        self.rows_applied = 0

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        rows = batch_df.limit(self.max_batch_rows).collect()
        if not rows:
            return
        scores = [r["score"] for r in rows]
        labels = [r["label"] for r in rows]
        kwargs = dict(
            learning_rate=self.learning_rate,
            momentum=self.momentum,
        )
        if self.mode is not None:
            kwargs["mode"] = self.mode
        if self.mode == "prior_aware":
            kwargs["tf"] = [r["tf"] for r in rows]
            kwargs["doc_len_ratio"] = [r["doc_len_ratio"] for r in rows]
        self.transform.update(scores, labels, **kwargs)
        self.batches_applied += 1
        self.rows_applied += len(rows)

    def attach(self, feedback_stream: DataFrame, checkpoint_dir: str):
        """-> StreamingQuery consuming the feedback stream."""
        return (
            feedback_stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )


def windowed_feedback_stats(
    feedback_stream: DataFrame,
    window_duration: str = "1 minute",
    watermark_delay: str = "2 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Event-time windowed feedback aggregates with late-data handling:
    (window, n, avg_score, pos_rate) — drift monitoring for when to
    re-fit alpha/beta."""
    return (
        feedback_stream.withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(F.col(ts_col), window_duration))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("score").alias("avg_score"),
            F.avg("label").alias("pos_rate"),
        )
    )
