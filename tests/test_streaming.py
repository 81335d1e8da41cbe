"""Structured-Streaming online update: foreachBatch feedback consumption
and watermarked windowed aggregates."""

import time

import pytest
from pyspark.sql import functions as F

from bayesian_bm25_js_spark.functions.prng import lcg_a
from bayesian_bm25_js_spark.functions.kernel import sigmoid
from bayesian_bm25_js_spark.functions.transform import (
    BayesianProbabilityTransform,
)
from bayesian_bm25_js_spark.streaming.online_update import (
    OnlineCalibrationUpdater,
    windowed_feedback_stats,
)


def test_foreach_batch_online_update(spark, tmp_path):
    # feedback files land in a directory; the stream drains them
    feed_dir = str(tmp_path / "feedback")
    ckpt = str(tmp_path / "ckpt")
    rng = lcg_a(42)
    rows = []
    for i in range(300):
        s = rng() * 3
        y = 1.0 if rng() < float(sigmoid(2.0 * (s - 1.0))) else 0.0
        rows.append((s, y))
    spark.createDataFrame(rows[:150], "score double, label double").write.mode(
        "overwrite"
    ).parquet(feed_dir)
    spark.createDataFrame(rows[150:], "score double, label double").write.mode(
        "append"
    ).parquet(feed_dir)

    t = BayesianProbabilityTransform(0.5, 0.0)
    updater = OnlineCalibrationUpdater(t, learning_rate=0.05)
    stream = (
        spark.readStream.schema("score double, label double")
        .option("maxFilesPerTrigger", 1)
        .parquet(feed_dir)
    )
    q = updater.attach(stream, ckpt)
    q.awaitTermination(120)
    assert updater.batches_applied >= 1
    assert updater.rows_applied == 300
    assert t.n_updates == updater.batches_applied
    # parameters moved toward the generating process
    assert t.alpha != 0.5 or t.beta != 0.0


def test_windowed_feedback_stats(spark, tmp_path):
    feed_dir = str(tmp_path / "feed2")
    out_rows = []
    base = "2026-01-01 00:{m:02d}:00"
    rows = [
        (base.format(m=0), 1.0, 1.0),
        (base.format(m=0), 2.0, 1.0),
        (base.format(m=1), 0.5, 0.0),
        (base.format(m=5), 3.0, 1.0),
    ]
    df = spark.createDataFrame(rows, "ts_s string, score double, label double")
    df.select(F.col("ts_s").cast("timestamp").alias("ts"), "score", "label").write.mode(
        "overwrite"
    ).parquet(feed_dir)

    stream = spark.readStream.schema("ts timestamp, score double, label double").parquet(feed_dir)
    agg = windowed_feedback_stats(stream, "1 minute", "2 minutes")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("feedback_windows")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window"]["start"].minute): (r["n"], r["avg_score"], r["pos_rate"])
        for r in spark.sql("select * from feedback_windows").collect()
    }
    # with availableNow + watermark, only windows sealed by the final
    # watermark (max_ts - 2min) are emitted in append mode
    assert got[0] == (2, 1.5, 1.0)
    assert got[1] == (1, 0.5, 0.0)
