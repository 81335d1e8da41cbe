"""Block-max WAND top-k — set-oriented, fully parallel pruning.

The reference exposes WAND/BMW bounds (probability.ts:346-368,
scorer.ts:618-711) but its retrieve() never uses them; classic WAND is
a sequential doc-at-a-time walk with a mutating threshold — the wrong
shape for a 1000-executor cluster. This operator re-derives the same
safe pruning as three declarative phases over the block-max metadata
(block_id = doc_id // block_size, scorer.ts:659-661):

  A. bounds   ub(q, b) = Σ over query TOKENS of max_contrib(term, b)
              (duplicate tokens count twice, matching bm25.ts:110);
              lb(q, b) = max over terms of max_contrib(term, b) — a
              score some real doc in block b attains, so it is a valid
              per-block lower bound witness.
  B. threshold τ(q) = kth largest lb over DISTINCT blocks (there exist
              k docs, one per such block, scoring ≥ τ); τ = -∞ when a
              query has fewer than k candidate blocks.
  C. prune    score only (q, b) with ub ≥ τ; aggregate + window top-k
              as usual.

Safety: every doc in a pruned block scores ≤ ub < τ ≤ kth best actual
score, so pruned top-k ≡ unpruned top-k (verified in tests/test_wand_spark.py).
The trade: slightly weaker pruning than doc-at-a-time BMW in exchange
for embarrassing parallelism — phases are plain joins/aggregations that
AQE plans, and no driver round-trips.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bayesian_bm25_js_spark.operators.compression import (
    DEFAULT_BLOCK_SIZE,
    block_max_table,
)
from bayesian_bm25_js_spark.operators.index_build import InvertedIndex
from bayesian_bm25_js_spark.operators.scoring import top_k


def wand_block_bounds(
    block_max: DataFrame, query_terms: DataFrame
) -> DataFrame:
    """Phase A: per-(query, block) upper/lower bounds. ub sums over
    query TOKENS (duplicates double-count, bm25.ts:110)."""
    qb = block_max.join(
        F.broadcast(query_terms.select("query_id", "term")), "term"
    )
    return qb.groupBy("query_id", "block_id").agg(
        F.sum("max_contrib").alias("ub"),
        F.max("max_contrib").alias("lb"),
    )


def wand_thresholds(
    block_max: DataFrame, query_terms: DataFrame, bounds: DataFrame, k: int
) -> DataFrame:
    """Phase B: per-query safe threshold τ = max of two witness rules.

    Rule 1 (distinct blocks): each block holds ≥1 doc scoring ≥ lb, so
    the kth largest lb over blocks is achieved by k distinct docs
    (one per block). Requires ≥ k blocks.

    Rule 2 (single-term counts): for one term t, every one of the
    n(t, b) docs in block b scores ≥ min_contrib(t, b); walking blocks
    in descending min_contrib until the cumulative count reaches k
    yields k distinct docs scoring ≥ that block's min_contrib. Taking
    the best term maximizes the bound; witnesses never mix terms, so
    no doc is double-counted.
    """
    # rule 1
    w1 = Window.partitionBy("query_id").orderBy(F.desc("lb"), F.asc("block_id"))
    rule1 = (
        bounds.withColumn("__rn", F.row_number().over(w1))
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_blocks"),
            F.min(F.when(F.col("__rn") <= k, F.col("lb"))).alias("kth_lb"),
        )
        .select(
            "query_id",
            F.when(F.col("n_blocks") >= k, F.col("kth_lb")).alias("tau1"),
        )
    )

    # rule 2
    qt = query_terms.select("query_id", "term").distinct()
    per_term = block_max.join(F.broadcast(qt), "term")
    w2 = Window.partitionBy("query_id", "term").orderBy(
        F.desc("min_contrib"), F.asc("block_id")
    )
    cum = per_term.withColumn("__cum", F.sum("n").over(w2))
    tau_t = (
        cum.filter((F.col("__cum") >= k) & (F.col("__cum") - F.col("n") < k))
        .groupBy("query_id", "term")
        .agg(F.max("min_contrib").alias("tau_t"))
    )
    rule2 = tau_t.groupBy("query_id").agg(F.max("tau_t").alias("tau2"))

    return (
        rule1.join(rule2, "query_id", "outer")
        .select(
            "query_id",
            F.coalesce(
                F.greatest("tau1", "tau2"),
                F.col("tau1"),
                F.col("tau2"),
                F.lit(float("-inf")),
            ).alias("tau"),
        )
    )


def wand_topk(
    index: InvertedIndex,
    query_terms: DataFrame,
    k: int,
    block_max: DataFrame = None,
    block_size: int = DEFAULT_BLOCK_SIZE,
    return_stats: bool = False,
):
    """Pruned top-k: rank-identical to the exhaustive scorer.

    query_terms: (query_id, pos, term) with duplicates preserved.
    Returns the ranked DataFrame (query_id, doc_id, score, tf_overlap,
    dl, rank); with return_stats=True also (blocks_total, blocks_kept).
    """
    if block_max is None:
        block_max = block_max_table(index, block_size)

    bounds = wand_block_bounds(block_max, query_terms)
    tau = wand_thresholds(block_max, query_terms, bounds, k)
    surviving = (
        bounds.join(tau, "query_id")
        .filter(F.col("ub") >= F.col("tau"))
        .select("query_id", "block_id")
    )

    contrib = index.tf_norm_column(F.col("tf"), F.col("dl")) * F.col("idf")
    qt = query_terms
    if "is_first" not in qt.columns:
        qt = qt.withColumn("is_first", F.lit(True))
    joined = (
        index.postings.withColumn(
            "block_id", F.floor(F.col("doc_id") / block_size).cast("int")
        )
        .join(F.broadcast(qt), "term")
        .join(surviving, ["query_id", "block_id"], "left_semi")
        .select(
            "query_id", "doc_id", "pos", "is_first", "dl", contrib.alias("contrib")
        )
    )
    ordered_sum = F.aggregate(
        F.array_sort(F.collect_list(F.struct("pos", "contrib"))),
        F.lit(0.0),
        lambda acc, x: acc + x["contrib"],
    )
    scores = joined.groupBy("query_id", "doc_id").agg(
        ordered_sum.alias("score"),
        F.sum(F.when(F.col("is_first"), 1).otherwise(0))
        .cast("int")
        .alias("tf_overlap"),
        F.first("dl").alias("dl"),
    )
    ranked = top_k(scores, k)
    if not return_stats:
        return ranked
    stats = (
        bounds.join(tau, "query_id")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("blocks_total"),
            F.sum(
                F.when(F.col("ub") >= F.col("tau"), 1).otherwise(0)
            ).alias("blocks_kept"),
        )
    )
    return ranked, stats
