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
  C. prune    score only (q, b) with ub ≥ τ - ε; aggregate + window
              top-k as usual.

Safety: every doc in a pruned block scores ≤ ub < τ - ε ≤ kth best
actual score minus ε, so with ε = one 6-dp rounding quantum the pruned
rounded-rank top-k ≡ the exhaustive rounded-rank top-k (monotonicity
of round; see the surviving-filter comment). Verified in
tests/test_index_hardening.py.

Physical shape (profiled at 400k docs / 150 queries / local[32]):
  * block_max is scanned ONCE per batch — the token join result is
    repartitioned by query_id so phases A and B read one reused
    exchange instead of re-scanning the 20M-row cache each;
  * the surviving (query, token, block) table is BROADCAST into the
    postings join, so postings keep their doc_id partitioning (full
    map-side combining) and pruned blocks never emit a fan-out row;
  * callers that know the workload's term set pass terms_filter so the
    sorted in-memory caches batch-prune the scans (the in-memory
    analogue of the term-bucketed parquet layout's bucket pruning).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bayesian_bm25_js_spark.operators.compression import (
    DEFAULT_BLOCK_SIZE,
    block_max_table,
)
from bayesian_bm25_js_spark.operators.index_build import InvertedIndex
from bayesian_bm25_js_spark.operators.scoring import top_k

# One 6-dp rounding quantum: ranking is on round(score, 6) (top_k float
# policy). Pruning at raw τ could drop a doc whose raw score is < τ but
# within a quantum of the kth score — it would tie at 6 dp and could
# enter the rounded top-k via the doc_id tie-break. Slack of one
# quantum guarantees every pruned doc rounds strictly below the rounded
# kth score, so pruned ≡ exhaustive under the rounded ranking.
ROUND_SLACK = 1e-6


def _term_key(block_max: DataFrame, query_terms: DataFrame):
    """-> (join_key, qt): intern query terms when the metadata table is
    term_id-keyed (preferred — long keys, string column pruned)."""
    if "term_id" in block_max.columns:
        return "term_id", query_terms.withColumn(
            "term_id", F.xxhash64("term")
        ).drop("term")
    return "term", query_terms


def wand_block_bounds(block_max: DataFrame, query_terms: DataFrame) -> DataFrame:
    """Phase A only (kept for API/tests): per-(query, block) bounds.
    ub sums over query TOKENS (duplicates double-count, bm25.ts:110)."""
    key, qt = _term_key(block_max, query_terms)
    qb = block_max.join(F.broadcast(qt.select("query_id", key)), key)
    return qb.groupBy("query_id", "block_id").agg(
        F.sum("max_contrib").alias("ub"),
        F.max("max_contrib").alias("lb"),
    )


def _bounds_and_tau(
    block_max: DataFrame, query_terms: DataFrame, k: int
) -> tuple[DataFrame, DataFrame]:
    """One block_max scan -> (bounds, tau).

    τ(q) = max of two witness rules:

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
    qt = query_terms
    if "is_first" not in qt.columns:
        w_first = Window.partitionBy("query_id", "term").orderBy("pos")
        qt = qt.withColumn("is_first", F.row_number().over(w_first) == 1)
    key, qt = _term_key(block_max, qt)
    # ONE scan of block_max; the repartition materializes an exchange
    # that both downstream aggregations reuse (profiled: without it the
    # 20M-row cache is scanned once per phase).
    qb = block_max.join(
        F.broadcast(qt.select("query_id", key, "is_first")), key
    ).repartition("query_id")

    bounds = qb.groupBy("query_id", "block_id").agg(
        F.sum("max_contrib").alias("ub"),
        F.max("max_contrib").alias("lb"),
    )

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

    # rule 2 (is_first dedupes duplicate query tokens)
    per_term = qb.filter(F.col("is_first"))
    w2 = Window.partitionBy("query_id", key).orderBy(
        F.desc("min_contrib"), F.asc("block_id")
    )
    cum = per_term.withColumn("__cum", F.sum("n").over(w2))
    tau_t = (
        cum.filter((F.col("__cum") >= k) & (F.col("__cum") - F.col("n") < k))
        .groupBy("query_id", key)
        .agg(F.max("min_contrib").alias("tau_t"))
    )
    rule2 = tau_t.groupBy("query_id").agg(F.max("tau_t").alias("tau2"))

    tau = (
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
    return bounds, tau


def wand_thresholds(
    block_max: DataFrame, query_terms: DataFrame, bounds: DataFrame, k: int
) -> DataFrame:
    """Back-compat wrapper: τ per query (bounds arg kept for signature
    stability; the fused path recomputes internally)."""
    _, tau = _bounds_and_tau(block_max, query_terms, k)
    return tau


def wand_topk(
    index: InvertedIndex,
    query_terms: DataFrame,
    k: int,
    block_max: DataFrame = None,
    block_size: int = DEFAULT_BLOCK_SIZE,
    return_stats: bool = False,
    exact_order: bool = False,
    terms_filter: Optional[Sequence[str]] = None,
    broadcast_survivors: bool = True,
):
    """Pruned top-k: rank-identical to the exhaustive scorer under the
    engine's 6-dp rounded ranking.

    query_terms: (query_id, pos, term) with duplicates preserved.
    terms_filter: the workload's distinct terms, when known client-side
      — prunes the cached columnar scans batch-wise (sorted-by-term
      caches make the In-filter stats-effective).
    broadcast_survivors: hint-broadcast the surviving token×block side
      of the scoring join (bounded by Σ_q tokens(q)·blocks(q); disable
      at extreme batch sizes and let AQE decide).
    Returns the ranked DataFrame (query_id, doc_id, score, tf_overlap,
    dl, rank); with return_stats=True also (blocks_total, blocks_kept).
    """
    if block_max is None:
        block_max = block_max_table(index, block_size)

    from bayesian_bm25_js_spark.operators.scoring import isin_filter

    def _isin_key(df: DataFrame):
        if "term_id" in df.columns:
            from bayesian_bm25_js_spark.functions.xxh64 import spark_xxhash64

            ids = [spark_xxhash64(t) for t in terms_filter]
            return df.filter(isin_filter("term_id", ids))
        return df.filter(isin_filter("term", terms_filter))

    if terms_filter is not None:
        block_max = _isin_key(block_max)

    bounds, tau = _bounds_and_tau(block_max, query_terms, k)
    keep = F.col("ub") >= F.col("tau") - F.lit(ROUND_SLACK)
    surviving = (
        bounds.join(tau, "query_id").filter(keep).select("query_id", "block_id")
    )

    contrib = index.tf_norm_column(F.col("tf"), F.col("dl")) * F.col("idf")
    qt = query_terms
    if "is_first" not in qt.columns:
        qt = qt.withColumn("is_first", F.lit(True))

    postings = index.postings
    join_key = "term"
    if "term_id" in postings.columns:
        join_key = "term_id"
        qt = qt.withColumn("term_id", F.xxhash64("term")).drop("term")
        postings = postings.drop("term")
    if terms_filter is not None:
        postings = _isin_key(postings)

    # Push the pruning INTO the join key: postings join on
    # (term_id, block_id) against surviving-query-token×block rows, so a
    # pruned (query, block) never emits a fan-out row at all (the
    # filter-after-fan-out alternative still materializes every
    # (posting, token) pair — profiled ~94M emitted rows per 150-query
    # batch). Broadcasting keeps postings doc_id-partitioned -> full
    # map-side combining of the score aggregation.
    qt_blocks = qt.join(surviving, "query_id").select(
        "query_id", "pos", "is_first", join_key, "block_id"
    )
    if broadcast_survivors:
        qt_blocks = F.broadcast(qt_blocks)

    joined = (
        postings.withColumn(
            "block_id", F.floor(F.col("doc_id") / block_size).cast("int")
        )
        .join(qt_blocks, [join_key, "block_id"])
        .select(
            "query_id", "doc_id", "pos", "is_first", "dl", contrib.alias("contrib")
        )
    )
    if exact_order:
        score_agg = F.aggregate(
            F.array_sort(F.collect_list(F.struct("pos", "contrib"))),
            F.lit(0.0),
            lambda acc, x: acc + x["contrib"],
        )
    else:
        score_agg = F.sum("contrib")
    scores = joined.groupBy("query_id", "doc_id").agg(
        score_agg.alias("score"),
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
            F.sum(F.when(keep, 1).otherwise(0)).alias("blocks_kept"),
        )
    )
    return ranked, stats
