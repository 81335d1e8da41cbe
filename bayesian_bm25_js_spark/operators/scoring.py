"""Query scoring: broadcast join + ordered aggregation + window top-k.

The reference's postings walk (bm25.ts:105-127) becomes:

  query_terms (tiny)  ── broadcast ──┐
  postings (term, doc_id, tf, dl, idf) ⋈ on term      no shuffle of the
                                                      big side beyond its
                                                      stored partitioning
    → contrib = idf * tf_norm per (query term, doc)
    → groupBy(query_id, doc_id):
        score = ORDERED sum of contribs by query-token position
        tf    = |distinct matched terms| (the prior's overlap count,
                scorer.ts:549-564)
        dl    = first(dl)
    → window top-k (desc score, asc doc_id)           rank-identical
                                                      tie-break (JS
                                                      stable sort)
    → calibration pandas UDF (Arrow-vectorized NumPy kernel)

Float64 parity details:
* duplicate query tokens contribute twice — the query side keeps one
  row per token position, never deduped (bm25.ts:110);
* per-doc contributions are summed in query-token order via
  array_sort(collect_list(struct(pos, contrib))) + aggregate(), because
  float64 addition is not associative (SURVEY §4.4);
* zero-score docs get probability exactly 0.0 (scorer.ts:577-593).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.window import Window

from bayesian_bm25_js_spark.operators.index_build import InvertedIndex


def isin_filter(col_name: str, values) -> "F.Column":
    """`col IN (...)` built as ONE JVM-parsed expression. PySpark's
    Column.isin() makes a py4j round-trip per literal — measured 1.8s
    of driver time per batch for a 1600-term filter; parsing a single
    SQL string costs ~nothing."""
    vals = list(values)
    if not vals:
        # `col IN ()` is a parse error; an empty filter matches nothing.
        return F.lit(False)
    for v in vals:
        if isinstance(v, bool) or not isinstance(v, (int, str)):
            raise TypeError(
                f"isin_filter supports int/str values only, got {type(v).__name__}"
            )
    if all(isinstance(v, int) for v in vals):
        lst = ",".join(str(v) for v in vals)
    else:
        lst = ",".join("'" + str(v).replace("\\", "\\\\").replace("'", "\\'") + "'" for v in vals)
    return F.expr(f"`{col_name}` IN ({lst})")


def queries_to_df(spark: SparkSession, queries: Sequence[Sequence[str]]) -> DataFrame:
    """[[token,...], ...] -> (query_id, pos, term, is_first).

    Duplicates preserved (they contribute twice to the score,
    bm25.ts:110). is_first marks the first occurrence of a term within
    its query, so the scoring aggregate can count distinct matched
    terms with a plain conditional sum instead of a per-group hash set
    (the overlap count feeds the tf prior, scorer.ts:549-564)."""
    rows = []
    for qid, tokens in enumerate(queries):
        seen = set()
        for pos, term in enumerate(tokens):
            rows.append((qid, pos, term, term not in seen))
            seen.add(term)
    return spark.createDataFrame(
        rows, "query_id long, pos int, term string, is_first boolean"
    )


def probability_udf(
    alpha: float,
    beta: float,
    base_rate: Optional[float],
    mode: str = "balanced",
    prior_fn=None,
):
    """Arrow-vectorized calibration kernel: (score, tf, dlr) -> probability.

    Runs the exact NumPy two-step posterior (functions/kernel.py) so
    distributed results match the driver oracle bit-for-bit.
    """
    from bayesian_bm25_js_spark.functions.kernel import score_to_probability

    @pandas_udf("double")
    def _prob(score: pd.Series, tf: pd.Series, dlr: pd.Series) -> pd.Series:
        out = score_to_probability(
            score.to_numpy(dtype=np.float64),
            tf.to_numpy(dtype=np.float64),
            dlr.to_numpy(dtype=np.float64),
            alpha,
            beta,
            base_rate,
            mode=mode,
            prior_fn=prior_fn,
        )
        return pd.Series(np.asarray(out, dtype=np.float64))

    return _prob


def score_queries(
    index: InvertedIndex,
    query_terms: DataFrame,
    exact_order: bool = False,
    terms_filter: Optional[Sequence[str]] = None,
    carry_idf: bool = False,
) -> DataFrame:
    """-> (query_id, doc_id, score, tf_overlap, dl) for matched docs only.

    Sparse output: docs with no matching term are absent (score
    semantically 0).

    exact_order=False (default, the scale path): plain float64 SUM —
    whole-stage-codegen'd HashAggregate with map-side combine; shuffle
    carries one double per (query, doc). Differs from the reference's
    left-to-right accumulation by ≤ a few ulp, invisible at the 6-dp
    contract every oracle/rank comparison uses (profiled: the
    collect_list variant spilled 28 GB per 150-query batch at 400k docs
    and broke 8→32 scaling).

    exact_order=True: bit-exact JS parity — per-doc contributions are
    summed in query-token order via array_sort(collect_list(...)) +
    aggregate(), because float64 addition is not associative
    (SURVEY §4.4; bm25.ts:117-123). ObjectHashAggregate, memory-heavy:
    fixture-parity runs only.
    """
    contrib = index.tf_norm_column(F.col("tf"), F.col("dl")) * F.col("idf")
    qt = query_terms
    if "is_first" not in qt.columns:
        qt = qt.withColumn("is_first", F.lit(True))
    postings = index.postings
    # carry_idf=False (default since r5): r4 moved idf to the broadcast
    # query side (vocab-sized term_stats join per batch) to avoid
    # decompressing the postings cache's idf column per row, but
    # same-session A/Bs read it as a per-batch FIXED cost with no
    # measurable scan saving: 50k docs/200 q — warm WAND CPU 12.4s vs
    # 8.2s with it off (-34%); 300k docs/2000 q — 374.6/382.6 vs 376.8
    # (neutral, inside noise). Off wins or ties everywhere measured;
    # carry_idf=True is the explicit A/B knob for larger-shape re-runs
    # (was the invisible SPARK_CARRY_IDF env switch, VERDICT r5 #2).
    # The packed layout keeps its own vocab join (push_string_filter
    # marks it): its postings view already attaches idf post-decode,
    # and dropping the column there would not remove the join.
    carry_idf = (
        carry_idf
        and "idf" in postings.columns
        and index.term_stats is not None
        and not getattr(index, "push_string_filter", False)
    )
    if carry_idf:
        # hint-broadcast the tiny query side: at 100M+ vocab the
        # static planner must never pick a sort-merge join that
        # shuffles term_stats per batch
        qt = F.broadcast(qt).join(
            index.term_stats.select("term", "idf"), "term"
        )
        postings = postings.drop("idf")
    join_key = "term"
    if (
        terms_filter is not None
        and "term" in postings.columns
        and (
            getattr(index, "push_string_filter", False)
            or "term_id" not in postings.columns
        )
    ):
        # Layouts whose term_id only exists POST-scan (the packed
        # delta+varint store computes it after decode) opt in to a
        # STRING In-predicate too: term IN (...) reaches the parquet
        # row-group stats, so non-matching blocks are skipped before
        # any varint decode runs. The interned row cache skips this —
        # its term_id filter below already batch-prunes, and an extra
        # per-row string compare would cost the hot path. Custom
        # layouts with NO term_id at all fall back to the string
        # filter unconditionally so terms_filter is never a silent
        # no-op (the only pruning such a layout can get).
        postings = postings.filter(isin_filter("term", terms_filter))
    if "term_id" in postings.columns:
        # Interned hot path: probe/filter on 8-byte keys; the columnar
        # scan prunes the string column entirely.
        join_key = "term_id"
        qt = qt.withColumn("term_id", F.xxhash64("term")).drop("term")
        postings = postings.drop("term")
        if terms_filter is not None:
            from bayesian_bm25_js_spark.functions.xxh64 import spark_xxhash64

            ids = [spark_xxhash64(t) for t in terms_filter]
            postings = postings.filter(isin_filter("term_id", ids))

    joined = postings.join(F.broadcast(qt), join_key).select(
        "query_id",
        "doc_id",
        "pos",
        "is_first",
        "dl",
        contrib.alias("contrib"),
    )
    if exact_order:
        score_agg = F.aggregate(
            F.array_sort(F.collect_list(F.struct("pos", "contrib"))),
            F.lit(0.0),
            lambda acc, x: acc + x["contrib"],
        )
    else:
        score_agg = F.sum("contrib")
    return joined.groupBy("query_id", "doc_id").agg(
        score_agg.alias("score"),
        F.sum(F.when(F.col("is_first"), 1).otherwise(0))
        .cast("int")
        .alias("tf_overlap"),
        F.first("dl").alias("dl"),
    )


def densify_scores(
    index: InvertedIndex, scores: DataFrame, query_ids: DataFrame
) -> DataFrame:
    """Reference dense semantics: every (query, doc) pair exists; missing
    scores become exactly 0.0 (bm25.ts:108). Only viable at fixture
    scale — production uses the sparse path."""
    all_pairs = query_ids.crossJoin(index.doc_stats)
    return (
        all_pairs.join(scores, ["query_id", "doc_id"], "left")
        .select(
            "query_id",
            "doc_id",
            F.coalesce(F.col("score"), F.lit(0.0)).alias("score"),
            F.coalesce(F.col("tf_overlap"), F.lit(0)).alias("tf_overlap"),
            F.coalesce(scores["dl"], all_pairs["dl"]).alias("dl"),
        )
    )


# Phase-1 grain target: rows one phase-1 task can sort entirely in
# execution memory without spilling (profiled: ~1.9M rows/task spilled
# ~2 GB at 2000 queries x 300k docs x 32 partitions; 470k/task at 128
# partitions stayed in memory with headroom).
P1_TARGET_ROWS = 500_000


def top_k(
    scores: DataFrame,
    k: int,
    two_phase: bool = True,
    salt: int = 64,
    round_dp: Optional[int] = 6,
    phase1_partitions: Optional[int] = None,
    est_rows: Optional[int] = None,
) -> DataFrame:
    """Per-query top-k with the mandatory (desc score, asc doc_id)
    tie-break (bm25.ts:139-144 via JS stable sort).

    round_dp (default 6): rank on round(score, 6) — the engine's float
    policy (see __spark_entry__ docstring). With the plain-sum scoring
    path, per-doc float64 totals differ by ulps between physical plans
    (combine order is plan-dependent), so ranking raw bits would make
    near-ties nondeterministic across plans (exhaustive vs WAND). At
    6 dp, equal-at-6dp docs tie-break deterministically by doc_id.
    round_dp=None ranks raw-score bits (exact_order fixture parity).

    two_phase=True (default, the scale path): a single window
    partitioned only by query_id funnels EVERY scored doc of a query
    through one task — the per-query skew bottleneck at 10^9 matched
    docs. Phase 1 takes local top-k within (query_id, hash(doc_id) %
    salt) slices — JVM-side window, never Python (an Arrow round-trip
    of the full scored stream measured 3x slower); phase 2 ranks the
    ≤ salt·k survivors per query. The global top-k is contained in the
    union of slice top-ks, so the result is identical (same tie-break
    in both phases).
    """
    sort_score = (
        F.col("score") if round_dp is None else F.round(F.col("score"), round_dp)
    )
    order = [F.desc(sort_score), F.asc("doc_id")]
    if two_phase:
        # Phase 1 sorts the ENTIRE scored stream within its window
        # groups; at the default shuffle grain (~1 partition per core)
        # each task sorts scored_rows/partitions rows and spills
        # (measured: 2 GB/batch at 2000 queries x 300k docs x 32
        # partitions). Pin this one exchange explicitly on exactly the
        # window keys, so the window adds NO second exchange, and pick
        # its grain from est_rows (callers pass the driver-known upper
        # bound n_queries x n_docs): coarse (= shuffle.partitions) when
        # the stream fits one sort per task, up to 4x finer when it
        # would spill. A FIXED 4x grain measured 1.8x slower on narrow
        # batches (200 queries x 50k docs: tiny fine partitions with
        # AQE off can't coalesce); without est_rows the scale-safe 4x
        # is kept. The grain is a pure function of (est_rows, config),
        # never of core count — every local[N] level of the scaling
        # sweep runs the identical plan (the cap argument requires it).
        scores = scores.withColumn(
            "__slice", F.pmod(F.xxhash64("doc_id"), F.lit(salt))
        )
        base = int(
            scores.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
        if phase1_partitions is not None:
            n_p1 = phase1_partitions
        elif est_rows is None:
            n_p1 = 4 * base
        else:
            n_p1 = base * min(
                4, max(1, -(-int(est_rows) // (P1_TARGET_ROWS * base)))
            )
        scores = scores.repartition(n_p1, "query_id", "__slice")
        w1 = Window.partitionBy("query_id", "__slice").orderBy(*order)
        scores = scores.withColumn("__r1", F.row_number().over(w1)).filter(
            F.col("__r1") <= k
        ).drop("__r1", "__slice")
    w = Window.partitionBy("query_id").orderBy(*order)
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def calibrate(
    scored: DataFrame,
    index: InvertedIndex,
    alpha: float,
    beta: float,
    base_rate: Optional[float],
    mode: str = "balanced",
    prior_fn=None,
) -> DataFrame:
    """Attach calibrated probability; zero scores pinned to exactly 0.0."""
    udf = probability_udf(alpha, beta, base_rate, mode, prior_fn)
    dlr = F.col("dl") / F.lit(index.avgdl)
    prob = F.when(
        F.col("score") > 0.0,
        udf(F.col("score"), F.col("tf_overlap").cast("double"), dlr),
    ).otherwise(F.lit(0.0))
    return scored.withColumn("probability", prob)
