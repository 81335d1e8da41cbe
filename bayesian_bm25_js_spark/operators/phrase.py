"""Positional postings + exact-phrase BM25 retrieval (engine addition).

The reference engine is strictly bag-of-words — no token positions
exist anywhere in its index or scoring (bm25.ts:52-148 consumes
`string[][]` and keeps only per-(doc,term) counts). A production
fulltext engine over source code needs exact-phrase queries
("hash join", "import numpy"), so this module adds a positional
index and phrase-scored top-k as new engine surface, Spark-first:

* Positional postings are ONE extra aggregation over the same
  exploded-token stream the main index uses: groupBy(doc_id, term)
  with a per-(doc,term) position list. The collected array is bounded
  by that term's tf in that doc — not an unbounded global collect.
* Phrase matching is pure Catalyst: filter the positional postings to
  the phrase's terms (term_id In-predicate → columnar batch pruning,
  same as the scoring path), pivot each phrase slot's position array
  with conditional max, and intersect slot arrays shifted by their
  slot offset (`array_intersect(p0, p1 - 1, p2 - 2, ...)`). Survivor
  count = exact phrase occurrences (tf). No Python in the plan.
* Scoring treats the phrase as a pseudo-term: df = docs containing
  the phrase (window count per query — no driver action, no second
  pass over the match), idf from the index's idf policy, tf-normalized
  BM25 exactly like a single-term query, then the engine's two-phase
  salted top-k.

Batch-first like the rest of the query path: `phrase_topk` takes a
whole batch of phrases and runs ONE plan; per-batch cost amortizes
across queries exactly as in operators/scoring.score_queries.

Scale notes (100 TB): the positional cache layout is hash-partitioned
by doc_id with the same 4×-cores grain as the main postings cache, so
the phrase-match groupBy(query_id, doc_id) combines map-side and the
shuffle carries one row per matched (query, doc); the slot pivot is a
conditional max, never a collect over docs. The join's query side is
broadcast (slots × batch rows). Skewed phrase terms ("the", "table")
cost a wide scan but never a single-task funnel: matching is
per-partition until the (query, doc)-keyed agg.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bayesian_bm25_js_spark.operators.index_build import idf_column
from bayesian_bm25_js_spark.operators.scoring import isin_filter, top_k


class PositionalIndex(NamedTuple):
    """Positional postings + the corpus constants BM25 needs."""

    postings: DataFrame  # (term_id, term, doc_id, dl, positions)
    n_docs: int
    avgdl: float
    k1: float
    b: float
    method: str

    def unpersist(self) -> None:
        try:
            self.postings.unpersist()
        except Exception:
            pass


def build_positional_index(
    docs: DataFrame,
    k1: float = 1.2,
    b: float = 0.75,
    method: str = "robertson",
    cache: bool = True,
    partition_by_doc: bool = True,
    layout_partitions: Optional[int] = None,
) -> PositionalIndex:
    """docs (doc_id, tokens array<string>) -> PositionalIndex.

    (term_id, term, doc_id, dl, positions): 0-based sorted token
    positions of `term` in `doc_id`. dl rides denormalized exactly as
    in the main postings layout (no doc_stats join at query time).

    One shuffle: posexplode → groupBy(doc_id, term). The position list
    is per-(doc, term) — size bounded by tf — and each doc arrives as
    one source row, so partial aggregation builds each list inside a
    single map task; array_sort pins the order deterministically
    regardless of merge order. Layout shuffle (paid once, cached):
    hash-partition by doc_id at the same 4×-parallelism grain as the
    main postings cache (see build_inverted_index's layout rationale)
    so phrase matching's (query, doc)-keyed agg combines map-side.
    """
    spark = docs.sparkSession
    base = docs.select("doc_id", F.size("tokens").alias("dl"), "tokens")

    stats = base.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("total")
    ).collect()[0]
    n_docs = int(stats["n"] or 0)
    avgdl = (int(stats["total"] or 0) / n_docs) if n_docs > 0 else 0.0

    postings = (
        base.select("doc_id", "dl", F.posexplode("tokens").alias("pos", "term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.array_sort(F.collect_list("pos")).alias("positions"))
        .withColumn("term_id", F.xxhash64("term"))
        .select("term_id", "term", "doc_id", "dl", "positions")
    )
    if partition_by_doc:
        n_part = layout_partitions or max(
            4 * spark.sparkContext.defaultParallelism,
            int(spark.conf.get("spark.sql.shuffle.partitions", "200")),
        )
        postings = postings.repartition(n_part, "doc_id").sortWithinPartitions(
            "term_id"
        )
    if cache:
        postings = postings.persist()
    return PositionalIndex(postings, n_docs, avgdl, k1, b, method)


def _phrases_to_slots(
    spark: SparkSession, phrases: Sequence[Sequence[str]]
) -> DataFrame:
    """[[t0, t1, ...], ...] -> (query_id, slot, term, plen)."""
    rows = [
        (qid, slot, term, len(phrase))
        for qid, phrase in enumerate(phrases)
        for slot, term in enumerate(phrase)
    ]
    return spark.createDataFrame(
        rows, "query_id long, slot int, term string, plen int"
    )


def _slot_pivot(
    index: PositionalIndex, slot_lists: Sequence[Sequence[str]]
) -> tuple[DataFrame, int]:
    """Shared match frontend for phrase/proximity: join the term_id-
    pruned positional postings to the broadcast slot table, then ONE
    (query, doc)-keyed agg pivots each slot's position array via
    conditional max. Returns (g, max_len) where g has columns
    (query_id, doc_id, dl, plen, p0..p{max_len-1}) and keeps only
    docs where every slot matched (countDistinct(slot) == plen)."""
    spark = index.postings.sparkSession
    slots = _phrases_to_slots(spark, slot_lists)
    max_len = max(len(p) for p in slot_lists)

    from bayesian_bm25_js_spark.functions.xxh64 import spark_xxhash64

    all_terms = sorted({t for p in slot_lists for t in p})
    ids = [spark_xxhash64(t) for t in all_terms]
    post = index.postings.filter(isin_filter("term_id", ids)).drop("term")
    qt = F.broadcast(slots.withColumn("term_id", F.xxhash64("term")).drop("term"))

    joined = post.join(qt, "term_id").select(
        "query_id", "slot", "plen", "doc_id", "dl", "positions"
    )
    pivots = [
        F.max(F.when(F.col("slot") == i, F.col("positions"))).alias(f"p{i}")
        for i in range(max_len)
    ]
    g = joined.groupBy("query_id", "doc_id").agg(
        *pivots,
        F.countDistinct("slot").alias("n_slots"),
        F.first("plen").alias("plen"),
        F.first("dl").alias("dl"),
    ).filter(F.col("n_slots") == F.col("plen"))
    return g, max_len


def phrase_match(
    index: PositionalIndex, phrases: Sequence[Sequence[str]]
) -> DataFrame:
    """-> (query_id, doc_id, dl, tf): docs containing each exact phrase,
    tf = number of phrase occurrences. Sparse (non-matching docs absent).

    Plan: postings filtered by a term_id In-predicate (8-byte keys →
    columnar batch pruning; the string column is never scanned), joined
    to the broadcast slot table, then ONE (query, doc)-keyed agg pivots
    each slot's position array via conditional max (_slot_pivot). A doc
    matches when every slot matched and the shifted position arrays
    intersect: start positions of slot i live at p_i - i, so
    ∩_i (p_i - i) is exactly the set of phrase start offsets. Duplicate
    phrase terms ("big data big") work unchanged — both slots pivot the
    same position array at different shifts.
    """
    if not phrases or any(len(p) == 0 for p in phrases):
        raise ValueError("phrases must be non-empty token sequences")
    g, max_len = _slot_pivot(index, phrases)

    # start-position set: p0 ∩ (p1 - 1) ∩ ... — slots beyond a query's
    # own length are NULL (no such slot row) and are skipped.
    def _shift(col, by: int):
        # NB: the lambda must be unary — pyspark gives a 2-arg lambda
        # the (element, index) signature, which would hijack a
        # default-arg loop-capture idiom here.
        return F.transform(col, lambda x: x - F.lit(by))

    occ = F.col("p0")
    for i in range(1, max_len):
        shifted = _shift(F.col(f"p{i}"), i)
        occ = F.when(F.col(f"p{i}").isNull(), occ).otherwise(
            F.array_intersect(occ, shifted)
        )
    return (
        g.withColumn("tf", F.size(occ).cast("int"))
        .filter(F.col("tf") > 0)
        .select("query_id", "doc_id", "dl", "tf")
    )


def phrase_topk(
    index: PositionalIndex,
    phrases: Sequence[Sequence[str]],
    k: int = 10,
) -> DataFrame:
    """-> (query_id, rank, doc_id, tf, score): exact-phrase BM25 top-k.

    The phrase is scored as a pseudo-term: df = matched-doc count per
    query (a window count over the already-(query)-keyed match output —
    no second match pass, no driver action), idf via the index's idf
    policy, standard tf normalization, then the engine's two-phase
    salted top-k with the (desc round(score,6), asc doc_id) tie-break.
    """
    from pyspark.sql.window import Window

    matched = phrase_match(index, phrases)
    pdf = F.count(F.lit(1)).over(Window.partitionBy("query_id"))
    k1, b, avgdl = F.lit(index.k1), F.lit(index.b), F.lit(index.avgdl)
    tf = F.col("tf").cast("double")
    tf_norm = (tf * (k1 + F.lit(1.0))) / (
        tf + k1 * (F.lit(1.0) - b + b * (F.col("dl") / avgdl))
    )
    scored = matched.withColumn(
        "score",
        idf_column(pdf, index.n_docs, index.method) * tf_norm,
    )
    out = top_k(
        scored.select("query_id", "doc_id", "tf", "score"),
        k,
        est_rows=len(phrases) * max(1, index.n_docs),
    )
    return out.select(
        "query_id",
        F.col("rank").cast("int").alias("rank"),
        "doc_id",
        "tf",
        "score",
    )


def _min_cover_count_udf(window: int):
    """Arrow-batched minimal-cover counter over pivoted slot position
    arrays. Per row: merge the slot position lists (each bounded by
    that term's tf in the doc) and run the classic two-pointer minimal-
    window enumeration; tf = number of minimal windows whose span
    (last - first + 1) fits in `window`. Python loops only over a
    doc's own occurrence events — never over docs row-at-a-time on the
    driver, and the heavy filtering (term pruning, full-slot coverage)
    already happened in Catalyst before this kernel sees a row."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def cover_count(arrs: pd.Series) -> pd.Series:
        out = np.zeros(len(arrs), dtype="int32")
        for i, row in enumerate(arrs):
            lists = [lst for lst in row if lst is not None]
            k = len(lists)
            if k == 1:
                # every occurrence is its own span-1 minimal window
                out[i] = len(lists[0])
                continue
            events = sorted(
                (int(p), s) for s, lst in enumerate(lists) for p in lst
            )
            counts = [0] * k
            covered = 0
            left = 0
            tf = 0
            for right, (pos_r, slot_r) in enumerate(events):
                if counts[slot_r] == 0:
                    covered += 1
                counts[slot_r] += 1
                if covered < k:
                    continue
                # shrink to the minimal window ending at `right`
                while counts[events[left][1]] > 1:
                    counts[events[left][1]] -= 1
                    left += 1
                if pos_r - events[left][0] + 1 <= window:
                    tf += 1
                # drop the left endpoint: the next minimal window must
                # start past it (each minimal window counted once)
                counts[events[left][1]] -= 1
                covered -= 1
                left += 1
            out[i] = tf
        return pd.Series(out)

    # The kernel is pure; asNondeterministic only stops Catalyst from
    # substituting the UDF into the pushed-down tf > 0 filter, which
    # would evaluate it twice (two ArrowEvalPython nodes = double the
    # Arrow transfer + kernel work; plan pinned in test_phrase).
    return cover_count.asNondeterministic()


def proximity_match(
    index: PositionalIndex,
    queries: Sequence[Sequence[str]],
    window: int,
) -> DataFrame:
    """-> (query_id, doc_id, dl, tf): docs where ALL of a query's
    distinct terms co-occur within `window` consecutive tokens, in any
    order. tf = number of minimal co-occurrence windows of span ≤
    `window` (a window is minimal when shrinking either end loses a
    term — each cluster of the terms counts once, not once per
    enclosing window). Duplicate query terms collapse: proximity is a
    set semantics, unlike phrase_match's slot-per-occurrence.

    Plan: identical Catalyst frontend to phrase_match (_slot_pivot:
    term_id-pruned postings scan, broadcast slots, one (query, doc)
    agg); only the final per-row kernel differs — minimal-cover
    counting over tf-bounded position arrays is not expressible with
    array intrinsics, so it runs as one Arrow-batched pandas UDF.
    """
    if not queries or any(len(q) == 0 for q in queries):
        raise ValueError("queries must be non-empty token sequences")
    if window < 1:
        raise ValueError("window must be >= 1")
    uniq = [sorted(set(q)) for q in queries]
    g, max_len = _slot_pivot(index, uniq)
    cover = _min_cover_count_udf(window)
    arr = F.array(*[F.col(f"p{i}") for i in range(max_len)])
    return (
        g.withColumn("tf", cover(arr))
        .filter(F.col("tf") > 0)
        .select("query_id", "doc_id", "dl", "tf")
    )


def proximity_topk(
    index: PositionalIndex,
    queries: Sequence[Sequence[str]],
    window: int,
    k: int = 10,
) -> DataFrame:
    """-> (query_id, rank, doc_id, tf, score): proximity BM25 top-k.

    Same pseudo-term scoring as phrase_topk — df = docs with ≥1
    qualifying window (window count per query, no driver action), idf
    by the index's policy, tf = minimal-cover count, engine tie-break
    (desc round(score, 6), asc doc_id)."""
    from pyspark.sql.window import Window

    matched = proximity_match(index, queries, window)
    pdf = F.count(F.lit(1)).over(Window.partitionBy("query_id"))
    k1, b, avgdl = F.lit(index.k1), F.lit(index.b), F.lit(index.avgdl)
    tf = F.col("tf").cast("double")
    tf_norm = (tf * (k1 + F.lit(1.0))) / (
        tf + k1 * (F.lit(1.0) - b + b * (F.col("dl") / avgdl))
    )
    scored = matched.withColumn(
        "score",
        idf_column(pdf, index.n_docs, index.method) * tf_norm,
    )
    out = top_k(
        scored.select("query_id", "doc_id", "tf", "score"),
        k,
        est_rows=len(queries) * max(1, index.n_docs),
    )
    return out.select(
        "query_id",
        F.col("rank").cast("int").alias("rank"),
        "doc_id",
        "tf",
        "score",
    )
