"""Physical-plan shape tests: the properties that matter at 100 TB.

These pin the plans, not just the results: query side broadcast, filter
pushdown into parquet scans, column pruning, bounded shuffle counts,
and two-phase top-k equivalence.
"""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SMALL_CORPUS, docs_df

from bayesian_bm25_js_spark.operators.index_build import build_inverted_index
from bayesian_bm25_js_spark.operators.scoring import (
    queries_to_df,
    score_queries,
    top_k,
)
from bayesian_bm25_js_spark.plans.audit import (
    count_exchanges,
    has_broadcast_join,
    plan_string,
    pushed_filters,
    read_schema,
)


@pytest.fixture(scope="module")
def idx(spark):
    return build_inverted_index(docs_df(spark, SMALL_CORPUS), method="lucene")


def test_query_join_is_broadcast(spark, idx):
    scores = score_queries(idx, queries_to_df(spark, [["cat", "dog"]]))
    assert has_broadcast_join(scores)


def test_scoring_shuffle_budget(spark, idx):
    """Scoring adds exactly one aggregation shuffle on top of the
    (cached) postings: broadcast join is shuffle-free."""
    scores = score_queries(idx, queries_to_df(spark, [["cat", "dog"]]))
    # postings cached: plan below the cache boundary is reused; the
    # scoring section must contribute just the groupBy exchange.
    n = count_exchanges(scores)
    assert n <= 3, plan_string(scores)


def test_saved_postings_pushdown(spark, idx, tmp_path):
    """Term filters reach the parquet scan of a saved index; unused
    columns are pruned from ReadSchema."""
    from bayesian_bm25_js_spark.sources.index_store import save_index

    path = str(tmp_path / "idx")
    save_index(idx, path)
    postings = spark.read.parquet(f"{path}/postings")
    q = postings.filter(F.col("term") == "cat").select("term", "doc_id", "tf")
    pf = pushed_filters(q)
    assert "term" in pf and "cat" in pf, pf
    rs = read_schema(q)
    assert "idf" not in rs and "dl" not in rs, rs


def test_two_phase_topk_identical(spark, idx):
    qdf = queries_to_df(spark, [["cat"], ["dog", "the"], ["machine", "learning"]])
    scores = score_queries(idx, qdf)
    one = top_k(scores, 3, two_phase=False).orderBy("query_id", "rank").collect()
    two = top_k(scores, 3, two_phase=True, salt=4).orderBy("query_id", "rank").collect()
    assert [(r["query_id"], r["rank"], r["doc_id"], r["score"]) for r in one] == [
        (r["query_id"], r["rank"], r["doc_id"], r["score"]) for r in two
    ]


def test_dense_path_not_used_by_default_retrieve_sparse(spark, idx):
    """Sparse retrieve plan must not contain a cartesian/cross join
    (the dense zero-fill path is fixture-only)."""
    from bayesian_bm25_js_spark.operators.scoring import calibrate

    scores = score_queries(idx, queries_to_df(spark, [["cat"]]))
    out = calibrate(top_k(scores, 3), idx, 1.0, 0.5, None)
    plan = plan_string(out)
    assert "CartesianProduct" not in plan
    assert "ArrowEvalPython" in plan or "BatchEvalPython" not in plan  # calibration is Arrow-vectorized
