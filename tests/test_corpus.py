"""Synthetic corpus: north-rule shape + per-row content sha256 invariant
(BASELINE.json input_hint)."""

from pyspark.sql import functions as F

from bayesian_bm25_js_spark.sources.corpus import synthesize_code_corpus


def test_corpus_shape_and_determinism(spark):
    c1 = synthesize_code_corpus(spark, 200)
    assert set(c1.columns) == {"repo", "path", "commit", "lang", "content", "doc_id"}
    rows = c1.select(
        "doc_id", F.sha2("content", 256).alias("h"), "repo", "path", "commit", "lang"
    ).collect()
    assert len(rows) == 200
    # regenerate: per-row sha256 equality (content is a pure function of id)
    c2 = synthesize_code_corpus(spark, 200)
    rows2 = {r["doc_id"]: r["h"] for r in c2.select("doc_id", F.sha2("content", 256).alias("h")).collect()}
    for r in rows:
        assert rows2[r["doc_id"]] == r["h"]
        assert len(r["commit"]) == 40
        assert r["path"].startswith("src/mod")
        assert "/" in r["repo"]


def test_corpus_prefix_stability(spark):
    """Growing the corpus must not change existing rows (doc_id keyed)."""
    small = {
        r["doc_id"]: r["h"]
        for r in synthesize_code_corpus(spark, 50)
        .select("doc_id", F.sha2("content", 256).alias("h"))
        .collect()
    }
    big = {
        r["doc_id"]: r["h"]
        for r in synthesize_code_corpus(spark, 150)
        .select("doc_id", F.sha2("content", 256).alias("h"))
        .collect()
    }
    for k, v in small.items():
        assert big[k] == v


def test_corpus_zipfian_skew(spark):
    """Keyword tokens dominate (the skew the engine must handle)."""
    from bayesian_bm25_js_spark.operators.tokenize import tokenize_column

    docs = synthesize_code_corpus(spark, 300).select(
        F.explode(tokenize_column(F.col("content"))).alias("t")
    )
    counts = {r["t"]: r["cnt"] for r in docs.groupBy("t").agg(F.count("*").alias("cnt")).collect()}
    kw = counts.get("def", 0) + counts.get("return", 0)
    ident = counts.get("var0", 0) + counts.get("var1", 0)
    assert kw > 3 * max(ident, 1)
