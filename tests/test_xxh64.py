"""Parity of the from-spec pure-Python XXH64 port with Spark's
xxhash64 expression — the foundation of the golden-fixture oracles
(tools/make_golden.py): if these hold, the independent MinHash/SimHash
expectations hash the same family Spark does."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from bayesian_bm25_js_spark.functions.xxh64 import (
    spark_xxhash64,
    xxh64_int_np,
    xxh64_long_np,
)

STRINGS = [
    "",
    "a",
    "hello world",
    "x" * 7,
    "y" * 8,
    "z" * 31,
    "w" * 32,
    "q" * 100,
    "unicode ≠ ascii ✓",
    "0,-3,42",
    "v4871 def return",
]
LONGS = [0, 1, -1, 42, 2**62, -(2**62), 123456789012345, -98765432109]


def test_string_parity(spark):
    df = spark.createDataFrame([(s,) for s in STRINGS], "s string").select(
        "s", F.xxhash64("s").alias("h")
    )
    got = {r["s"]: r["h"] for r in df.collect()}
    for s in STRINGS:
        assert got[s] == spark_xxhash64(s), s


def test_long_and_chained_parity(spark):
    df = spark.createDataFrame([(v,) for v in LONGS], "v long").select(
        "v",
        F.xxhash64("v").alias("h"),
        F.xxhash64("v", F.lit(7)).alias("h_chain_int"),
        F.xxhash64("v", F.lit("suffix")).alias("h_chain_str"),
    )
    for r in df.collect():
        assert r["h"] == spark_xxhash64(r["v"])
        assert r["h_chain_int"] == spark_xxhash64(r["v"], ("int", 7))
        assert r["h_chain_str"] == spark_xxhash64(r["v"], "suffix")


def test_vectorized_matches_scalar():
    arr = np.array([v % (1 << 64) for v in LONGS], dtype=np.uint64)
    h = xxh64_long_np(arr, 42).view(np.int64)
    for i, v in enumerate(LONGS):
        assert int(h[i]) == spark_xxhash64(v)
    seeds = xxh64_long_np(arr, 42)
    h2 = xxh64_int_np(np.full(len(LONGS), 9, dtype=np.uint64), seeds).view(np.int64)
    for i, v in enumerate(LONGS):
        assert int(h2[i]) == spark_xxhash64(v, ("int", 9))


def test_term_id_matches_index_build(spark):
    """postings.term_id (F.xxhash64(term)) is reproducible client-side
    by the pure-Python port — the contract terms_filter relies on."""
    from bayesian_bm25_js_spark.operators.index_build import build_inverted_index

    docs = spark.createDataFrame(
        [(0, ["cat", "dog"]), (1, ["dog", "v123"])],
        "doc_id long, tokens array<string>",
    )
    idx = build_inverted_index(docs)
    for r in idx.postings.select("term", "term_id").distinct().collect():
        assert r["term_id"] == spark_xxhash64(r["term"])
