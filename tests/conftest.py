"""Shared pytest fixtures: one local SparkSession per test session."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
os.environ.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("bayesian-bm25-spark-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield spark
    spark.stop()


SMALL_CORPUS = [
    ["the", "cat", "sat", "on", "the", "mat"],
    ["the", "dog", "chased", "the", "cat"],
    ["a", "quick", "brown", "fox", "jumps", "over", "the", "lazy", "dog"],
    ["hello", "world"],
    ["machine", "learning", "is", "a", "subset", "of", "artificial", "intelligence"],
    ["the", "cat", "and", "the", "dog", "are", "friends"],
]

TWO_FIELD_DOCS = [
    {"title": ["cat", "sat", "mat"], "body": ["the", "cat", "sat", "on", "the", "mat"]},
    {"title": ["dog", "chased", "cat"], "body": ["the", "dog", "chased", "the", "cat", "around"]},
    {
        "title": ["quick", "brown", "fox"],
        "body": ["a", "quick", "brown", "fox", "jumps", "over", "the", "lazy", "dog"],
    },
    {"title": ["hello", "world"], "body": ["hello", "world", "program"]},
    {
        "title": ["machine", "learning"],
        "body": ["machine", "learning", "is", "a", "subset", "of", "artificial", "intelligence"],
    },
]


@pytest.fixture(scope="session")
def small_corpus():
    return SMALL_CORPUS


@pytest.fixture(scope="session")
def two_field_docs():
    return TWO_FIELD_DOCS


def docs_df(spark, corpus):
    return spark.createDataFrame(
        [(i, toks) for i, toks in enumerate(corpus)],
        "doc_id long, tokens array<string>",
    )
