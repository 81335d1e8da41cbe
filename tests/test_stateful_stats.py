"""Keyed-state streaming term stats (streaming/stateful_stats.py).

Parity model: after draining N micro-batches, every term's running df
must equal the batch build's df over the union of those batches
(bm25.ts:82-84 — df counts documents containing the term)."""

from pyspark.sql import functions as F

from bayesian_bm25_js_spark.operators.index_build import build_inverted_index
from bayesian_bm25_js_spark.streaming.stateful_stats import streaming_term_stats
from tests.conftest import SMALL_CORPUS, docs_df


def test_streaming_term_stats_accumulate_to_batch_df(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")

    # Two source files -> maxFilesPerTrigger=1 forces two micro-batches,
    # so running state must actually carry df across batches.
    for lo, hi in [(0, 3), (3, len(SMALL_CORPUS))]:
        spark.createDataFrame(
            [(i, SMALL_CORPUS[i]) for i in range(lo, hi)],
            "doc_id long, tokens array<string>",
        ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("doc_id long, tokens array<string>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_term_stats(stream)
        .writeStream.format("memory")
        .queryName("term_stats_stream")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # update mode re-emits a term each batch it appears in; the LAST
    # emission per term carries the running total.
    emitted = spark.sql("SELECT * FROM term_stats_stream").collect()
    last_df = {}
    for r in emitted:
        last_df[r["term"]] = r["df"]

    batch = build_inverted_index(docs_df(spark, SMALL_CORPUS), cache=False)
    want = {r["term"]: r["df"] for r in batch.term_stats.collect()}
    assert last_df == want

    # Cross-batch accumulation really happened: 'the' is in both chunks,
    # so it was emitted twice with a strictly growing df.
    the_rows = sorted(r["df"] for r in emitted if r["term"] == "the")
    assert len(the_rows) == 2 and the_rows[0] < the_rows[1]

    # batch_df is per-batch (unique docs of that batch only).
    the_batch = sorted(r["batch_df"] for r in emitted if r["term"] == "the")
    assert sum(the_batch) == want["the"]


def test_streaming_term_stats_df_counts_docs_not_tokens(spark, tmp_path):
    """A term repeated inside one doc contributes once to df."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(
        [(0, ["x", "x", "x", "y"]), (1, ["x"])],
        "doc_id long, tokens array<string>",
    ).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(
        "doc_id long, tokens array<string>"
    ).parquet(src)
    q = (
        streaming_term_stats(stream)
        .writeStream.format("memory")
        .queryName("df_dedup_stream")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["term"]: r["df"]
        for r in spark.sql("SELECT * FROM df_dedup_stream").collect()
    }
    assert got == {"x": 2, "y": 1}
