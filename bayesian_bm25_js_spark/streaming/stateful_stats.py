"""Continuously-maintained term statistics via keyed streaming state.

Companion to streaming/index_ingest.py: the delta-pile design defers
df/idf to a read-time aggregate over all epochs. When a consumer wants
term statistics that are *current after every micro-batch* — vocab
monitoring, stop-word drift alarms, feeding WAND upper-bound refreshes
— recomputing over the whole pile each batch is O(corpus). This
operator keeps a running per-term document-frequency in Spark's keyed
state store (applyInPandasWithState), so each batch costs O(batch):
every term's count lives with its key, survives across batches via the
checkpoint, and an updated (term, df, n_batch_docs) row is emitted only
for terms the batch touched.

Semantics match the batch build (index_build.py / bm25.ts:82-84):
df counts *documents containing the term*, so within a batch each
doc_id contributes at most once per term. Documents must not span
micro-batches (the ingest contract: a doc arrives whole, exactly once).

IDF needs the global n_docs, which is not a per-term quantity; emit
rows carry the batch's doc count so the sink can maintain the running
total and apply idf_column — the same split the reference makes
(df accumulates; idf is derived at scoring time, bm25.ts:90-102).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# (term) -> rows with the running df and how many docs of THIS batch
# contained the term (n_batch used by sinks to advance n_docs).
_OUTPUT_SCHEMA = "term string, df long, batch_df long"
_STATE_SCHEMA = "df long"


def _update_term_df(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Keyed update: fold this batch's unique doc_ids into the running
    document frequency for `term`."""
    batch_docs = set()
    for pdf in pdfs:
        batch_docs.update(pdf["doc_id"].tolist())
    prev = state.get[0] if state.exists else 0
    df = prev + len(batch_docs)
    state.update((df,))
    yield pd.DataFrame(
        {"term": [key[0]], "df": [df], "batch_df": [len(batch_docs)]}
    )


def streaming_term_stats(doc_stream: DataFrame) -> DataFrame:
    """(doc_id, tokens array<string>) stream -> continuously-updated
    (term, df, batch_df) stream.

    The explode stays a narrow JVM transformation; the only shuffle is
    the groupBy(term) that routes rows to their state partition. Use
    outputMode('update') so each batch emits only the touched terms.
    """
    exploded = doc_stream.select(
        "doc_id", F.explode("tokens").alias("term")
    )
    return exploded.groupBy("term").applyInPandasWithState(
        _update_term_df,
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
