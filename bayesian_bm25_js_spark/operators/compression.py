"""Posting-list compression: docID-sorted delta+varint blocks + block-max.

The reference keeps plain {docId, tf} arrays (bm25.ts:20-23) and a
separate dense BlockMaxIndex (scorer.ts:624-711). At 10^12-doc scale
postings dominate storage, so the engine packs them into fixed
doc-range blocks:

  packed (term, block_id, n, min_doc_id, max_doc_id, max_contrib,
          doc_deltas BINARY, tfs BINARY)

* block_id = doc_id // block_size — the reference's block rule
  (scorer.ts:659-661), so block membership is a pure function of
  doc_id and packing is an ordinary groupBy (skew-proof: every group
  holds ≤ block_size postings regardless of term frequency).
* doc_deltas: varint gaps of ascending doc_ids within the block
  (first gap is from the block base, doc_id - block_id*block_size);
  tfs: varint term frequencies.
* max_contrib: the block's max BM25 contribution idf*tf_norm — the
  BMW bound input (Corollary 7.4.2), computed at pack time.

Pack/unpack run as Arrow-vectorized pandas UDFs over per-block struct
arrays; the varint codec touches ≤ block_size values per call.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from bayesian_bm25_js_spark.operators.index_build import InvertedIndex

DEFAULT_BLOCK_SIZE = 128  # scorer.ts:630


def varint_encode(values: np.ndarray) -> bytes:
    out = bytearray()
    for v in values:
        v = int(v)
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                out.append(b | 0x80)
            else:
                out.append(b)
                break
    return bytes(out)


def varint_decode(data: bytes) -> List[int]:
    out: List[int] = []
    shift = 0
    cur = 0
    for b in data:
        cur |= (b & 0x7F) << shift
        if b & 0x80:
            shift += 7
        else:
            out.append(cur)
            cur = 0
            shift = 0
    return out


def pack_postings(
    index: InvertedIndex,
    block_size: int = DEFAULT_BLOCK_SIZE,
    pack_by: str = "count",
) -> DataFrame:
    """postings -> packed block table. One shuffle on (term, block_id).

    pack_by="count" (default): block_id is the posting's ordinal within
    its term's docID-sorted list // block_size — every block holds
    exactly block_size postings (last one excepted), so sparse tail
    terms still fill blocks and varint deltas amortize (doc-range
    blocking left one-posting blocks whose per-row metadata outweighed
    the payload — measured packed/row ≈ 1.39 on the long-tail corpus).
    pack_by="range": the reference BlockMaxIndex rule
    block_id = doc_id // block_size (scorer.ts:659-661) — block ids
    line up with the WAND metadata, at the storage cost above.

    Either way the first delta is from min_doc_id (stored), so unpack
    never needs the blocking rule back.
    """
    if block_size < 1:
        raise ValueError(f"block_size must be >= 1, got {block_size}")
    if pack_by not in ("count", "range"):
        raise ValueError(f"pack_by must be 'count' or 'range', got {pack_by!r}")
    contrib = index.tf_norm_column(F.col("tf"), F.col("dl")) * F.col("idf")

    @pandas_udf("struct<doc_deltas:binary,tfs:binary>")
    def _pack(entries: pd.Series, bases: pd.Series) -> pd.DataFrame:
        deltas_out, tfs_out = [], []
        for arr, base in zip(entries, bases):
            doc_ids = np.array([e["doc_id"] for e in arr], dtype=np.int64)
            tfs = np.array([e["tf"] for e in arr], dtype=np.int64)
            gaps = np.diff(doc_ids, prepend=int(base))
            deltas_out.append(varint_encode(gaps))
            tfs_out.append(varint_encode(tfs))
        return pd.DataFrame({"doc_deltas": deltas_out, "tfs": tfs_out})

    if pack_by == "range":
        with_block = index.postings.withColumn(
            "block_id", F.floor(F.col("doc_id") / block_size).cast("int")
        )
    else:
        from pyspark.sql.window import Window

        w = Window.partitionBy("term").orderBy("doc_id")
        with_block = index.postings.withColumn(
            "block_id",
            F.floor((F.row_number().over(w) - 1) / block_size).cast("int"),
        )
    grouped = (
        with_block.withColumn("contrib", contrib)
        .groupBy("term", "block_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
            F.max("contrib").alias("max_contrib"),
            F.array_sort(
                F.collect_list(F.struct("doc_id", "tf"))
            ).alias("entries"),
        )
    )
    packed = grouped.withColumn(
        "blob", _pack(F.col("entries"), F.col("min_doc_id"))
    ).select(
        "term",
        "block_id",
        "n",
        "min_doc_id",
        "max_doc_id",
        "max_contrib",
        F.col("blob.doc_deltas").alias("doc_deltas"),
        F.col("blob.tfs").alias("tfs"),
    )
    return packed


def unpack_postings(packed: DataFrame, block_size: int = DEFAULT_BLOCK_SIZE) -> DataFrame:
    """packed blocks -> (term, block_id, doc_id, tf). Inverse of pack."""

    @pandas_udf("array<struct<doc_id:long,tf:int>>")
    def _unpack(deltas: pd.Series, tfs: pd.Series, bases: pd.Series) -> pd.Series:
        out = []
        for d, t, base in zip(deltas, tfs, bases):
            gaps = varint_decode(bytes(d))
            tf_vals = varint_decode(bytes(t))
            doc_ids = np.cumsum(gaps) + int(base)
            out.append(
                [{"doc_id": int(did), "tf": int(tf)} for did, tf in zip(doc_ids, tf_vals)]
            )
        return pd.Series(out)

    return (
        packed.withColumn(
            "entry",
            F.explode(_unpack(F.col("doc_deltas"), F.col("tfs"), F.col("min_doc_id"))),
        )
        .select(
            "term",
            "block_id",
            F.col("entry.doc_id").alias("doc_id"),
            F.col("entry.tf").alias("tf"),
        )
    )


def block_max_table(
    index: InvertedIndex, block_size: int = DEFAULT_BLOCK_SIZE
) -> DataFrame:
    """(term, block_id, max_contrib, min_contrib, n) — BlockMaxIndex.build
    semantics (scorer.ts:641-674) as one aggregate, extended with the
    block's min contribution and posting count: every one of the n docs
    holding the term in the block scores >= min_contrib, which gives the
    WAND threshold n distinct lower-bound witnesses per (term, block)."""
    contrib = index.tf_norm_column(F.col("tf"), F.col("dl")) * F.col("idf")
    # term rides along for inspection/oracle queries (1:1 with term_id);
    # hot paths join/filter on term_id and column-prune the string away.
    keys = (
        ["term_id", "term", "block_id"]
        if "term_id" in index.postings.columns
        else ["term", "block_id"]
    )
    return (
        index.postings.withColumn(
            "block_id", F.floor(F.col("doc_id") / block_size).cast("int")
        )
        .groupBy(*keys)
        .agg(
            F.max(contrib).alias("max_contrib"),
            F.min(contrib).alias("min_contrib"),
            F.count(F.lit(1)).alias("n"),
        )
    )
