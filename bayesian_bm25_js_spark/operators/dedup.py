"""Deduplication operators for large-scale training-data pipelines.

All hot paths are pure Catalyst expressions (JVM-side, codegen'd):
xxhash64 shingle hashing, wide min-aggregates for MinHash signatures,
band-bucket joins for LSH candidate generation. No Python in the data
path — at 100 TB the signature build is two shuffles (distinct
shingles, signature agg) and candidate generation is a self-join on
band buckets whose size LSH keeps tiny.

Operators:
  exact_dedup           full-content hash groups
  shingle_column        k-gram shingle hash arrays
  minhash_signatures    n-permutation MinHash (seeded xxhash64 family)
  minhash_lsh_pairs     banded LSH candidates + signature-estimated
                        Jaccard ≥ threshold
  ngram_jaccard_pairs   exact shingle-set Jaccard for candidate pairs
  simhash_signatures    64-bit tf-weighted SimHash
  simhash_near_pairs    Hamming ≤ t via chunk pigeonhole + bit_count
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exact_dedup(
    df: DataFrame, content_col: str = "content", member_cap: int = 1000
) -> DataFrame:
    """Groups of byte-identical content: (h, n, keeper, doc_ids).

    doc_ids is CAPPED at the member_cap smallest ids: n and keeper stay
    exact for any group size, but an unbounded member list is a
    one-giant-row hazard — a boilerplate file duplicated 10^7 times
    would otherwise materialize a 10^7-element array in one aggregation
    buffer (VERDICT r01). The cap is applied BEFORE the collect (a
    streaming row_number window, which sorts but never materializes the
    group), so no buffer ever exceeds member_cap. member_cap=None opts
    out at fixture scale."""
    hashed = df.select(F.md5(F.col(content_col)).alias("h"), "doc_id")
    stats = hashed.groupBy("h").agg(
        F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("keeper")
    )
    members_src = hashed
    if member_cap is not None:
        from pyspark.sql.window import Window

        w = Window.partitionBy("h").orderBy("doc_id")
        members_src = (
            hashed.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= member_cap)
            .drop("__rn")
        )
    members = members_src.groupBy("h").agg(
        F.sort_array(F.collect_list("doc_id")).alias("doc_ids")
    )
    return (
        stats.filter(F.col("n") > 1)
        .join(members, "h")
        .select("h", "n", "keeper", "doc_ids")
    )


def shingle_column(tokens: Column, k: int = 5) -> Column:
    """array<string> tokens -> array<bigint> of xxhash64'd k-gram
    shingles (empty-safe; shorter docs get one whole-doc shingle)."""
    n_shingles = F.greatest(F.lit(1), F.size(tokens) - (k - 1))
    return F.transform(
        F.sequence(F.lit(1), n_shingles),
        lambda i: F.xxhash64(F.array_join(F.slice(tokens, i, k), " ")),
    )


def minhash_signatures(
    docs: DataFrame,
    tokens_col: str = "tokens",
    n_hashes: int = 64,
    shingle_k: int = 5,
) -> DataFrame:
    """-> (doc_id, sig array<bigint>[n_hashes]).

    MinHash family h_i(s) = xxhash64(s, i); signature component i is the
    min over the doc's distinct shingles. One explode + one wide
    min-aggregate (map-side combined)."""
    shingles = docs.select(
        "doc_id", F.explode(shingle_column(F.col(tokens_col), shingle_k)).alias("sh")
    ).distinct()
    aggs = [
        F.min(F.xxhash64(F.col("sh"), F.lit(i))).alias(f"h{i}")
        for i in range(n_hashes)
    ]
    wide = shingles.groupBy("doc_id").agg(*aggs)
    return wide.select(
        "doc_id", F.array(*[F.col(f"h{i}") for i in range(n_hashes)]).alias("sig")
    )


def minhash_lsh_pairs(
    signatures: DataFrame,
    n_bands: int = 16,
    threshold: float = 0.7,
    n_hashes: int = None,
) -> DataFrame:
    """-> (a, b, est_jaccard) near-dup candidate pairs, a < b.

    Bands the signature (rows = len(sig)/n_bands), buckets on
    (band_id, hash(band slice)), self-joins buckets, dedups pairs and
    keeps pairs whose signature-estimated Jaccard ≥ threshold.

    Shuffle diet: the band self-join and the pair dedup carry ONLY
    (doc_id, band_id, band_hash) — 24 bytes/row, not the 512-byte
    signature arrays; signatures re-attach to the (much smaller)
    deduped candidate set via two joins. Pass n_hashes to skip the
    signature-length probe job."""
    if n_hashes is None:
        first = signatures.select(F.size("sig").alias("n")).limit(1).collect()
        n_hashes = first[0]["n"] if first else 64
    rows = max(1, n_hashes // n_bands)

    bands = signatures.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda b: F.struct(
                    b.alias("band_id"),
                    F.xxhash64(
                        F.array_join(
                            F.transform(
                                F.slice("sig", b * rows + 1, rows),
                                lambda x: x.cast("string"),
                            ),
                            ",",
                        )
                    ).alias("band_hash"),
                ),
            )
        ).alias("band"),
    ).select("doc_id", "band.band_id", "band.band_hash")

    left = bands.select(F.col("doc_id").alias("a"), "band_id", "band_hash")
    right = bands.select(F.col("doc_id").alias("b"), "band_id", "band_hash")
    pairs = (
        left.join(right, ["band_id", "band_hash"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    cand = pairs.join(
        signatures.select(F.col("doc_id").alias("a"), F.col("sig").alias("sig_a")),
        "a",
    ).join(
        signatures.select(F.col("doc_id").alias("b"), F.col("sig").alias("sig_b")),
        "b",
    )
    est = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda eq: eq
        )
    ) / F.lit(float(n_hashes))
    return (
        cand.withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= threshold)
        .select("a", "b", "est_jaccard")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    tokens_col: str = "tokens",
    shingle_k: int = 5,
) -> DataFrame:
    """Exact shingle-set Jaccard for (a, b) candidate pairs ->
    (a, b, jaccard). Verification stage after LSH candidates."""
    sets = docs.select(
        "doc_id",
        F.array_distinct(shingle_column(F.col(tokens_col), shingle_k)).alias("sh"),
    )
    j = (
        pairs.join(sets.select(F.col("doc_id").alias("a"), F.col("sh").alias("sh_a")), "a")
        .join(sets.select(F.col("doc_id").alias("b"), F.col("sh").alias("sh_b")), "b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return j.select(
        "a", "b", (inter / union).alias("jaccard")
    )


def simhash_signatures(
    docs: DataFrame, tokens_col: str = "tokens", bits: int = 64
) -> DataFrame:
    """-> (doc_id, simhash bigint): tf-weighted sign-sum over token-hash
    bits. Explode + 64 conditional sums, all JVM-side."""
    toks = docs.select(
        "doc_id", F.explode(F.col(tokens_col)).alias("tok")
    ).groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("w"))
    h = F.xxhash64("tok")
    aggs = [
        F.sum(
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, F.col("w"))
            .otherwise(-F.col("w"))
        ).alias(f"s{i}")
        for i in range(bits)
    ]
    wide = toks.groupBy("doc_id").agg(*aggs)
    sim = None
    for i in range(bits):
        bit = F.when(F.col(f"s{i}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, i)
        sim = term if sim is None else sim.bitwiseOR(term)
    return wide.select("doc_id", sim.alias("simhash"))


def simhash_near_pairs(
    signatures: DataFrame, max_distance: int = 3, n_chunks: int = 4
) -> DataFrame:
    """-> (a, b, hamming) pairs with Hamming(simhash) ≤ max_distance.

    Pigeonhole: distance ≤ n_chunks-1 guarantees ≥1 equal 16-bit chunk,
    so candidates come from equality joins on chunks, then bit_count
    verifies. max_distance must be < n_chunks for completeness."""
    width = 64 // n_chunks
    mask = (1 << width) - 1
    chunks = signatures.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk_id"),
                        F.shiftrightunsigned("simhash", c * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("chunk"),
                    )
                    for c in range(n_chunks)
                ]
            )
        ).alias("ch"),
    ).select("doc_id", "simhash", "ch.chunk_id", "ch.chunk")
    left = chunks.select(
        F.col("doc_id").alias("a"), F.col("simhash").alias("ha"),
        "chunk_id", "chunk",
    )
    right = chunks.select(
        F.col("doc_id").alias("b"), F.col("simhash").alias("hb"),
        "chunk_id", "chunk",
    )
    # dedup on the pair key only (ha/hb are functions of a/b)
    pairs = (
        left.join(right, ["chunk_id", "chunk"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "ha", "hb")
        .dropDuplicates(["a", "b"])
    )
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        pairs.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_distance)
        .select("a", "b", "hamming")
    )
