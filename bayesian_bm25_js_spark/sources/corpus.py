"""Deterministic synthetic source-code corpus in the north-rule shape.

Generates (repo, path, commit, lang, content) rows entirely with
Catalyst expressions — no Python RNG, no per-row UDF, no driver data —
so the corpus is (a) reproducible bit-for-bit (content sha256 is a pure
function of the row id; the per-row invariant required by
BASELINE.json's input_hint), and (b) generated at cluster parallelism:
synthesizing 10^8 files is a single narrow `range` stage.

Token distribution is Zipfian-ish via a tiered weighted vocabulary
(code keywords dominate), which exercises the engine's skew handling
the way real code corpora do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ~100 distinct tokens; keywords repeated to skew the draw like code.
_KEYWORDS = (
    "def return if else for while import from class self none true false "
    "and or not in is try except raise with as pass break continue lambda "
    "function var let const new this typeof void int long double float "
    "static public private string bool struct enum switch case"
).split()
_IDENTIFIERS = [f"var{i}" for i in range(40)] + [
    "index", "builder", "query", "engine", "score", "posting", "term",
    "document", "partition", "shuffle", "hash", "merge", "block", "bound",
    "prob", "fusion", "spark", "arrow", "batch", "kernel",
]
# weighted vocab: each keyword appears 8x, identifiers once -> Zipf-ish
WEIGHTED_VOCAB = [w for w in _KEYWORDS for _ in range(8)] + _IDENTIFIERS

# Long-tail identifier namespace: real code corpora have million-term
# vocabularies where most terms are rare (user identifiers), while
# keywords blanket every file. TAIL_PCT of token draws come from a
# fixed-size "v{0..N}" namespace, giving each tail term a document
# frequency around 0.1% at 400k files — the selective-term regime that
# block-max pruning and skew handling must both face. The size is
# FIXED (not a function of n_files) so growing the corpus never
# rewrites existing rows (prefix-stability invariant, test_corpus).
TAIL_VOCAB_SIZE = 50_000
TAIL_PCT = 25
LANGS = ["py", "js", "java", "go", "rs", "ts", "cpp", "rb"]
EXT = {"py": "py", "js": "js", "java": "java", "go": "go",
       "rs": "rs", "ts": "ts", "cpp": "cc", "rb": "rb"}


def synthesize_code_corpus(
    spark: SparkSession,
    n_files: int,
    min_tokens: int = 40,
    max_tokens: int = 400,
    n_repos: int = 200,
    partitions: int | None = None,
) -> DataFrame:
    """-> (repo, path, commit, lang, content), deterministic in n_files."""
    vocab = F.array(*[F.lit(w) for w in WEIGHTED_VOCAB])
    v = len(WEIGHTED_VOCAB)

    df = spark.range(0, n_files, 1, partitions or spark.sparkContext.defaultParallelism)
    fid = F.col("id")
    length = (
        F.lit(min_tokens)
        + F.pmod(F.xxhash64(fid, F.lit(1)), F.lit(max_tokens - min_tokens))
    ).cast("int")
    lang = F.element_at(
        F.array(*[F.lit(l) for l in LANGS]),
        (F.pmod(F.xxhash64(fid, F.lit(2)), F.lit(len(LANGS))) + 1).cast("int"),
    )
    def token_at(i):
        head = F.element_at(
            vocab, (F.pmod(F.xxhash64(fid, i), F.lit(v)) + 1).cast("int")
        )
        tail = F.concat(
            F.lit("v"),
            F.pmod(F.xxhash64(fid, i, F.lit(5)), F.lit(TAIL_VOCAB_SIZE)).cast("string"),
        )
        is_tail = F.pmod(F.xxhash64(fid, i, F.lit(4)), F.lit(100)) < F.lit(TAIL_PCT)
        return F.when(is_tail, tail).otherwise(head)
    content = F.array_join(
        F.transform(F.sequence(F.lit(10), length + 9), token_at), " "
    )
    return df.select(
        F.concat(
            F.lit("org"),
            F.pmod(fid, F.lit(n_repos // 4 or 1)).cast("string"),
            F.lit("/repo"),
            F.pmod(fid, F.lit(n_repos)).cast("string"),
        ).alias("repo"),
        F.concat(
            F.lit("src/mod"),
            F.pmod(F.xxhash64(fid, F.lit(3)), F.lit(97)).cast("string"),
            F.lit("/file"),
            fid.cast("string"),
            F.lit("."),
        ).alias("path_base"),
        lang.alias("lang"),
        F.sha2(F.concat(F.lit("commit"), fid.cast("string")), 256).substr(1, 40).alias("commit"),
        content.alias("content"),
        fid.alias("doc_id"),
    ).select(
        "repo",
        F.concat(
            "path_base",
            F.element_at(
                F.array(*[F.lit(EXT[l]) for l in LANGS]),
                (F.pmod(F.xxhash64(F.col("doc_id"), F.lit(2)), F.lit(len(LANGS))) + 1).cast("int"),
            ),
        ).alias("path"),
        "commit",
        "lang",
        "content",
        "doc_id",
    )
