"""Batch-width throughput sweep for the routed query path.

Builds the north-rule corpus once, then measures warm routed-query
throughput at several batch widths in the same JVM.  Motivation: the
per-batch serial fraction (plan construction, broadcast collect, stage
scheduling) amortizes with width, but the scoring agg's map-side
combine state GROWS with width — one hash entry per (query, matched
doc) per layout partition — so throughput rises to a sweet spot and
then falls off a spill cliff.  With the default 128-way layout at
local[32]/300k docs the curve measured 79 / 107 / 132 / 98 q/s at
widths 500/1000/2000/4000 (the 4000 run spilled 34 GB in the scoring
stage).  Spill-free width scales with layout_partitions: size builds
expecting W-wide batches at layout_partitions >= W x n_docs x 64B /
(unified-memory-per-core).

Usage: python tools/width_sweep.py [cpus] [n_files] [widths,csv]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 300_000
    widths = [int(w) for w in (sys.argv[3] if len(sys.argv) > 3
                               else "500,1000,2000,4000").split(",")]
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)

    from pyspark.sql import functions as F

    from bench import build_workload
    from bayesian_bm25_js_spark.operators.compression import block_max_table
    from bayesian_bm25_js_spark.operators.index_build import build_inverted_index
    from bayesian_bm25_js_spark.operators.scoring import calibrate
    from bayesian_bm25_js_spark.operators.tokenize import tokenize_column
    from bayesian_bm25_js_spark.operators.wand import auto_topk
    from bayesian_bm25_js_spark.session import get_spark, query_mode
    from bayesian_bm25_js_spark.sources.corpus import synthesize_code_corpus

    layout = int(os.environ.get("SPARK_LAYOUT_PARTS", "128"))
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    corpus = synthesize_code_corpus(spark, n_files).persist()
    corpus.count()
    docs = corpus.select("doc_id", tokenize_column(F.col("content")).alias("tokens"))
    index = build_inverted_index(
        docs, k1=1.2, b=0.75, method="lucene", layout_partitions=layout
    )
    index.postings.count()
    bm = (
        block_max_table(index, 128)
        .repartition(layout, "term_id")
        .sortWithinPartitions("term_id")
        .persist()
    )
    bm.count()

    out = {}
    for width in widths:
        wl = build_workload(width)

        def run():
            return calibrate(
                auto_topk(index, wl, 10, block_max=bm, block_size=128),
                index, 1.0, 0.5, 0.05,
            ).count()

        with query_mode(spark):
            run()  # warm
            times = []
            for _ in range(2):
                t0 = time.time()
                run()
                times.append(time.time() - t0)
        t = min(times)
        out[width] = round(width / t, 2)
        print(f"[width] {width}: {t:.2f}s = {out[width]} q/s", file=sys.stderr)
    print(json.dumps({"cpus": cpus, "n_files": n_files,
                      "layout_partitions": layout, "qps_by_width": out}))


if __name__ == "__main__":
    main()
