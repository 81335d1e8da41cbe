"""Benchmark harness — prints ONE JSON line for the driver.

Phases (timed separately, reported in "queries"):
  corpus_synth     deterministic code corpus (north-rule shape)
  index_build      full inverted-index build, forced via postings count
  query_warm       batched top-10 calibrated BM25, 50-query workload
                   (steady-state: timed on the second, warm run)
  plus the oracle-suite headliners at $SPARK_GRAFT_SF_DIR.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     BENCH_FILES (synthetic corpus size, default 20000),
     BENCH_QUERIES (workload size, default 50).

`python bench.py --scaling` additionally runs the same job at local[8]
and local[32] in subprocesses and prints a scaling-efficiency report to
stderr + BENCH/BASELINE.md (north-rule two-cluster-size evidence).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_FILES = int(os.environ.get("BENCH_FILES", "100000"))
N_QUERIES = int(os.environ.get("BENCH_QUERIES", "200"))


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def build_workload(n_queries: int):
    """Deterministic 2-4 term queries over the synthetic-corpus vocab."""
    from bayesian_bm25_js_spark.functions.prng import mulberry32
    from bayesian_bm25_js_spark.sources.corpus import WEIGHTED_VOCAB

    vocab = sorted(set(WEIGHTED_VOCAB))
    rng = mulberry32(7)
    queries = []
    for _ in range(n_queries):
        n_terms = 2 + int(rng() * 3)
        queries.append([vocab[int(rng() * len(vocab))] for _ in range(n_terms)])
    return queries


def run_bench(cpus: int) -> dict:
    from pyspark.sql import functions as F

    from bayesian_bm25_js_spark.operators.index_build import build_inverted_index
    from bayesian_bm25_js_spark.operators.scoring import (
        calibrate,
        queries_to_df,
        score_queries,
        top_k,
    )
    from bayesian_bm25_js_spark.session import get_spark
    from bayesian_bm25_js_spark.sources.corpus import synthesize_code_corpus
    from bayesian_bm25_js_spark.operators.tokenize import tokenize_column

    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}

    # -- corpus ------------------------------------------------------------
    t0 = time.time()
    corpus = synthesize_code_corpus(spark, N_FILES).persist()
    n = corpus.count()
    timings["corpus_synth"] = round(time.time() - t0, 3)
    log(f"[bench] corpus: {n} files in {timings['corpus_synth']}s")

    # -- index build --------------------------------------------------------
    t0 = time.time()
    docs = corpus.select("doc_id", tokenize_column(F.col("content")).alias("tokens"))
    index = build_inverted_index(docs, k1=1.2, b=0.75, method="lucene")
    n_postings = index.postings.count()
    build_s = time.time() - t0
    timings["index_build"] = round(build_s, 3)
    files_per_sec = round(n / build_s, 1)
    log(f"[bench] index: {n_postings} postings in {build_s:.1f}s = {files_per_sec} files/s")

    # -- query workload ------------------------------------------------------
    workload = build_workload(N_QUERIES)
    qdf = queries_to_df(spark, workload)

    def run_queries():
        scores = score_queries(index, qdf)
        out = calibrate(top_k(scores, 10), index, 1.0, 0.5, 0.05)
        return out.count()

    import statistics

    t0 = time.time()
    n_results = run_queries()
    timings["query_cold"] = round(time.time() - t0, 3)
    warm = []
    for _ in range(3):
        t0 = time.time()
        run_queries()
        warm.append(time.time() - t0)
    query_s = statistics.median(warm)
    timings["query_warm"] = round(query_s, 3)
    qps = round(N_QUERIES / query_s, 2)
    log(f"[bench] queries: {N_QUERIES} in median {query_s:.2f}s = {qps} q/s ({n_results} rows)")

    # -- oracle-suite headliners at SF_DIR ------------------------------------
    if os.environ.get("BENCH_SKIP_SUITE"):
        total = round(sum(timings.values()), 3)
        spark.stop()
        return {
            "metric": "bench_suite_seconds",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": SF_DIR,
            "cpus": cpus,
            "n_files": n,
            "files_per_sec": files_per_sec,
            "qps_top10_calibrated": qps,
        }

    import __spark_entry__ as entry_mod

    for name in ["bm25_calibrated_topk", "dense_probabilities", "cosine_topk",
                 "dedup_exact", "text_stats"]:
        fn = entry_mod.queries()[name]
        t0 = time.time()
        fn(spark, SF_DIR).count()
        timings[name] = round(time.time() - t0, 3)
        log(f"[bench] {name}: {timings[name]}s")

    total = round(sum(timings.values()), 3)
    spark.stop()
    return {
        "metric": "bench_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "cpus": cpus,
        "n_files": n,
        "files_per_sec": files_per_sec,
        "qps_top10_calibrated": qps,
    }


def run_scaling() -> None:
    """Interleaved subprocess trials at local[8] and local[32] (fresh JVM
    per trial, alternating order to decorrelate machine noise), medians
    reported. Larger corpus than the per-round bench so the parallel
    region dominates fixed job overhead."""
    import statistics

    trials = int(os.environ.get("SCALING_TRIALS", "3"))
    n_files = os.environ.get("BENCH_FILES", "300000")
    results: dict[int, list[dict]] = {8: [], 32: []}
    for t in range(trials):
        for cpus in (8, 32) if t % 2 == 0 else (32, 8):
            env = dict(
                os.environ,
                SPARK_GRAFT_CPUS=str(cpus),
                BENCH_FILES=n_files,
                BENCH_SKIP_SUITE="1",
                SPARK_DRIVER_MEM=os.environ.get("SPARK_DRIVER_MEM", "48g"),
            )
            out = subprocess.run(
                [sys.executable, __file__], env=env, capture_output=True, text=True
            )
            line = out.stdout.strip().splitlines()[-1]
            r = json.loads(line)
            results[cpus].append(r)
            log(
                f"[scaling] trial {t} local[{cpus}]: "
                f"{r['files_per_sec']} f/s, {r['qps_top10_calibrated']} q/s"
            )

    med = lambda rs, key: statistics.median(r[key] for r in rs)
    f8, f32 = med(results[8], "files_per_sec"), med(results[32], "files_per_sec")
    qps8, qps32 = (
        med(results[8], "qps_top10_calibrated"),
        med(results[32], "qps_top10_calibrated"),
    )
    eff_b = (f32 / f8) / 4.0
    eff_q = (qps32 / qps8) / 4.0
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            "# BENCH — two-parallelism scaling evidence (north rule)\n\n"
            "Same job, same input, local[8] vs local[32] (sandbox proxy for\n"
            "N vs 4N executors; 32 physical cores, no SMT). Medians over\n"
            f"{trials} interleaved fresh-JVM trials per level.\n"
            "Efficiency = (throughput_32 / throughput_8) / 4.\n\n"
            "| metric | local[8] | local[32] | efficiency |\n"
            "|---|---|---|---|\n"
            f"| index build (files/s) | {f8} | {f32} | {eff_b:.3f} |\n"
            f"| top-10 calibrated queries/s | {qps8} | {qps32} | {eff_q:.3f} |\n\n"
            f"Corpus: {n_files} synthetic code files (sources/corpus.py, "
            f"north-rule shape), {N_QUERIES}-query top-10 calibrated "
            "workload, warm-median timing (bench.py).\n\n"
            "Raw trials:\n\n```\n"
            + "\n".join(
                f"local[{c}] trial {i}: {r['files_per_sec']} f/s, "
                f"{r['qps_top10_calibrated']} q/s"
                for c in (8, 32)
                for i, r in enumerate(results[c])
            )
            + "\n```\n"
        )
    log(f"[scaling] build eff={eff_b:.3f}, query eff={eff_q:.3f} -> BENCH/BASELINE.md")


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_bench(CPUS)))
