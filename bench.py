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
    """Deterministic 2-4 term queries: realistic code-search shape —
    each term is 50/50 a hot keyword (Zipf head) or a long-tail
    identifier ("v{N}"), mirroring the corpus token distribution.
    Mixed selectivity exercises both the skew path (hot terms) and the
    block-max pruning path (selective terms)."""
    from bayesian_bm25_js_spark.functions.prng import mulberry32
    from bayesian_bm25_js_spark.sources.corpus import TAIL_VOCAB_SIZE, WEIGHTED_VOCAB

    vocab = sorted(set(WEIGHTED_VOCAB))
    rng = mulberry32(7)
    queries = []
    for _ in range(n_queries):
        n_terms = 2 + int(rng() * 3)
        terms = []
        for _ in range(n_terms):
            if rng() < 0.5:
                terms.append(vocab[int(rng() * len(vocab))])
            else:
                terms.append(f"v{int(rng() * TAIL_VOCAB_SIZE)}")
        queries.append(terms)
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

    # -- JIT warmup (untimed): heat the codegen/JIT paths the timed
    # phases use, so fresh-JVM compilation cost doesn't masquerade as
    # serial fraction in the scaling comparison.
    if os.environ.get("BENCH_WARMUP", "1") != "0":
        t0 = time.time()
        wc = synthesize_code_corpus(spark, 5000).persist()
        wdocs = wc.select("doc_id", tokenize_column(F.col("content")).alias("tokens"))
        widx = build_inverted_index(wdocs, k1=1.2, b=0.75, method="lucene")
        wq = queries_to_df(spark, build_workload(20))
        calibrate(top_k(score_queries(widx, wq), 10), widx, 1.0, 0.5, 0.05).count()
        widx.unpersist()
        wc.unpersist()
        log(f"[bench] warmup {time.time() - t0:.1f}s")

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


def _burn(_):
    x = 0
    for i in range(30_000_000):
        x += i * i
    return x


def _raw_cpu_units_per_sec(n_procs: int) -> float:
    """Hardware ceiling probe: embarrassingly parallel pure-Python work,
    no JVM, no shuffle. What N processes can actually extract from this
    box — the upper bound on ANY engine's scaling here."""
    import multiprocessing as mp
    import time as _t

    t0 = _t.time()
    with mp.Pool(n_procs) as p:
        p.map(_burn, range(n_procs))
    return n_procs / (_t.time() - t0)


def run_scaling() -> None:
    """Interleaved subprocess trials at the configured parallelism levels
    (fresh JVM per trial, alternating order to decorrelate machine
    noise), medians reported, plus a raw-CPU hardware-ceiling probe —
    engine efficiency is meaningful only relative to what the
    (contended) box itself delivers."""
    import statistics

    trials = int(os.environ.get("SCALING_TRIALS", "3"))
    n_files = os.environ.get("BENCH_FILES", "300000")
    levels = [
        int(x) for x in os.environ.get("SCALING_LEVELS", "2,8,32").split(",")
    ]
    results: dict[int, list[dict]] = {c: [] for c in levels}
    for t in range(trials):
        for cpus in levels if t % 2 == 0 else reversed(levels):
            env = dict(
                os.environ,
                SPARK_GRAFT_CPUS=str(cpus),
                BENCH_FILES=n_files,
                BENCH_SKIP_SUITE="1",
                # 8-12g is the sweet spot: bigger heaps anti-scale at 32
                # threads in this VM (lazy page-fault storms on fresh
                # young-gen pages).
                SPARK_DRIVER_MEM=os.environ.get("SPARK_DRIVER_MEM", "10g"),
            )
            out = subprocess.run(
                [sys.executable, __file__], env=env, capture_output=True, text=True
            )
            line = out.stdout.strip().splitlines()[-1]
            r = json.loads(line)
            results[cpus].append(r)
            log(
                f"[scaling] trial {t} local[{cpus}]: "
                f"{r['files_per_sec']} f/s, {r['qps_top10_calibrated']} q/s "
                f"timings={r['queries']}"
            )

    med = lambda rs, key: statistics.median(r[key] for r in rs)
    mx = lambda rs, key: max(r[key] for r in rs)
    f = {c: med(results[c], "files_per_sec") for c in levels}
    q = {c: med(results[c], "qps_top10_calibrated") for c in levels}
    fm = {c: mx(results[c], "files_per_sec") for c in levels}
    qm = {c: mx(results[c], "qps_top10_calibrated") for c in levels}

    log("[scaling] probing raw-CPU hardware ceiling...")
    hw = {c: _raw_cpu_units_per_sec(c) for c in levels}

    def eff(d, lo, hi):
        return (d[hi] / d[lo]) / (hi / lo)

    pairs = [(levels[i], levels[i + 1]) for i in range(len(levels) - 1)]
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as fh:
        fh.write(
            "# BENCH — two-cluster-size scaling evidence (north rule)\n\n"
            "Same job, same input, at multiple local[N] parallelism levels\n"
            "(sandbox proxy for N vs 4N executors; 32 vCPUs, no SMT).\n"
            f"Medians over {trials} interleaved fresh-JVM trials per level.\n"
            "Efficiency(lo→hi) = (throughput_hi / throughput_lo) / (hi/lo).\n\n"
            "**Hardware context:** this sandbox VM is CPU-contended — a pure\n"
            "Python multiprocessing burn (no JVM, no shuffle, perfectly\n"
            "parallel) measures the ceiling any engine can reach here. Engine\n"
            "efficiency should be read against that ceiling, not against an\n"
            "ideal 1.0 the box itself cannot deliver.\n\n"
            "| throughput | " + " | ".join(f"local[{c}]" for c in levels) + " |\n"
            "|---|" + "|".join(["---"] * len(levels)) + "|\n"
            "| index build (files/s) | "
            + " | ".join(f"{f[c]:.0f}" for c in levels) + " |\n"
            "| top-10 calibrated queries/s | "
            + " | ".join(f"{q[c]:.2f}" for c in levels) + " |\n"
            "| raw-CPU ceiling (units/s) | "
            + " | ".join(f"{hw[c]:.2f}" for c in levels) + " |\n\n"
            "| efficiency | " + " | ".join(f"{lo}→{hi} (×{hi//lo})" for lo, hi in pairs) + " |\n"
            "|---|" + "|".join(["---"] * len(pairs)) + "|\n"
            "| index build (median) | "
            + " | ".join(f"{eff(f, lo, hi):.3f}" for lo, hi in pairs) + " |\n"
            "| queries (median) | "
            + " | ".join(f"{eff(q, lo, hi):.3f}" for lo, hi in pairs) + " |\n"
            "| index build (best trial = least host contention) | "
            + " | ".join(f"{eff(fm, lo, hi):.3f}" for lo, hi in pairs) + " |\n"
            "| queries (best trial) | "
            + " | ".join(f"{eff(qm, lo, hi):.3f}" for lo, hi in pairs) + " |\n"
            "| raw-CPU ceiling | "
            + " | ".join(f"{eff(hw, lo, hi):.3f}" for lo, hi in pairs) + " |\n\n"
            "| efficiency normalized to hardware ceiling | "
            + " | ".join(f"{lo}→{hi}" for lo, hi in pairs) + " |\n"
            "|---|" + "|".join(["---"] * len(pairs)) + "|\n"
            "| index build (best trial) | "
            + " | ".join(f"{eff(fm, lo, hi)/eff(hw, lo, hi):.3f}" for lo, hi in pairs) + " |\n"
            "| queries (best trial) | "
            + " | ".join(f"{eff(qm, lo, hi)/eff(hw, lo, hi):.3f}" for lo, hi in pairs) + " |\n\n"
            f"Corpus: {n_files} synthetic code files (sources/corpus.py, "
            f"north-rule shape), {N_QUERIES}-query top-10 calibrated "
            "workload, warm-median timing. Shuffle dirs on tmpfs "
            "(spark.local.dir=/dev/shm) — this VM's block device serializes "
            "shuffle I/O and was the dominant anti-scaling factor before.\n\n"
            "Raw trials:\n\n```\n"
            + "\n".join(
                f"local[{c}] trial {i}: {r['files_per_sec']} f/s, "
                f"{r['qps_top10_calibrated']} q/s"
                for c in levels
                for i, r in enumerate(results[c])
            )
            + "\n```\n"
        )
    for lo, hi in pairs:
        log(
            f"[scaling] {lo}->{hi}: build eff={eff(f, lo, hi):.3f} "
            f"query eff={eff(q, lo, hi):.3f} hw ceiling={eff(hw, lo, hi):.3f}"
        )
    log("[scaling] -> BENCH/BASELINE.md")


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_bench(CPUS)))
