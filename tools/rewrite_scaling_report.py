"""Replay BENCH/scaling_trials.jsonl through bench._write_scaling_report.

The scaling report (BENCH/BASELINE.md) is a pure function of the raw
trial rows, which run_scaling persists one-per-line.  When the report
writer changes (new sections, fixed formatting) this replays the saved
trials instead of re-running ~40 minutes of fresh-JVM benchmarks:

    python tools/rewrite_scaling_report.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main() -> None:
    path = os.path.join("BENCH", "scaling_trials.jsonl")
    rows = [json.loads(line) for line in open(path) if line.strip()]
    if not rows:
        raise SystemExit(f"{path} is empty")
    levels = sorted({r["cpus"] for r in rows})
    results = {c: [r for r in rows if r["cpus"] == c] for c in levels}
    last = rows[-1]
    hw_cpu = {int(k): v for k, v in last["hw_cpu"].items()}
    hw_mem = {int(k): v for k, v in last["hw_mem"].items()}
    trials = max(r["trial"] for r in rows) + 1
    bench._write_scaling_report(
        results, levels, hw_cpu, hw_mem, trials,
        last["n_files"], last["n_queries"],
    )
    print(f"rewrote BENCH/BASELINE.md from {len(rows)} trials "
          f"(levels {levels}, {trials} trials/level)")


if __name__ == "__main__":
    main()
