"""Driver-serial-time profiler over Spark event logs.

The N->4N query gap at high core counts is wall time when NO stage is
running: plan analysis, routing, broadcast construction, scheduling
gaps between the many small stages of a batch.  This decomposes it
from the event log bench.py writes (spark.eventLog.dir):

  per job group:  wall = last stage end - first stage start
                  covered = union of [stage submit, stage complete]
                  serial = wall - covered    (no stage in flight)
                  sched  = covered - busy-weighted estimate (reported
                           per-stage: submit->first-task-launch is in
                           covered, so small stages surface here)

Usage: python tools/profile_serial.py /tmp/bench-events-<pid> [group]
Prints one line per job group plus the per-stage table for the chosen
group (default: query_auto, the routed warm batch).
"""
from __future__ import annotations

import json
import os
import sys
from collections import defaultdict


def load_events(d: str):
    entries = [os.path.join(d, f) for f in os.listdir(d) if not f.startswith(".")]
    if not entries:
        raise SystemExit(f"no event log in {d}")
    newest = max(entries, key=os.path.getmtime)
    if os.path.isdir(newest):  # rolling v2 layout: events_* parts inside
        paths = sorted(
            os.path.join(newest, f)
            for f in os.listdir(newest)
            if f.startswith("events_")
        )
    else:
        paths = [newest]
    for path in paths:
        if path.endswith(".zstd"):  # rolling logs default to zstd
            import io

            import pyarrow as pa

            fh = io.TextIOWrapper(
                pa.input_stream(path, compression="zstd"), encoding="utf-8"
            )
        else:
            fh = open(path)
        with fh:
            for line in fh:
                line = line.strip()
                if line:
                    try:
                        yield json.loads(line)
                    except json.JSONDecodeError:
                        continue


def union_len(iv):
    iv = sorted(iv)
    total = 0
    cur_s = cur_e = None
    for s, e in iv:
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                total += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    if cur_e is not None:
        total += cur_e - cur_s
    return total


def main() -> None:
    d = sys.argv[1] if len(sys.argv) > 1 else None
    focus = sys.argv[2] if len(sys.argv) > 2 else "query_auto"
    if not d:
        cands = sorted(
            (p for p in os.listdir("/tmp") if p.startswith("bench-events-")),
            key=lambda p: os.path.getmtime(os.path.join("/tmp", p)),
        )
        if not cands:
            raise SystemExit("no /tmp/bench-events-* dirs")
        d = os.path.join("/tmp", cands[-1])
    job_group: dict[int, str] = {}
    stage_job: dict[int, int] = {}
    stage_iv: dict[int, tuple] = {}
    stage_name: dict[int, str] = {}
    for e in load_events(d):
        ev = e.get("Event")
        if ev == "SparkListenerJobStart":
            gid = (e.get("Properties") or {}).get("spark.jobGroup.id") or ""
            job_group[e["Job ID"]] = gid
            for sid in e.get("Stage IDs", []):
                stage_job[sid] = e["Job ID"]
        elif ev == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            sub = si.get("Submission Time")
            com = si.get("Completion Time")
            if sub and com:
                stage_iv[si["Stage ID"]] = (sub, com)
                stage_name[si["Stage ID"]] = si.get("Stage Name", "")

    by_group: dict[str, list] = defaultdict(list)
    for sid, iv in stage_iv.items():
        g = job_group.get(stage_job.get(sid, -1), "?")
        by_group[g].append((sid, iv))

    print(f"{'group':14} {'wall_s':>8} {'covered_s':>9} {'serial_s':>8} "
          f"{'serial%':>7} stages")
    for g, stages in sorted(by_group.items()):
        iv = [v for _, v in stages]
        wall = (max(e for _, e in iv) - min(s for s, _ in iv)) / 1000.0
        cov = union_len(iv) / 1000.0
        print(f"{g or '(none)':14} {wall:8.2f} {cov:9.2f} {wall - cov:8.2f} "
              f"{100 * (wall - cov) / wall if wall else 0:6.1f}% {len(stages)}")

    stages = sorted(by_group.get(focus, []), key=lambda t: t[1][0])
    if stages:
        print(f"\nper-stage, group={focus} (gap = idle before this stage):")
        prev_end = None
        for sid, (s, e) in stages:
            gap = (s - prev_end) / 1000.0 if prev_end is not None else 0.0
            # overlapping stages show negative gap; clamp for readability
            print(f"  stage {sid:4} dur {(e - s) / 1000.0:7.2f}s "
                  f"gap {max(gap, -0.0):6.2f}s  {stage_name[sid][:70]}")
            prev_end = max(prev_end or 0, e)


if __name__ == "__main__":
    main()
