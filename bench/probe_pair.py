#!/usr/bin/env python3
"""Host-ceiling probes under the SAME protocol as bench/scaling.py:
interleaved (2, 8)-process pairs, taskset-pinned, median-of-K — but with NO
Spark and NO engine: a pure-CPU spin kernel and the engine's tokenize batch
kernel driven by plain multiprocessing. Whatever efficiency THESE show is
the host's ceiling for the corresponding resource mix; the engine cannot
out-scale its host. Run the same day as the scaling run (probes.md: only
same-day A/B is meaningful on this drifting host).

Usage: python bench/probe_pair.py [--pairs K]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import sys, time
sys.path.insert(0, {root!r})
mode = {mode!r}

def spin_task(_):
    x = 0
    for i in range(20_000_000):
        x += i * i
    return x

def tok_task(_):
    from sparkft.config import DEFAULT_CONFIG
    from sparkft.tokenizer import tokenize_batch
    texts = [("word%d merge sort stream filter value index " % i) * 12
             for i in range(800)]
    tokenize_batch(texts, DEFAULT_CONFIG, words_only=True)
    return 0

task = spin_task if mode == "spin" else tok_task
import multiprocessing as mp
if __name__ == "__main__":
    procs = {procs}
    tasks = {tasks}
    with mp.Pool(procs) as pool:
        pool.map(task, range(procs))  # warm (imports, allocator)
        t0 = time.time()
        pool.map(task, range(tasks))
        dt = time.time() - t0
    print("RESULT " + str(dt))
"""


def run_leg(mode: str, procs: int, tasks: int) -> float:
    code = WORKER.format(root=ROOT, mode=mode, procs=procs, tasks=tasks)
    cmd = ["taskset", "-c", f"0-{procs - 1}", sys.executable, "-c", code]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=1200)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return float(line[len("RESULT "):])
    sys.stderr.write(out.stderr[-2000:])
    raise SystemExit(f"no RESULT from {mode} x{procs}")


def _median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2.0


def main() -> int:
    pairs = 5
    if "--pairs" in sys.argv:
        pairs = int(sys.argv[sys.argv.index("--pairs") + 1])
    tasks = 32  # fixed work total per leg; throughput = tasks / wall
    out: dict = {"pairs": pairs, "tasks_per_leg": tasks, "modes": {}}
    for mode in ("spin", "tokenize"):
        legs: dict = {2: [], 8: []}
        for i in range(pairs):
            for procs in (2, 8):
                wall = run_leg(mode, procs, tasks)
                legs[procs].append(round(wall, 2))
                print(f"{mode} pair {i+1} x{procs}: {wall:.2f}s",
                      file=sys.stderr)
        thr2 = [tasks / w for w in legs[2]]
        thr8 = [tasks / w for w in legs[8]]
        eff = _median(thr8) / (4.0 * _median(thr2))
        out["modes"][mode] = {
            "walls_2": legs[2], "walls_8": legs[8],
            "median_eff_2_to_8": round(eff, 3),
            "per_pair_eff": [round(b / (4 * a), 3)
                             for a, b in zip(thr2, thr8)],
        }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
