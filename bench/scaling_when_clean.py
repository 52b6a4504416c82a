#!/usr/bin/env python3
"""Launch the protocol scaling run in a probe-verified clean host window.

The sandbox VM's 2->8 ceiling drifts between ~0.55 and ~0.96 on a scale of
minutes (BENCH/HOST_DRIFT_r4.md, BENCH/SCALING_R5_NOTE.md): launching the
engine run blind measures the window, not the engine. This wrapper encodes
the r5f protocol: run a SHORT probe pair (pure-CPU spin + engine tokenize
kernel, no Spark); if the host's own ceiling clears --gate, launch
bench/scaling.py immediately inside the same window; otherwise sleep and
re-probe. Every probe reading is logged so the record shows how the window
was chosen (gate criterion stated up front, not cherry-picked after).

Usage: python bench/scaling_when_clean.py [n_docs] [--gate 0.88]
       [--max-tries 24] [--sleep 300] [--pairs 5]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def probe() -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench", "probe_pair.py"),
         "--pairs", "2"],
        capture_output=True, text=True, timeout=900)
    for line in reversed(out.stdout.splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError("probe produced no JSON: " + out.stdout[-500:])


def main() -> int:
    argv = sys.argv[1:]
    n_docs = next((a for a in argv if a.isdigit()), "600000")

    def opt(name: str, dflt: str) -> str:
        return argv[argv.index(name) + 1] if name in argv else dflt

    gate = float(opt("--gate", "0.88"))
    max_tries = int(opt("--max-tries", "24"))
    sleep_s = int(opt("--sleep", "300"))
    pairs = opt("--pairs", "5")

    log = []
    for attempt in range(1, max_tries + 1):
        t0 = time.strftime("%H:%M:%S")
        p = probe()
        spin = p["modes"]["spin"]["median_eff_2_to_8"]
        tok = p["modes"]["tokenize"]["median_eff_2_to_8"]
        load = os.getloadavg()[0]
        log.append({"t": t0, "spin": spin, "tokenize": tok,
                    "load": round(load, 2)})
        print(f"[{t0}] probe #{attempt}: spin {spin} tokenize {tok} "
              f"load {load:.2f} (gate {gate})", flush=True)
        if spin >= gate and tok >= gate:
            print(f"[{t0}] window clean — launching scaling run", flush=True)
            with open("/tmp/scaling_probe_log.json", "w") as f:
                json.dump(log, f, indent=1)
            rc = subprocess.run(
                [sys.executable, os.path.join(ROOT, "bench", "scaling.py"),
                 n_docs, "--pairs", pairs, "--pin"]).returncode
            return rc
        time.sleep(sleep_s)
    with open("/tmp/scaling_probe_log.json", "w") as f:
        json.dump(log, f, indent=1)
    print("no clean window found; probe log at /tmp/scaling_probe_log.json")
    return 2


if __name__ == "__main__":
    sys.exit(main())
