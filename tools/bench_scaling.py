"""Scaling-efficiency evidence: the same harmonization job at N and 4N cores.

BASELINE.json's north_rule requires >=0.8 throughput scaling efficiency
between N and 4N executors. No real cluster exists in this sandbox, so the
sanctioned evidence is the identical job at two parallelism levels on the
same deterministic input:

    efficiency = (throughput_4N / throughput_N) / 4

Methodology notes (hard-won):
* every run is a fresh subprocess (own JVM) that warms JIT and reports the
  best of two measured runs (cold generated-code paths are ~5x slower);
* the host is multi-tenant with time-varying background load, so the two
  levels are INTERLEAVED (lo,hi,lo,hi) and the per-level best is used;
* levels default to 4 and 16; an 8-vs-32 pair would measure the host's
  ceiling (~20-24 effective cores), not the engine. Round 3 runs 2-vs-8.
* each level is PINNED to its core count with taskset (round 3): local[N]
  only caps task threads, and the surplus CPU that GC/JIT/IO threads grab
  is proportionally larger at small N, which silently flattered the low
  level.

Usage: python tools/bench_scaling.py [n_turns] [lo] [hi] [rounds]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cpus: int, n_turns: int, mode: str = "harmonize_only") -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        BENCH_MODE=mode,
        BENCH_TURNS=str(n_turns),
    )
    cmd = [sys.executable, os.path.join(REPO, "bench.py")]
    if shutil.which("taskset"):
        # HARD-cap the whole process tree at N CPUs. local[N] only limits
        # TASK threads — GC, JIT, shuffle IO and Py4J threads run beyond
        # them, so an unpinned "local[2]" JVM was observed sustaining >4
        # cores of CPU, inflating the low level and making the N-vs-4N
        # ratio meaningless. Pinning makes "N cores" mean N cores — the
        # same accounting a cluster manager's CPU quota enforces per
        # executor, i.e. exactly what the north rule's two-cluster-size
        # comparison assumes.
        total = os.cpu_count() or cpus
        cmd = ["taskset", "-c", f"{total - cpus}-{total - 1}"] + cmd
    out = subprocess.run(
        cmd,
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON from bench at cpus={cpus}:\n{out.stdout}\n{out.stderr}")


def main():
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    mode = sys.argv[5] if len(sys.argv) > 5 else "harmonize_only"

    best = {lo: 0, hi: 0}
    runs = []
    for _ in range(rounds):
        for level in (lo, hi):
            r = run_level(level, n_turns, mode)
            runs.append((level, r["turns_per_sec"]))
            best[level] = max(best[level], r["turns_per_sec"])
    eff = (best[hi] / best[lo]) / (hi / lo)
    jobdesc = (
        "harmonize (generate -> VARIANT mapping -> chunked session bundle assembly)"
        if mode == "harmonize_only"
        else "streaming pipeline (file stream -> mapping -> stateful session assembly -> exactly-once sink)"
    )
    result = {
        "job": jobdesc,
        "n_turns": n_turns,
        "all_runs": [{"cpus": c, "turns_per_sec": t} for c, t in runs],
        "best": {f"local[{lo}]": best[lo], f"local[{hi}]": best[hi]},
        "scaling_efficiency": round(eff, 3),
        "target": ">= 0.8",
        "pass": eff >= 0.8,
    }
    print(json.dumps(result, indent=2))
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(
            f"\n## Scaling run [{mode}] (N={lo} vs 4N={hi} cores, {n_turns:,} turns, "
            f"{rounds} interleaved rounds, best per level)\n\n"
            f"| level | best turns/sec |\n|---|---|\n"
            f"| local[{lo}] | {best[lo]:,} |\n"
            f"| local[{hi}] | {best[hi]:,} |\n\n"
            f"all runs: {runs}\n\n"
            f"**Scaling efficiency = (tp_4N/tp_N)/{hi // lo} = {eff:.3f}** "
            f"(target >= 0.8: {'PASS' if eff >= 0.8 else 'FAIL'})\n"
        )


if __name__ == "__main__":
    main()
