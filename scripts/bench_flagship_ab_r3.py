"""Cross-commit flagship A/B: HEAD vs the round-3 commit (01ca1c3) —
adjudicates the 10.75 s (r3 driver) → 12.47 s (r4 driver) headline
delta, which is confounded by cross-process host drift (CLAUDE.md:
±20% between runs; comparisons are only fair interleaved in one
session, best-of-N).

The two trees can't share a process (same module names), so each rep
is a fresh subprocess with PYTHONPATH pointing at one tree, and the
reps INTERLEAVE (A B A B ...) so both sides sample the same host
phase. os.sync() between reps flushes writeback debt onto the run that
created it.

Usage: python scripts/bench_flagship_ab_r3.py [reps] [num_cpus] [r3_tree]
(the r3 tree defaults to /tmp/lpr_r3_tree — `git worktree add
/tmp/lpr_r3_tree 01ca1c3`)
"""

import json
import os
import subprocess
import sys

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 32
R3_TREE = sys.argv[3] if len(sys.argv) > 3 else "/tmp/lpr_r3_tree"
HEAD_TREE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SEQ_DIR = os.environ.get(
    "SEQ_DIR", "/tmp/lpr_bench_cache/root_testdata_sf0.1_x16_v2"
)

_CHILD = r"""
import gc, os, shutil, sys, tempfile, time
import ray, ray.data
ray.init(address="local", num_cpus=int(sys.argv[1]),
         include_dashboard=False, logging_level="ERROR")
ray.data.DataContext.get_current().enable_progress_bars = False
from logpipe_ray.pipelines.flagship import run_fused
out = tempfile.mkdtemp(prefix="lpr_ab3_")
try:
    t0 = time.time()
    ds = ray.data.read_parquet(sys.argv[2])
    n = run_fused(ds, out).to_pandas()["n_rows"].sum()
    dt = time.time() - t0
finally:
    shutil.rmtree(out, ignore_errors=True)
ray.shutdown()
print("ABRESULT", dt, int(n))
"""


def run_once(tree: str) -> float:
    env = dict(os.environ, PYTHONPATH=tree, RAY_DEDUP_LOGS="1")
    r = subprocess.run(
        [sys.executable, "-c", _CHILD, str(CPUS), SEQ_DIR],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=tree,
    )
    for line in r.stdout.splitlines():
        if line.startswith("ABRESULT"):
            _, dt, n = line.split()
            os.sync()
            return float(dt)
    raise RuntimeError(f"no result from {tree}: {r.stderr[-1500:]}")


def main():
    sides = {"head": HEAD_TREE, "r3": R3_TREE}
    times = {k: [] for k in sides}
    for rep in range(REPS):
        # alternate order per rep: monotone host-phase trends otherwise
        # bias against whichever side always runs first
        order = list(sides.items())
        if rep % 2:
            order.reverse()
        for k, tree in order:
            dt = run_once(tree)
            times[k].append(dt)
            print(f"rep{rep} {k}: {dt:.2f}s", flush=True)
    best = {k: min(v) for k, v in times.items()}
    print(
        json.dumps(
            {
                "metric": "flagship_ab_head_vs_r3_sec",
                "best": best,
                "ratio_head_over_r3": round(best["head"] / best["r3"], 3),
                "all": times,
                "num_cpus": CPUS,
                "reps": REPS,
            }
        )
    )


if __name__ == "__main__":
    main()
