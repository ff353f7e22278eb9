"""Same-session A/B: flagship (fused in-store writer) vs resumable
(storage→storage fragment runner) over the SAME bench input cache —
adjudicates the driver-round resumable trend (12.8 → 16.0 → 22.0 s)
that is confounded by cross-process host drift and kernel writeback.

Interleaved best-of-N in one process with os.sync() barriers between
timed stages (the CLAUDE.md host-drift rule).

Usage: python scripts/bench_resumable_ab.py [reps] [num_cpus]
"""

import gc
import glob
import os
import shutil
import sys
import tempfile
import time

import ray
import ray.data

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 32
SEQ_DIR = os.environ.get(
    "SEQ_DIR", "/tmp/lpr_bench_cache/root_testdata_sf0.1_x16_v2"
)


def run_flagship() -> float:
    from logpipe_ray.pipelines.flagship import run_fused

    out = tempfile.mkdtemp(prefix="lpr_ab_flag_")
    try:
        t0 = time.time()
        ds = ray.data.read_parquet(SEQ_DIR)
        run_fused(ds, out).to_pandas()
        return time.time() - t0
    finally:
        shutil.rmtree(out, ignore_errors=True)
        gc.collect()
        os.sync()


def run_resumable() -> float:
    from logpipe_ray.pipelines.resumable import run_resumable

    paths = sorted(glob.glob(f"{SEQ_DIR}/*.parquet"))
    out = tempfile.mkdtemp(prefix="lpr_ab_res_")
    try:
        t0 = time.time()
        run_resumable(paths, out, make_sequences=False)
        return time.time() - t0
    finally:
        shutil.rmtree(out, ignore_errors=True)
        gc.collect()
        os.sync()


def main():
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=CPUS, include_dashboard=False)
    ray.data.DataContext.get_current().enable_progress_bars = False
    times = {"flagship": [], "resumable": []}
    for rep in range(REPS):
        f = run_flagship()
        r = run_resumable()
        times["flagship"].append(round(f, 2))
        times["resumable"].append(round(r, 2))
        print(f"rep{rep}: flagship {f:.2f}s  resumable {r:.2f}s", flush=True)
    best_f, best_r = min(times["flagship"]), min(times["resumable"])
    print(
        {
            "flagship": times["flagship"],
            "resumable": times["resumable"],
            "best_flagship": best_f,
            "best_resumable": best_r,
            "ratio": round(best_r / best_f, 2),
            "num_cpus": CPUS,
        }
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
