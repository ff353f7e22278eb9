"""Engine-only sweep: run every queries() entry at a given sf_dir (no
DuckDB oracle — the two all-pairs Jaccard oracles take hours at sf0.1)
and report per-query wall time. Usage: python scripts/engine_sweep.py
[sf_dir] [num_cpus]."""

import gc
import sys
import time

import ray
import ray.data

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
NUM_CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 32


def main():
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    ray.data.DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as mod

    times = {}
    fails = {}
    for name, fn in mod.queries().items():
        t0 = time.time()
        try:
            res = fn(SF_DIR)
            if isinstance(res, ray.data.Dataset):
                res.count()
            times[name] = time.time() - t0
        except Exception as ex:
            fails[name] = f"{type(ex).__name__}: {ex}"
        gc.collect()
        print(f"{name}: {times.get(name, -1):.1f}s"
              + (f" FAIL {fails[name]}" if name in fails else ""), flush=True)
    worst = sorted(times.items(), key=lambda kv: -kv[1])[:8]
    print("SLOWEST:", [(n, round(t, 1)) for n, t in worst])
    print("RESULT:", "FAIL" if fails else "PASS",
          f"({len(times)} ok, {len(fails)} failed)")
    ray.shutdown()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
