"""Same-session interleaved A/B: Ray's sort-based groupby().aggregate()
over UNBOUNDED (user, window) keys vs the partial → sorted_runs_fold
shape that tumbling_aggregate / events_sliding / dedup_exact /
seq_dedup_exact moved to in round 5.

Both sides run the identical prep (window id + cents) over the same
synthesized events table (bench_events_fold.py generator: ≥0.85
distinct users per event — the worst case for pre-aggregation, since
per-batch partials barely shrink below the input). Sides alternate
A/B/B/A within one process (the CLAUDE.md drift rule); best-of-2 each.

Usage: python scripts/bench_groupby_fold_ab.py [n_events_millions] [num_cpus]
"""

import gc
import json
import os
import shutil
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

from bench_events_fold import N, CPUS, synth  # noqa: E402


def main():
    import ray

    ray.init(
        address="local",
        num_cpus=CPUS,
        include_dashboard=False,
        logging_level="ERROR",
    )
    import ray.data
    from ray.data.aggregate import Count, Sum

    ray.data.DataContext.get_current().enable_progress_bars = False

    d = f"/tmp/lpr_events_bench_{N}"
    if not os.path.exists(f"{d}/events.parquet"):
        synth(d)

    from logpipe_ray.stages.window import (
        add_tumbling_window,
        add_value_cents,
        tumbling_aggregate,
    )

    def read():
        return ray.data.read_parquet(
            f"{d}/events.parquet", columns=["user_id", "ts", "value"]
        )

    def prep(b):
        b = add_tumbling_window(b, ts_col="ts", width_s=3600)
        b = add_value_cents(b, value_col="value")
        return b.select(["user_id", "window", "value_cents"])

    def run_groupby():
        out = (
            read()
            .map_batches(prep, batch_format="pyarrow")
            .groupby(["user_id", "window"])
            .aggregate(
                Count(alias_name="n_events"),
                Sum("value_cents", alias_name="sum_value_cents"),
            )
        )
        n = out.count()
        del out
        gc.collect()
        return n

    def run_fold():
        out = tumbling_aggregate(read(), width_s=3600)
        n = out.count()
        del out
        gc.collect()
        return n

    times = {"groupby": [], "fold": []}
    rows = {}
    for side_order in (("groupby", run_groupby), ("fold", run_fold)), (
        ("fold", run_fold),
        ("groupby", run_groupby),
    ):
        for name, fn in side_order:
            t0 = time.time()
            rows[name] = fn()
            times[name].append(round(time.time() - t0, 2))
            print(name, times[name][-1], "s", rows[name], "rows", flush=True)

    assert rows["groupby"] == rows["fold"], rows
    best_g, best_f = min(times["groupby"]), min(times["fold"])
    print(
        json.dumps(
            {
                "metric": "tumbling_groupby_vs_fold_ab",
                "n_events": N,
                "out_rows": rows["fold"],
                "num_cpus": CPUS,
                "groupby_sec": times["groupby"],
                "fold_sec": times["fold"],
                "speedup_best": round(best_g / best_f, 2),
            }
        )
    )
    ray.shutdown()
    shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
