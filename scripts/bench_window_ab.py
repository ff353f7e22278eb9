"""Same-session A/B: per-group pandas window kernels (round-3 shape,
reconstructed via smallagg.map_groups_typed) vs the vectorized
lexsort+run-scan kernels in stages/window.py (round 4).

Host timing drifts ±20% between processes (CLAUDE.md), so both variants
run interleaved in ONE process, best-of-N each — the only fair compare.

Usage: python scripts/bench_window_ab.py [n_events] [n_users] [reps]
"""

import gc
import sys
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
USERS = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 2


def make_events(n: int, users: int) -> pa.Table:
    rng = np.random.RandomState(7)
    return pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(
                rng.randint(0, users, size=n).astype(np.int64)
            ),
            "ts": pa.array(
                rng.randint(0, 86400_000_000, size=n).astype("datetime64[us]")
            ),
            "value": pa.array(rng.uniform(0, 100, size=n)),
        }
    )


# ---- round-3 per-group pandas implementations (verbatim shape) -------------


def old_sessionize(ds, gap_s=1800):
    from logpipe_ray.stages.smallagg import map_groups_typed
    from logpipe_ray.stages.window import cents_half_away

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        gaps = g["ts"].diff().dt.total_seconds().fillna(0.0)
        session = (gaps > gap_s).cumsum()
        cents = cents_half_away(g["value"])
        out = (
            pd.DataFrame(
                {
                    "user_id": g["user_id"].to_numpy(),
                    "session_id": session.to_numpy(),
                    "value_cents": cents,
                }
            )
            .groupby(["user_id", "session_id"], as_index=False)
            .agg(
                n_events=("value_cents", "size"),
                sum_value_cents=("value_cents", "sum"),
            )
        )
        out["session_id"] = out["session_id"].astype(np.int64)
        out["n_events"] = out["n_events"].astype(np.int64)
        return out

    schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("session_id", pa.int64()),
            ("n_events", pa.int64()),
            ("sum_value_cents", pa.int64()),
        ]
    )
    return map_groups_typed(ds, "user_id", per_key, schema)


def old_cumsum(ds):
    from logpipe_ray.stages.smallagg import map_groups_typed
    from logpipe_ray.stages.window import cents_half_away

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        cents = cents_half_away(g["value"])
        return pd.DataFrame(
            {
                "event_id": g["event_id"].astype("int64").to_numpy(),
                "running_cents": cents.cumsum(),
            }
        )

    schema = pa.schema([("event_id", pa.int64()), ("running_cents", pa.int64())])
    return map_groups_typed(ds, "user_id", per_key, schema)


def main():
    from logpipe_ray.stages.window import cumulative_sum_by_key, sessionize

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False)
    ray.data.DataContext.get_current().enable_progress_bars = False

    tbl = make_events(N, USERS)
    variants = {
        "sessionize_old": lambda d: old_sessionize(d),
        "sessionize_new": lambda d: sessionize(d, gap_s=1800),
        "cumsum_old": lambda d: old_cumsum(d),
        "cumsum_new": lambda d: cumulative_sum_by_key(d),
    }
    best: dict[str, float] = {}
    rows: dict[str, int] = {}
    for rep in range(REPS):
        for name, fn in variants.items():  # interleaved within each rep
            ds = ray.data.from_arrow(tbl).repartition(64)
            gc.collect()
            t0 = time.time()
            n = fn(ds).count()
            dt = time.time() - t0
            best[name] = min(best.get(name, 1e9), dt)
            rows[name] = n
            print(f"rep{rep} {name}: {dt:.2f}s ({n} rows)", flush=True)
    assert rows["sessionize_old"] == rows["sessionize_new"]
    assert rows["cumsum_old"] == rows["cumsum_new"]
    print(
        {
            "n_events": N,
            "n_users": USERS,
            **{k: round(v, 2) for k, v in best.items()},
            "sessionize_speedup": round(
                best["sessionize_old"] / best["sessionize_new"], 2
            ),
            "cumsum_speedup": round(best["cumsum_old"] / best["cumsum_new"], 2),
        }
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
