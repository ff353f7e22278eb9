"""Direct window-kernel properties: timestamp-unit independence and
key-run integrity across blocks (the sort-boundary hazard class)."""

import numpy as np
import pyarrow as pa
import ray.data

from logpipe_ray.stages.window import sessionize


def _events(unit: str) -> pa.Table:
    # user 1: events at 0s, 10s, 3000s (gap 1800s → two sessions)
    # user 2: events at 5s, 6s (one session)
    ticks = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[unit]
    ts = np.array([0, 10, 3000, 5, 6], dtype=np.int64) * ticks
    return pa.table(
        {
            "user_id": pa.array([1, 1, 1, 2, 2], type=pa.int64()),
            "ts": pa.array(ts).cast(pa.timestamp(unit)),
            "value": pa.array([1.0, 2.0, 3.0, 4.0, 5.0]),
            "event_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
        }
    )


def _sessions(tbl: pa.Table):
    ds = ray.data.from_arrow(tbl).repartition(2)
    out = sessionize(ds, gap_s=1800).take_all()
    return sorted((r["user_id"], r["session_id"], r["n_events"]) for r in out)


def test_sessionize_unit_independent(ray_session):
    """timestamp[s]/[ms]/[us]/[ns] inputs must sessionize identically —
    the gap threshold scales with the column unit (a hardcoded 1e6
    would collapse ms input to one session and shatter ns input)."""
    expect = _sessions(_events("us"))
    assert expect == [(1, 0, 2), (1, 1, 1), (2, 0, 2)]
    for unit in ("s", "ms", "ns"):
        assert _sessions(_events(unit)) == expect, unit


def test_sessionize_many_keys_across_blocks(ray_session):
    """2000 keys spread over 16 input blocks: per-key session counts
    must match a brute-force single-machine computation exactly (a key
    run split across sort ranges would create phantom sessions)."""
    rng = np.random.RandomState(11)
    n, users, gap_s = 20000, 2000, 100
    u = rng.randint(0, users, n).astype(np.int64)
    ts = rng.randint(0, 10**6, n).astype(np.int64)  # seconds
    tbl = pa.table(
        {
            "user_id": pa.array(u),
            "ts": pa.array(ts * 10**6).cast(pa.timestamp("us")),
            "value": pa.array(np.ones(n)),
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
        }
    )
    got = sessionize(
        ray.data.from_arrow(tbl).repartition(16), gap_s=gap_s
    ).take_all()
    n_sessions_got = len(got)
    # brute force
    brute = 0
    import collections

    by_u = collections.defaultdict(list)
    for uu, tt in zip(u, ts):
        by_u[uu].append(tt)
    for uu, tts in by_u.items():
        tts.sort()
        brute += 1 + sum(
            1 for a, b in zip(tts, tts[1:]) if (b - a) > gap_s
        )
    assert n_sessions_got == brute
    assert sum(r["n_events"] for r in got) == n
