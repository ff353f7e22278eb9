"""Unit tests for the non-equi joins (stages/joins.py): broadcast
interval join (overlap / no-match semantics) and the banded
time-proximity join (boundary inclusivity, zero-match lefts, bucket
replication across block splits)."""

import numpy as np
import pyarrow as pa
import ray.data

from logpipe_ray.stages.joins import band_join_count, broadcast_range_join


def _tiers():
    return pa.table(
        {
            "lo": pa.array([0, 10, 20], pa.int64()),
            "hi": pa.array([10, 25, 30], pa.int64()),  # [10,25) ∩ [20,30) overlap
            "tier": pa.array(["a", "b", "c"]),
        }
    )


def test_broadcast_range_join_overlap_and_miss():
    ds = ray.data.from_arrow(
        pa.table({"id": pa.array([1, 2, 3, 4], pa.int64()),
                  "v": pa.array([5, 22, 30, 12], pa.int64())})
    )
    out = broadcast_range_join(ds, _tiers(), value_col="v").to_pandas()
    got = sorted(zip(out["id"], out["tier"]))
    # v=5 → a; v=22 → b AND c (overlap); v=30 → no tier (hi exclusive);
    # v=12 → b
    assert got == [(1, "a"), (2, "b"), (2, "c"), (4, "b")]


def test_broadcast_range_join_no_match_batch_typed():
    # A batch where NO row matches any interval must still return a
    # TYPED empty table (schema = batch + label cols) — schema-less
    # empties are the crash class documented in stages/smallagg. (A
    # fully empty input Dataset is out of scope: Ray's plan_udf_map_op
    # skips empty blocks before the UDF runs.)
    import ray as _ray

    from logpipe_ray.stages.joins import BroadcastRangeJoiner

    joiner = BroadcastRangeJoiner(_ray.put(_tiers()), value_col="v")
    batch = pa.table(
        {"id": pa.array([9], pa.int64()), "v": pa.array([99], pa.int64())}
    )
    out = joiner(batch)
    assert out.num_rows == 0
    assert out.column_names == ["id", "v", "tier"]
    assert out.schema.field("tier").type == pa.string()


def test_broadcast_range_join_disjoint_fast_path_matches_general():
    # Sorted non-overlapping tiers take the searchsorted path; result
    # must equal the general per-interval-mask path on the same input.
    import ray as _ray

    from logpipe_ray.stages.joins import BroadcastRangeJoiner

    tiers = pa.table(
        {
            "lo": pa.array([0, 10, 25], pa.int64()),
            "hi": pa.array([10, 20, 30], pa.int64()),  # gap [20,25)
            "tier": pa.array(["a", "b", "c"]),
        }
    )
    rng = np.random.default_rng(3)
    vals = rng.integers(-5, 35, 500)
    batch = pa.table(
        {"id": pa.array(np.arange(500), pa.int64()),
         "v": pa.array(vals, pa.int64())}
    )
    fast = BroadcastRangeJoiner(_ray.put(tiers), value_col="v")
    assert fast._resolve_plan(tiers)[0] is True
    general = BroadcastRangeJoiner(_ray.put(tiers), value_col="v")
    general._plan = (False, None, None)
    a = fast(batch).sort_by([("id", "ascending"), ("tier", "ascending")])
    b = general(batch).sort_by([("id", "ascending"), ("tier", "ascending")])
    assert a.equals(b)
    # spot semantics: gap values and out-of-range match nothing
    matched = set(a["id"].to_pylist())
    for i, v in enumerate(vals):
        assert (int(i) in matched) == (0 <= v < 20 or 25 <= v < 30)


def test_broadcast_range_join_empty_intervals_matches_nothing():
    import ray as _ray

    from logpipe_ray.stages.joins import BroadcastRangeJoiner

    empty = _tiers().slice(0, 0)
    joiner = BroadcastRangeJoiner(_ray.put(empty), value_col="v")
    out = joiner(
        pa.table({"id": pa.array([1], pa.int64()), "v": pa.array([5], pa.int64())})
    )
    assert out.num_rows == 0
    assert out.column_names == ["id", "v", "tier"]


def test_band_join_count_boundaries_and_zero_matches():
    # delta=10; left at t=100 with rights at 90 and 110 (both inclusive),
    # 89 and 111 (both out); a second left with NO rights at all; a third
    # left whose only match sits in the neighbor bucket.
    left = ray.data.from_arrow(
        pa.table(
            {
                "key": pa.array([1, 1, 2, 3], pa.int64()),
                "t": pa.array([100, 500, 100, 9], pa.int64()),
                "id": pa.array([10, 11, 12, 13], pa.int64()),
            }
        )
    )
    right = ray.data.from_arrow(
        pa.table(
            {
                "key": pa.array([1, 1, 1, 1, 3], pa.int64()),
                "t": pa.array([90, 110, 89, 111, 10], pa.int64()),
            }
        )
    )
    out = band_join_count(left, right, delta=10).to_pandas()
    got = dict(zip(out["id"], out["n_matches"]))
    assert got == {10: 2, 11: 0, 12: 0, 13: 1}


def test_band_join_count_matches_bruteforce_random():
    rng = np.random.default_rng(7)
    n_l, n_r, delta = 400, 600, 50
    lk = rng.integers(0, 8, n_l)
    lt = rng.integers(0, 2000, n_l)
    rk = rng.integers(0, 8, n_r)
    rt = rng.integers(0, 2000, n_r)
    left = ray.data.from_arrow(
        pa.table(
            {
                "key": pa.array(lk, pa.int64()),
                "t": pa.array(lt, pa.int64()),
                "id": pa.array(np.arange(n_l), pa.int64()),
            }
        )
    )
    right = ray.data.from_arrow(
        pa.table({"key": pa.array(rk, pa.int64()), "t": pa.array(rt, pa.int64())})
    ).repartition(7)  # force candidates to span read blocks
    out = band_join_count(left.repartition(5), right, delta=delta).to_pandas()
    got = dict(zip(out["id"], out["n_matches"]))
    brute = {
        i: int(np.sum((rk == lk[i]) & (np.abs(rt - lt[i]) <= delta)))
        for i in range(n_l)
    }
    assert got == brute
