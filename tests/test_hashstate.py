"""HashStateStore: bounded segment count under many ticks, identical
dedup output to a never-compacted store, crash-leftover GC."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from logpipe_ray.state.hashstate import HashStateStore


def _tick_batch(rng, tick, seen_pool):
    """Some brand-new hashes + some re-sends of earlier ticks' hashes."""
    fresh = [tick * 1000 + j for j in range(rng.randint(5, 40))]
    resend = (
        [int(x) for x in rng.choice(seen_pool, size=min(10, len(seen_pool)), replace=False)]
        if len(seen_pool)
        else []
    )
    return fresh, resend


def test_bounded_segments_25_ticks_identical_dedup():
    """25 ticks of an ingest loop against (a) the compacted store and
    (b) a naive one-file-per-tick reference: per-tick ingested sets
    must be IDENTICAL, and the compacted store's live file count must
    stay ≤ max_segments at every tick (the reference grows to 25)."""
    import tempfile

    rng = np.random.RandomState(3)
    da = tempfile.mkdtemp(prefix="hs_a_")
    db = tempfile.mkdtemp(prefix="hs_b_")
    store = HashStateStore(da, max_segments=6)
    seen_pool: list[int] = []
    naive_files: list[str] = []
    max_live = 0

    for tick in range(25):
        fresh, resend = _tick_batch(rng, tick, np.array(seen_pool))
        arriving = fresh + resend

        # (a) compacted store membership
        files = store.files()
        state_a = (
            set(
                pq.read_table(files)["text_hash"].to_pylist()
            )
            if files
            else set()
        )
        ingest_a = sorted(set(h for h in arriving if h not in state_a))

        # (b) naive per-tick files
        state_b = (
            set(pq.read_table(naive_files)["text_hash"].to_pylist())
            if naive_files
            else set()
        )
        ingest_b = sorted(set(h for h in arriving if h not in state_b))

        assert ingest_a == ingest_b == sorted(set(fresh))
        tbl = pa.table({"text_hash": pa.array(ingest_a, type=pa.int64())})
        store.append(tbl)
        p = os.path.join(db, f"tick-{tick}.parquet")
        pq.write_table(tbl, p)
        naive_files.append(p)
        seen_pool.extend(fresh)

        n_live = len(store.files())
        max_live = max(max_live, n_live)
        assert n_live <= 6, f"tick {tick}: {n_live} live segments"
        # every live file exists on disk; no dead files linger
        on_disk = {
            f for f in os.listdir(da) if f.startswith("seg-")
        }
        assert on_disk == {os.path.basename(f) for f in store.files()}

    assert len(naive_files) == 25  # the shape being avoided
    # final content identical (multiset equality — appends are sets here)
    a = sorted(store.read_all()["text_hash"].to_pylist())
    b = sorted(pq.read_table(naive_files)["text_hash"].to_pylist())
    assert a == b
    assert max_live <= 6


def test_crash_leftover_segment_gc():
    """A segment file written but never committed to the manifest (crash
    between write and commit) is invisible to files() and removed by
    the next append."""
    import tempfile

    d = tempfile.mkdtemp(prefix="hs_c_")
    store = HashStateStore(d, max_segments=4)
    store.append(pa.table({"text_hash": pa.array([1, 2], type=pa.int64())}))
    orphan = os.path.join(d, "seg-999999999999.parquet")
    pq.write_table(pa.table({"text_hash": pa.array([99], type=pa.int64())}), orphan)
    assert orphan not in store.files()
    store.append(pa.table({"text_hash": pa.array([3], type=pa.int64())}))
    assert not os.path.exists(orphan)
    assert sorted(store.read_all()["text_hash"].to_pylist()) == [1, 2, 3]


def test_compaction_preserves_rows_across_merges():
    import tempfile

    d = tempfile.mkdtemp(prefix="hs_m_")
    store = HashStateStore(d, max_segments=3)
    expect = []
    for i in range(12):
        rows = list(range(i * 100, i * 100 + i + 1))
        expect += rows
        store.append(pa.table({"text_hash": pa.array(rows, type=pa.int64())}))
        assert len(store.files()) <= 3
    assert sorted(store.read_all()["text_hash"].to_pylist()) == sorted(expect)


def test_model_random_appends_with_injected_commit_failures(tmp_path):
    """Model-based check: across a random interleaving of appends,
    injected commit crashes, and retries, the store's multiset of rows
    always equals exactly the successfully-committed appends — crashes
    lose the in-flight append only (never committed state), retries
    re-add it, file count stays bounded, and no orphan outlives the
    next successful append."""
    import collections
    import os
    import random

    import pyarrow as pa

    from logpipe_ray.state.hashstate import HashStateStore

    rng = random.Random(20260819)
    store = HashStateStore(str(tmp_path / "hs"), max_segments=4)
    model: collections.Counter = collections.Counter()
    next_val = 0
    for step in range(60):
        n = rng.randint(0, 5)
        rows = list(range(next_val, next_val + n))
        next_val += n
        t = pa.table({"v": pa.array(rows, type=pa.int64())})
        crash = rng.random() < 0.3
        if crash:
            store.fail_next_commits = 1
            try:
                store.append(t)
                raise AssertionError("injected commit failure did not fire")
            except OSError:
                pass
            # crashed append must NOT be visible; retry it
            got = collections.Counter(
                store.read_all()["v"].to_pylist()
                if store.read_all().num_columns
                else []
            )
            assert got == model, f"step {step}: crash leaked rows"
        store.append(t)
        model.update(rows)
        got = collections.Counter(
            store.read_all()["v"].to_pylist()
            if store.read_all().num_columns
            else []
        )
        assert got == model, f"step {step}: mismatch after append"
        segs = [
            f for f in os.listdir(store.state_dir) if f.startswith("seg-")
        ]
        assert len(segs) <= store.max_segments + 0, segs  # GC'd + bounded
        live = {os.path.basename(p) for p in store.files()}
        assert set(segs) == live  # no orphans survive a successful append
