"""Kill-mid-tick chaos tests for the ingest loop (pipelines/ingest.py).

Each test crashes one tick at a specific durability boundary, then
re-runs the tick and asserts the documented at-least-once +
dedup-absorbs contract converges to the oracle:

- the hash state's distinct (source, text_hash) set equals the distinct
  set of everything ever appended (nothing lost, nothing phantom);
- the routed output, deduped by text_hash (what downstream consumers
  do), equals that same set — duplicates may exist, losses may not;
- a follow-up tick that re-appends already-ingested lines ingests
  nothing (the membership check absorbs the replay).
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from logpipe_ray.pipelines.ingest import IngestCrash, ingest_tick
from logpipe_ray.sources.stream import DirectoryTailSource
from logpipe_ray.state.hashstate import HashStateStore

LINES_T1 = [("a.log", f"alpha-{i}") for i in range(8)] + [
    ("b.log", f"beta-{i}") for i in range(5)
]
LINES_T2 = [("a.log", f"alpha2-{i}") for i in range(6)] + [
    ("a.log", "alpha-3"),  # replayed content → must dedup away
    ("b.log", "beta-1"),
]


@pytest.fixture()
def loop(tmp_path):
    logs = tmp_path / "logs"
    logs.mkdir()
    store = HashStateStore(str(tmp_path / "state"), max_segments=2)
    tail = DirectoryTailSource(
        str(logs), str(tmp_path / "_tailstate"), include=["*.log"]
    )
    outd = str(tmp_path / "out")

    def append(lines):
        by = {}
        for src, text in lines:
            by.setdefault(src, []).append(text)
        for src, ls in by.items():
            with open(logs / src, "a") as f:
                f.write("".join(x + "\n" for x in ls))

    return append, tail, store, outd


def _routed_rows(outd):
    rows = []
    for root, _d, files in os.walk(outd):
        for f in files:
            if f.endswith(".parquet"):
                t = pq.read_table(os.path.join(root, f), columns=["source", "text"])
                rows += list(zip(t["source"].to_pylist(), t["text"].to_pylist()))
    return rows


def _state_pairs(store):
    t = store.read_all()
    if t.num_columns == 0:
        return set()
    return set(zip(t["source"].to_pylist(), t["text_hash"].to_pylist()))


def _expect(lines_seen):
    return {(s.removesuffix(".log"), t) for s, t in lines_seen}


def _assert_converged(store, outd, all_lines):
    """Contract: state and deduped routed output both equal the oracle
    distinct set; routed output has no losses (dups allowed)."""
    expected = _expect(all_lines)
    routed = _routed_rows(outd)
    assert set(routed) == expected  # every distinct line present
    state = _state_pairs(store)
    assert len(state) >= len(expected)
    # state keys the same set: one hash row per distinct (source, text)
    # (dup hash ROWS allowed after a replay — membership sums absorb them)
    from logpipe_ray.stages.dedup import add_text_hash

    srcs, texts = zip(*expected)
    ht = add_text_hash(
        pa.table({"source": list(srcs), "text": list(texts)})
    )
    assert state == set(zip(ht["source"].to_pylist(), ht["text_hash"].to_pylist()))


def test_clean_two_ticks_baseline(ray_session, loop):
    append, tail, store, outd = loop
    append(LINES_T1)
    seen1, ing1 = ingest_tick(tail, store, outd, 1)
    assert sum(seen1.values()) == len(LINES_T1)
    assert sum(ing1.values()) == len(LINES_T1)
    append(LINES_T2)
    seen2, ing2 = ingest_tick(tail, store, outd, 2)
    assert sum(seen2.values()) == len(LINES_T2)
    assert sum(ing2.values()) == 6  # the 2 replayed lines dedup away
    _assert_converged(store, outd, LINES_T1 + LINES_T2)


def test_kill_between_segment_write_and_manifest_commit(ray_session, loop):
    """Crash INSIDE the state append: the segment file exists but the
    manifest never references it. The retry re-reads the lines
    (offsets uncommitted), re-routes them (duplicate output files —
    allowed), and the next successful append garbage-collects the
    orphan segment."""
    append, tail, store, outd = loop
    append(LINES_T1)
    ingest_tick(tail, store, outd, 1)
    append(LINES_T2)
    store.fail_next_commits = 1
    with pytest.raises(OSError, match="injected"):
        ingest_tick(tail, store, outd, 2)
    # orphan segment on disk, manifest unchanged
    seg_files = [f for f in os.listdir(store.state_dir) if f.startswith("seg-")]
    live = {os.path.basename(p) for p in store.files()}
    assert set(seg_files) - live  # at least one unreferenced orphan
    # retry the tick → converges; GC removed the orphan
    seen, ing = ingest_tick(tail, store, outd, 2)
    assert sum(seen.values()) == len(LINES_T2)
    assert sum(ing.values()) == 6
    _assert_converged(store, outd, LINES_T1 + LINES_T2)
    seg_files = set(os.listdir(store.state_dir))
    assert all(
        os.path.basename(p) in seg_files for p in store.files()
    ) and not {
        f for f in seg_files if f.startswith("seg-")
    } - {os.path.basename(p) for p in store.files()}


def test_kill_between_routed_append_and_state_append(ray_session, loop):
    """Crash after the routed append: output holds the tick's lines but
    neither state nor offsets advanced. The retry re-ingests the same
    lines. Routed part names are content-deterministic
    (stages/route.py sha1 of first|last id + row count), so a retry
    with identical batch boundaries OVERWRITES the same files —
    file-level idempotence; a retry with different boundaries (other
    parallelism) would instead duplicate rows, which downstream
    dedup-by-hash absorbs. Either way: no losses, state exact."""
    append, tail, store, outd = loop
    append(LINES_T1)
    ingest_tick(tail, store, outd, 1)
    append(LINES_T2)
    with pytest.raises(IngestCrash):
        ingest_tick(tail, store, outd, 2, fault="after_routed_append")
    crashed = _routed_rows(outd)
    assert len(crashed) == len(_expect(LINES_T1 + LINES_T2))  # appended pre-crash
    seen, ing = ingest_tick(tail, store, outd, 2)
    assert sum(seen.values()) == len(LINES_T2)
    # the retry's write_routed counters still report the 6 survivors
    assert sum(ing.values()) == 6
    routed = _routed_rows(outd)
    # identical retry → identical part names → overwrite, no dups
    assert sorted(routed) == sorted(crashed)
    _assert_converged(store, outd, LINES_T1 + LINES_T2)


def test_kill_between_state_append_and_offset_commit(ray_session, loop):
    """Crash after the state append: state knows the lines, offsets
    don't. The retry re-reads them and the membership check drops every
    one — the dedup-absorbs showcase: NO new routed rows, NO double
    count, convergence exact."""
    append, tail, store, outd = loop
    append(LINES_T1)
    ingest_tick(tail, store, outd, 1)
    append(LINES_T2)
    with pytest.raises(IngestCrash):
        ingest_tick(tail, store, outd, 2, fault="after_state_append")
    before = len(_routed_rows(outd))
    seen, ing = ingest_tick(tail, store, outd, 2)
    assert sum(seen.values()) == len(LINES_T2)  # re-read, all absorbed
    assert sum(ing.values()) == 0
    assert len(_routed_rows(outd)) == before  # nothing re-routed
    _assert_converged(store, outd, LINES_T1 + LINES_T2)
    # and a THIRD tick with no new lines is a clean no-op
    seen3, ing3 = ingest_tick(tail, store, outd, 3)
    assert sum(seen3.values()) == 0 and sum(ing3.values()) == 0
