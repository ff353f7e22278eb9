"""Kill-and-resume: manifest-based exactly-once per fragment (FIXTURES oracle 3)."""

import glob
import shutil
import tempfile
from collections import Counter

import pyarrow.parquet as pq
import pytest
import ray.data

from logpipe_ray.pipelines.resumable import run_resumable
from logpipe_ray.sources.sequences import synthesize_sequences
from logpipe_ray.state.manifest import frag_id, load_manifest, pending_fragments


@pytest.fixture(scope="module")
def fragmented_input(sf_dir):
    """The sequences table written as 4 parquet fragments."""
    d = tempfile.mkdtemp(prefix="lpr_frags_")
    ds = synthesize_sequences(sf_dir)
    ds.repartition(4).write_parquet(d)
    paths = sorted(glob.glob(d + "/*.parquet"))
    assert len(paths) >= 4
    yield paths
    shutil.rmtree(d, ignore_errors=True)


def _counters_oracle(paths):
    import duckdb

    from logpipe_ray.routes import DEFAULT_ROUTE, default_route_table

    routes = default_route_table()
    con = duckdb.connect()
    agg = {}
    for p in paths:
        t = pq.read_table(p, columns=["source", "n_tok"])
        df = t.to_pandas()
        for (src,), g in df.groupby(["source"]):
            sink = routes.get(src, DEFAULT_ROUTE)["sink"]
            key = (src, sink)
            a = agg.setdefault(key, [0, 0])
            a[0] += len(g)
            a[1] += int(g["n_tok"].sum())
    con.close()
    return {k: tuple(v) for k, v in agg.items()}


def test_full_run_counters_match(fragmented_input):
    out = tempfile.mkdtemp(prefix="lpr_resume_full_")
    counters = run_resumable(fragmented_input, out, make_sequences=False)
    got = {(c["source"], c["sink"]): (c["n_rows"], c["sum_n_tok"]) for c in counters}
    assert got == _counters_oracle(fragmented_input)
    assert len(load_manifest(out)) == len(fragmented_input)
    shutil.rmtree(out, ignore_errors=True)


def test_kill_and_resume_no_dupes_no_loss(fragmented_input):
    out = tempfile.mkdtemp(prefix="lpr_resume_kill_")
    # fail two specific fragments on the first run
    fail = frozenset(frag_id(p) for p in fragmented_input[2:])
    with pytest.raises(Exception):
        run_resumable(fragmented_input, out, make_sequences=False, fail_on=fail)
    done_after_crash = load_manifest(out)
    # crash-abort may cancel in-flight good fragments; only guarantee:
    # the failed ones are NOT committed
    assert len(done_after_crash) < len(fragmented_input)
    assert not (fail & set(done_after_crash))
    pend = pending_fragments(out, fragmented_input)
    assert len(pend) == len(fragmented_input) - len(done_after_crash)

    # resume: only pending fragments run; counters whole and exact
    counters = run_resumable(fragmented_input, out, make_sequences=False)
    got = {(c["source"], c["sink"]): (c["n_rows"], c["sum_n_tok"]) for c in counters}
    assert got == _counters_oracle(fragmented_input)

    # routed rows: multiset of doc_ids in sink dirs == input, no dupes
    routed = Counter()
    for f in glob.glob(out + "/sink=*/*.parquet"):
        routed.update(pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist())
    expected = Counter()
    for p in fragmented_input:
        expected.update(pq.read_table(p, columns=["doc_id"])["doc_id"].to_pylist())
    assert routed == expected
    shutil.rmtree(out, ignore_errors=True)


def test_rerun_is_noop(fragmented_input):
    out = tempfile.mkdtemp(prefix="lpr_resume_noop_")
    c1 = run_resumable(fragmented_input, out, make_sequences=False)
    files1 = sorted(glob.glob(out + "/sink=*/*.parquet"))
    c2 = run_resumable(fragmented_input, out, make_sequences=False)
    files2 = sorted(glob.glob(out + "/sink=*/*.parquet"))
    assert c1 == c2
    assert files1 == files2
    shutil.rmtree(out, ignore_errors=True)


def test_full_dose_reprocesses_without_dupes(fragmented_input):
    """full_dose=True re-runs every fragment; deterministic file names
    mean overwrite, not duplication (start_once_for_full_dose analog)."""
    out = tempfile.mkdtemp(prefix="lpr_fulldose_")
    c1 = run_resumable(fragmented_input, out, make_sequences=False)
    files1 = sorted(glob.glob(out + "/sink=*/*.parquet"))
    c2 = run_resumable(
        fragmented_input, out, make_sequences=False, full_dose=True
    )
    files2 = sorted(glob.glob(out + "/sink=*/*.parquet"))
    assert c1 == c2 and files1 == files2
    shutil.rmtree(out, ignore_errors=True)


def test_metrics_table(fragmented_input):
    from logpipe_ray.state.manifest import metrics_table

    out = tempfile.mkdtemp(prefix="lpr_metrics_")
    run_resumable(fragmented_input, out, make_sequences=False)
    m = metrics_table(out)
    assert m.num_rows == len(fragmented_input)
    assert m["n_rows"].to_pylist() and sum(m["n_rows"].to_pylist()) == 6000
    assert all(len(d) == 16 for d in m["doc_digest"].to_pylist())
    shutil.rmtree(out, ignore_errors=True)
