"""Regression: CPU-count-dependent sizing at the DRIVER's cluster size.

The r2 dedup_minhash_lsh crash (ArrowInvalid: No match ... FieldRef.Name
(doc_id)) only reproduced at num_cpus=32: sizing join partitions from
cluster CPUs left hash partitions with zero blocks and no schema when
the candidate set was tiny (~50 rows into 32 partitions). The session
fixture runs at num_cpus=4, so this file exercises the fix two ways:

- pure unit tests of the ``join_partitions`` clamp policy;
- a subprocess running the REAL 16-band config under
  ``ray.init(num_cpus=32)`` — the driver's exact condition.
"""

import subprocess
import sys
import textwrap

from logpipe_ray.stages.joins import join_partitions


class TestJoinPartitionsPolicy:
    def test_small_side_clamps_requested(self):
        # a pinned 32 must not survive a 50-row small side
        assert join_partitions(requested=32, small_rows=50) == 2

    def test_small_side_clamps_default(self):
        assert join_partitions(small_rows=1) == 2
        assert join_partitions(small_rows=0) == 2  # degenerate, never empty-crash

    def test_large_side_keeps_parallelism(self):
        # a million-row side is capped by requested/cluster, not rows
        assert join_partitions(requested=16, small_rows=1_000_000) == 16

    def test_rows_per_partition_floor(self):
        # 640 rows / 64 rows-per-partition = 10 partitions max
        assert join_partitions(requested=32, small_rows=640) == 10

    def test_no_hint_defers_to_cluster(self):
        got = join_partitions(cap=16)
        assert 2 <= got <= 16


def test_minhash_lsh_16band_at_32_cpus():
    """The driver's exact failing condition from CORRECTNESS_r02: the
    default 16-band config at num_cpus=32 (tiny candidate set). Runs in
    a fresh subprocess because the pytest session owns a 4-CPU Ray."""
    code = textwrap.dedent(
        """
        import sys; sys.path.insert(0, "/root/repo")
        import ray
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
        import ray.data
        ray.data.DataContext.get_current().enable_progress_bars = False
        from logpipe_ray.pipelines.dedup_pipeline import minhash_lsh_pairs
        t = minhash_lsh_pairs("/root/testdata/sf0.001", threshold_bp=2000,
                              k=128, bands=16)
        assert t.num_rows > 0, "expected verified near-dup pairs"
        print("PAIRS", t.num_rows)
        ray.shutdown()
        """
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, f"stderr tail:\n{proc.stderr[-2000:]}"
    assert "PAIRS" in proc.stdout
