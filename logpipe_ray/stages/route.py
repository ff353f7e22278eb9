"""Routing fan-out: salting + the per-sink partitioned Parquet writer.

The writer is the Ray-native analog of logpipe's merge-by-filename file
sink (logpipe-output-file.c:207-314: open-or-create ``path/filename``,
cached handle, append block) and the fan-out-to-all-outputs rule
(src/output.c:256-277). Parquet can't append, so "append" becomes
"add a part file to the sink's directory"; the handle cache becomes
grouping one batch by sink and writing one part per sink per batch.

Implemented as a *stateless map_batches task stage* (not Ray's built-in
``write_parquet(partition_cols=...)``): measured 20-40× less CPU per
block — the built-in datasink calls ``pyarrow.dataset.write_dataset``
with ``use_threads=True`` from every 1-CPU task, thrashing the Arrow
thread pool at high task counts. Here each task does plain
``pq.write_table`` per sink group with zstd-1 (for this payload:
faster than snappy AND ~4× smaller — token values < 50257 have ~2
bytes of entropy per int32).

The stage **returns per-batch counter partials** (source, sink, n_rows,
sum_n_tok), so the forwarded-record counters come from the same single
pass that wrote the data — mirroring the reference's
commit-after-write counter semantics (src/output.c:280-302) without a
second read of the output.

Idempotency: the part filename is a content hash (first/last doc_id +
row count), so a retried task overwrites its own file instead of
duplicating rows (SURVEY.md §4 "retries").
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def _resolve_fs(out_dir: str):
    """(filesystem, path) for ``out_dir`` — the remote-sink analog of
    logpipe-output-hdfs (logpipe-output-hdfs.c:343-429: same writer, a
    filesystem handle instead of open(2)). A URI (``memory://``,
    ``s3://``, ``hdfs://`` …) resolves through fsspec (pyarrow accepts
    fsspec filesystems in ``pq.write_table``); a plain path stays on
    the local filesystem (``None`` → pyarrow's default)."""
    if "://" in out_dir:
        import fsspec

        return fsspec.core.url_to_fs(out_dir)
    return None, out_dir


def _sink_groups(batch: pa.Table, sink_col: str):
    """Yield (sink_value, subtable) pairs via dictionary-encode + mask.

    Kept as one masked ``filter`` per sink: the alternative (single
    stable argsort + full-table ``take`` + zero-copy run slices) was
    measured 20% SLOWER on 150k-row batches with 5 sinks — a scattered
    permutation gather on a list column rebuilds offsets row-wise,
    while boolean filters copy mask runs. Per-sink masks win while
    sinks are few; revisit only if sink cardinality grows large."""
    enc = pc.dictionary_encode(batch[sink_col])
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    indices = enc.indices.to_numpy(zero_copy_only=False)
    for code, sink in enumerate(enc.dictionary.to_pylist()):
        mask = indices == code
        yield sink, batch.filter(pa.array(mask))


def write_routed_batch(
    batch: pa.Table,
    *,
    out_dir: str,
    sink_col: str = "sink",
    source_col: str = "source",
    n_tok_col: str = "n_tok",
    id_col: str = "doc_id",
    compression: str = "zstd",
    compression_level: int = 1,
    drop_cols: tuple[str, ...] | None = None,
    file_tag: str | None = None,
    roll_bytes: int = 256 << 20,
) -> pa.Table:
    """Write one batch fanned out to ``{out_dir}/sink=<sink>/part-*.parquet``;
    return the batch's counter partials (source, sink, n_rows, sum_n_tok).

    The ``sink`` column is dropped from the data files by default — the
    hive path is authoritative (reading the directory re-derives it),
    exactly like the reference encodes the route in the output filename.

    **Size-targeted rotation** (the rotate_size analog of
    logpipe-output-file.c:160-205): a sink's slice larger than
    ``roll_bytes`` (in-memory Arrow bytes — an upper bound on the file)
    is split into rolled part files, so no output file exceeds the
    target no matter how large the writer batch is. The matching lower
    bound comes from the writer stage's batch size (``run_fused`` feeds
    this stage ~128k-row batches) — together: few, bounded-size files
    instead of one small file per 16k-row batch per sink.
    """
    if drop_cols is None:
        drop_cols = (sink_col,)
    fs, base = _resolve_fs(out_dir)
    part_sources, part_sinks, part_rows, part_sums = [], [], [], []
    for sink, sub in _sink_groups(batch, sink_col):
        sink_dir = (
            f"{base.rstrip('/')}/sink={sink}"
            if fs is not None
            else os.path.join(base, f"sink={sink}")
        )
        if fs is not None:
            fs.makedirs(sink_dir, exist_ok=True)
        else:
            os.makedirs(sink_dir, exist_ok=True)
        if file_tag is not None:
            # caller-supplied deterministic tag (e.g. the fragment id in
            # the resumable runner) — one file per sink per fragment
            tag = file_tag
        else:
            ids = sub[id_col]
            tag = hashlib.sha1(
                f"{ids[0].as_py()}|{ids[-1].as_py()}|{sub.num_rows}".encode()
            ).hexdigest()[:16]
        data = sub.drop_columns(list(drop_cols)) if drop_cols else sub
        n_slices = max(1, -(-data.nbytes // roll_bytes))  # ceil
        rows_per = -(-data.num_rows // n_slices)
        for si in range(n_slices):
            part = data.slice(si * rows_per, rows_per)
            if part.num_rows == 0:
                continue
            name = (
                f"part-{tag}.parquet"
                if n_slices == 1
                else f"part-{tag}-r{si:04d}.parquet"
            )
            dest = (
                f"{sink_dir}/{name}" if fs is not None else os.path.join(sink_dir, name)
            )
            pq.write_table(
                part,
                dest,
                filesystem=fs,
                compression=compression,
                compression_level=compression_level,
                use_dictionary=False,
                row_group_size=65536,
            )
        # counter partials for this (sink, source) pair set
        g = (
            sub.select([source_col, n_tok_col])
            .group_by([source_col])
            .aggregate([(n_tok_col, "sum"), (n_tok_col, "count")])
        )
        part_sources.extend(g[source_col].to_pylist())
        part_sinks.extend([sink] * g.num_rows)
        part_rows.extend(g[f"{n_tok_col}_count"].to_pylist())
        part_sums.extend(g[f"{n_tok_col}_sum"].to_pylist())
    return pa.table(
        {
            "source": pa.array(part_sources, type=pa.string()),
            "sink": pa.array(part_sinks, type=pa.string()),
            "n_rows": pa.array(part_rows, type=pa.int64()),
            "sum_n_tok": pa.array(part_sums, type=pa.int64()),
        }
    )


def add_salt(
    batch: pa.Table,
    *,
    hot_keys: frozenset[str] | set[str],
    key_col: str = "source",
    id_col: str = "doc_id",
    buckets: int = 16,
    out_col: str = "salt",
) -> pa.Table:
    """Salt column for skewed keys before a key-partitioned shuffle.

    Rows of hot keys get ``hash(id) % buckets``; others 0 — so a
    ``repartition``/groupby on (key, salt) splits a hot key across
    ``buckets`` partitions while cold keys stay in one (SURVEY.md §4
    "skew / hot file"; reference analog: max_append_count starvation
    guard, logpipe-input-file.c:400-422).
    """
    import pandas as pd

    keys = batch[key_col].to_numpy(zero_copy_only=False)
    is_hot = np.isin(keys, list(hot_keys))
    salt = np.zeros(batch.num_rows, dtype=np.int32)
    if is_hot.any():
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        # deterministic vectorized hash (builtin hash() is per-process
        # salted by PYTHONHASHSEED — never use it across workers)
        h = pd.util.hash_array(ids[is_hot].astype(object))
        salt[is_hot] = (h % buckets).astype(np.int32)
    return batch.append_column(out_col, pa.array(salt, type=pa.int32()))
