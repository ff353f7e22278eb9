"""Extra columnar file sources: ORC and Arrow IPC (Feather V2).

Ray Data has no built-in reader for these (2.49), so both use the
standard file-parallel work-list shape (the same pattern as the
resumable runner and the text sources): one row per file in a
``from_items`` Dataset, expanded by a ``map_batches`` task that decodes
the file with the pyarrow reader — the streaming executor schedules
one task per file with backpressure, so a directory of N shards reads
N-wide with no driver-side I/O. ``columns`` prunes at the decoder
(both formats are columnar — untouched columns are never materialized;
ORC skips stripes column-wise, IPC buffers are memory-mapped).

At 100 TB these behave like the parquet path: per-file tasks,
column-pruned decode, no object-store transit of undecoded bytes.
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data


def _dir_files(path: str, ext: str) -> list[str]:
    files = sorted(
        os.path.join(path, n)
        for n in os.listdir(path)
        if n.endswith(ext) and not n.startswith((".", "_"))
    )
    if not files:
        raise FileNotFoundError(f"no *{ext} files under {path!r}")
    return files


def read_orc_dir(
    path: str, *, columns: list[str] | None = None
) -> ray.data.Dataset:
    """File-parallel ORC directory read (one decode task per file)."""

    def expand(b: pa.Table) -> pa.Table:
        from pyarrow import orc

        tables = [
            orc.ORCFile(p).read(columns=columns)
            for p in b["path"].to_pylist()
        ]
        return pa.concat_tables(tables)

    items = [{"path": p} for p in _dir_files(path, ".orc")]
    return ray.data.from_items(items).map_batches(
        expand, batch_format="pyarrow", batch_size=1
    )


def read_ipc_dir(
    path: str, *, columns: list[str] | None = None
) -> ray.data.Dataset:
    """File-parallel Arrow IPC / Feather-V2 directory read."""

    def expand(b: pa.Table) -> pa.Table:
        from pyarrow import feather

        tables = [
            feather.read_table(p, columns=columns, memory_map=True)
            for p in b["path"].to_pylist()
        ]
        return pa.concat_tables(tables)

    items = [{"path": p} for p in _dir_files(path, ".arrow")]
    return ray.data.from_items(items).map_batches(
        expand, batch_format="pyarrow", batch_size=1
    )
