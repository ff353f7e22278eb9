"""Log-file text source: files → (source, line_no, byte_offset, line) rows.

The Ray-native restatement of logpipe's file input + line splitting:

- file discovery with include/exclude globs and the `.`/`_` prefix skip
  (logpipe-input-file.c:593-739 glob screens, :584-588 prefix skip,
  matcher IsMatchString :478-529);
- the stream key is the file name (``source``), as in the reference's
  filename routing key (src/logpipe_in.h:140-141);
- per-file ``line_no`` (1-based) and ``byte_offset`` counters — the
  ``trace_line`` / ``trace_offset`` analogs (logpipe-input-file.c:10-36);
- line re-chunking = the SplitLineBuffer tool (src/util.c:585-666),
  here a vectorized split over whole-file payloads.

Each input file becomes one ``read_binary_files`` row, split into line
rows by a vectorized ``map_batches`` — per-file order and counters are
exact because the whole file is split in one task (the reference's
single-threaded per-file loop gives the same guarantee). Files larger
than a block should be pre-chunked upstream; log files are rotated
small by the reference's own design (rotate_size).
"""

from __future__ import annotations

import fnmatch
import os

import numpy as np
import pyarrow as pa
import ray.data

LINE_SCHEMA = pa.schema(
    [
        ("source", pa.string()),
        ("line_no", pa.int64()),
        ("byte_offset", pa.int64()),
        ("line", pa.string()),
    ]
)


def match_files(
    names: list[str],
    *,
    include: list[str] | None = None,
    exclude: list[str] | None = None,
    skip_hidden: bool = True,
) -> list[str]:
    """Reference glob screening: include then exclude patterns, plus the
    `.`/`_` prefix skip (logpipe-input-file.c:584-739)."""
    out = []
    for n in names:
        base = os.path.basename(n)
        if skip_hidden and base[:1] in (".", "_"):
            continue
        if include and not any(fnmatch.fnmatch(base, p) for p in include):
            continue
        if exclude and any(fnmatch.fnmatch(base, p) for p in exclude):
            continue
        out.append(n)
    return out


def split_file_to_lines(batch: pa.Table) -> pa.Table:
    """(path, bytes) rows → line rows with per-file counters (vectorized)."""
    sources, line_nos, offsets, lines = [], [], [], []
    for path, payload in zip(batch["path"].to_pylist(), batch["bytes"].to_pylist()):
        source = os.path.basename(path)
        text = payload.decode("utf-8")
        raw = text.split("\n")
        if raw and raw[-1] == "":
            raw = raw[:-1]  # trailing newline
        lens = np.fromiter(
            (len(line.encode()) + 1 for line in raw), dtype=np.int64, count=len(raw)
        )
        offs = np.zeros(len(raw), dtype=np.int64)
        if len(raw) > 1:
            np.cumsum(lens[:-1], out=offs[1:])
        sources.extend([source] * len(raw))
        line_nos.extend(range(1, len(raw) + 1))
        offsets.extend(offs.tolist())
        lines.extend(raw)
    return pa.Table.from_arrays(
        [
            pa.array(sources, type=pa.string()),
            pa.array(line_nos, type=pa.int64()),
            pa.array(offsets, type=pa.int64()),
            pa.array(lines, type=pa.string()),
        ],
        schema=LINE_SCHEMA,
    )


def read_log_lines(
    dir_or_paths: str | list[str],
    *,
    include: list[str] | None = None,
    exclude: list[str] | None = None,
) -> ray.data.Dataset:
    """Directory of log files → Dataset of line rows (schema above)."""
    if isinstance(dir_or_paths, str):
        names = sorted(
            os.path.join(dir_or_paths, n) for n in os.listdir(dir_or_paths)
        )
    else:
        names = list(dir_or_paths)
    paths = match_files(names, include=include, exclude=exclude)
    ds = ray.data.read_binary_files(paths, include_paths=True)
    return ds.map_batches(split_file_to_lines, batch_format="pyarrow")
