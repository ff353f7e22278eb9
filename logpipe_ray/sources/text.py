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

Files are read in byte-range CHUNKS (``chunk_bytes``) so a single huge
unrotated log cannot blow a task's memory — the SplitLineBuffer
cross-block carry (src/util.c:585-666) restated statelessly: a chunk
[s, e) owns exactly the lines whose first byte lies in [s, e), finds
them from the newline positions in [s-1, e), and reads forward past
``e`` only to finish its last owned line. No cross-task state; every
line is emitted exactly once. Exact per-file ``line_no`` needs the
line counts of earlier chunks — a cheap counting pass over multi-chunk
files computes per-chunk line bases first (single-chunk files skip it).
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
    """(path, bytes) rows → line rows with per-file counters (vectorized).

    Whole-file path, kept for payloads already materialized as bytes;
    the chunked reader below is the scale path."""
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


def _chunk_lines(path: str, start: int, end: int) -> tuple[int, list[bytes]]:
    """Lines OWNED by byte range [start, end) of ``path``.

    A line is owned iff its first byte p ∈ [start, end); p is 0 or one
    past a newline, so owned starts are found from the newlines in
    [start-1, end-1). The last owned line is finished by reading past
    ``end`` to its terminating newline (or EOF) — the stateless
    restatement of the reference's cross-block carry buffer.
    Returns (file_offset_of_first_owned_line, [line bytes...]).
    """
    with open(path, "rb") as f:
        read_from = max(0, start - 1)
        f.seek(read_from)
        buf = f.read(end - read_from)
        if start == 0:
            first_rel = 0
        else:
            # first owned line starts right after the first newline at
            # absolute position ≥ start-1 (i.e. rel 0) and < end-1
            nl = buf.find(b"\n", 0, end - 1 - read_from)
            if nl < 0:
                return end, []  # no line starts inside this chunk
            first_rel = nl + 1
        # finish the last owned line: extend until newline or EOF
        while buf and not buf.endswith(b"\n"):
            extra = f.read(1 << 16)
            if not extra:
                break
            cut = extra.find(b"\n")
            buf += extra if cut < 0 else extra[: cut + 1]
            if cut >= 0:
                break
        body = buf[first_rel:]
        if not body:
            return read_from + first_rel, []
        raw = body.split(b"\n")
        if raw and raw[-1] == b"":
            raw = raw[:-1]
        return read_from + first_rel, raw


def _line_rows(
    path: str, source: str, start: int, end: int, line_base: int
) -> pa.Table:
    first_off, raw = _chunk_lines(path, start, end)
    n = len(raw)
    lens = np.fromiter((len(r) + 1 for r in raw), dtype=np.int64, count=n)
    offs = np.full(n, first_off, dtype=np.int64)
    if n > 1:
        offs[1:] += np.cumsum(lens[:-1])
    return pa.Table.from_arrays(
        [
            pa.array([source] * n, type=pa.string()),
            pa.array(np.arange(line_base + 1, line_base + n + 1), type=pa.int64()),
            pa.array(offs, type=pa.int64()),
            pa.array([r.decode("utf-8") for r in raw], type=pa.string()),
        ],
        schema=LINE_SCHEMA,
    )


def read_log_lines(
    dir_or_paths: str | list[str],
    *,
    include: list[str] | None = None,
    exclude: list[str] | None = None,
    chunk_bytes: int = 64 << 20,
) -> ray.data.Dataset:
    """Directory of log files → Dataset of line rows (schema above).

    Files larger than ``chunk_bytes`` are read as independent byte-range
    chunks (see :func:`_chunk_lines`) so a 10 GB unrotated log streams
    through many tasks instead of one. Multi-chunk files get a cheap
    counting pre-pass to fix each chunk's starting ``line_no``; the
    common small-file case (every file ≤ chunk_bytes) skips it.
    """
    if isinstance(dir_or_paths, str):
        names = sorted(
            os.path.join(dir_or_paths, n) for n in os.listdir(dir_or_paths)
        )
    else:
        names = list(dir_or_paths)
    paths = match_files(names, include=include, exclude=exclude)

    chunks: list[dict] = []
    for p in paths:
        size = os.path.getsize(p)
        src = os.path.basename(p)
        if size == 0:
            continue
        for ci, s in enumerate(range(0, size, chunk_bytes)):
            chunks.append(
                {
                    "path": p,
                    "source": src,
                    "start": s,
                    "end": min(s + chunk_bytes, size),
                    "chunk": ci,
                }
            )

    multi = {c["path"] for c in chunks if c["chunk"] > 0}
    bases: dict[tuple[str, int], int] = {}
    if multi:
        # counting pre-pass (distributed): lines owned per chunk → the
        # driver folds the tiny per-chunk counts into line-number bases
        count_items = [c for c in chunks if c["path"] in multi]

        def count_chunk(b: pa.Table) -> pa.Table:
            ns = [
                len(_chunk_lines(p, s, e)[1])
                for p, s, e in zip(
                    b["path"].to_pylist(),
                    b["start"].to_pylist(),
                    b["end"].to_pylist(),
                )
            ]
            return pa.table(
                {
                    "path": b["path"],
                    "chunk": b["chunk"],
                    "n_lines": pa.array(ns, type=pa.int64()),
                }
            )

        counts = (
            ray.data.from_items(count_items)
            .map_batches(count_chunk, batch_format="pyarrow")
            .take_all()
        )
        running: dict[str, int] = {}
        for r in sorted(counts, key=lambda r: (r["path"], r["chunk"])):
            bases[(r["path"], r["chunk"])] = running.get(r["path"], 0)
            running[r["path"]] = running.get(r["path"], 0) + r["n_lines"]

    for c in chunks:
        c["line_base"] = bases.get((c["path"], c["chunk"]), 0)

    def expand(b: pa.Table) -> pa.Table:
        tables = [
            _line_rows(p, src, s, e, lb)
            for p, src, s, e, lb in zip(
                b["path"].to_pylist(),
                b["source"].to_pylist(),
                b["start"].to_pylist(),
                b["end"].to_pylist(),
                b["line_base"].to_pylist(),
            )
        ]
        if not tables:
            return LINE_SCHEMA.empty_table()
        return pa.concat_tables(tables)

    if not chunks:
        return ray.data.from_arrow(LINE_SCHEMA.empty_table())
    return ray.data.from_items(chunks).map_batches(
        expand, batch_format="pyarrow"
    )
