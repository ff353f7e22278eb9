"""Streaming-source skeleton: incremental tail of a growing log directory.

The batch restatement of logpipe's streaming inputs — the inotify tail
loop of logpipe-input-file.c (read-to-EOF per event, offsets carried in
TraceFile) and the poll loops of logpipe-input-exec.c:85-228 /
logpipe-input-kafka.c:96-252: each ``read()`` consumes exactly the bytes
that arrived since the last ``commit()``, as a normal Ray ``Dataset`` of
line rows.

Semantics:

- Progress = a per-file byte offset + line count, persisted atomically
  (write-temp + ``os.replace``, same discipline as state/manifest.py).
  Offsets are always LINE boundaries: bytes after the file's last
  newline are left unconsumed until the line is terminated — the
  reference's split-line carry (src/util.c:585-666), made durable.
- New/grown files are chunked with the same byte-range ownership rule
  as sources/text.py (a chunk owns lines starting inside it), so a huge
  append streams through many tasks.
- A file that SHRANK below its committed offset is treated as rotated:
  re-baselined to 0 and read as new (the reference re-opens on
  move_self/delete_self inotify events).
- ``read()`` is repeatable until ``commit()`` — crash between the two
  re-reads the same increment (at-least-once into an idempotent sink,
  the commit-after-write order of src/output.c:280-302).

Use:
    src = DirectoryTailSource(watch_dir, state_dir, include=["*.log"])
    ds = src.read()          # Dataset[source, line_no, byte_offset, line]
    ... consume ds ...
    src.commit()             # durably advance offsets
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import ray.data

from logpipe_ray.sources.text import (
    LINE_SCHEMA,
    _chunk_lines,
    _line_rows,
    match_files,
)


def _last_line_boundary(path: str, lo: int, size: int) -> int:
    """One past the last newline in [lo, size), or ``lo`` if none —
    the consumable end of the file (complete lines only). Scans
    backwards in growing windows; cheap for normal line lengths."""
    win = 1 << 16
    with open(path, "rb") as f:
        end = size
        while end > lo:
            start = max(lo, end - win)
            f.seek(start)
            buf = f.read(end - start)
            nl = buf.rfind(b"\n")
            if nl >= 0:
                return start + nl + 1
            end = start
            win *= 2
    return lo


class DirectoryTailSource:
    """Incremental line source over a watched directory (see module doc)."""

    def __init__(
        self,
        watch_dir: str,
        state_dir: str,
        *,
        include: list[str] | None = None,
        exclude: list[str] | None = None,
        chunk_bytes: int = 64 << 20,
    ):
        self.watch_dir = watch_dir
        self.state_dir = state_dir
        self.include = include
        self.exclude = exclude
        # exact-basename allowlist (set-membership, not fnmatch) — for
        # planners that pin a read to a pre-listed file set (the kafka
        # source's TOCTOU close); O(1) per file vs O(|patterns|)
        self.include_names: set[str] | None = None
        self.chunk_bytes = chunk_bytes
        self._pending_state: dict[str, dict] | None = None

    # -- durable offsets ----------------------------------------------------

    def _state_path(self) -> str:
        return os.path.join(self.state_dir, "offsets.json")

    def load_state(self) -> dict[str, dict]:
        try:
            with open(self._state_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            return {}

    def commit(self) -> None:
        """Atomically persist the offsets computed by the last read()."""
        if self._pending_state is None:
            return
        os.makedirs(self.state_dir, exist_ok=True)
        tmp = self._state_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._pending_state, f)
        os.replace(tmp, self._state_path())
        self._pending_state = None

    # -- planning + read ----------------------------------------------------

    def _plan(self) -> tuple[list[dict], dict[str, dict]]:
        state = self.load_state()
        names = sorted(
            os.path.join(self.watch_dir, n) for n in os.listdir(self.watch_dir)
        )
        paths = match_files(names, include=self.include, exclude=self.exclude)
        if self.include_names is not None:
            paths = [
                p for p in paths if os.path.basename(p) in self.include_names
            ]
        chunks: list[dict] = []
        new_state: dict[str, dict] = dict(state)
        for p in paths:
            size = os.path.getsize(p)
            prev = state.get(p, {"offset": 0, "lines": 0})
            lo, line_base = prev["offset"], prev["lines"]
            if size < lo:  # truncated/rotated → re-baseline as a new file
                lo, line_base = 0, 0
            hi = _last_line_boundary(p, lo, size)
            if hi <= lo:
                continue
            src = os.path.basename(p)
            file_chunks = []
            for ci, s in enumerate(range(lo, hi, self.chunk_bytes)):
                file_chunks.append(
                    {
                        "path": p,
                        "source": src,
                        "start": s,
                        "end": min(s + self.chunk_bytes, hi),
                        "chunk": ci,
                        "line_base": 0,
                    }
                )
            # exact line_no across chunks + runs: count lines per chunk
            # (reads the new bytes once more — increments are small; at
            # scale the counts could ride back on the read itself)
            n_total = 0
            for c in file_chunks:
                n = len(_chunk_lines(c["path"], c["start"], c["end"])[1])
                c["line_base"] = line_base + n_total
                n_total += n
            chunks.extend(file_chunks)
            new_state[p] = {"offset": hi, "lines": line_base + n_total}
        self._pending_state = new_state
        return chunks, new_state

    def read(self) -> ray.data.Dataset:
        """Dataset of line rows that arrived since the last commit()."""
        chunks, _ = self._plan()
        if not chunks:
            return ray.data.from_arrow(LINE_SCHEMA.empty_table())

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
            return pa.concat_tables(tables) if tables else LINE_SCHEMA.empty_table()

        return ray.data.from_items(chunks).map_batches(
            expand, batch_format="pyarrow"
        )
