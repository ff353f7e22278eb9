"""Command-output source — the ``logpipe-input-exec`` analog.

Reference: ``src-plugins/logpipe-input-exec.c:85-228`` — the plugin
``popen()``s a configured command line and feeds its stdout through the
same split-line buffer as the file source (uncompleted trailing line
kept back until more output arrives; at EOF the remainder is flushed as
a final line, mirroring the plugin's drain-on-exit).

Ray-Data shape: the command LIST is the work list — a tiny Dataset of
``(source, cmd)`` rows — and each command runs inside one ``map_batches``
task (``batch_size=1`` → one task per command, embarrassingly parallel,
no shuffle). Each task subprocesses the command once, splits stdout into
lines vectorized (one ``bytes.split`` + numpy cumsum for offsets — no
per-line Python loop), and emits the same row shape as the file source:
``(source, line_no, byte_offset, line)`` with per-command counters (the
trace_line / trace_offset analogs).

At 100 TB scale the command list is the partitioning: thousands of
commands (e.g. one ``s3 cat`` / decompress / export shard each) fan out
across the cluster, and output streams block-by-block into downstream
stages — the driver never holds command output.
"""

from __future__ import annotations

import subprocess

import numpy as np
import pyarrow as pa
import ray.data

EXEC_SCHEMA = pa.schema(
    [
        ("source", pa.string()),
        ("line_no", pa.int64()),
        ("byte_offset", pa.int64()),
        ("line", pa.string()),
    ]
)


def lines_table(source: str, raw: bytes, *, encoding: str = "utf-8") -> pa.Table:
    """Split one command's stdout into line rows (vectorized offsets)."""
    if not raw:
        return EXEC_SCHEMA.empty_table()
    # trailing newline → no phantom empty last line; no trailing newline
    # → the remainder is still a line (EOF flush, like the plugin drain)
    body = raw[:-1] if raw.endswith(b"\n") else raw
    parts = body.split(b"\n")
    lens = np.fromiter((len(p) for p in parts), dtype=np.int64, count=len(parts))
    offsets = np.zeros(len(parts), dtype=np.int64)
    np.cumsum(lens[:-1] + 1, out=offsets[1:])
    return pa.table(
        {
            "source": pa.array([source] * len(parts), type=pa.string()),
            "line_no": pa.array(np.arange(1, len(parts) + 1)),
            "byte_offset": pa.array(offsets),
            "line": pa.array(
                [p.decode(encoding) for p in parts], type=pa.string()
            ),
        }
    )


def read_exec(
    cmds: list[str] | list[tuple[str, str]],
    *,
    encoding: str = "utf-8",
    check: bool = True,
) -> ray.data.Dataset:
    """Dataset over the stdout lines of shell commands.

    ``cmds``: shell command strings, or ``(source_label, cmd)`` pairs
    (default label ``exec-<i>``). One Ray task per command; a non-zero
    exit raises in that task (→ Ray's normal retry path) unless
    ``check=False``, in which case partial output is still emitted.
    """
    items = []
    for i, c in enumerate(cmds):
        src, cmd = c if isinstance(c, tuple) else (f"exec-{i}", c)
        items.append({"source": src, "cmd": cmd})

    def run(batch: pa.Table) -> pa.Table:
        out = []
        for src, cmd in zip(
            batch["source"].to_pylist(), batch["cmd"].to_pylist()
        ):
            p = subprocess.run(cmd, shell=True, capture_output=True)
            if check and p.returncode != 0:
                raise RuntimeError(
                    f"exec source command failed (rc={p.returncode}): {cmd!r}: "
                    f"{p.stderr.decode(errors='replace')[:500]}"
                )
            out.append(lines_table(src, p.stdout, encoding=encoding))
        return (
            pa.concat_tables(out) if out else EXEC_SCHEMA.empty_table()
        )

    return ray.data.from_items(items).map_batches(
        run, batch_format="pyarrow", batch_size=1
    )
