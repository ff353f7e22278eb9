"""Vectorized helpers over the ``tokens: list<int32>`` payload column.

The payload is opaque to the pipeline (token-array pass-through
invariant), but tests/oracles need cheap *observables* of it — checksum
and length — computed from the actual Arrow list buffers with numpy
segment ops, no Python row loops.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _list_buffers(col) -> tuple[np.ndarray, np.ndarray]:
    """(absolute offsets, values) as int64 numpy arrays for a list column."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offsets = col.offsets.to_numpy().astype(np.int64)
    values = col.values.to_numpy(zero_copy_only=False).astype(np.int64)
    return offsets, values


def token_sums(col) -> np.ndarray:
    """Per-row sum of the token list (int64; empty list → 0)."""
    offsets, values = _list_buffers(col)
    lengths = np.diff(offsets)
    if len(lengths) == 0:
        return np.zeros(0, dtype=np.int64)
    # reduceat misbehaves on empty segments (returns values[idx]); mask them
    starts = np.minimum(offsets[:-1], len(values) - 1) if len(values) else offsets[:-1]
    sums = (
        np.add.reduceat(values, starts)
        if len(values)
        else np.zeros(len(lengths), dtype=np.int64)
    )
    return np.where(lengths > 0, sums, 0)


def add_tokens_sum(
    batch: pa.Table, *, tokens_col: str = "tokens", out_col: str = "tokens_sum"
) -> pa.Table:
    """Append an int64 checksum column = sum(tokens) per row."""
    return batch.append_column(
        out_col, pa.array(token_sums(batch[tokens_col]), type=pa.int64())
    )


def token_lengths(col) -> np.ndarray:
    offsets, _ = _list_buffers(col)
    return np.diff(offsets)
