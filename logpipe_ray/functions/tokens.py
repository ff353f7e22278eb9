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
    if len(offsets) <= 1:
        return np.zeros(0, dtype=np.int64)
    # prefix-sum segment totals: exact for empty segments anywhere
    # (reduceat returns values[idx] for empty segments and clamping the
    # start indices corrupts the *preceding* segment — see ADVICE r1)
    csum = np.concatenate([[0], np.cumsum(values, dtype=np.int64)])
    return csum[offsets[1:]] - csum[offsets[:-1]]


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


def token_histogram_partials(
    batch: pa.Table, *, tokens_col: str = "tokens", vocab: int = 50257
) -> pa.Table:
    """Per-batch token-frequency partial: one ``np.bincount`` over the
    flat values buffer → (token, n) rows for tokens present in the
    batch. The pre-aggregation before the vocabulary ``groupby``: at
    most ``vocab`` rows leave each batch regardless of batch size, so
    the shuffle volume is bounded by vocab × n_blocks, never by corpus
    token count."""
    _, values = _list_buffers(batch[tokens_col])
    counts = np.bincount(values, minlength=vocab)
    nz = np.nonzero(counts)[0]
    return pa.table(
        {
            "token": pa.array(nz, type=pa.int64()),
            "n": pa.array(counts[nz], type=pa.int64()),
        }
    )


def add_tokens_hash(
    batch: pa.Table, *, tokens_col: str = "tokens", out_col: str = "tokens_hash"
) -> pa.Table:
    """Append an int64 content hash of each row's token array.

    blake2b over the row's slice of the little-endian int32 value
    buffer (content hash — Python ``hash()`` is process-salted and
    cannot key a cross-worker shuffle). Offsets come straight from the
    Arrow list buffers; the only per-row work is one C digest call."""
    import hashlib

    col = batch[tokens_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offsets = col.offsets.to_numpy().astype(np.int64)
    raw = np.ascontiguousarray(
        col.values.to_numpy(zero_copy_only=False), dtype="<i4"
    ).tobytes()
    h = hashlib.blake2b
    vals = np.fromiter(
        (
            int.from_bytes(
                h(raw[offsets[i] * 4 : offsets[i + 1] * 4], digest_size=8).digest(),
                "big",
            )
            >> 1
            for i in range(len(col))
        ),
        dtype=np.int64,
        count=len(col),
    )
    return batch.append_column(out_col, pa.array(vals, type=pa.int64()))
