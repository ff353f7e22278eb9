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


_FM1 = np.uint64(0xFF51AFD7ED558CCD)
_FM2 = np.uint64(0xC4CEB9FE1A85EC53)
_GOLD = np.uint64(0x9E3779B97F4A7C15)
_PRIME = np.uint64(0xC2B2AE3D27D4EB4F)


def _fmix64(h: np.ndarray) -> np.ndarray:
    """murmur3 fmix64 avalanche, vectorized uint64 (wraparound mul)."""
    h = h.copy()
    h ^= h >> np.uint64(33)
    h *= _FM1
    h ^= h >> np.uint64(29)
    h *= _FM2
    h ^= h >> np.uint64(32)
    return h


def token_content_hashes(offsets: np.ndarray, values: np.ndarray) -> np.ndarray:
    """Per-row order-sensitive 63-bit content hash of a list column,
    fully vectorized: every element is avalanche-mixed with its IN-ROW
    position, a row is the wraparound sum of its mixed elements (the
    baked-in position makes the sum order-sensitive), finalized with
    the row length. Deterministic across worker processes (Python
    ``hash()`` is per-process salted and cannot key a shuffle); same
    64-bit birthday collision envelope as a truncated-blake2b digest.

    MEASURED (this host, 200k rows × mean 256 tokens, best-of-2):
    24M tokens/s vs the blake2b buffer-sliced loop's 119M tokens/s —
    numpy's ~6 streaming passes over the widened uint64 buffer lose to
    one cache-friendly digest pass on this bandwidth-starved box, and
    32 concurrent workers contend for bandwidth, not CPU. So
    :func:`add_tokens_hash` keeps blake2b; this kernel is the right
    choice only for SHORT rows (≲16 tokens), where the ~0.5 µs/row
    Python call overhead of the loop dominates instead."""
    # a sliced ListArray's offsets are absolute into the full value
    # buffer and need not start at 0
    values = values[offsets[0] : offsets[-1]]
    offsets = offsets - offsets[0]
    lens = np.diff(offsets)
    n = len(values)
    # in-row position+1 without np.repeat: unit steps, decremented at
    # row boundaries, prefix-summed in place (fewest big allocations —
    # this kernel is memory-bandwidth-bound)
    d = np.ones(n, dtype=np.uint64)
    if len(offsets) > 2:
        # np.subtract.at, NOT fancy-index -=: EMPTY rows give duplicate
        # boundary offsets, whose decrements must ACCUMULATE at the one
        # shared start index; boundaries at n (trailing empty rows) own
        # no elements and are skipped
        b = offsets[1:-1]
        in_range = b < n
        np.subtract.at(d, b[in_range], lens[:-1].astype(np.uint64)[in_range])
    np.cumsum(d, out=d)  # d = pos+1
    d *= _PRIME
    elem = values.astype(np.uint64)
    elem *= _GOLD
    elem ^= d
    # fmix64 in place, reusing d as shift scratch
    np.right_shift(elem, np.uint64(33), out=d)
    elem ^= d
    elem *= _FM1
    np.right_shift(elem, np.uint64(29), out=d)
    elem ^= d
    elem *= _FM2
    np.right_shift(elem, np.uint64(32), out=d)
    elem ^= d
    cs = np.zeros(n + 1, dtype=np.uint64)
    np.cumsum(elem, out=cs[1:])
    row = cs[offsets[1:]] - cs[offsets[:-1]]
    out = _fmix64(row ^ lens.astype(np.uint64) * _GOLD)
    return (out >> np.uint64(1)).astype(np.int64)


def add_tokens_hash(
    batch: pa.Table, *, tokens_col: str = "tokens", out_col: str = "tokens_hash"
) -> pa.Table:
    """Append an int64 content hash of each row's token array: blake2b
    over the row's slice of the little-endian int32 value buffer. One C
    digest call per row, no per-row Python object churn — measured 3-5×
    faster than the vectorized :func:`token_content_hashes` at this
    table's row lengths (see its docstring for the numbers and the
    crossover)."""
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
