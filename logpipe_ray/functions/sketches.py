"""Mergeable sketches for approximate aggregates at scale.

KMV (k-minimum-values) distinct-count sketch: keep the k smallest
64-bit hashes seen; estimate N ≈ (k-1) / max_kept_normalized. Fully
deterministic (content hashing, no RNG), mergeable by union+truncate —
the right shape for Ray Data: one partial sketch per batch inside
``map_batches``, merged in a tiny ``groupby``; the raw values never
shuffle (sketches are mergeable — see Ray Data aggregation docs,
https://docs.ray.io/en/latest/data/aggregating-data.html).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

HASH_SPACE = float(1 << 63)  # sketches carry 63-bit hashes in int64


def _hash_column(col) -> np.ndarray:
    """Deterministic 63-bit hashes of a column's values (vectorized via
    pandas' C hashing of the string form for non-ints; splitmix-style
    mixing for ints)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type):
        x = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        # splitmix64 finalizer (public-domain constant mix)
        x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        x ^= x >> np.uint64(30)
        x = (x * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        x ^= x >> np.uint64(27)
        x = (x * np.uint64(0x94D049BB133111EB)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        x ^= x >> np.uint64(31)
        return (x >> np.uint64(1)).astype(np.int64)
    import pandas as pd

    h = pd.util.hash_array(np.asarray(col.to_pylist(), dtype=object))
    return (h >> np.uint64(1)).astype(np.int64)


def kmv_partial(values, k: int = 256) -> np.ndarray:
    """Sketch of one batch: the k smallest distinct hashes (sorted)."""
    h = np.unique(_hash_column(values))
    return h[:k]


def kmv_merge(sketches: list[np.ndarray], k: int = 256) -> np.ndarray:
    if not sketches:
        return np.zeros(0, dtype=np.int64)
    merged = np.unique(np.concatenate(sketches))
    return merged[:k]


def kmv_estimate(sketch: np.ndarray, k: int = 256) -> float:
    """Distinct-count estimate; exact when fewer than k values seen."""
    if len(sketch) < k:
        return float(len(sketch))
    kth = float(sketch[k - 1])  # k-th smallest, in [0, 2^63)
    return (k - 1) / (kth / HASH_SPACE)


def approx_distinct_by_key(
    ds,
    *,
    key_col: str,
    value_col: str,
    k: int = 256,
    batch_size: int = 65536,
):
    """Approximate count-distinct(value) per key.

    map_batches emits one serialized partial sketch per (key, batch);
    groupby(key).map_groups merges sketches and estimates. Only sketch
    rows (≤ k int64s each) shuffle.
    """
    import pandas as pd

    def partials(b: pa.Table) -> pa.Table:
        keys_out, sk_out = [], []
        enc = pa.compute.dictionary_encode(b[key_col])
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        idx = enc.indices.to_numpy(zero_copy_only=False)
        for code, key in enumerate(enc.dictionary.to_pylist()):
            sub = b[value_col].filter(pa.array(idx == code))
            keys_out.append(key)
            sk_out.append(kmv_partial(sub, k).tolist())
        return pa.table(
            {
                key_col: pa.array(keys_out),
                "sketch": pa.array(sk_out, type=pa.list_(pa.int64())),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        sketches = [np.asarray(s, dtype=np.int64) for s in g["sketch"]]
        est = kmv_estimate(kmv_merge(sketches, k), k)
        return pd.DataFrame(
            {key_col: [g[key_col].iloc[0]], "approx_distinct": [round(est)]}
        )

    return (
        ds.map_batches(partials, batch_format="pyarrow", batch_size=batch_size)
        .groupby(key_col)
        .map_groups(merge, batch_format="pandas")
    )
