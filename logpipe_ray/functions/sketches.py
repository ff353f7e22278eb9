"""Mergeable sketches for approximate aggregates at scale.

KMV (k-minimum-values) distinct-count sketch: keep the k smallest
64-bit hashes seen; estimate N ≈ (k-1) / max_kept_normalized. Fully
deterministic (content hashing, no RNG), mergeable by union+truncate —
the right shape for Ray Data: one partial sketch per batch inside
``map_batches``, merged in a tiny ``groupby``; the raw values never
shuffle (sketches are mergeable — see Ray Data aggregation docs,
https://docs.ray.io/en/latest/data/aggregating-data.html).

Misra–Gries heavy-hitters sketch (Misra & Gries 1982; mergeability per
Agarwal et al., "Mergeable Summaries", PODS 2012): a capacity-m
frequency summary whose per-item undercount is bounded by the total
decrement D applied along the merge tree. Any item with true count > D
is guaranteed present in the final summary, so an EXACT top-k follows
from a second candidates-only counting pass whenever the k-th exact
count exceeds D — checked at runtime, making the composition
provably-exact rather than approximate. The point at 100 TB: a
web-scale vocabulary is unbounded, so per-batch full value_counts
partials shuffle vocab-sized data; MG partials shuffle ≤ (m+1) rows
per block no matter the vocabulary.
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
    the partials tree-merge via ``fold_blocks_tree`` (KMV merge =
    union + truncate-to-k — mergeable along any tree), so no keyed
    shuffle runs at all and only sketch rows (≤ k int64s each) move.
    """

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

    def merge_sketches(b: pa.Table) -> pa.Table:
        # per-key KMV merge of whatever partial rows this block holds;
        # re-applicable to its own output (union+truncate semilattice)
        if b.num_rows == 0:
            return b.select([key_col, "sketch"])
        enc = pa.compute.dictionary_encode(b[key_col])
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        idx = enc.indices.to_numpy(zero_copy_only=False)
        sk = b["sketch"].to_pylist()
        keys_out, sk_out = [], []
        for code, key in enumerate(enc.dictionary.to_pylist()):
            parts = [
                np.asarray(sk[i], dtype=np.int64)
                for i in np.flatnonzero(idx == code)
            ]
            keys_out.append(key)
            sk_out.append(kmv_merge(parts, k).tolist())
        return pa.table(
            {
                key_col: pa.array(keys_out),
                "sketch": pa.array(sk_out, type=pa.list_(pa.int64())),
            }
        )

    from logpipe_ray.stages.smallagg import fold_blocks_tree

    root = fold_blocks_tree(
        ds.map_batches(partials, batch_format="pyarrow", batch_size=batch_size),
        merge_sketches,
    )

    def estimate(b: pa.Table) -> pa.Table:
        ests = [
            round(kmv_estimate(np.asarray(s, dtype=np.int64), k))
            for s in b["sketch"].to_pylist()
        ]
        return pa.table(
            {key_col: b[key_col], "approx_distinct": pa.array(ests)}
        )

    return root.map_batches(estimate, batch_format="pyarrow", batch_size=None)


# --- Misra–Gries heavy hitters ---------------------------------------------
#
# Summary representation on the wire: an Arrow table
#   (item: string|null, n: int64)
# where non-null rows are the ≤ m retained (item, lower-bound count)
# entries and ONE null-item row carries that partial's total decrement
# D. Merging = concat → group-sum → truncate-with-decrement; D rows
# sum like any other group and the truncation adds its own t.


def mg_truncate(items: "np.ndarray", counts: np.ndarray, m: int):
    """Keep ≤ m items by subtracting the (m+1)-th largest count t from
    every count and dropping ≤ 0 (one vectorized partition+mask, no
    per-decrement loop); returns (items, counts, t). Classic MG
    batch-decrement: each survivor's count drops by ≤ t, every dropped
    item had count ≤ t."""
    if len(items) <= m:
        return items, counts, 0
    # t = (m+1)-th largest via one O(n) partition
    t = int(np.partition(counts, len(counts) - (m + 1))[len(counts) - (m + 1)])
    new = counts - t
    keep = new > 0
    return items[keep], new[keep], t


def mg_partial_table(values, *, m: int) -> pa.Table:
    """One batch → MG summary table. Exact value_counts first (bounded
    by the batch's own vocabulary), then one truncation."""
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if not isinstance(values, pa.Array):
        values = pa.array(values)
    vc = values.value_counts()
    items = vc.field("values")
    counts = vc.field("counts").to_numpy(zero_copy_only=False).astype(np.int64)
    it_np = np.asarray(items.to_pylist(), dtype=object)
    it_np, counts, t = mg_truncate(it_np, counts, m)
    return pa.table(
        {
            "item": pa.array(list(it_np) + [None], type=pa.string()),
            "n": pa.array(
                np.concatenate((counts, [t])).astype(np.int64), type=pa.int64()
            ),
        }
    )


def mg_merge_table(tbl: pa.Table, *, m: int) -> pa.Table:
    """Merge concatenated MG summary tables into one (same layout)."""
    import pyarrow.compute as pc

    null_mask = pc.is_null(tbl["item"])
    d_total = int(
        pc.sum(tbl.filter(null_mask)["n"]).as_py() or 0
    )
    rest = tbl.filter(pc.invert(null_mask))
    if rest.num_rows:
        g = rest.group_by("item").aggregate([("n", "sum")])
        it_np = np.asarray(g["item"].to_pylist(), dtype=object)
        counts = g["n_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        it_np, counts, t = mg_truncate(it_np, counts, m)
        d_total += t
    else:
        it_np, counts = np.zeros(0, dtype=object), np.zeros(0, dtype=np.int64)
    return pa.table(
        {
            "item": pa.array(list(it_np) + [None], type=pa.string()),
            "n": pa.array(
                np.concatenate((counts, [d_total])).astype(np.int64),
                type=pa.int64(),
            ),
        }
    )


def heavy_hitters_exact_topk(
    ds,
    *,
    k: int,
    m: int = 512,
    make_values,
):
    """PROVABLY-EXACT distributed top-k frequency over an unbounded item
    domain, in two streaming passes:

    pass 1 — per-batch MG partials (≤ m+1 rows leave any block,
    vocabulary-independent) folded into one summary; D = its total
    decrement, candidates = its ≤ m items (superset of every item with
    true count > D).

    pass 2 — exact counts of candidates only: broadcast the candidate
    set, per-batch filtered value_counts partials (≤ m rows/block),
    folded once. Result = top-k by (count desc, item asc).

    Raises if min(top-k count) ≤ D — the capacity-m guarantee can then
    not certify exactness (grow m). ``make_values(batch) -> pa.Array``
    extracts the item stream from each input batch.
    """
    import ray

    import pyarrow.compute as pc

    def partials(b: pa.Table) -> pa.Table:
        return mg_partial_table(make_values(b), m=m)

    from logpipe_ray.stages.smallagg import fold_blocks_tree

    # MG summaries are mergeable along an arbitrary tree (PODS 2012):
    # tree-fold the ≤(m+1)-row partials — a flat repartition(1) merge
    # would concat n_blocks × (m+1) rows into ONE task at web-scale
    # block counts. D accumulates along the tree exactly as the
    # certificate below assumes.
    summary = fold_blocks_tree(
        ds.map_batches(partials, batch_format="pyarrow"),
        lambda t: mg_merge_table(t, m=m),
    )
    tbl = pa.Table.from_pandas(summary.to_pandas())
    null_mask = pc.is_null(tbl["item"])
    d_total = int(pc.sum(tbl.filter(null_mask)["n"]).as_py() or 0)
    cand = tbl.filter(pc.invert(null_mask))["item"]
    if isinstance(cand, pa.ChunkedArray):
        cand = cand.combine_chunks()
    cand_ref = ray.put(cand)

    def exact_partials(b: pa.Table) -> pa.Table:
        from logpipe_ray.util import bounded_resolve

        cand_local = bounded_resolve(_MG_CACHE, cand_ref)
        v = make_values(b)
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        v = v.filter(pc.is_in(v, value_set=cand_local))
        vc = v.value_counts()
        return pa.table(
            {
                "item": vc.field("values"),
                "n": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    from logpipe_ray.stages.smallagg import fold_partials_tree

    # candidate domain is ≤ m items but the partial STREAM is
    # block-count-proportional — tree-fold the per-block counts
    exact = fold_partials_tree(
        ds.map_batches(exact_partials, batch_format="pyarrow"), "item", "n"
    )
    top = pa.Table.from_pandas(
        exact.sort(["n", "item"], descending=[True, False]).limit(k).to_pandas()
    )
    kth = int(top["n"][top.num_rows - 1].as_py()) if top.num_rows else 0
    # D == 0 ⇒ no truncation ever fired and the summary is exact (any
    # candidate count < k then reflects true domain size). With D > 0,
    # exactness is certified only if k full rows exist AND the k-th
    # exact count strictly beats the undercount bound.
    if d_total > 0 and (top.num_rows < k or kth <= d_total):
        raise ValueError(
            f"MG capacity m={m} cannot certify exact top-{k}: "
            f"{top.num_rows} candidates, k-th count {kth}, "
            f"decrement bound {d_total}"
        )
    return top.select(["item", "n"])


_MG_CACHE: dict = {}
