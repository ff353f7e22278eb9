"""Distributed global rank (``row_number() OVER (ORDER BY key, id)``).

The reference engine orders records only within one worker's file
handle (logpipe src/worker.c event-loop: per-fd sequential reads); a
corpus-wide rank is a training-data extension (curriculum ordering,
stratified splits, quota mixing all need "position of this row in the
globally sorted stream").

Scale shape — the same two-level prefix sum as
:func:`logpipe_ray.stages.packing.pack_by_token_budget`, applied to
row counts instead of token counts:

1. per-batch partials count rows per ordered key-range ``bucket``
   (``key // bucket_width``) — at most (blocks × buckets) tiny rows
   leave the map side, folded in ONE task
   (:func:`logpipe_ray.stages.smallagg.fold_partials_tree`, no keyed
   shuffle, no empty reduce partitions);
2. exclusive bucket offsets (the count of all rows in lower buckets,
   per group) are broadcast via ``ray.put``;
3. one ``groupby(bucket).map_groups`` co-locates each bucket, sorts it
   locally by (key, id), and adds the offset.

The corpus shuffles exactly once (the irreducible exchange of any
global ordering); the driver holds only the (groups × buckets)-row
offsets table. ``bucket_width`` tunes bucket ≈ block at scale: one
bucket must fit a worker's heap, the classic range-partitioned-sort
contract.

Keys must be NON-NEGATIVE int64 (arrow integer divide truncates toward
zero, so negative keys would mis-bucket); callers pre-convert (money →
integer cents, floats → scaled ints).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from logpipe_ray.stages.smallagg import count_partials, fold_partials_tree

_PROC_CACHE: dict[str, object] = {}


def global_rank(
    ds: ray.data.Dataset,
    *,
    key_col: str,
    id_col: str,
    bucket_width: int,
    group_col: str | None = None,
    rank_col: str = "rnk",
    carry_cols: tuple[str, ...] = (),
) -> ray.data.Dataset:
    """Add ``rank_col`` = 1-based global row number ordered by
    ``(key_col, id_col)`` ascending — per ``group_col`` partition when
    given (``row_number() OVER (PARTITION BY group ORDER BY key, id)``),
    else over the whole dataset.

    ``key_col`` must be non-negative int64; ``id_col`` must be a unique
    tiebreaker (ranks are then deterministic). Output columns:
    ``id_col, [group_col], key_col, rank_col, *carry_cols``.
    """
    group_cols = [group_col] if group_col is not None else []

    def add_bucket(b: pa.Table) -> pa.Table:
        key = pc.cast(b[key_col], pa.int64())
        cols = {
            id_col: b[id_col],
            key_col: key,
            "bucket": pc.divide(key, bucket_width),
        }
        for g in group_cols:
            cols[g] = b[g]
        for c in carry_cols:
            cols[c] = b[c]
        return pa.table(cols)

    # materialize: the bucketed projection feeds both the count fold and
    # the rank shuffle — without it Ray re-executes the upstream lineage
    # per consumer. Only projected key columns are held, never payloads.
    keyed = ds.map_batches(add_bucket, batch_format="pyarrow").materialize()

    counts = pa.concat_tables(
        fold_partials_tree(
            count_partials(keyed, group_cols + ["bucket"]),
            group_cols + ["bucket"],
            "n",
        ).iter_batches(batch_format="pyarrow")
    ).to_pandas()
    counts = counts.sort_values(group_cols + ["bucket"])
    if group_cols:
        counts["offset"] = (
            counts.groupby(group_cols[0])["n"].cumsum() - counts["n"]
        )
        offsets = {
            (g, int(bk)): int(off)
            for g, bk, off in zip(
                counts[group_cols[0]], counts["bucket"], counts["offset"]
            )
        }
    else:
        counts["offset"] = counts["n"].cumsum() - counts["n"]
        offsets = {
            int(bk): int(off)
            for bk, off in zip(counts["bucket"], counts["offset"])
        }
    off_ref = ray.put(offsets)

    # The map_groups sort sizes its output ranges from the INPUT block
    # count; with more ranges than distinct (group, bucket) keys the
    # surplus ranges are schema-less empty blocks (see stages/smallagg
    # module docstring). Bound ranges by the distinct-key count AND the
    # data volume (~256k rows per range — skewed keys duplicate sampled
    # quantile boundaries, so cardinality alone still leaves empties).
    n_rows = keyed.count()  # keyed is materialized — count is metadata
    pre_blocks = max(1, min(len(counts), n_rows // 262144 + 1))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        from logpipe_ray.util import bounded_resolve

        offs = bounded_resolve(_PROC_CACHE, off_ref)
        if group_cols:
            base = offs[(g[group_cols[0]].iloc[0], int(g["bucket"].iloc[0]))]
        else:
            base = offs[int(g["bucket"].iloc[0])]
        order = np.lexsort(
            (g[id_col].to_numpy(), g[key_col].to_numpy(dtype=np.int64))
        )
        out = {
            id_col: g[id_col].to_numpy()[order],
            key_col: g[key_col].to_numpy(dtype=np.int64)[order],
            rank_col: base + np.arange(1, len(order) + 1, dtype=np.int64),
        }
        for c in group_cols + list(carry_cols):
            out[c] = g[c].to_numpy()[order]
        return pd.DataFrame(out)

    arrow_schema = keyed.schema().base_schema
    # mirror per_bucket's dict semantics when names collide (key_col may
    # equal id_col): first occurrence keeps the position, last the type
    fields: dict[str, pa.DataType] = {}
    fields[id_col] = arrow_schema.field(id_col).type
    fields[key_col] = pa.int64()
    fields[rank_col] = pa.int64()
    for c in group_cols + list(carry_cols):
        fields[c] = arrow_schema.field(c).type
    fields = list(fields.items())
    from logpipe_ray.stages.smallagg import map_groups_typed

    return map_groups_typed(
        keyed,
        group_cols + ["bucket"],
        per_bucket,
        pa.schema(fields),
        pre_blocks=pre_blocks,
    )
