"""Bounded-cardinality aggregation without empty shuffle partitions.

Ray Data's sort-based ``groupby().aggregate()`` / ``map_groups`` size
their reduce side from the input BLOCK count, not the key cardinality.
When keys number far fewer than blocks (counters over 16 sources,
5 event types, ...), many reduce partitions receive zero rows, and the
all-to-all operators emit ZERO-COLUMN empty blocks for them — the
``RefBundle ... new schema: .`` executor warnings, and the exact
empty-schema failure class that crashed pyarrow joins at 32 CPUs in
round 2 (see stages/joins.py ``join_partitions``).

Important Ray 2.49 fact (drives the design here): those schema-less
empties CANNOT be repaired downstream — map operators deliberately
pass empty input blocks through WITHOUT calling the UDF (workaround in
ray/data/_internal/planner/plan_udf_map_op.py:453-462, with Ray's own
``TODO(hchen): ... some all-to-all operators output empty blocks with
no schema``). A typed-empty-returning UDF never runs on them. The only
real fix is to not create over-partitioned all-to-alls in the first
place:

- :func:`fold_partials` — for aggregates whose per-block PARTIALS are
  already tiny (counter tables, pre-binned histograms): coalesce the
  partial blocks (plain ``repartition`` — a block-ref concat, not a
  keyed shuffle) and combine them in one vectorized ``pyarrow``
  ``group_by`` task. No keyed all-to-all → no empty reduce partitions
  at all. At 100 TB the partials are (n_blocks × cardinality) rows —
  for bounded-cardinality keys that is MBs, so one combine task is the
  right cost; raise ``num_blocks`` for a two-level tree if cardinality
  grows.
- :func:`map_groups_typed` — ``groupby(k).map_groups(fn)`` restated as
  ``sort(k)`` + per-block group-sliced UDF application (what Ray's
  map_groups does under the hood, grouped_data.py
  ``_apply_udf_to_groups``), with every produced block cast to the
  DECLARED output schema — so this stage never *originates* an untyped
  or schema-drifting block. (Blocks the sort itself emits empty are
  passed through by Ray, per the workaround above — they are benign
  for every consumer except pyarrow joins, which ``join_partitions``
  guards by bounding the partition count.)
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def fold_partials(
    partials: ray.data.Dataset,
    keys: list[str] | str,
    value_cols: list[str] | str,
    *,
    num_blocks: int = 1,
) -> ray.data.Dataset:
    """Sum ``value_cols`` per ``keys`` over already-partial blocks.

    Equivalent to ``partials.groupby(keys).aggregate(Sum(c) for c in
    value_cols)`` (with the output columns keeping their input names)
    but with a fixed, tiny reduce side: no reduce partition can be
    empty, so no zero-column blocks reach the streaming executor.
    """
    return partials.repartition(num_blocks).map_batches(
        _sum_combine(keys, value_cols), batch_format="pyarrow", batch_size=None
    )


def _sum_combine(
    keys: list[str] | str, value_cols: list[str] | str
) -> Callable[[pa.Table], pa.Table]:
    """Per-key sum merge (input column names preserved) — the combine
    shared by :func:`fold_partials` and :func:`fold_partials_tree`."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    value_cols = [value_cols] if isinstance(value_cols, str) else list(value_cols)
    out_cols = keys + value_cols

    def combine(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.select(out_cols)
        g = b.group_by(keys).aggregate([(c, "sum") for c in value_cols])
        g = g.rename_columns(
            [c[: -len("_sum")] if c.endswith("_sum") else c for c in g.column_names]
        )
        return g.select(out_cols)

    return combine


def fold_blocks_tree(
    partials: ray.data.Dataset,
    combine: Callable[[pa.Table], pa.Table],
    *,
    fanin: int = 64,
) -> ray.data.Dataset:
    """Hierarchical fold of an arbitrary ASSOCIATIVE ``combine`` over a
    partial-block stream whose BLOCK COUNT is unbounded: repeatedly
    coalesce ``fanin`` blocks per combine task until ONE combined block
    remains (the blocks each repartition coalesces are arbitrary, so
    any >1-block output would still hold split state — only the
    1-block root is a fold). ``combine`` must be a *merge*:
    re-applicable to a concatenation of its own outputs with the same
    result as one application to the raw partials (per-key sums,
    min-k / cap selections, mergeable sketches). Every combine input is
    ≤ fanin × max-partial-rows and every output ≤ one combined table —
    bounded task memory at ANY corpus size, with no keyed shuffle and
    therefore no empty reduce ranges. (A flat ``repartition(1)`` +
    combine concatenates the whole n_blocks × partial-rows stream into
    ONE block first — the one-block-fold trap once n_blocks is large.)
    """
    if fanin < 2:
        raise ValueError(f"fanin must be ≥ 2, got {fanin}")
    ds = partials.materialize()
    nb = ds.num_blocks()
    while True:  # ≥ 1 combine even for a 1-block stream (dups in-block)
        nb = max(1, -(-nb // fanin))  # ceil: floor would hand one task
        # up to 2*fanin-1 blocks (e.g. 127//64 = 1), breaking the bound
        ds = (
            ds.repartition(nb)
            .map_batches(combine, batch_format="pyarrow", batch_size=None)
            .materialize()
        )
        if nb <= 1:
            return ds


def fold_partials_tree(
    partials: ray.data.Dataset,
    keys: list[str] | str,
    value_cols: list[str] | str,
    *,
    fanin: int = 64,
) -> ray.data.Dataset:
    """Hierarchical :func:`fold_partials` for BOUNDED-DOMAIN keys whose
    partial STREAM is unbounded in block count (histograms over a fixed
    value domain scanned from an arbitrarily large corpus): the
    :func:`fold_blocks_tree` shape with the per-key sum as the combine.
    Every combine input is ≤ fanin × |domain| rows and every output
    ≤ |domain| — bounded task memory at ANY corpus size."""
    return fold_blocks_tree(partials, _sum_combine(keys, value_cols), fanin=fanin)


def grouped_agg(
    ds: ray.data.Dataset,
    keys: list[str] | str,
    *,
    sums: dict[str, str] | None = None,
    count: str | None = None,
    num_blocks: int = 1,
) -> ray.data.Dataset:
    """``groupby(keys).aggregate(Sum/Count)`` for BOUNDED-cardinality
    keys, with no keyed shuffle: per-block vectorized ``pyarrow``
    ``group_by`` partials (≤ cardinality rows leave any block) folded
    by :func:`fold_partials`. Unlike the native aggregate, no reduce
    partition can be empty, so no schema-less zero-column blocks reach
    the streaming executor (module docstring).

    ``sums`` maps OUTPUT column name → input column; ``count`` names a
    count(*) output column. Output columns: keys, then sums in dict
    order, then count.

    The default ``num_blocks=1`` folds hierarchically
    (:func:`fold_partials_tree`) so the partial stream's block count —
    corpus-proportional — never concatenates into one task; pass
    ``num_blocks>1`` for the flat repartition (partial, per-key-split
    output).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    sums = dict(sums or {})
    aggs = [(c, "sum") for c in sums.values()]
    if count is not None:
        aggs.append(([], "count_all"))
    rename = {f"{c}_sum": out for out, c in sums.items()}
    if count is not None:
        rename["count_all"] = count
    out_vals = list(sums) + ([count] if count is not None else [])

    def _sum_type(t: pa.DataType) -> pa.DataType:
        # pyarrow group_by "sum" promotes integers to int64; floats stay
        return pa.int64() if pa.types.is_integer(t) else t

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            cols = {k: b[k] for k in keys}
            for out, c in sums.items():
                cols[out] = pa.array([], type=_sum_type(b[c].type))
            if count is not None:
                cols[count] = pa.array([], type=pa.int64())
            return pa.table(cols)
        g = b.group_by(keys).aggregate(aggs)
        g = g.rename_columns([rename.get(c, c) for c in g.column_names])
        return g.select(keys + out_vals)

    partial_ds = ds.map_batches(partial, batch_format="pyarrow")
    if num_blocks == 1:
        return fold_partials_tree(partial_ds, keys, out_vals)
    return fold_partials(partial_ds, keys, out_vals, num_blocks=num_blocks)


def count_partials(
    ds: ray.data.Dataset,
    keys: list[str] | str,
    *,
    out_col: str = "n",
) -> ray.data.Dataset:
    """Per-block vectorized count-by-key partials (the combiner half of
    a distributed COUNT: at most ``cardinality`` rows leave any block)."""
    keys = [keys] if isinstance(keys, str) else list(keys)

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.select(keys).append_column(
                out_col, pa.array([], type=pa.int64())
            )
        g = b.group_by(keys).aggregate([([], "count_all")])
        g = g.rename_columns(
            [out_col if c == "count_all" else c for c in g.column_names]
        )
        return g.select(keys + [out_col])

    return ds.map_batches(partial, batch_format="pyarrow")


def run_starts(sorted_keys: np.ndarray) -> np.ndarray:
    """Start indices of equal-key runs in a SORTED key array — the
    numpy-array companion to :func:`_group_bounds` for the lexsort →
    run-scan partial-aggregate kernels (per-group argmax / cap / rank)."""
    n = len(sorted_keys)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    return np.concatenate(
        ([0], np.flatnonzero(sorted_keys[1:] != sorted_keys[:-1]) + 1)
    )


def run_ranks(sorted_keys: np.ndarray) -> np.ndarray:
    """0-based rank of each element within its equal-key run (keys must
    be sorted/grouped)."""
    n = len(sorted_keys)
    starts = run_starts(sorted_keys)
    run_lens = np.diff(np.concatenate((starts, [n])))
    return np.arange(n, dtype=np.int64) - np.repeat(starts, run_lens)


def _group_bounds(tbl: pa.Table, keys: list[str]) -> np.ndarray:
    """Boundary indices of equal-key runs in a key-sorted table."""
    n = tbl.num_rows
    change = np.zeros(max(n - 1, 0), dtype=bool)
    for k in keys:
        col = tbl[k]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        v = col.to_numpy(zero_copy_only=False)
        change |= v[1:] != v[:-1]
    return np.concatenate(([0], np.flatnonzero(change) + 1, [n]))


def map_groups_typed(
    ds: ray.data.Dataset,
    keys: list[str] | str,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    out_schema: pa.Schema,
    *,
    batch_format: str = "pandas",
    pre_blocks: int | None = None,
) -> ray.data.Dataset:
    """``groupby(keys).map_groups(fn)`` with a declared output schema.

    Same contract as Ray's map_groups (sort co-locates and orders keys;
    one key's rows never span blocks; each group fits a worker), but
    every block this stage produces is cast to ``out_schema`` — group
    outputs can't drift dtypes (pandas nullable-int → float64 etc.),
    and a block the UDF empties out stays typed. (Empty blocks emitted
    by the upstream sort are passed through by Ray without invoking the
    UDF — see the module docstring.)

    ``pre_blocks``: when the caller KNOWS the distinct-key count is
    bounded (routed sinks × salt buckets, ...), pass a block count at
    or below it. The sort sizes its output ranges from the input block
    count; with more ranges than distinct keys the surplus ranges are
    the schema-less empty blocks of the module-docstring warning class.
    A cheap ref-coalescing ``repartition`` first keeps every range
    nonempty. Leave ``None`` for unbounded key spaces — capping blocks
    there would cap shuffle parallelism.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    if pre_blocks is not None:
        ds = ds.repartition(pre_blocks)
    sorted_ds = ds.sort(keys)

    def apply(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return out_schema.empty_table()
        bounds = _group_bounds(block, keys)
        outs = []
        for s, e in zip(bounds[:-1], bounds[1:]):
            grp = block.slice(s, e - s)
            if batch_format == "pandas":
                res = fn(grp.to_pandas())
                outs.append(
                    pa.Table.from_pandas(
                        res, schema=out_schema, preserve_index=False
                    )
                )
            else:
                outs.append(fn(grp).cast(out_schema))
        return pa.concat_tables(outs) if outs else out_schema.empty_table()

    return sorted_ds.map_batches(apply, batch_format="pyarrow", batch_size=None)


def sorted_runs_fold(
    ds: ray.data.Dataset,
    keys: list[str] | str,
    combine: Callable[[pa.Table], pa.Table],
    *,
    rows_per_block: int = 65536,
) -> ray.data.Dataset:
    """Global per-key fold of a KEY-PROPORTIONAL dataset (candidate
    pairs, dup positions, ... — small relative to the corpus but not
    driver-sized): materialize (the input is about to be consumed by a
    count anyway), coalesce to volume-bounded blocks, ONE range sort on
    ``keys``, then ``combine`` — a vectorized run-scan over each block
    (the sort invariant co-locates a key's rows). ``combine`` must be
    associative-safe per key run (count/min/max/sum via ``run_starts``
    + ``np.{add,minimum,...}.reduceat``).

    This is for UNBOUNDED/high-cardinality keys (distinct keys ≫ the
    rows/rows_per_block block count, so every sort range lands on
    data). With distinct keys BELOW the block count the surplus ranges
    come out as schema-less empty blocks (module docstring) — for a
    bounded key domain use :func:`fold_partials` /
    :func:`fold_partials_tree` instead, which shuffle nothing."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    ds = ds.materialize()
    blocks = max(1, ds.count() // rows_per_block + 1)
    return (
        ds.repartition(blocks)
        .sort(keys)
        .map_batches(combine, batch_format="pyarrow", batch_size=None)
    )
