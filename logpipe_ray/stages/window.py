"""Event-stream windowed aggregates over an ordered, partitioned log.

The reference delivers immediately and has no windows (SURVEY.md §2.5
"Windows: none"), but a complete engine over the ``events`` table needs
them. Ray Data has no event-time watermarks; the batch restatement
(composed from public Ray Data sort/map_batches primitives,
https://docs.ray.io/en/latest/data/grouping-data.html):

- **tumbling window**: window id is a pure function of ts → add the
  column vectorized in ``map_batches``, then a plain groupby — no
  per-key ordering needed.
- **ordered per-key operators** (session, as-of, cumsum, lag): ONE
  ``sort([key])`` co-locates every key's rows in one block (range
  assignment is a deterministic function of the KEY value alone, so an
  equal-key run never straddles a range — sorting by ``[key, ts]``
  instead would place composite boundaries INSIDE a key's run and
  split it across blocks; measured as 4 phantom sessions at sf0.01),
  then the kernel lexsorts the whole block by (key, ts, id) once and
  run-scans it (``run_starts`` + ``np.*.reduceat`` / cumsum-with-run-
  reset), computing every group in one vectorized pass. No per-group
  UDF calls, no Arrow→pandas round-trip per key: with millions of keys
  per block the per-group shape is a Python-loop straggler (the same
  defect the dedup pipeline measured at 1.5-1.7× end-to-end —
  BASELINE.md round-3 dedup section); the lexsort+run-scan shape is
  O(block log block) numpy regardless of key count. Assumes one key's
  events fit in a worker (salt/secondary window if a key is
  pathological).

Monetary/value sums are carried as integer cents so results are exactly
reproducible across engines (float sum order is not deterministic).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from logpipe_ray.stages.smallagg import run_starts


def add_tumbling_window(
    batch: pa.Table,
    *,
    ts_col: str = "ts",
    width_s: int = 3600,
    out_col: str = "window",
) -> pa.Table:
    """window = floor(epoch_seconds / width) as int64 (UTC-naive)."""
    epoch_us = pc.cast(batch[ts_col], pa.int64())  # timestamp[us] → µs
    win = pc.divide(epoch_us, width_s * 1_000_000)
    return batch.append_column(out_col, pc.cast(win, pa.int64()))


def cents_half_away(v: "pd.Series | np.ndarray") -> np.ndarray:
    """value*100 rounded half-away-from-zero (duckdb round() parity);
    np.round is banker's half-to-even and silently disagrees on .5."""
    x = np.asarray(v, dtype=np.float64) * 100.0
    return (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)


def add_value_cents(
    batch: pa.Table, *, value_col: str = "value", out_col: str = "value_cents"
) -> pa.Table:
    cents = pc.cast(
        pc.round(pc.multiply(batch[value_col], 100.0), round_mode="half_towards_infinity"),
        pa.int64(),
    )
    return batch.append_column(out_col, cents)


def tumbling_aggregate(
    ds: ray.data.Dataset,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    width_s: int = 3600,
) -> ray.data.Dataset:
    """count + exact cents-sum per (key, tumbling window).

    Distributed shape ((key, window) is UNBOUNDED): per-batch pyarrow
    group_by partials — Ray's sort-based ``groupby().aggregate()``
    would range-sort every RAW event row instead — completed per key by
    ``sorted_runs_fold`` (single-column sort co-locates a key; the
    combine re-groups (key, window) within the block)."""
    from logpipe_ray.stages.smallagg import sorted_runs_fold

    out_cols = [key_col, "window", "n_events", "sum_value_cents"]

    def _group(b: pa.Table, n_col: str) -> pa.Table:
        g = b.group_by([key_col, "window"]).aggregate(
            [([], "count_all"), (n_col, "sum")]
            if n_col == "value_cents"
            else [("n_events", "sum"), (n_col, "sum")]
        )
        rename = {
            "count_all": "n_events",
            "n_events_sum": "n_events",
            "value_cents_sum": "sum_value_cents",
            "sum_value_cents_sum": "sum_value_cents",
        }
        g = g.rename_columns([rename.get(c, c) for c in g.column_names])
        return g.select(out_cols)

    def partial(b: pa.Table) -> pa.Table:
        b = add_tumbling_window(b, ts_col=ts_col, width_s=width_s)
        b = add_value_cents(b, value_col=value_col)
        b = b.select([key_col, "window", "value_cents"])
        if b.num_rows == 0:
            return pa.table(
                {
                    key_col: b[key_col],
                    "window": b["window"],
                    "n_events": pa.array([], type=pa.int64()),
                    "sum_value_cents": pa.array([], type=pa.int64()),
                }
            )
        return _group(b, "value_cents")

    def combine(b: pa.Table) -> pa.Table:
        # a key's partial rows are confined to this block (single-column
        # sort invariant), so re-grouping completes every (key, window)
        if b.num_rows == 0:
            return b.select(out_cols)
        return _group(b, "sum_value_cents")

    return sorted_runs_fold(
        ds.map_batches(partial, batch_format="pyarrow"), key_col, combine
    )


def _np(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.to_numpy(zero_copy_only=False)


def _ticks_per_second(t: pa.DataType) -> int:
    """Integer ticks per second for a timestamp column — the gap
    threshold must scale with the column's unit (a hardcoded 1e6 would
    silently mis-sessionize timestamp[ms]/[ns] inputs)."""
    if pa.types.is_timestamp(t):
        return {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[t.unit]
    raise TypeError(f"expected a timestamp column, got {t}")


def sessionize(
    ds: ray.data.Dataset,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap_s: int = 1800,
) -> ray.data.Dataset:
    """Gap-based session windows per key.

    A new session starts when the time since the previous event of the
    same key exceeds ``gap_s``. Returns one row per session:
    (key, session_id [0-based, in ts order], n_events, sum_value_cents).

    One ``sort([key])`` co-locates (module doc); the kernel lexsorts
    the block by (key, ts) — equal-ts ties have gap 0, so the tie order
    can't change the segmentation — then computes every key's sessions
    in four vectorized passes (gap diff → session boundaries →
    reduceat sums), no per-group UDF.
    """
    out_schema = pa.schema(
        [
            (key_col, pa.int64()),
            ("session_id", pa.int64()),
            ("n_events", pa.int64()),
            ("sum_value_cents", pa.int64()),
        ]
    )

    def kernel(b: pa.Table) -> pa.Table:
        n = b.num_rows
        if n == 0:
            return out_schema.empty_table()
        gap_ticks = gap_s * _ticks_per_second(b[ts_col].type)
        keys = _np(b[key_col]).astype(np.int64, copy=False)
        ts_us = _np(pc.cast(b[ts_col], pa.int64()))
        cents = cents_half_away(_np(b[value_col]))
        order = np.lexsort((ts_us, keys))
        keys, ts_us, cents = keys[order], ts_us[order], cents[order]
        starts = run_starts(keys)
        # session boundary: first event of a key, or gap > threshold
        new_sess = np.zeros(n, dtype=bool)
        new_sess[starts] = True
        gap = np.empty(n, dtype=np.int64)
        gap[0] = 0
        gap[1:] = ts_us[1:] - ts_us[:-1]
        new_sess |= gap > gap_ticks
        sess_starts = np.flatnonzero(new_sess)
        # per-key 0-based session ids: global session counter minus its
        # value at the key's first session
        sess_global = np.cumsum(new_sess) - 1  # id of each row's session
        run_lens = np.diff(np.concatenate((starts, [n])))
        key_base = np.repeat(sess_global[starts], run_lens)
        sess_id_rows = sess_global - key_base
        ends = np.concatenate((sess_starts[1:], [n]))
        return pa.table(
            {
                key_col: pa.array(keys[sess_starts], type=pa.int64()),
                "session_id": pa.array(
                    sess_id_rows[sess_starts], type=pa.int64()
                ),
                "n_events": pa.array(ends - sess_starts, type=pa.int64()),
                "sum_value_cents": pa.array(
                    np.add.reduceat(cents, sess_starts), type=pa.int64()
                ),
            }
        )

    return ds.sort(key_col).map_batches(
        kernel, batch_format="pyarrow", batch_size=None
    )


def top_k(
    ds: ray.data.Dataset,
    *,
    key_col: str,
    value_col: str,
    k: int = 10,
) -> ray.data.Dataset:
    """Top-k keys by exact cents-sum. Deterministic tie-break:
    (sum desc, key asc).

    Distributed shape (keys are UNBOUNDED — users, domains): per-batch
    pyarrow group_by partials (≤ distinct-keys-in-batch rows leave any
    block — Ray's sort-based ``groupby().aggregate()`` would ship every
    RAW row through the range sort instead), completed per key by
    ``sorted_runs_fold`` over volume-bounded blocks, then each block's
    local top-k (k rows) tree-merges via ``fold_blocks_tree`` — the
    top-k selection re-sorts from scratch, so it is its own merge. The
    final sort orders ≤ k rows.

    ``key_col`` keeps its input type (int, string, ...) — the run-scan
    and lexsort tie-break are dtype-generic."""
    import numpy as np

    from logpipe_ray.stages.smallagg import (
        fold_blocks_tree,
        run_starts,
        sorted_runs_fold,
    )

    def _empty(b: pa.Table) -> pa.Table:
        return pa.schema(
            [(key_col, b.schema.field(key_col).type), ("total_cents", pa.int64())]
        ).empty_table()

    def partial(b: pa.Table) -> pa.Table:
        b = add_value_cents(b, value_col=value_col)
        t = pa.table({key_col: b[key_col], "total_cents": b["value_cents"]})
        if t.num_rows == 0:
            return _empty(t)
        g = t.group_by([key_col]).aggregate([("total_cents", "sum")])
        g = g.rename_columns(
            [c[: -len("_sum")] if c.endswith("_sum") else c for c in g.column_names]
        )
        # value_cents is int64 (add_value_cents) and an int64 group_by
        # sum stays int64 — no cast needed
        return g.select([key_col, "total_cents"])

    def key_combine(b: pa.Table) -> pa.Table:
        # a key's rows are confined to this block (single-column sort)
        if b.num_rows == 0:
            return _empty(b)
        kv = b[key_col].combine_chunks().to_numpy(zero_copy_only=False)
        tc = b["total_cents"].combine_chunks().to_numpy(zero_copy_only=False)
        starts = run_starts(kv)
        return pa.table(
            {
                key_col: b[key_col].take(pa.array(starts, type=pa.int64())),
                "total_cents": pa.array(
                    np.add.reduceat(tc, starts).astype(np.int64),
                    type=pa.int64(),
                ),
            }
        )

    def local_topk(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _empty(b)
        kv = b[key_col].combine_chunks().to_numpy(zero_copy_only=False)
        tc = b["total_cents"].combine_chunks().to_numpy(zero_copy_only=False)
        keep = np.lexsort((kv, -tc))[:k]
        return pa.table(
            {
                key_col: b[key_col].take(pa.array(keep, type=pa.int64())),
                "total_cents": pa.array(tc[keep], type=pa.int64()),
            }
        )

    totals = sorted_runs_fold(
        ds.map_batches(partial, batch_format="pyarrow"), key_col, key_combine
    )
    top = fold_blocks_tree(
        totals.map_batches(local_topk, batch_format="pyarrow", batch_size=None),
        local_topk,
    )
    return top.sort(["total_cents", key_col], descending=[True, False]).limit(k)


def asof_join_by_key(
    ds: ray.data.Dataset,
    *,
    key_col: str,
    ts_col: str,
    left_mask_col: str,
    right_mask_col: str,
    left_id: str,
    right_id: str,
    out_right_id: str,
) -> ray.data.Dataset:
    """As-of join within each key: for every left row, the most recent
    right row with ts <= left.ts (backward, exact matches allowed).

    Left/right membership comes from boolean mask columns so a single
    pass over one dataset can as-of join two of its slices (e.g.
    purchases against signups in an event log).

    Kernel: ``sort([key])`` co-locates (module doc); the block is
    lexsorted by (key, ts, side, right_id) with right rows ordered
    BEFORE left rows at equal ts (side=0 for right; right_id last so
    among equal-ts right rows the LAST by id wins — merge_asof's
    right-sorted-by-(ts, id) "most recent" convention, bit-exact), so
    "last right at block position < here" == "last right with ts <=
    mine, exact ties included" — a single prefix-count (cumsum of the
    right mask) then answers every left row at once; a key check on the
    candidate rejects cross-key bleed. No per-group merge_asof calls.
    """
    out_schema = pa.schema([(left_id, pa.int64()), (out_right_id, pa.float64())])

    def kernel(b: pa.Table) -> pa.Table:
        n = b.num_rows
        if n == 0:
            return out_schema.empty_table()
        keys = _np(b[key_col]).astype(np.int64, copy=False)
        ts_us = _np(pc.cast(b[ts_col], pa.int64()))
        lmask = _np(b[left_mask_col]).astype(bool, copy=False)
        rmask = _np(b[right_mask_col]).astype(bool, copy=False)
        lids = _np(b[left_id])
        rids = _np(b[right_id]).astype(np.float64, copy=False)
        tie = np.where(np.isnan(rids), 0.0, rids)
        order = np.lexsort((tie, lmask.astype(np.int8), ts_us, keys))
        keys, lmask, rmask = keys[order], lmask[order], rmask[order]
        lids, rids = lids[order], rids[order]
        r_pos = np.flatnonzero(rmask)
        # prefix count of right rows at-or-before each position
        cnt = np.cumsum(rmask)
        l_pos = np.flatnonzero(lmask)
        cand = cnt[l_pos] - 1  # index into r_pos of the candidate match
        safe = np.maximum(cand, 0)
        if len(r_pos):
            valid = (cand >= 0) & (keys[r_pos[safe]] == keys[l_pos])
            matched = np.where(valid, rids[r_pos[safe]], np.nan)
        else:
            matched = np.full(len(l_pos), np.nan)
        return pa.table(
            {
                left_id: pa.array(
                    lids[l_pos].astype(np.int64), type=pa.int64()
                ),
                out_right_id: pa.array(matched, type=pa.float64()),
            }
        )

    return ds.sort(key_col).map_batches(
        kernel, batch_format="pyarrow", batch_size=None
    )


def cumulative_sum_by_key(
    ds: ray.data.Dataset,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> ray.data.Dataset:
    """Per-key running cents-sum in (ts, id) order → (id, running_cents).

    ``sort([key])`` co-locates; the kernel lexsorts the block by
    (key, ts, id), then one cumsum with a per-run reset (subtract the
    running total at each key's first row) — every key in the block in
    one vectorized pass (module doc)."""
    out_schema = pa.schema([(id_col, pa.int64()), ("running_cents", pa.int64())])

    def kernel(b: pa.Table) -> pa.Table:
        n = b.num_rows
        if n == 0:
            return out_schema.empty_table()
        keys = _np(b[key_col]).astype(np.int64, copy=False)
        ts_us = _np(pc.cast(b[ts_col], pa.int64()))
        ids = _np(b[id_col]).astype(np.int64, copy=False)
        cents = cents_half_away(_np(b[value_col]))
        order = np.lexsort((ids, ts_us, keys))
        keys, ids, cents = keys[order], ids[order], cents[order]
        starts = run_starts(keys)
        run_lens = np.diff(np.concatenate((starts, [n])))
        total = np.cumsum(cents)
        base = np.repeat(total[starts] - cents[starts], run_lens)
        return pa.table(
            {
                id_col: pa.array(ids, type=pa.int64()),
                "running_cents": pa.array(total - base, type=pa.int64()),
            }
        )

    return ds.sort(key_col).map_batches(
        kernel, batch_format="pyarrow", batch_size=None
    )


def lag_diff_by_key(
    ds: ray.data.Dataset,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> ray.data.Dataset:
    """Per-key lead/lag delta in (ts, id) order: each event's cents
    value minus the previous event's (first event per key → 0, via the
    COALESCE(lag(...), cents) convention, keeping the column pure
    int64 — nullable ints degrade to float64 through pandas/Arrow and
    break the integer-cents oracle rule) — the LAG() window
    restatement. ``sort([key])`` co-locates; the kernel lexsorts the
    block by (key, ts, id), then one shifted diff with the delta zeroed
    at run starts (module doc)."""
    out_schema = pa.schema([(id_col, pa.int64()), ("delta_cents", pa.int64())])

    def kernel(b: pa.Table) -> pa.Table:
        n = b.num_rows
        if n == 0:
            return out_schema.empty_table()
        keys = _np(b[key_col]).astype(np.int64, copy=False)
        ts_us = _np(pc.cast(b[ts_col], pa.int64()))
        ids = _np(b[id_col]).astype(np.int64, copy=False)
        cents = cents_half_away(_np(b[value_col]))
        order = np.lexsort((ids, ts_us, keys))
        keys, ids, cents = keys[order], ids[order], cents[order]
        delta = np.zeros(n, dtype=np.int64)
        delta[1:] = cents[1:] - cents[:-1]
        delta[run_starts(keys)] = 0
        return pa.table(
            {
                id_col: pa.array(ids, type=pa.int64()),
                "delta_cents": pa.array(delta, type=pa.int64()),
            }
        )

    return ds.sort(key_col).map_batches(
        kernel, batch_format="pyarrow", batch_size=None
    )
