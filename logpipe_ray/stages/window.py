"""Event-stream windowed aggregates over an ordered, partitioned log.

The reference delivers immediately and has no windows (SURVEY.md §2.5
"Windows: none"), but a complete engine over the ``events`` table needs
them. Ray Data has no event-time watermarks; the batch restatement
(composed from public Ray Data groupby/map_groups primitives,
https://docs.ray.io/en/latest/data/grouping-data.html):

- **tumbling window**: window id is a pure function of ts → add the
  column vectorized in ``map_batches``, then a plain groupby — no
  per-key ordering needed.
- **session window** (gap-based): requires per-key time order →
  ``groupby(key).map_groups`` with a pandas sort + gap cumsum inside
  each group. Assumes one key's events fit in a worker (salt/secondary
  window if a key is pathological).

Monetary/value sums are carried as integer cents so results are exactly
reproducible across engines (float sum order is not deterministic).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Sum

from logpipe_ray.stages.smallagg import map_groups_typed


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
    """count + exact cents-sum per (key, tumbling window)."""

    def prep(b: pa.Table) -> pa.Table:
        b = add_tumbling_window(b, ts_col=ts_col, width_s=width_s)
        b = add_value_cents(b, value_col=value_col)
        return b.select([key_col, "window", "value_cents"])

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby([key_col, "window"])
        .aggregate(
            Count(alias_name="n_events"),
            Sum("value_cents", alias_name="sum_value_cents"),
        )
    )


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
    Ordering assumption: all events of one key are colocated by the
    groupby shuffle and sorted by ts inside the group.
    """

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, "event_id"] if "event_id" in g else [ts_col])
        gaps = g[ts_col].diff().dt.total_seconds().fillna(0.0)
        session = (gaps > gap_s).cumsum()
        cents = cents_half_away(g[value_col])
        out = (
            pd.DataFrame(
                {
                    key_col: g[key_col].to_numpy(),
                    "session_id": session.to_numpy(),
                    "value_cents": cents,
                }
            )
            .groupby([key_col, "session_id"], as_index=False)
            .agg(n_events=("value_cents", "size"), sum_value_cents=("value_cents", "sum"))
        )
        out["session_id"] = out["session_id"].astype(np.int64)
        out["n_events"] = out["n_events"].astype(np.int64)
        return out

    schema = pa.schema(
        [
            (key_col, pa.int64()),
            ("session_id", pa.int64()),
            ("n_events", pa.int64()),
            ("sum_value_cents", pa.int64()),
        ]
    )
    return map_groups_typed(ds, key_col, per_key, schema)


def top_k(
    ds: ray.data.Dataset,
    *,
    key_col: str,
    value_col: str,
    k: int = 10,
) -> ray.data.Dataset:
    """Top-k keys by exact cents-sum (pre-agg → sort → limit).

    Deterministic tie-break: (sum desc, key asc).
    """

    def prep(b: pa.Table) -> pa.Table:
        b = add_value_cents(b, value_col=value_col)
        return b.select([key_col, "value_cents"])

    totals = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(key_col)
        .aggregate(Sum("value_cents", alias_name="total_cents"))
    )
    return totals.sort(["total_cents", key_col], descending=[True, False]).limit(k)


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

    Composition: co-locate by key
    with one groupby shuffle, then ``pd.merge_asof`` over the sorted
    group. Left/right membership comes from boolean mask columns so a
    single pass over one dataset can as-of join two of its slices
    (e.g. purchases against signups in an event log).
    """

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g[left_mask_col]].sort_values([ts_col, left_id])
        right = g[g[right_mask_col]].sort_values([ts_col, right_id])
        if len(left) == 0:
            return pd.DataFrame(
                {
                    left_id: pd.Series([], dtype="int64"),
                    out_right_id: pd.Series([], dtype="float64"),
                }
            )
        if len(right) == 0:
            out = pd.DataFrame({left_id: left[left_id].astype("int64")})
            out[out_right_id] = np.nan
            return out
        merged = pd.merge_asof(
            left[[ts_col, left_id]],
            right[[ts_col, right_id]].rename(columns={right_id: out_right_id}),
            on=ts_col,
            direction="backward",
            allow_exact_matches=True,
        )
        return merged[[left_id, out_right_id]].astype(
            {left_id: "int64", out_right_id: "float64"}
        )

    schema = pa.schema([(left_id, pa.int64()), (out_right_id, pa.float64())])
    return map_groups_typed(ds, key_col, per_key, schema)


def cumulative_sum_by_key(
    ds: ray.data.Dataset,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> ray.data.Dataset:
    """Per-key running cents-sum in (ts, id) order → (id, running_cents)."""

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, id_col])
        cents = cents_half_away(g[value_col])
        return pd.DataFrame(
            {
                id_col: g[id_col].astype("int64").to_numpy(),
                "running_cents": cents.cumsum(),
            }
        )

    schema = pa.schema([(id_col, pa.int64()), ("running_cents", pa.int64())])
    return map_groups_typed(ds, key_col, per_key, schema)


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
    restatement (co-locate by key, order within the group; same
    partitioning contract as cumulative_sum_by_key)."""

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, id_col])
        cents = np.asarray(cents_half_away(g[value_col]), dtype=np.int64)
        delta = np.diff(cents, prepend=cents[:1] if len(cents) else 0)
        return pd.DataFrame(
            {
                id_col: g[id_col].astype("int64").to_numpy(),
                "delta_cents": delta,
            }
        )

    schema = pa.schema([(id_col, pa.int64()), ("delta_cents", pa.int64())])
    return map_groups_typed(ds, key_col, per_key, schema)
