"""Event-stream windowed aggregates over an ordered, partitioned log.

The reference delivers immediately and has no windows (SURVEY.md §2.5
"Windows: none"), but a complete engine over the ``events`` table needs
them. Ray Data has no event-time watermarks; the batch restatement
(per ray_guide "Streaming-shaped workloads"):

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
        cents = np.round(g[value_col] * 100.0).astype(np.int64)
        out = (
            pd.DataFrame(
                {
                    key_col: g[key_col].to_numpy(),
                    "session_id": session.to_numpy(),
                    "value_cents": cents.to_numpy(),
                }
            )
            .groupby([key_col, "session_id"], as_index=False)
            .agg(n_events=("value_cents", "size"), sum_value_cents=("value_cents", "sum"))
        )
        out["session_id"] = out["session_id"].astype(np.int64)
        out["n_events"] = out["n_events"].astype(np.int64)
        return out

    return ds.groupby(key_col).map_groups(per_key, batch_format="pandas")


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
