"""Join strategies (SURVEY.md §2.5 "Lookup/enrich"; Ray Data joins:
https://docs.ray.io/en/latest/data/joining-data.html).

The reference's only join is the degenerate broadcast lookup (config
source→sink table); a complete data-processing engine needs the full
set, each chosen by side sizes:

- **broadcast join** (small side fits in memory): `ray.put` the small
  Arrow table once, per-batch `pa.Table.join` inside ``map_batches`` —
  no shuffle, the default for dimension tables.
- **bucketed hash join** (both sides large): add ``bucket = key % B`` to
  both sides, union with a side marker, ``groupby(bucket).map_groups``
  joining the two sides inside each bucket — an explicit partitioned
  hash join; B chosen so a bucket fits a worker's heap; salt hot keys.
- **semi / anti join**: broadcast the key set, vectorized ``is_in``
  filter inside ``map_batches`` — never a shuffle.
- **range join** (non-equi): broadcast variant for dimension-sized
  interval tables (per-interval vectorized masks — intervals may
  overlap); banded variant for large×large time-proximity joins
  (bucket by ``t // delta``, replicate the right side into the ±1
  neighbor buckets, co-locate with ONE volume-bounded range sort and
  count per run with ``np.searchsorted`` — the classic band-join
  restatement; only (key, t, id) triples shuffle, never payloads).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

_PROC_CACHE: dict[str, object] = {}


def _resolve(ref):
    from logpipe_ray.util import bounded_resolve

    return bounded_resolve(_PROC_CACHE, ref)


class BroadcastJoiner:
    """Task-mode per-batch hash join against a broadcast small table."""

    def __init__(
        self,
        small_ref,
        *,
        keys: str | list[str],
        right_keys: str | list[str] | None = None,
        join_type: str = "inner",
    ):
        self.small_ref = small_ref
        self.keys = [keys] if isinstance(keys, str) else list(keys)
        rk = right_keys if right_keys is not None else keys
        self.right_keys = [rk] if isinstance(rk, str) else list(rk)
        self.join_type = join_type

    def __call__(self, batch: pa.Table) -> pa.Table:
        small: pa.Table = _resolve(self.small_ref)
        return batch.join(
            small,
            keys=self.keys,
            right_keys=self.right_keys,
            join_type=self.join_type,
        )


def broadcast_join(
    ds: ray.data.Dataset,
    small: pa.Table,
    *,
    keys: str | list[str],
    right_keys: str | list[str] | None = None,
    join_type: str = "inner",
    batch_size: int = 16384,
) -> ray.data.Dataset:
    ref = ray.put(small)
    return ds.map_batches(
        BroadcastJoiner(ref, keys=keys, right_keys=right_keys, join_type=join_type),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


class BroadcastSemiFilter:
    """Semi (keep matches) / anti (keep non-matches) via broadcast key set."""

    def __init__(self, keys_ref, *, key_col: str, anti: bool = False):
        self.keys_ref = keys_ref
        self.key_col = key_col
        self.anti = anti

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = _resolve(self.keys_ref)
        mask = pc.is_in(batch[self.key_col], value_set=keys)
        if self.anti:
            mask = pc.invert(mask)
        return batch.filter(mask)


def semi_join(
    ds: ray.data.Dataset,
    keys: pa.Array | pa.ChunkedArray,
    *,
    key_col: str,
    anti: bool = False,
    batch_size: int = 16384,
) -> ray.data.Dataset:
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    ref = ray.put(keys)
    return ds.map_batches(
        BroadcastSemiFilter(ref, key_col=key_col, anti=anti),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def distinct_keys(ds: ray.data.Dataset, key_col: str) -> pa.Array:
    """Distributed distinct of one key column, for a broadcast semi/anti
    join: per-block pre-distinct inside map_batches (so only already-
    unique values enter the shuffle), then ``Dataset.unique``. The
    driver receives exactly the distinct set — use only when that set
    is broadcastable (dimension-key cardinality); otherwise use
    ``hash_join`` in semi mode."""
    pre = ds.map_batches(
        lambda b: pa.table({key_col: pc.unique(b[key_col].combine_chunks())}),
        batch_format="pyarrow",
    )
    vals = pre.unique(key_col)
    return pa.array(sorted(vals))


def join_partitions(
    *,
    small_rows: int | None = None,
    requested: int | None = None,
    cap: int = 16,
    rows_per_partition: int = 64,
) -> int:
    """Partition count for a hash-partitioned ``Dataset.join``, bounded
    two ways:

    - **above by cluster size**: every Ray Data ``JoinOperator``
      partition reserves ~2 GB of logical executor memory up front, so
      a partition count sized for a big cluster deadlocks a small one
      (observed at num_cpus=8 in r2).
    - **above by the small side's row count**: Ray's hash-shuffle
      aggregator builds a SCHEMA-LESS empty table for any partition
      that received zero batches of one side, and pyarrow's join then
      throws ``ArrowInvalid: No match ... FieldRef.Name(<key>)`` (the
      r2 ``dedup_minhash_lsh`` crash at num_cpus=32 with ~50 candidate
      rows). ``rows_per_partition=64`` makes an empty partition
      statistically impossible (p · (1-1/p)^(64p) ≈ p·e⁻⁶⁴) while never
      binding for genuinely large joins, where CPUs cap first.

    An explicit ``requested`` replaces the cluster-CPU base but is
    still clamped by ``small_rows`` — a pinned count must not be able
    to re-introduce the empty-partition crash.
    """
    if requested is not None:
        base = requested
    else:
        from logpipe_ray.util import cluster_cpus

        base = min(cluster_cpus(), cap)
    if small_rows is not None:
        base = min(base, -(-small_rows // rows_per_partition))
    return max(2, base)


class BroadcastRangeJoiner:
    """Inner range join against a broadcast intervals table.

    Emits one output row per (left row, interval) pair with
    ``lo <= value < hi``; intervals MAY overlap (each is tested
    independently with a vectorized mask). When the interval table is
    sorted and non-overlapping — the common case (price tiers, time
    buckets, key ranges) — one ``np.searchsorted`` per batch replaces
    the per-interval masks, so cost is O(rows·log n_intervals)
    regardless of interval count; the general overlap path stays
    O(rows·n_intervals) and is only right for dimension-sized tables.
    The path is chosen once per actor from the broadcast table itself.
    Label columns (everything in ``ranges`` except lo/hi) are appended
    to the matched rows.
    """

    def __init__(self, ranges_ref, *, value_col: str, lo_col: str = "lo", hi_col: str = "hi"):
        self.ranges_ref = ranges_ref
        self.value_col = value_col
        self.lo_col = lo_col
        self.hi_col = hi_col
        self._plan = None  # (disjoint: bool, los, his) resolved on first batch

    def _resolve_plan(self, ranges: pa.Table):
        if self._plan is None:
            los = ranges[self.lo_col].combine_chunks().to_numpy(zero_copy_only=False)
            his = ranges[self.hi_col].combine_chunks().to_numpy(zero_copy_only=False)
            disjoint = bool(
                np.issubdtype(los.dtype, np.number)
                and np.all(los[1:] >= los[:-1])
                and np.all(his[:-1] <= los[1:])
                and np.all(los <= his)
            )
            self._plan = (disjoint, los, his)
        return self._plan

    def __call__(self, batch: pa.Table) -> pa.Table:
        ranges: pa.Table = _resolve(self.ranges_ref)
        label_cols = [
            n for n in ranges.column_names if n not in (self.lo_col, self.hi_col)
        ]
        out_schema = batch.schema
        for n in label_cols:
            out_schema = out_schema.append(ranges.schema.field(n))
        disjoint, los, his = self._resolve_plan(ranges)
        v = batch[self.value_col]
        if ranges.num_rows == 0:
            # vacuously "disjoint" (np.all over empty is True) but the
            # fast path would index the empty his array — zero intervals
            # simply match nothing
            return out_schema.empty_table()
        if disjoint:
            vn = v.combine_chunks().to_numpy(zero_copy_only=False)
            idx = np.searchsorted(los, vn, side="right") - 1
            ok = (idx >= 0) & (vn < his[np.clip(idx, 0, len(his) - 1)])
            sel = batch.take(pa.array(np.flatnonzero(ok), type=pa.int64()))
            hit = idx[ok]
            for n in label_cols:
                col = ranges[n].combine_chunks().take(
                    pa.array(hit, type=pa.int64())
                )
                sel = sel.append_column(n, col)
            return sel if sel.num_rows else out_schema.empty_table()
        parts: list[pa.Table] = []
        for i in range(ranges.num_rows):
            lo = ranges[self.lo_col][i].as_py()
            hi = ranges[self.hi_col][i].as_py()
            sel = batch.filter(
                pc.and_(pc.greater_equal(v, lo), pc.less(v, hi))
            )
            if sel.num_rows == 0:
                continue
            for n in label_cols:
                typ = ranges.schema.field(n).type
                val = pa.scalar(ranges[n][i].as_py(), type=typ)
                sel = sel.append_column(n, pa.repeat(val, sel.num_rows))
            parts.append(sel)
        return pa.concat_tables(parts) if parts else out_schema.empty_table()


def broadcast_range_join(
    ds: ray.data.Dataset,
    ranges: pa.Table,
    *,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    batch_size: int = 16384,
) -> ray.data.Dataset:
    ref = ray.put(ranges)
    return ds.map_batches(
        BroadcastRangeJoiner(ref, value_col=value_col, lo_col=lo_col, hi_col=hi_col),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def band_join_count(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    delta: int,
    key_col: str = "key",
    t_col: str = "t",
    id_col: str = "id",
    out_col: str = "n_matches",
) -> ray.data.Dataset:
    """Large×large band join, aggregated: for every left row, the COUNT
    of right rows with the same key and ``|right.t - left.t| <= delta``
    (inclusive both ends — SQL ``BETWEEN t-delta AND t+delta`` parity).

    ``left`` columns: (key_col, t_col, id_col); ``right``: (key_col,
    t_col). Both int64 (cast timestamps to epoch µs upstream).

    Scale shape: bucket ``t // delta``; a right row is replicated into
    its bucket and both neighbors (any match is within ±1 bucket of the
    left row's), so one volume-bounded range sort on (key, bucket)
    co-locates every left row with ALL its candidates; per-run counting
    is two ``np.searchsorted`` calls against the run's sorted right
    timestamps. Only 4×int64 tuples move — 3× the right side's keys +
    the left's — never an all-pairs product, never a payload shuffle.
    Left rows with zero matches are emitted with 0 (LEFT JOIN parity).
    """
    from logpipe_ray.stages.smallagg import sorted_runs_fold

    def prep_left(b: pa.Table) -> pa.Table:
        t = b[t_col].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "k": pc.cast(b[key_col], pa.int64()),
                "bkt": pa.array(t // delta, type=pa.int64()),
                "side": pa.array(np.zeros(len(t), dtype=np.int8)),
                "t": pa.array(t, type=pa.int64()),
                "rid": pc.cast(b[id_col], pa.int64()),
            }
        )

    def prep_right(b: pa.Table) -> pa.Table:
        t = b[t_col].combine_chunks().to_numpy(zero_copy_only=False)
        k = b[key_col].combine_chunks().to_numpy(zero_copy_only=False)
        bkt = t // delta
        n = len(t)
        return pa.table(
            {
                "k": pa.array(np.tile(k, 3), type=pa.int64()),
                "bkt": pa.array(
                    np.concatenate((bkt - 1, bkt, bkt + 1)), type=pa.int64()
                ),
                "side": pa.array(np.ones(3 * n, dtype=np.int8)),
                "t": pa.array(np.tile(t, 3), type=pa.int64()),
                "rid": pa.array(np.zeros(3 * n, dtype=np.int64)),
            }
        )

    tagged = left.map_batches(prep_left, batch_format="pyarrow").union(
        right.map_batches(prep_right, batch_format="pyarrow")
    )

    out_schema = pa.schema([(id_col, pa.int64()), (out_col, pa.int64())])

    def count_runs(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return out_schema.empty_table()
        k = b["k"].combine_chunks().to_numpy(zero_copy_only=False)
        bkt = b["bkt"].combine_chunks().to_numpy(zero_copy_only=False)
        side = b["side"].combine_chunks().to_numpy(zero_copy_only=False)
        t = b["t"].combine_chunks().to_numpy(zero_copy_only=False)
        rid = b["rid"].combine_chunks().to_numpy(zero_copy_only=False)
        # normalize within-run order: rights sorted by t, lefts after
        order = np.lexsort((t, side, bkt, k))
        k, bkt, side, t, rid = k[order], bkt[order], side[order], t[order], rid[order]
        change = (k[1:] != k[:-1]) | (bkt[1:] != bkt[:-1])
        starts = np.concatenate(([0], np.flatnonzero(change) + 1))
        ends = np.concatenate((starts[1:], [len(k)]))
        ids: list[np.ndarray] = []
        cnt: list[np.ndarray] = []
        for s, e in zip(starts, ends):
            sd = side[s:e]
            nl = int(np.searchsorted(sd, 1))  # lefts sort first (side 0)
            if nl == 0:
                continue
            lt, rt = t[s : s + nl], t[s + nl : e]
            ids.append(rid[s : s + nl])
            cnt.append(
                np.searchsorted(rt, lt + delta, side="right")
                - np.searchsorted(rt, lt - delta, side="left")
            )
        if not ids:
            return out_schema.empty_table()
        return pa.table(
            {
                id_col: pa.array(np.concatenate(ids), type=pa.int64()),
                out_col: pa.array(
                    np.concatenate(cnt).astype(np.int64), type=pa.int64()
                ),
            }
        )

    return sorted_runs_fold(tagged, ["k", "bkt"], count_runs, rows_per_block=262144)


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    on: str | tuple[str, ...],
    right_on: str | tuple[str, ...] | None = None,
    join_type: str = "inner",
    num_partitions: int | None = None,
    small_rows: int | None = None,
) -> ray.data.Dataset:
    """Large×large hash-partitioned join (both sides shuffle on the key).

    Thin policy wrapper over ``Dataset.join``: use ONLY when both sides
    are too big to broadcast — it is an all-to-all exchange of both
    inputs. ``num_partitions`` bounds per-partition memory (each
    partition joined independently); size it so a partition of the
    larger side fits a worker's heap, and pre-salt hot keys if one key
    dominates (see stages.route.add_salt). Default scales with cluster
    CPUs — each JoinOperator partition reserves ~2 GB of logical
    executor memory up front, so a partition count sized for a big
    cluster deadlocks a small one (see BASELINE.md r2 notes). Pass
    ``small_rows`` (a count of the smaller input, if the caller has
    one) so tiny joins can't hit the empty-partition crash — full
    sizing policy in :func:`join_partitions`.
    """
    num_partitions = join_partitions(
        requested=num_partitions, small_rows=small_rows
    )
    on_t = (on,) if isinstance(on, str) else tuple(on)
    r_t = (
        None
        if right_on is None
        else ((right_on,) if isinstance(right_on, str) else tuple(right_on))
    )
    return left.join(
        right,
        join_type=join_type,
        num_partitions=num_partitions,
        on=on_t,
        right_on=r_t,
    )
