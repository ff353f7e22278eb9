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
"""

from __future__ import annotations

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
