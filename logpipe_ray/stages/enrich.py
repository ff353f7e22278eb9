"""Broadcast-lookup enrich stage (stateful actor pool).

The analog of logpipe's pack-metadata filter + sink routing config: a
small source→(sink, system, server) table attached to every row. The
reference holds this in per-plugin config structs loaded once at start
(src/config.c:441-489, logpipe-filter-pack-metadata.c:52-100); we hold
it in actor state, fetched once per actor from the object store
(``ray.put`` on the driver → ``ray.get`` in ``__init__``), never
re-shipped per batch and never a distributed join.

The per-batch lookup is O(distinct sources in batch), not O(rows):
``source`` is dictionary-encoded, each *unique* value resolved in
Python, then the resolved columns are materialized with a vectorized
``take``.
"""

from __future__ import annotations

from typing import Mapping

import pyarrow as pa
import pyarrow.compute as pc
import ray

from logpipe_ray.routes import DEFAULT_ROUTE

ENRICH_COLS = ("sink", "system", "server")


def enrich_batch(
    batch: pa.Table,
    routes: Mapping[str, Mapping[str, str]],
    *,
    source_col: str = "source",
    default: Mapping[str, str] = DEFAULT_ROUTE,
) -> pa.Table:
    """Append sink/system/server columns resolved from the routes table."""
    enc = pc.dictionary_encode(batch[source_col])
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    uniq = enc.dictionary.to_pylist()
    indices = enc.indices
    for col in ENRICH_COLS:
        resolved = pa.array(
            [routes.get(u, default)[col] for u in uniq], type=pa.string()
        )
        batch = batch.append_column(col, resolved.take(indices))
    return batch


_PROC_CACHE: dict[str, Mapping] = {}


class BroadcastEnricher:
    """Task-mode enrich: a picklable callable holding a broadcast ref.

    Passed as an *instance* to ``map_batches`` → runs as stateless
    tasks, so Ray Data fuses it with the surrounding parse/write task
    stages into one single-pass operator — measured 2.3× faster than an
    actor-pool hop for this light lookup (every block otherwise takes an
    extra plasma round-trip through the pool; see BASELINE.md).

    The routes table is broadcast once (``ray.put`` on the driver) and
    resolved at most once per worker process (module-level cache) — the
    small side is never re-shipped per batch. Use :class:`Enricher`
    (actor pool) instead when per-worker state is genuinely heavy
    (models, indexes) or must be isolated.
    """

    def __init__(
        self,
        routes_ref,
        *,
        source_col: str = "source",
        default: Mapping[str, str] = DEFAULT_ROUTE,
    ):
        self.routes_ref = routes_ref
        self.source_col = source_col
        self.default = dict(default)

    def _routes(self) -> Mapping[str, Mapping[str, str]]:
        from logpipe_ray.util import bounded_resolve

        return bounded_resolve(_PROC_CACHE, self.routes_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return enrich_batch(
            batch, self._routes(), source_col=self.source_col, default=self.default
        )


class Enricher:
    """Actor-pool enrich stage for ``map_batches(Enricher, concurrency=N)``.

    ``__init__`` runs once per actor (the Load*PluginConfig /
    Init*PluginContext analog, src/env.c:12-72): it resolves the
    broadcast routes object. ``__call__`` runs per batch.

    Use ``fn_constructor_kwargs={"routes_ref": ray.put(table)}``.
    A plain dict also works (it is then serialized into the actor
    definition once — fine for tiny tables).
    """

    def __init__(
        self,
        routes_ref,
        *,
        source_col: str = "source",
        default: Mapping[str, str] = DEFAULT_ROUTE,
    ):
        if isinstance(routes_ref, ray.ObjectRef):
            self.routes = ray.get(routes_ref)
        else:
            self.routes = routes_ref
        self.source_col = source_col
        self.default = dict(default)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return enrich_batch(
            batch, self.routes, source_col=self.source_col, default=self.default
        )
