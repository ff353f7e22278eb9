"""The flagship parse → enrich → route → aggregate pipeline.

Ray-Data-native restatement of logpipe's collect→forward dataflow
(src/output.c:103-355 WriteAllOutputPlugins; SURVEY.md §7.0):

    synthesize/read sequences                  # source (input_hint shape)
      → map_batches(parse: cut route_key)      # vectorized pyarrow.compute
      → map_batches(Enricher, concurrency=N)   # broadcast source→route lookup
      → write_parquet(out, partition_cols=[sink])   # fan-out per-sink dirs
    read back routed output (column-pruned)
      → partial pre-agg → groupby(source, sink)     # forwarded-record counters

Counters are computed over the *written* routed output — mirroring the
reference's commit-after-write semantics (offsets committed only after
all outputs accepted the block, src/output.c:280-302): what we count is
what actually landed in the sinks.

``tokens`` passes through every stage untouched (append-only columnar
transforms, zero-copy Arrow) — the per-row token-array-equality
invariant.
"""

from __future__ import annotations

import ray
import ray.data

from logpipe_ray.routes import default_route_table
from logpipe_ray.sources.sequences import synthesize_sequences
from logpipe_ray.stages.enrich import Enricher
from logpipe_ray.stages.parse import cut_route_key
from logpipe_ray.state.counters import aggregate_counters
from logpipe_ray.util import pool_size


def build_enriched(
    sf_dir: str,
    *,
    expand: int = 1,
    routes: dict | None = None,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 8192,
) -> ray.data.Dataset:
    """sequences → parse(route_key) → enrich(sink, system, server).

    Stage/resource layout (matters — wrong sizing deadlocks a small
    cluster): synthesis + parse are *stateless tasks* (elastic, use every
    free CPU — they carry the heavy vectorized token work), while the
    enrich lookup is a small *actor pool* at ``num_cpus=0.5``. The
    fractional CPU (a) keeps the pool from starving the read/write task
    stages and (b) prevents operator fusion from dragging the heavy
    parse work into the fixed-size pool. The lookup itself is
    O(distinct sources) per batch — light.
    """
    if routes is None:
        routes = default_route_table()
    if concurrency is None:
        concurrency = pool_size(per_actor_cpus=0.5, reserve_cpus=2, cap=8)
    ds = synthesize_sequences(sf_dir, expand=expand, batch_size=batch_size)
    ds = ds.map_batches(cut_route_key, batch_format="pyarrow", batch_size=batch_size)
    routes_ref = ray.put(routes)
    return ds.map_batches(
        Enricher,
        fn_constructor_kwargs={"routes_ref": routes_ref},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=0.5,
    )


def run_flagship(
    sf_dir: str,
    out_dir: str,
    *,
    expand: int = 1,
    concurrency: int | tuple[int, int] = 4,
    batch_size: int = 8192,
) -> ray.data.Dataset:
    """Full pipeline incl. routed fan-out write; returns the counters Dataset.

    Output layout: ``{out_dir}/sink=<sink>/...parquet`` — one directory
    per sink (merge-by-filename analog, SURVEY.md §2.4 output-file), so a
    consumer of one sink reads one directory, and a rerun can target
    individual sinks.
    """
    enriched = build_enriched(
        sf_dir, expand=expand, concurrency=concurrency, batch_size=batch_size
    )
    enriched.write_parquet(out_dir, partition_cols=["sink"])
    routed = read_routed(out_dir, columns=["source", "n_tok", "sink"])
    return aggregate_counters(routed)


def read_routed(out_dir: str, *, columns: list[str] | None = None) -> ray.data.Dataset:
    """Read back the routed per-sink output (hive-partitioned by sink)."""
    return ray.data.read_parquet(out_dir, columns=columns)
