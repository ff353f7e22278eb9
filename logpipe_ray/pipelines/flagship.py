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
from logpipe_ray.stages.smallagg import fold_partials_tree, map_groups_typed
from logpipe_ray.sources.sequences import synthesize_sequences
from logpipe_ray.stages.enrich import BroadcastEnricher, Enricher
from logpipe_ray.stages.parse import cut_route_key
from logpipe_ray.state.counters import aggregate_counters


def enrich_pipeline(
    ds: ray.data.Dataset,
    *,
    routes: dict | None = None,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 8192,
) -> ray.data.Dataset:
    """sequences Dataset → parse(route_key) → enrich(sink, system, server).

    All stages are *stateless task* transforms, so Ray Data fuses
    read → parse → enrich (→ the downstream routed write) into one
    single-pass operator — each block is touched once, no extra object
    store round-trips. The enrich lookup uses a broadcast
    ``ray.put``-once routes table resolved at most once per worker
    process (:class:`BroadcastEnricher`). Measured 2.3× faster than
    funneling blocks through a fixed actor pool for this light lookup
    (BASELINE.md); the actor-pool variant (:class:`Enricher`,
    ``concurrency=N``) remains the pattern for heavy-state stages.
    """
    if routes is None:
        routes = default_route_table()
    ds = ds.map_batches(cut_route_key, batch_format="pyarrow", batch_size=batch_size)
    if concurrency is not None:
        routes_ref = ray.put(routes)
        return ds.map_batches(
            Enricher,
            fn_constructor_kwargs={"routes_ref": routes_ref},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
            num_cpus=0.5,
        )
    routes_ref = ray.put(routes)
    return ds.map_batches(
        BroadcastEnricher(routes_ref),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def route_and_count(
    enriched: ray.data.Dataset,
    out_dir: str,
    *,
    batch_size: int = 8192,
    roll_bytes: int = 256 << 20,
) -> ray.data.Dataset:
    """Routed fan-out write + single-pass counters (see run_flagship)."""
    from functools import partial

    from logpipe_ray.stages.route import write_routed_batch

    partials = enriched.map_batches(
        partial(write_routed_batch, out_dir=out_dir, roll_bytes=roll_bytes),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    return fold_partials_tree(partials, ["source", "sink"], ["n_rows", "sum_n_tok"])


def build_enriched(
    sf_dir: str,
    *,
    expand: int = 1,
    routes: dict | None = None,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 8192,
) -> ray.data.Dataset:
    """Synthesize the sequences table from ``sf_dir`` and enrich it."""
    ds = synthesize_sequences(sf_dir, expand=expand, batch_size=batch_size)
    return enrich_pipeline(
        ds, routes=routes, concurrency=concurrency, batch_size=batch_size
    )


def run_flagship(
    sf_dir: str,
    out_dir: str,
    *,
    expand: int = 1,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 8192,
) -> ray.data.Dataset:
    """Full pipeline incl. routed fan-out write; returns the counters Dataset.

    Output layout: ``{out_dir}/sink=<sink>/part-*.parquet`` — one
    directory per sink (merge-by-filename analog, SURVEY.md §2.4
    output-file), so a consumer of one sink reads one directory.

    Single pass: the routed write stage itself emits per-batch counter
    partials, which a tiny groupby folds into the final per-(source,
    sink) counters — data is written and counted in the same streaming
    execution (commit-after-write semantics, src/output.c:280-302).
    Uses the fused single-operator path (:func:`run_fused`) unless an
    actor-pool enrich is explicitly requested via ``concurrency``.
    """
    if concurrency is not None:
        enriched = build_enriched(
            sf_dir, expand=expand, concurrency=concurrency, batch_size=batch_size
        )
        return route_and_count(enriched, out_dir, batch_size=batch_size)
    seq = synthesize_sequences(sf_dir, expand=expand, batch_size=batch_size)
    return run_fused(seq, out_dir)  # writer-sized batches (see run_fused)


def read_routed(out_dir: str, *, columns: list[str] | None = None) -> ray.data.Dataset:
    """Read back the routed per-sink output (hive-partitioned by sink)."""
    return ray.data.read_parquet(out_dir, columns=columns)


def route_shuffled(
    enriched: ray.data.Dataset,
    out_dir: str,
    *,
    hot_sinks: frozenset[str] | None = None,
    salt_buckets: int = 16,
    batch_size: int = 8192,
) -> ray.data.Dataset:
    """The explicit hash-partitioned router: shuffle rows by (sink, salt)
    so each output partition holds exactly one sink's rows, then write
    one file per partition.

    This is the shuffle alternative to :func:`route_and_count` (which
    fans out per-sink files from every task without moving rows). Use it
    when sinks need few large files or downstream work is per-sink;
    ``hot_sinks`` rows are salted into ``salt_buckets`` sub-partitions
    (stages/route.add_salt) so the ~50%-of-rows hot sink cannot become
    one giant straggler partition — the north-rule skew requirement.
    Counters are folded from the same written groups (single pass).
    """
    import pyarrow as pa

    from logpipe_ray.stages.route import add_salt, write_routed_batch

    if hot_sinks is None:
        hot_sinks = frozenset({"sink-web"})  # receives the hot source

    salted = enriched.map_batches(
        lambda b: add_salt(
            b, hot_keys=hot_sinks, key_col="sink", buckets=salt_buckets
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
    )

    def write_group(tbl: pa.Table) -> pa.Table:
        salt = tbl["salt"][0].as_py() if tbl.num_rows else 0
        sink = tbl["sink"][0].as_py() if tbl.num_rows else ""
        tag = f"shuf-{sink}-{salt:04d}"
        return write_routed_batch(
            tbl.drop_columns(["salt"]), out_dir=out_dir, file_tag=tag
        )

    counter_schema = pa.schema(
        [
            ("source", pa.string()),
            ("sink", pa.string()),
            ("n_rows", pa.int64()),
            ("sum_n_tok", pa.int64()),
        ]
    )
    # Distinct (sink, salt) groups = cold sinks (salt 0) + salt_buckets
    # for the hot sink — ~20 with the default route table. Half that as
    # the sort block count keeps every sort range nonempty (no
    # schema-less empties; see map_groups_typed) while the write
    # parallelism stays group-bounded anyway.
    partials = map_groups_typed(
        salted,
        ["sink", "salt"],
        write_group,
        counter_schema,
        batch_format="pyarrow",
        pre_blocks=max(2, salt_buckets // 2),
    )
    return fold_partials_tree(partials, ["source", "sink"], ["n_rows", "sum_n_tok"])


def run_fused(
    seq_ds: ray.data.Dataset,
    out_dir: str,
    *,
    routes: dict | None = None,
    batch_size: int = 65536,
) -> ray.data.Dataset:
    """Single-operator flagship: parse+enrich+routed-write composed into
    ONE map_batches UDF so the whole hot path is one task per block — no
    operator boundaries, no intermediate blocks in the object store
    (measured ~17% faster than the three-stage chain; BASELINE.md).
    Semantically identical to enrich_pipeline → route_and_count.

    ``batch_size`` doubles as the output-file size lever (one part file
    per sink per batch, bounded above by the writer's ``roll_bytes``)
    AND the load-balance granularity: 64k rows ≈ 150 tasks at the bench
    scale — measured 14% faster than 128k (67 tasks pack poorly onto 32
    CPUs) while hot-sink files stay ~17 MB zstd (the small-files killer
    was ~3 MB files at 16k batches)."""
    from functools import partial

    from logpipe_ray.stages.enrich import enrich_batch
    from logpipe_ray.stages.route import write_routed_batch

    if routes is None:
        routes = default_route_table()
    routes_ref = ray.put(routes)

    def fused(b, _ref=routes_ref):
        import ray as _ray

        from logpipe_ray.stages.enrich import _PROC_CACHE

        key = _ref.hex()
        if key not in _PROC_CACHE:
            _PROC_CACHE[key] = _ray.get(_ref)
        r = _PROC_CACHE[key]
        return write_routed_batch(
            enrich_batch(cut_route_key(b), r), out_dir=out_dir
        )

    partials = seq_ds.map_batches(
        fused, batch_format="pyarrow", batch_size=batch_size
    )
    return fold_partials_tree(partials, ["source", "sink"], ["n_rows", "sum_n_tok"])
