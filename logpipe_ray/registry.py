"""Stage registry: config ``kind`` strings → pipeline stage factories.

The rebuild of logpipe's plugin surface (SURVEY.md §2.5 "User-extension
surface"): where the reference dlopens ``.so`` plugins implementing
typedef'd hook sets from a JSON config (src/config.c:40-290,
src/logpipe_api.h:130-158), this engine maps a config ``kind`` to a
registered factory returning either

- a batch-callable ``fn(batch: pa.Table) -> pa.Table`` (stateless task
  stage), or
- an ``ActorStage(cls, ctor_kwargs, pool_kwargs)`` (stateful actor-pool
  stage — the Init*PluginContext analog).

Third-party stages register with ``@register_stage("kind")`` — a plain
Python function instead of a compiled plugin ABI.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable

import pyarrow as pa


@dataclass
class ActorStage:
    cls: type
    ctor_kwargs: dict[str, Any] = field(default_factory=dict)
    pool_kwargs: dict[str, Any] = field(default_factory=dict)


@dataclass
class DatasetStage:
    """A whole-Dataset transform (ds → ds) — for stages that need a
    shuffle/groupby (packing, dedup, sort) rather than a per-batch map.
    The config chain applies ``fn`` to the running Dataset directly."""

    fn: Callable[[Any], Any]


StageFactory = Callable[..., Any]

STAGES: dict[str, StageFactory] = {}
SOURCES: dict[str, StageFactory] = {}
SINKS: dict[str, StageFactory] = {}


def register_stage(kind: str):
    def deco(fn):
        STAGES[kind] = fn
        return fn

    return deco


def register_source(kind: str):
    def deco(fn):
        SOURCES[kind] = fn
        return fn

    return deco


def register_sink(kind: str):
    def deco(fn):
        SINKS[kind] = fn
        return fn

    return deco


# --- sources ---------------------------------------------------------------


@register_source("parquet")
def _src_parquet(path: str, columns: list[str] | None = None, **kw):
    import ray.data

    return ray.data.read_parquet(path, columns=columns, **kw)


@register_source("sequences")
def _src_sequences(sf_dir: str, expand: int = 1, **kw):
    from logpipe_ray.sources.sequences import synthesize_sequences

    return synthesize_sequences(sf_dir, expand=expand, **kw)


@register_source("log_lines")
def _src_log_lines(path: str, include: list | None = None, exclude: list | None = None):
    from logpipe_ray.sources.text import read_log_lines

    return read_log_lines(path, include=include, exclude=exclude)


@register_source("exec")
def _src_exec(cmds: list, **kw):
    from logpipe_ray.sources.exec import read_exec

    return read_exec(cmds, **kw)


@register_source("message_log")
def _src_message_log(topic_dir: str, state_dir: str, **kw):
    from logpipe_ray.sources.kafka_log import MessageLogSource

    return MessageLogSource(topic_dir, state_dir, **kw).read()


@register_source("tail")
def _src_tail(watch_dir: str, state_dir: str, *, include: list | None = None, **kw):
    """Incremental directory tail (the logpipe-input-file analog as a
    CONFIG source): lines appended since the offsets last committed to
    ``state_dir`` — e.g. an aggregator config reading the tcp sink's
    collector spool. Like the ``message_log`` config source, this does
    NOT advance offsets itself (a config run is a read, not a consumer
    loop); read→process→COMMIT loops belong to the programmatic API
    (`DirectoryTailSource.commit`, `pipelines/ingest.ingest_tick`),
    where the commit is ordered after the durable sink append."""
    from logpipe_ray.sources.stream import DirectoryTailSource

    return DirectoryTailSource(
        watch_dir, state_dir, include=include, **kw
    ).read()


@register_source("orc")
def _src_orc(path: str, **kw):
    from logpipe_ray.sources.columnar import read_orc_dir

    return read_orc_dir(path, **kw)


@register_source("arrow_ipc")
def _src_ipc(path: str, **kw):
    from logpipe_ray.sources.columnar import read_ipc_dir

    return read_ipc_dir(path, **kw)


# --- stages (filters, in reference terms) ----------------------------------


@register_stage("cut_route_key")
def _st_cut(**params):
    from logpipe_ray.stages.parse import cut_route_key

    return partial(cut_route_key, **params)


@register_stage("enrich")
def _st_enrich(routes: dict | None = None, broadcast: bool = True, **params):
    import ray

    from logpipe_ray.routes import default_route_table
    from logpipe_ray.stages.enrich import BroadcastEnricher, Enricher

    routes = routes if routes is not None else default_route_table()
    if broadcast:
        return BroadcastEnricher(ray.put(routes), **params)
    return ActorStage(
        Enricher,
        {"routes_ref": ray.put(routes), **params},
        {"concurrency": 4, "num_cpus": 0.5},
    )


@register_stage("grep")
def _st_grep(**params):
    from logpipe_ray.stages.parse import grep_filter

    return partial(grep_filter, **params)


@register_stage("pack_metadata")
def _st_pack(**params):
    from logpipe_ray.stages.parse import pack_metadata

    return partial(pack_metadata, **params)


@register_stage("unpack_metadata")
def _st_unpack(**params):
    from logpipe_ray.stages.parse import unpack_metadata

    return partial(unpack_metadata, **params)


@register_stage("split_fields")
def _st_split(**params):
    from logpipe_ray.stages.parse import split_fields

    return partial(split_fields, **params)


@register_stage("format_template")
def _st_template(template: str, **params):
    from logpipe_ray.stages.parse import format_template

    return partial(format_template, template=template, **params)


@register_stage("salt")
def _st_salt(hot_keys: list[str], **params):
    from logpipe_ray.stages.route import add_salt

    return partial(add_salt, hot_keys=frozenset(hot_keys), **params)


@register_stage("tokens_sum")
def _st_tokens_sum(**params):
    from logpipe_ray.functions.tokens import add_tokens_sum

    return partial(add_tokens_sum, **params)


@register_stage("text_stats")
def _st_text_stats(**params):
    from logpipe_ray.stages.text_analysis import add_text_stats

    return partial(add_text_stats, **params)


@register_stage("token_count")
def _st_token_count(**params):
    from logpipe_ray.stages.text_analysis import add_token_count

    return partial(add_token_count, **params)


@register_stage("quality_score")
def _st_quality(**params):
    from logpipe_ray.stages.text_analysis import quality_score_batch

    return partial(quality_score_batch, **params)


@register_stage("fingerprint")
def _st_fingerprint(**params):
    from logpipe_ray.stages.text_analysis import fingerprint_batch

    return partial(fingerprint_batch, **params)


@register_stage("lang_id")
def _st_langid(**pool):
    from logpipe_ray.stages.text_analysis import LangId

    return ActorStage(LangId, {}, {"concurrency": 2, "num_cpus": 0.5, **pool})


@register_stage("text_hash")
def _st_text_hash(**params):
    from logpipe_ray.stages.dedup import add_text_hash

    return partial(add_text_hash, **params)


@register_stage("simhash")
def _st_simhash(**params):
    from logpipe_ray.stages.dedup import add_simhash

    return partial(add_simhash, **params)


@register_stage("pack_tokens")
def _st_pack_tokens(**params):
    from logpipe_ray.stages.packing import pack_by_token_budget

    return DatasetStage(partial(pack_by_token_budget, **params))


@register_stage("dedup_exact")
def _st_dedup_exact(**params):
    from logpipe_ray.stages.dedup import exact_dedup

    return DatasetStage(partial(exact_dedup, **params))


@register_stage("chunk_tokens")
def _st_chunk_tokens(**params):
    from logpipe_ray.stages.packing import chunk_tokens

    return partial(chunk_tokens, **params)


@register_stage("token_histogram")
def _st_token_histogram(**params):
    from logpipe_ray.functions.tokens import token_histogram_partials

    return partial(token_histogram_partials, **params)


@register_stage("repetition_stats")
def _st_repetition_stats(**params):
    from logpipe_ray.stages.text_analysis import repetition_stats

    return partial(repetition_stats, **params)


@register_stage("lm_familiarity")
def _st_lm_familiarity(**params):
    """Count-pruned bigram-LM quality scoring (two-pass whole-Dataset
    stage; see stages/text_analysis.lm_familiarity_scores)."""
    from logpipe_ray.stages.text_analysis import lm_familiarity_scores

    return DatasetStage(partial(lm_familiarity_scores, **params))


@register_stage("wav_encode")
def _st_wav_encode(**params):
    from logpipe_ray.stages.multimodal import encode_wav_payload

    return partial(encode_wav_payload, **params)


@register_stage("wav_decode")
def _st_wav_decode(**pool):
    from logpipe_ray.stages.multimodal import WavDecode

    return ActorStage(WavDecode, {}, {"concurrency": 2, "num_cpus": 0.5, **pool})


@register_stage("redact")
def _st_redact(**params):
    from logpipe_ray.stages.text_analysis import redact_batch

    return partial(redact_batch, **params)


@register_stage("decode_payload")
def _st_decode_payload(**pool):
    from logpipe_ray.stages.multimodal import DecodeStub

    return ActorStage(DecodeStub, {}, {"concurrency": 2, "num_cpus": 0.5, **pool})


@register_stage("resize_payload")
def _st_resize_payload(target_w: int = 224, target_h: int = 224, **pool):
    from logpipe_ray.stages.multimodal import ResizeStub

    return ActorStage(
        ResizeStub,
        {"target_w": target_w, "target_h": target_h},
        {"concurrency": 2, "num_cpus": 0.5, **pool},
    )


@register_stage("frame_sample")
def _st_frame_sample(frame_stride: int = 97, **pool):
    from logpipe_ray.stages.multimodal import FrameSampleStub

    return ActorStage(
        FrameSampleStub,
        {"frame_stride": frame_stride},
        {"concurrency": 2, "num_cpus": 0.5, **pool},
    )


@register_stage("transcode_decode")
def _st_transcode_decode(**params):
    from logpipe_ray.stages.encoding import decode_binary

    return partial(decode_binary, **params)


@register_stage("transcode_encode")
def _st_transcode_encode(**params):
    from logpipe_ray.stages.encoding import encode_string

    return partial(encode_string, **params)


@register_stage("select")
def _st_select(columns: list[str]):
    return lambda b: b.select(columns)


# --- sinks (outputs) -------------------------------------------------------


@register_sink("parquet")
def _sink_parquet(ds, path: str, **kw):
    ds.write_parquet(path, **kw)
    return None


@register_sink("routed_parquet")
def _sink_routed(ds, out_dir: str, batch_size: int = 8192, roll=None, **kw):
    """Per-sink fan-out write + single-pass counters (the flagship sink).
    ``roll`` = size-rotation target per output file (the reference's
    rotate_size); accepts ``"64MB"``-style suffix strings via
    config.normalize_units or util.parse_size."""
    from logpipe_ray.pipelines.flagship import route_and_count
    from logpipe_ray.util import parse_size

    extra = {}
    if roll is not None:
        extra["roll_bytes"] = parse_size(roll)
    return route_and_count(ds, out_dir, batch_size=batch_size, **extra)


@register_sink("counters")
def _sink_counters(ds, **kw):
    from logpipe_ray.state.counters import aggregate_counters

    return aggregate_counters(ds)


@register_sink("dataset")
def _sink_dataset(ds, **kw):
    return ds


@register_sink("message_log")
def _sink_message_log(ds, topic_dir: str, **kw):
    """Produce rows into a partitioned message-log topic
    (logpipe-output-kafka analog; see sources/kafka_log.MessageLogSink)."""
    from logpipe_ray.sources.kafka_log import produce_messages
    from logpipe_ray.stages.smallagg import fold_partials_tree

    partials = produce_messages(ds, topic_dir, **kw)
    return fold_partials_tree(partials, "partition", "n_messages")


@register_sink("es")
def _sink_es(ds, url: str | None = None, **kw):
    """ES bulk-HTTP delivery (logpipe-output-es transport half): actor
    pool of keep-alive connections, batched ``_bulk`` POSTs with
    reconnect-retry-resend; returns folded delivery counters. See
    stages/es_sink.py for the full semantics map.

    ``stub=true`` hosts the in-process bulk-HTTP stub server and
    targets it — the run-both-ends-on-localhost demo topology, same as
    the tcp sink's ``collector_spool`` (no external ES in this
    container)."""
    from logpipe_ray.util import pool_size

    batch_size = kw.pop("batch_size", 4096)
    concurrency = kw.pop("concurrency", pool_size(per_actor_cpus=0.5, cap=8))
    stub = None
    if kw.pop("stub", False):
        if url is not None:
            raise ValueError(
                "es sink: stub=true hosts its own endpoint — don't also "
                "pass url (the configured destination would be silently "
                "ignored)"
            )
        from logpipe_ray.stages.es_sink import start_bulk_stub

        stub = start_bulk_stub()
        url = stub.url
    if url is None:
        raise ValueError("es sink needs url=... or stub=true")
    try:
        out = _build_es_sink(
            ds, url, kw, batch_size=batch_size, concurrency=concurrency
        )
        if stub is not None:
            # the hosted stub must outlive the lazy pipeline: execute now
            out = out.materialize()
        return out
    finally:
        if stub is not None:
            # stop the hosted stub (and close its listening fd) whether
            # the run succeeded, failed mid-pipeline, or failed while
            # CONSTRUCTING the pipeline (pool-arg validation etc.)
            stub.shutdown()
            stub.server_close()


def _build_es_sink(ds, url, kw, *, batch_size, concurrency):
    from logpipe_ray.stages.es_sink import PARTIAL_SCHEMA, EsBulkSink
    from logpipe_ray.stages.smallagg import fold_partials_tree

    partials = ds.map_batches(
        EsBulkSink,
        fn_constructor_kwargs={"url": url, **kw},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=0.5,
    ).map_batches(
        # both branches MUST emit the same column order (sink appended
        # LAST) — mismatched orders would crash the fold's concat
        lambda b: b.append_column(
            "sink", pa.array(["es"] * b.num_rows, type=pa.string())
        )
        if b.num_rows
        else PARTIAL_SCHEMA.append(pa.field("sink", pa.string())).empty_table(),
        batch_format="pyarrow",
    )
    return fold_partials_tree(
        partials, "sink", ["n_docs", "n_posts", "n_retries", "n_http_errors"]
    )


@register_sink("tcp")
def _sink_tcp(ds, host: str | None = None, port: int | None = None, **kw):
    """Real TCP frame forwarder (logpipe-output-tcp analog): actor pool
    of persistent sockets sending '@'-framed files with ack +
    reconnect-resend; multi-peer round-robin failover via
    ``peers=["host:port", ...]`` and wire deflate via
    ``compress="deflate"``; see sources/tcp.py.

    ``collector_spool="/dir"`` hosts the receiving collector IN this
    process (uncompress matched to ``compress``) and targets it — the
    reference's run-both-ends-on-localhost demo topology
    (README.md:1275-1338) in one config file; the spool dir persists
    for a downstream ``message_log``/``log_lines`` pipeline to tail."""
    from logpipe_ray.sources.tcp import TcpFrameSink, start_collector
    from logpipe_ray.stages.smallagg import fold_partials_tree
    from logpipe_ray.util import pool_size

    batch_size = kw.pop("batch_size", 8192)
    concurrency = kw.pop("concurrency", pool_size(per_actor_cpus=0.5, cap=8))
    spool = kw.pop("collector_spool", None)
    srv = None
    if spool is not None:
        if host is not None or port is not None or "peers" in kw:
            raise ValueError(
                "tcp sink: collector_spool hosts its own endpoint — "
                "don't also pass host/port/peers (the configured "
                "destination would be silently ignored)"
            )
        srv = start_collector(spool, uncompress=kw.get("compress"))
        kw["peers"] = [("127.0.0.1", srv.port)]
    try:
        partials = ds.map_batches(
            TcpFrameSink,
            fn_constructor_args=(host, port),
            fn_constructor_kwargs=kw,
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
            num_cpus=0.5,
        )
        out = fold_partials_tree(partials, "source", "n_lines")
        if srv is not None:
            # the hosted collector must outlive the lazy pipeline:
            # execute now (counters are sink-cardinality small)
            out = out.materialize()
        return out
    finally:
        if srv is not None:
            # stop the collector (and close its listening fd) whether
            # the run succeeded, failed mid-pipeline, or failed during
            # pipeline CONSTRUCTION
            srv.shutdown()
            srv.server_close()


@register_sink("stdout")
def _sink_stdout(ds, limit: int = 20, **kw):
    """Debug sink (logpipe-output-stdout analog)."""
    df = ds.limit(limit).to_pandas()
    print(df.to_string())
    return df
