"""Config-driven pipeline builder — the LoadConfig analog.

The reference builds its whole dataflow from a JSON file with
``/inputs``, ``/filters``, ``/outputs`` arrays (src/config.c:293-492);
this engine's spec mirrors that shape:

    {
      "source":  {"kind": "sequences", "sf_dir": "..."},
      "stages":  [ {"kind": "cut_route_key"},
                   {"kind": "enrich"},
                   {"kind": "grep", "text_col": "source", "pattern": "web"} ],
      "sink":    {"kind": "routed_parquet", "out_dir": "..."},
      "batch_size": 8192
    }

Stages run in config order, each seeing the previous stage's output —
the reference's filter-chain contract (src/output.c:232-253); a stage
that filters rows drops them for everything downstream (the filter
return>0 drop path, :244-248). Kinds resolve through
``logpipe_ray.registry`` (the dlopen/dlsym analog). A kind whose
factory returns :class:`DatasetStage` is a whole-Dataset transform
(packing, dedup — ops that need a shuffle) and is applied to the
running Dataset directly instead of via ``map_batches``.
"""

from __future__ import annotations

import json
from typing import Any

import ray.data

from logpipe_ray.registry import SINKS, SOURCES, STAGES, ActorStage, DatasetStage


def load_spec(path_or_dict: str | dict) -> dict:
    """Load a pipeline spec; accepts GB18030-encoded config files.

    The reference transcodes non-UTF-8 (GBK) config files before
    parsing (src/config.c:428 iconv path); GB18030 is the superset
    codec — a pure-ASCII or UTF-8 file decodes identically, CJK config
    values decode correctly either way."""
    if isinstance(path_or_dict, dict):
        return path_or_dict
    with open(path_or_dict, "rb") as f:
        raw = f.read()
    try:
        return json.loads(raw.decode("utf-8"))
    except UnicodeDecodeError:
        return json.loads(raw.decode("gb18030"))


_SIZE_KEYS = ("batch_size", "roll", "roll_bytes", "flush_bytes", "block_bytes",
              "chunk_bytes", "rows_per_block", "budget", "limit")
_DURATION_KEYS_SUFFIX = "_s"


def normalize_units(d: dict) -> dict:
    """Config unit suffixes — the ``size64_atou64``/``usleep_atou64``
    analog (src/util.c:525-568): a STRING value for a size-like key
    (``"roll": "64MB"``, ``"batch_size": "16kb"``) parses through
    :func:`logpipe_ray.util.parse_size`; a string for a ``*_s``
    duration key (``"retry_wait_s": "100ms"``) through
    :func:`~logpipe_ray.util.parse_duration_s`. Numbers pass through;
    nested dicts/lists normalize recursively."""
    from logpipe_ray.util import parse_duration_s, parse_size

    out: dict = {}
    for k, v in d.items():
        if isinstance(v, dict):
            out[k] = normalize_units(v)
        elif isinstance(v, list):
            out[k] = [normalize_units(x) if isinstance(x, dict) else x for x in v]
        elif isinstance(v, str) and k in _SIZE_KEYS:
            try:
                out[k] = parse_size(v)
            except ValueError as e:
                raise ValueError(f"config key {k!r}: bad size value {v!r}") from e
        elif isinstance(v, str) and k.endswith(_DURATION_KEYS_SUFFIX):
            try:
                out[k] = parse_duration_s(v)
            except ValueError as e:
                raise ValueError(
                    f"config key {k!r}: bad duration value {v!r} "
                    "(string values for '*_s' keys parse as durations; "
                    "rename the key if it should stay a string)"
                ) from e
        else:
            out[k] = v
    return out


def build_pipeline(spec: str | dict) -> Any:
    """Build and return the pipeline's result (Dataset or sink output)."""
    spec = normalize_units(load_spec(spec))
    batch_size = spec.get("batch_size", 8192)

    src = dict(spec["source"])
    src_kind = src.pop("kind")
    if src_kind not in SOURCES:
        raise KeyError(f"unknown source kind: {src_kind!r}")
    ds: ray.data.Dataset = SOURCES[src_kind](**src)

    for stage_spec in spec.get("stages", []):
        stage_spec = dict(stage_spec)
        kind = stage_spec.pop("kind")
        if kind not in STAGES:
            raise KeyError(f"unknown stage kind: {kind!r}")
        stage = STAGES[kind](**stage_spec)
        if isinstance(stage, DatasetStage):
            ds = stage.fn(ds)
        elif isinstance(stage, ActorStage):
            ds = ds.map_batches(
                stage.cls,
                fn_constructor_kwargs=stage.ctor_kwargs,
                batch_format="pyarrow",
                batch_size=batch_size,
                **stage.pool_kwargs,
            )
        else:
            ds = ds.map_batches(
                stage, batch_format="pyarrow", batch_size=batch_size
            )

    sink = dict(spec.get("sink", {"kind": "dataset"}))
    sink_kind = sink.pop("kind")
    if sink_kind not in SINKS:
        raise KeyError(f"unknown sink kind: {sink_kind!r}")
    return SINKS[sink_kind](ds, **sink)
