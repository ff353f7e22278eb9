"""Small cluster/runtime helpers."""

from __future__ import annotations

import datetime
import time

import ray


def expand_path_template(template: str, when: "datetime.datetime") -> str:
    """Date-template expansion for sink paths — the ExpandStringBuffer
    analog (src/util.c:364-444): ``%Y %M %D %h %m %s`` → zero-padded
    year/month/day/hour/minute/second (reference's own letter scheme,
    not strftime's)."""
    return (
        template.replace("%Y", f"{when.year:04d}")
        .replace("%M", f"{when.month:02d}")
        .replace("%D", f"{when.day:02d}")
        .replace("%h", f"{when.hour:02d}")
        .replace("%m", f"{when.minute:02d}")
        .replace("%s", f"{when.second:02d}")
    )


def parse_size(v: "str | int | float") -> int:
    """``size64_atou64`` analog (src/util.c:525-546): ``"64MB"`` →
    bytes. Case-insensitive ``b/kb/mb/gb`` suffixes (binary, ×1024) +
    bare numbers; ``tb`` added (the reference stops at gb). Fractions
    allowed (``"0.5gb"``). Raises on an unknown suffix instead of the
    reference's silent UINT64_MAX."""
    if isinstance(v, (int, float)):
        return int(v)
    s = v.strip().lower()
    mult = {"b": 1, "kb": 1 << 10, "mb": 1 << 20, "gb": 1 << 30, "tb": 1 << 40}
    for suf in ("tb", "gb", "mb", "kb", "b"):
        if s.endswith(suf):
            return int(float(s[: -len(suf)]) * mult[suf])
    return int(float(s))


def parse_duration_s(v: "str | int | float") -> float:
    """``usleep_atou64`` analog (src/util.c:549-568), normalized to
    SECONDS (the natural unit batch-side): ``"100ms"`` → 0.1,
    ``"2s"`` → 2.0, ``"500us"`` → 5e-4; a bare number is seconds
    (the reference's bare unit is µs only because its sleeps are
    usleep calls). Raises on an unknown suffix."""
    if isinstance(v, (int, float)):
        return float(v)
    s = v.strip().lower()
    for suf, mult in (("ms", 1e-3), ("us", 1e-6), ("m", 60.0), ("h", 3600.0), ("s", 1.0)):
        if s.endswith(suf):
            return float(s[: -len(suf)]) * mult
    return float(s)


def join_lines(arr, sep: str = "\n") -> str:
    """Join a string Array into one ``sep``-terminated payload with ONE
    arrow ``binary_join`` kernel — no per-row Python. Shared by the
    message-log, ES and TCP sinks (the line-framing half of every
    text-protocol transport here)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if len(arr) == 0:
        return ""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return (
        pc.binary_join(pa.ListArray.from_arrays([0, len(arr)], arr), sep)[0].as_py()
        + sep
    )


def cluster_cpus(default: int = 8, retries: int = 20) -> int:
    """Total cluster CPUs, retrying briefly: right after ``ray.init`` the
    GCS may not have registered resources yet and ``cluster_resources()``
    returns ``{}`` — sizing an actor pool off a guessed default can then
    overcommit CPUs and deadlock the streaming executor (pending actors
    vs running read/write tasks)."""
    for _ in range(retries):
        cpus = ray.cluster_resources().get("CPU")
        if cpus:
            return int(cpus)
        time.sleep(0.05)
    return default


def bounded_resolve(cache: dict, ref, max_entries: int = 8):
    """Resolve a broadcast value (plain object or ``ObjectRef``) through
    a small per-process FIFO cache: ``ray.get`` at most once per ref
    per worker, bounded so long-lived workers serving many pipelines
    don't accumulate dead broadcast objects indefinitely (one worker
    can interleave tasks of several stages, so a single-entry cache
    would thrash — FIFO of a few entries covers the live set)."""
    if not isinstance(ref, ray.ObjectRef):
        return ref
    key = ref.hex()
    if key not in cache:
        while len(cache) >= max_entries:
            cache.pop(next(iter(cache)))
        cache[key] = ray.get(ref)
    return cache[key]


def pool_size(
    *, per_actor_cpus: float = 1.0, reserve_cpus: int = 2, cap: int | None = None
) -> int:
    """Actor-pool size that leaves ``reserve_cpus`` for task stages
    (read/write) so no stage starves: pool × per_actor ≤ CPUs − reserve."""
    ncpu = cluster_cpus()
    n = max(1, int((ncpu - reserve_cpus) / per_actor_cpus))
    if cap is not None:
        n = min(n, cap)
    return n
