"""Resumable flagship runner — exactly-once per input fragment.

Distribution model: the work-list of pending fragments is itself a
``ray.data.Dataset`` (one row per fragment path) consumed by
``map_batches(process_fragment, batch_size=1)`` — the streaming executor
schedules fragments across the cluster with backpressure and task
retries, and each fragment task does a storage→storage pass (read the
fragment, parse + enrich + routed write, commit manifest entry). At
100 TB scale this is the standard "pipeline over a file work-list"
shape: no block ever transits the object store; per-fragment outputs
and the manifest give deterministic, idempotent resume.

Counter fidelity: the final per-(source, sink) counters are folded from
the committed manifest entries — exactly the rows that were durably
written (commit-after-write, src/output.c:280-302), and a re-run after
a crash cannot double-count because a fragment commits at most once.
"""

from __future__ import annotations

import glob
import os
from typing import Any

import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from logpipe_ray.routes import DEFAULT_ROUTE, default_route_table
from logpipe_ray.stages.enrich import enrich_batch
from logpipe_ray.stages.parse import cut_route_key
from logpipe_ray.stages.route import write_routed_batch
from logpipe_ray.state.manifest import (
    commit_fragment,
    doc_id_digest,
    frag_id,
    manifest_counters,
    pending_fragments,
)


def process_fragment(
    path: str,
    out_dir: str,
    routes: dict,
    *,
    make_sequences: bool = True,
    fail_on: frozenset[str] = frozenset(),
) -> dict[str, Any]:
    """One storage→storage fragment pass; returns the manifest entry.

    ``fail_on`` injects a crash for specific frag_ids (tests only).
    """
    fid = frag_id(path)
    if fid in fail_on:
        raise RuntimeError(f"injected failure for fragment {fid}")
    # use_threads=False: this task owns ONE CPU; the default threaded
    # read spawns arrow's full pool from every concurrent fragment task
    # (32 tasks × 32 threads) — measured 25% slower at 64 fragments /
    # 32 CPUs, and slower even stand-alone on this host (BASELINE.md
    # round-4 resumable section)
    table = pq.read_table(path, use_threads=False)
    if make_sequences:
        from logpipe_ray.sources.sequences import make_sequences_batch

        table = make_sequences_batch(table)
    table = cut_route_key(table)
    table = enrich_batch(table, routes, default=DEFAULT_ROUTE)
    partials = write_routed_batch(table, out_dir=out_dir, file_tag=fid)
    entry = {
        "frag_id": fid,
        "path": path,
        "n_rows": table.num_rows,
        "sum_n_tok": int(pa.compute.sum(table["n_tok"]).as_py() or 0),
        "doc_digest": doc_id_digest(table["doc_id"]),
        "counters": [
            {
                "source": s,
                "sink": k,
                "n_rows": int(n),
                "sum_n_tok": int(t),
            }
            for s, k, n, t in zip(
                partials["source"].to_pylist(),
                partials["sink"].to_pylist(),
                partials["n_rows"].to_pylist(),
                partials["sum_n_tok"].to_pylist(),
            )
        ],
    }
    commit_fragment(out_dir, entry)
    return entry


def run_resumable(
    input_paths: list[str] | str,
    out_dir: str,
    *,
    routes: dict | None = None,
    make_sequences: bool = True,
    fail_on: frozenset[str] = frozenset(),
    full_dose: bool = False,
) -> list[dict[str, Any]]:
    """Process all pending fragments; returns final folded counters.

    ``input_paths``: list of parquet files, or a glob/dir. Fragments
    already present in ``{out_dir}/_manifest`` are skipped (resume) —
    unless ``full_dose=True``, which reprocesses everything (the
    reference's start_once_for_full_dose toggle,
    logpipe-input-file.c:807-821: re-read from offset 0 vs append-only);
    deterministic output names make the re-run overwrite, not duplicate.
    """
    if isinstance(input_paths, str):
        if os.path.isdir(input_paths):
            paths = sorted(glob.glob(os.path.join(input_paths, "*.parquet")))
        else:
            paths = sorted(glob.glob(input_paths))
    else:
        paths = list(input_paths)
    if routes is None:
        routes = default_route_table()

    todo = list(paths) if full_dose else pending_fragments(out_dir, paths)
    if todo:
        routes_ref = ray.put(routes)

        def run_one(batch: dict) -> dict:
            r = ray.get(routes_ref) if isinstance(routes_ref, ray.ObjectRef) else routes_ref
            done_ids = []
            for p in batch["path"]:
                e = process_fragment(
                    p, out_dir, r, make_sequences=make_sequences, fail_on=fail_on
                )
                done_ids.append(e["frag_id"])
            return {"frag_id": done_ids}

        wl = ray.data.from_items([{"path": p} for p in todo])
        # one fragment per task; count() drives the streaming execution
        wl.map_batches(run_one, batch_size=1).count()

    return manifest_counters(out_dir)
