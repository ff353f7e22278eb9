"""Per-partition checkpoint manifest — durable progress + lineage.

The reference tracks per-stream progress in worker memory only
(``TraceFile.trace_offset/trace_line`` rbtrees, logpipe-input-file.c:10-36,
111-129) and loses it on crash (offsets re-baseline to EOF on restart,
:807-821). The rebuild makes progress durable and the commit atomic
(SURVEY.md §4 "checkpoint / resume", §7.4 "Exactly-once resume"):

- unit of work = one input *fragment* (a parquet file);
- a fragment's outputs use deterministic names (``part-{frag_id}-…``),
  so a retried/re-run fragment overwrites its own files — idempotent;
- the manifest entry (``{out_dir}/_manifest/{frag_id}.json``) is
  written LAST via write-temp + ``os.replace`` (atomic on POSIX):
  fragment counted as done iff its entry exists;
- resume = diff input fragments against existing entries, process only
  the missing ones;
- each entry carries the fragment's lineage + metrics: row count,
  sum(n_tok), per-(source, sink) counters, output files, and a
  doc_id digest (order-insensitive xor-hash) for audit.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Any, Iterable


def frag_id(path: str) -> str:
    """Stable id for an input fragment (path-keyed)."""
    return hashlib.sha1(path.encode()).hexdigest()[:16]


def manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def load_manifest(out_dir: str) -> dict[str, dict[str, Any]]:
    """frag_id → entry for all committed fragments."""
    mdir = manifest_dir(out_dir)
    if not os.path.isdir(mdir):
        return {}
    entries = {}
    for name in os.listdir(mdir):
        if name.endswith(".json"):
            with open(os.path.join(mdir, name)) as f:
                e = json.load(f)
            entries[e["frag_id"]] = e
    return entries


def commit_fragment(out_dir: str, entry: dict[str, Any]) -> None:
    """Atomically record a fragment as done (write temp + rename)."""
    mdir = manifest_dir(out_dir)
    os.makedirs(mdir, exist_ok=True)
    final = os.path.join(mdir, f"{entry['frag_id']}.json")
    tmp = final + ".tmp"
    with open(tmp, "w") as f:
        json.dump(entry, f)
    os.replace(tmp, final)


def pending_fragments(out_dir: str, paths: Iterable[str]) -> list[str]:
    """Input paths with no committed manifest entry (the resume diff)."""
    done = load_manifest(out_dir)
    return [p for p in paths if frag_id(p) not in done]


def doc_id_digest(doc_ids) -> str:
    """Order-insensitive 64-bit xor digest of per-doc content hashes
    (lineage). Vectorized: one ``pd.util.hash_array`` over the ids +
    an xor reduce — the old per-id sha1 loop was 11% of a resumable
    fragment's wall time. (Content hash, NOT ``hash()`` — per-process
    salted.) Accepts an Arrow array/column or any iterable of strings.
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    if isinstance(doc_ids, (pa.Array, pa.ChunkedArray)):
        arr = doc_ids.to_numpy(zero_copy_only=False)
    else:
        arr = np.asarray(list(doc_ids), dtype=object)
    if len(arr) == 0:
        return f"{0:016x}"
    h = pd.util.hash_array(arr.astype(object))
    return f"{int(np.bitwise_xor.reduce(h)):016x}"


def manifest_counters(out_dir: str) -> list[dict[str, Any]]:
    """Flattened per-(source, sink) counters across committed fragments."""
    rows: dict[tuple[str, str], dict[str, Any]] = {}
    for e in load_manifest(out_dir).values():
        for c in e["counters"]:
            key = (c["source"], c["sink"])
            if key not in rows:
                rows[key] = {"source": c["source"], "sink": c["sink"], "n_rows": 0, "sum_n_tok": 0}
            rows[key]["n_rows"] += c["n_rows"]
            rows[key]["sum_n_tok"] += c["sum_n_tok"]
    return sorted(rows.values(), key=lambda r: (r["source"], r["sink"]))


def metrics_table(out_dir: str):
    """Per-partition metrics as an Arrow table (the per-partition
    metrics/lineage surface of the north rule): one row per committed
    fragment with row count, token sum, lineage digest, path."""
    import pyarrow as pa

    entries = sorted(load_manifest(out_dir).values(), key=lambda e: e["frag_id"])
    return pa.table(
        {
            "frag_id": pa.array([e["frag_id"] for e in entries], type=pa.string()),
            "path": pa.array([e["path"] for e in entries], type=pa.string()),
            "n_rows": pa.array([e["n_rows"] for e in entries], type=pa.int64()),
            "sum_n_tok": pa.array(
                [e["sum_n_tok"] for e in entries], type=pa.int64()
            ),
            "doc_digest": pa.array(
                [e["doc_digest"] for e in entries], type=pa.string()
            ),
        }
    )
