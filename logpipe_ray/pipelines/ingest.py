"""The reference's core loop, batch-restated as a resumable tick:
incremental tail-follow → dedup against all previously ingested content
→ routed append → state append → offset commit.

Each :func:`ingest_tick` is one pass of logpipe's
inotify-read→filter→write event cycle (src/input.c + output.c), with
the durability boundaries made explicit and ORDERED:

1. **routed append** — survivor lines land in
   ``out_dir/tick<N>/sink=<source>/part-*.parquet`` (unique file names,
   so a retried tick never tears an existing file);
2. **state append** — the tick's new content hashes join the
   :class:`~logpipe_ray.state.hashstate.HashStateStore` (internally:
   segment write, then manifest commit via atomic rename);
3. **offset commit** — the tail source's per-file offsets persist.

A crash between ANY two of those (or inside 2, between the segment
write and the manifest rename) loses no data and the retry converges:
offsets were not committed, so the next tick re-reads the same lines;
whatever already reached the state store dedups them away, and whatever
reached only the routed output is re-routed — landing on the SAME part
files when the retry's batch boundaries match (content-deterministic
part names, stages/route.py), or as duplicate rows when they don't —
the documented **at-least-once + dedup-absorbs** contract (downstream
consumers key on ``text_hash``, exactly like every other source in
this repo).

``fault=`` injects a crash after a named boundary — the same
first-class failure-injection style as the TCP collector's
``fail_next_files`` — used by tests/test_ingest_chaos.py to prove the
contract at every boundary.

Scale shape per tick: membership is one volume-bounded
``sorted_runs_fold`` over the per-batch (source, text_hash) partials
unioned with the hash-state rows — corpus state is never broadcast and
never re-hashed; the sort carries partial rows only (r5: replaced Ray's
sort-based groupby, 12.2× measured on all-distinct keys, BASELINE). The state store's LSM
compaction bounds the per-tick read fan-in to O(max_segments) files no
matter how many ticks have run.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

from logpipe_ray.sources.stream import DirectoryTailSource
from logpipe_ray.state.hashstate import HashStateStore

_PART_SCHEMA = pa.schema(
    [
        ("source", pa.string()),
        ("text_hash", pa.int64()),
        ("corpus_n", pa.int64()),
        ("new_n", pa.int64()),
        ("text", pa.string()),
    ]
)


class IngestCrash(RuntimeError):
    """Injected mid-tick crash (tests only — see module doc)."""


def _prep(b: pa.Table) -> pa.Table:
    from logpipe_ray.stages.dedup import add_text_hash

    if b.num_rows == 0:
        return _PART_SCHEMA.empty_table()
    # strip only a TRAILING .log — replace_substring would also eat an
    # infix match ('auth.login.log' → 'authin'), colliding source keys
    src = pc.replace_substring_regex(b["source"], r"\.log$", "")
    b2 = add_text_hash(pa.table({"source": src, "text": b["line"]}))
    t2 = pa.table(
        {
            "source": b2["source"],
            "text_hash": b2["text_hash"],
            "corpus_n": pa.array(np.zeros(b2.num_rows, dtype=np.int64)),
            "new_n": pa.array(np.ones(b2.num_rows, dtype=np.int64)),
            "text": b2["text"],
        }
    )
    g = t2.group_by(["source", "text_hash"]).aggregate(
        [("corpus_n", "sum"), ("new_n", "sum"), ("text", "min")]
    )
    g = g.rename_columns(
        [c.removesuffix("_sum").removesuffix("_min") for c in g.column_names]
    )
    return g.select(_PART_SCHEMA.names)


def _as_state(b: pa.Table) -> pa.Table:
    n = b.num_rows
    return pa.table(
        {
            "source": b["source"],
            "text_hash": b["text_hash"],
            "corpus_n": pa.array(np.ones(n, dtype=np.int64)),
            "new_n": pa.array(np.zeros(n, dtype=np.int64)),
            "text": pa.array([None] * n, type=pa.string()),
        }
    )


def _finalize(b: pa.Table) -> pa.Table:
    keep = pc.and_(pc.equal(b["corpus_n"], 0), pc.greater(b["new_n"], 0))
    kept = b.filter(keep)
    return pa.table(
        {
            "source": kept["source"],
            "text_hash": pc.cast(kept["text_hash"], pa.int64()),
            "text": kept["text"],
            "n_seen_part": pc.cast(kept["new_n"], pa.int64()),
        }
    )


def ingest_tick(
    tail: DirectoryTailSource,
    store: HashStateStore,
    out_dir: str,
    tick_id: int,
    *,
    fault: str | None = None,
) -> tuple[dict[str, int], dict[str, int]]:
    """One ingest tick; returns (seen_by_source, ingested_by_source).

    ``fault``: ``"after_routed_append"`` or ``"after_state_append"``
    raises :class:`IngestCrash` right after that boundary (a crash
    INSIDE the state append — between segment write and manifest
    commit — injects via ``store.fail_next_commits``).
    """
    from logpipe_ray.stages.route import write_routed_batch

    new = tail.read()
    parts = new.map_batches(_prep, batch_format="pyarrow")
    state_files = store.files()
    if state_files:
        parts = parts.union(
            ray.data.read_parquet(state_files).map_batches(
                _as_state, batch_format="pyarrow"
            )
        )

    def _merge(b: pa.Table) -> pa.Table:
        # a hash's rows (tick + state, all sources) are co-located by
        # the fold's single-column sort; min(text) skips the state
        # side's nulls, so the surviving new text rides along — text
        # volume in the shuffle is tick-bounded (state rows carry null)
        cols = ["source", "text_hash", "corpus_n", "new_n", "text"]
        if b.num_rows == 0:
            return b.select(cols)
        g = b.group_by(["source", "text_hash"]).aggregate(
            [("corpus_n", "sum"), ("new_n", "sum"), ("text", "min")]
        )
        g = g.rename_columns(
            [
                c[: -len("_sum")]
                if c.endswith("_sum")
                else (c[: -len("_min")] if c.endswith("_min") else c)
                for c in g.column_names
            ]
        )
        return g.select(cols)

    from logpipe_ray.stages.smallagg import sorted_runs_fold

    agg = (
        # hash domain is corpus-proportional: volume-bounded sort fold,
        # not Ray's sort-based groupby (12.2× measured, BASELINE r5)
        sorted_runs_fold(parts, "text_hash", _merge)
        # two consumers (survivors + seen counters) — without this the
        # tail byte reads, hashing, state read and sort fold all
        # re-execute per consumer
        .materialize()
    )

    survivors = agg.map_batches(_finalize, batch_format="pyarrow")
    tick_dir = os.path.join(out_dir, f"tick{tick_id}")
    counted = survivors.map_batches(
        lambda b: write_routed_batch(
            b,
            out_dir=tick_dir,
            sink_col="source",
            source_col="source",
            n_tok_col="n_seen_part",
            id_col="text_hash",
            drop_cols=(),
        ),
        batch_format="pyarrow",
    ).to_pandas()
    if fault == "after_routed_append":
        raise IngestCrash("injected: after routed append, before state append")

    # seen counts include dropped dups: fold new_n over ALL groups
    from logpipe_ray.stages.smallagg import grouped_agg

    seen_tbl = grouped_agg(agg, "source", sums={"n": "new_n"}).to_pandas()
    seen = {r["source"]: int(r["n"]) for _, r in seen_tbl.iterrows()}
    ingested: dict[str, int] = {}
    if len(counted):  # a tick may ingest nothing (all dups)
        for _, r in (
            counted.groupby("source", as_index=False)["n_rows"].sum().iterrows()
        ):
            ingested[r["source"]] = int(r["n_rows"])

    # persist the tick's new hashes as corpus state — read back from the
    # routed files (what's durable IS the truth, not the in-memory plan)
    new_hashes = pa.table(
        {
            "source": pa.array([], type=pa.string()),
            "text_hash": pa.array([], type=pa.int64()),
        }
    )
    surv_files = []
    for root, _dirs, files in os.walk(tick_dir):
        surv_files += [
            os.path.join(root, f) for f in files if f.endswith(".parquet")
        ]
    if surv_files:
        new_hashes = pq.read_table(surv_files, columns=["source", "text_hash"])
    store.append(new_hashes)
    if fault == "after_state_append":
        raise IngestCrash("injected: after state append, before offset commit")
    tail.commit()
    return seen, ingested
