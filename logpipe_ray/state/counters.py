"""Per-(source, sink) forwarded-record counters.

The reference keeps per-stream running totals — ``file_offset`` (bytes)
and ``file_line`` (records) committed after every block is accepted by
all outputs (src/output.c:31-56, logpipe-input-file.c:1901-1925). In a
batch engine the equivalent observable is the per-destination aggregate
over *routed* (post-filter) rows:

    SELECT source, sink, count(*) AS n_rows, sum(n_tok) AS sum_n_tok
    GROUP BY source, sink

Scale note: a bare ``groupby().aggregate()`` shuffles every row. We
**pre-aggregate inside map_batches** (one partial row per (source, sink)
per batch — at most |sources|×|sinks| rows), so the global shuffle moves
only tiny partials (SURVEY.md §7.3). Key cardinality is low (16×5 here),
so the final groupby is trivial at any scale.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from logpipe_ray.stages.smallagg import fold_partials_tree


def partial_counters(batch: pa.Table) -> pa.Table:
    """Combine within one batch: (source, sink) → n_rows, sum_n_tok."""
    t = batch.select(["source", "sink", "n_tok"])
    out = t.group_by(["source", "sink"]).aggregate(
        [("n_tok", "sum"), ("n_tok", "count")]
    )
    return pa.Table.from_arrays(
        [
            out["source"],
            out["sink"],
            pa.compute.cast(out["n_tok_count"], pa.int64()),
            pa.compute.cast(out["n_tok_sum"], pa.int64()),
        ],
        names=["source", "sink", "n_rows", "sum_n_tok"],
    )


def aggregate_counters(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Dataset with (source, sink, n_tok) → final counters dataset.

    The final fold is :func:`fold_partials_tree` (fanin-bounded combines
    over the tiny partials) rather than a groupby shuffle — the key
    cardinality is bounded, and a shuffle sized from the block count
    would leave most reduce partitions empty (zero-column blocks)."""
    partials = ds.map_batches(partial_counters, batch_format="pyarrow")
    return fold_partials_tree(partials, ["source", "sink"], ["n_rows", "sum_n_tok"])
