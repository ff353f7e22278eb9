"""Token-budget packing and fixed-length context chunking (the ×tokens
training-data axis: turning a corpus of variable-length pre-tokenized
sequences into trainer-shaped units).

The reference engine forwards opaque records and has no token
semantics; these stages are the training-data extension over the
BASELINE `sequences` table (doc_id, tokens:list<int32>, n_tok, source).

Scale shapes:

- :func:`pack_by_token_budget` — greedy streaming concat packing: each
  doc is assigned the pack where its first token lands when token
  counts accumulate per source in doc_id order
  (``pack_id = exclusive_cumsum(n_tok) // budget``). Distributed as a
  TWO-LEVEL PREFIX SUM: (1) one small ``groupby(source, bucket)``
  aggregate of per-bucket token totals — buckets are *ordered* ranges
  of the stream key, so the (sources × buckets)-row result is the only
  thing the driver ever holds; exclusive bucket offsets are broadcast
  (``ray.put``); (2) each bucket sorts locally and adds its offset
  inside ``groupby(source, bucket).map_groups``. No all-to-all sort of
  the corpus, no driver materialization — this is how a 10^12-row
  stream gets a consistent global cumsum.

- :func:`chunk_tokens` — flat-map each token list into fixed-length
  context windows, fully vectorized from the Arrow list buffers
  (offset arithmetic + one value prefix-sum for per-chunk checksums;
  no per-row Python loop). Pure per-batch transform: embarrassingly
  parallel at any scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from logpipe_ray.functions.tokens import _list_buffers

_SEQ_PAT = r"-(?P<seq>\d+)$"

_PROC_CACHE: dict[str, object] = {}


def _extract_seq(doc_id_col) -> pa.Array:
    """doc_id '<source>-<zero-padded seq>' → int64 seq (the stream key;
    zero-padding makes string order == numeric order within a source)."""
    return pc.cast(
        pc.struct_field(pc.extract_regex(doc_id_col, _SEQ_PAT), "seq"),
        pa.int64(),
    )


def pack_by_token_budget(
    ds: ray.data.Dataset,
    *,
    budget: int = 2048,
    bucket_width: int = 10**12,
    id_col: str = "doc_id",
    source_col: str | None = "source",
    n_tok_col: str = "n_tok",
    carry_cols: tuple[str, ...] = (),
) -> ray.data.Dataset:
    """(id, [source], n_tok) → (id, [source], pack_id): greedy
    doc-boundary packing into ``budget``-token training packs, per
    source stream (``source_col=None`` → one global stream).

    The ordering key is ``id_col``: integer ids order numerically;
    string ids of the ``<source>-<zero-padded seq>`` form order by the
    extracted seq (zero-padding makes string order == numeric order).
    ``bucket_width`` splits each stream into ordered key-range buckets;
    tune it so one bucket ≈ one block at your scale (the per-bucket
    ``map_groups`` holds a single bucket in memory, and the driver-side
    offsets table is sources × buckets rows).
    """
    import pandas as pd

    def add_bucket(b: pa.Table) -> pa.Table:
        ids = b[id_col]
        if pa.types.is_integer(ids.type):
            key = pc.cast(ids, pa.int64())
        else:
            key = _extract_seq(ids)
        # integer division (arrow divide truncates on ints)
        bucket = pc.divide(key, bucket_width)
        cols = {
            id_col: ids,
            "source": (
                b[source_col]
                if source_col is not None
                else pa.array([""] * b.num_rows, type=pa.string())
            ),
            "n_tok": pc.cast(b[n_tok_col], pa.int64()),
            "bucket": bucket,
        }
        for c in carry_cols:
            cols[c] = b[c]
        return pa.table(cols)

    # materialize: keyed feeds both prefix-sum levels, and Ray Data
    # re-executes lineage per consumer — without this the entire
    # upstream (e.g. the dedup shuffle in docs_to_training_packs) runs
    # twice. Only the 4 projected key columns are held, never payloads.
    keyed = ds.map_batches(add_bucket, batch_format="pyarrow").materialize()

    # level 1: per-(source, ordered-bucket) token totals — a SMALL table
    # (per-block partials + one fold; no keyed shuffle → no empty
    # reduce partitions, see stages/smallagg)
    from logpipe_ray.stages.smallagg import grouped_agg, map_groups_typed

    totals = grouped_agg(
        keyed, ["source", "bucket"], sums={"tok_total": "n_tok"}
    ).to_pandas()
    totals = totals.sort_values(["source", "bucket"])
    totals["offset"] = (
        totals.groupby("source")["tok_total"].cumsum() - totals["tok_total"]
    )
    offsets = {
        (s, int(bk)): int(off)
        for s, bk, off in zip(totals["source"], totals["bucket"], totals["offset"])
    }
    off_ref = ray.put(offsets)

    # level 2: local exclusive cumsum + broadcast bucket offset
    # (resolved once per worker process, not once per group — map_groups
    # calls the UDF per group and a ray.get re-deserializes every time)
    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        from logpipe_ray.util import bounded_resolve

        offs = bounded_resolve(_PROC_CACHE, off_ref)
        g = g.sort_values(id_col)
        base = offs[(g["source"].iloc[0], int(g["bucket"].iloc[0]))]
        excl = base + g["n_tok"].cumsum().to_numpy(dtype=np.int64) - g[
            "n_tok"
        ].to_numpy(dtype=np.int64)
        out = {id_col: g[id_col].to_numpy()}
        if source_col is not None:
            out["source"] = g["source"].to_numpy()
        out[n_tok_col] = g["n_tok"].to_numpy(dtype=np.int64)
        out["pack_id"] = excl // budget
        for c in carry_cols:
            out[c] = g[c].to_numpy()
        return pd.DataFrame(out)

    arrow_schema = keyed.schema().base_schema  # known: keyed materialized
    fields = [(id_col, arrow_schema.field(id_col).type)]
    if source_col is not None:
        fields.append(("source", pa.string()))
    fields.append((n_tok_col, pa.int64()))
    fields.append(("pack_id", pa.int64()))
    fields += [(c, arrow_schema.field(c).type) for c in carry_cols]
    # Sort ranges come from sampled key quantiles: a skewed combo
    # duplicates boundaries and surplus ranges come out empty. Bound
    # ranges by BOTH the key cardinality and the data volume (~256k
    # rows per range) — at toy scale that is one nonempty range, at
    # scale combos ≈ blocks by bucket_width design.
    n_rows = keyed.count()  # keyed is materialized — count is metadata
    pre = max(1, min(len(offsets), n_rows // 262144 + 1))
    return map_groups_typed(
        keyed,
        ["source", "bucket"],
        per_bucket,
        pa.schema(fields),
        pre_blocks=pre,
    )


def chunk_tokens(
    batch: pa.Table,
    *,
    chunk: int = 128,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
) -> pa.Table:
    """Explode each tokens list into fixed-length context windows:
    (doc_id, chunk_idx, chunk_len, chunk_sum) rows; the final window of
    a doc may be short (no padding — padding policy belongs to the
    trainer). ``chunk_sum`` is the window checksum used by oracles and
    lineage. Fully vectorized; empty token lists yield no chunks."""
    offsets, values = _list_buffers(batch[tokens_col])
    lens = np.diff(offsets)
    n_chunks = -(-lens // chunk)  # ceil
    total = int(n_chunks.sum())
    row_rep = np.repeat(np.arange(len(lens), dtype=np.int64), n_chunks)
    coff = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(n_chunks, out=coff[1:])
    ci = np.arange(total, dtype=np.int64) - np.repeat(coff[:-1], n_chunks)
    starts = offsets[:-1][row_rep] + ci * chunk
    ends = np.minimum(starts + chunk, offsets[1:][row_rep])
    csum = np.concatenate([[0], np.cumsum(values, dtype=np.int64)])
    return pa.table(
        {
            id_col: pc.take(batch[id_col], pa.array(row_rep)),
            "chunk_idx": pa.array(ci, type=pa.int64()),
            "chunk_len": pa.array(ends - starts, type=pa.int64()),
            "chunk_sum": pa.array(csum[ends] - csum[starts], type=pa.int64()),
        }
    )
