"""Deterministic synthetic `sequences` table (the BASELINE input_hint shape).

The engine's canonical input is a Parquet table of pre-tokenized training
sequences: ``doc_id:string, tokens:list<int32>, n_tok:int32,
source:string`` (FIXTURES.md F1). This sandbox has no external data, so
the table is synthesized *deterministically* from the driver-generated
``lineitem`` table of an sf dir: every derivation below is pure integer
arithmetic on the lineitem keys, so a DuckDB oracle can reproduce every
scalar column (and a token checksum) exactly.

Derivation (seed-free, closed-form — keep in sync with
``__ray_entry__.SEQ_CTE``):

    seq   = ((l_orderkey*10 + l_linenumber)*20000 + l_partkey)*2000 + l_suppkey
    m     = seq % 1048573                      # bounded mixer, avoids int64 overflow
    n_tok = 1 + (m * 2654435761) % 512
    s     = 0               if seq % 2 == 0    # source id; s=0 is the HOT source
            1 + (seq//2)%15 otherwise          #  (~50% of rows — skew fixture)
    grp   = GROUPS[s % 4]                      # rotated-log-style names
    source = f"{grp}_{s:02d}.log"
    doc_id = f"{source}-{seq:014d}"
    tokens[i] = (m*1000003 + i*10007) % 50257  for i in 0..n_tok-1

``source`` names follow the reference's rotated-filename key-cut
convention (logpipe-output-ingeek.c:468-493): stripping the extension
and taking the first two ``_``-words yields the route group.

The hot source (s=0, half of all rows) reproduces the reference's
hot-file starvation scenario (logpipe-input-file.c:400-422
``max_append_count`` guard) and exercises salted repartitioning.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

TOKEN_VOCAB = 50257
MIX_MOD = 1048573  # prime
MIX_MUL = 2654435761  # Knuth multiplicative hash constant
TOK_MUL_ROW = 1000003
TOK_MUL_POS = 10007
MAX_N_TOK = 512
N_SOURCES = 16

GROUPS = ("app_web", "db_core", "sys_monitor", "app_api")

SEQ_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
    ]
)

# the 16 possible source names, indexed by source id s
SOURCE_NAMES = np.array(
    [f"{GROUPS[s % 4]}_{s:02d}.log" for s in range(N_SOURCES)], dtype=object
)


def _seq_ids(batch: pa.Table) -> np.ndarray:
    ok = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    ln = batch["l_linenumber"].to_numpy(zero_copy_only=False).astype(np.int64)
    pk = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    sk = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    return ((ok * 10 + ln) * 20000 + pk) * 2000 + sk


def tokens_for(seq: np.ndarray) -> tuple[pa.ListArray, np.ndarray, np.ndarray]:
    """Vectorized token-array generation. Returns (list_array, n_tok, tokens_sum)."""
    m = seq % MIX_MOD
    n_tok = (1 + (m * MIX_MUL) % MAX_N_TOK).astype(np.int64)
    offsets = np.zeros(len(seq) + 1, dtype=np.int64)
    np.cumsum(n_tok, out=offsets[1:])
    total = int(offsets[-1])
    pos = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], n_tok)
    m_rep = np.repeat(m, n_tok)
    vals = ((m_rep * TOK_MUL_ROW + pos * TOK_MUL_POS) % TOKEN_VOCAB).astype(np.int32)
    tokens = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()), pa.array(vals, type=pa.int32())
    )
    tokens_sum = np.add.reduceat(vals.astype(np.int64), offsets[:-1])
    return tokens, n_tok, tokens_sum


def make_sequences_batch(batch: pa.Table) -> pa.Table:
    """lineitem key columns → one sequences batch (pyarrow in/out)."""
    seq = _seq_ids(batch)
    tokens, n_tok, _ = tokens_for(seq)
    s = np.where(seq % 2 == 0, 0, 1 + (seq // 2) % 15).astype(np.int64)
    source = pa.array(SOURCE_NAMES[s], type=pa.string())
    seq_str = pc.utf8_lpad(pc.cast(pa.array(seq), pa.string()), 14, "0")
    doc_id = pc.binary_join_element_wise(source, seq_str, "-")
    return pa.Table.from_arrays(
        [doc_id, tokens, pa.array(n_tok, type=pa.int32()), source],
        schema=SEQ_SCHEMA,
    )


def synthesize_sequences(
    sf_dir: str, *, expand: int = 1, batch_size: int = 8192
) -> ray.data.Dataset:
    """Sequences Dataset derived from ``{sf_dir}/lineitem.parquet``.

    ``expand`` > 1 replicates every base row ``expand`` times with
    distinct seq ids (``seq + e*10^14``) — used only by the benchmark to
    scale row count; the sf0.01 correctness path always uses expand=1.
    Column-pruned read: only the 4 lineitem key columns leave storage.
    """
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"],
    )
    if expand == 1:
        return ds.map_batches(
            make_sequences_batch, batch_format="pyarrow", batch_size=batch_size
        )

    def expanded(batch: pa.Table) -> pa.Table:
        base = _seq_ids(batch)
        outs = []
        for e in range(expand):
            seq = base + e * 10**14
            tokens, n_tok, _ = tokens_for(seq)
            s = np.where(seq % 2 == 0, 0, 1 + (seq // 2) % 15).astype(np.int64)
            source = pa.array(SOURCE_NAMES[s], type=pa.string())
            seq_str = pc.utf8_lpad(pc.cast(pa.array(seq), pa.string()), 16, "0")
            doc_id = pc.binary_join_element_wise(source, seq_str, "-")
            outs.append(
                pa.Table.from_arrays(
                    [doc_id, tokens, pa.array(n_tok, type=pa.int32()), source],
                    schema=SEQ_SCHEMA,
                )
            )
        return pa.concat_tables(outs)

    # smaller input batches: each fans out ``expand``× in size
    bs = max(256, batch_size // expand)
    return ds.map_batches(expanded, batch_format="pyarrow", batch_size=bs)
