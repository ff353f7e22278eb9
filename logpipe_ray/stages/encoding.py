"""Character-encoding conversion stage (the iconv analog).

The reference transcodes GB18030↔UTF-8 payloads with iconv
(src/util.c:449-522, enabled per-plugin via config). Arrow strings are
always UTF-8, so the engine's model is: foreign-encoded payloads ride
as ``binary`` columns; ``decode_binary`` turns them into utf-8 string
columns (one C-level ``bytes.decode`` per row — no pyarrow kernel
exists for non-utf8 codecs) and ``encode_string`` the inverse.
"""

from __future__ import annotations

import pyarrow as pa


def decode_binary(
    batch: pa.Table,
    *,
    col: str,
    encoding: str = "gb18030",
    out_col: str | None = None,
    errors: str = "strict",
) -> pa.Table:
    """binary column (foreign encoding) → utf-8 string column."""
    out = [
        b.decode(encoding, errors) if b is not None else None
        for b in batch[col].to_pylist()
    ]
    name = out_col or col
    arr = pa.array(out, type=pa.string())
    if name in batch.column_names:
        return batch.set_column(batch.schema.get_field_index(name), name, arr)
    return batch.append_column(name, arr)


def encode_string(
    batch: pa.Table,
    *,
    col: str,
    encoding: str = "gb18030",
    out_col: str | None = None,
) -> pa.Table:
    """utf-8 string column → binary column in the target encoding."""
    out = [
        s.encode(encoding) if s is not None else None
        for s in batch[col].to_pylist()
    ]
    name = out_col or col
    arr = pa.array(out, type=pa.binary())
    if name in batch.column_names:
        return batch.set_column(batch.schema.get_field_index(name), name, arr)
    return batch.append_column(name, arr)
