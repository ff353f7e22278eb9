"""Vectorized parse stages (pyarrow.compute over zero-copy Arrow batches).

These reproduce the reference's parse-side semantics:

- ``cut_route_key``: the ingeek sink's filename key-cut — strip the
  extension, keep the first N ``_``-separated words
  (logpipe-output-ingeek.c:468-493, config :199-215).
- ``pack_metadata`` / ``unpack_metadata``: the
  ``[[system=..][server=..][filename=..][offset=..][line=..]]`` header
  the pack/unpack filter pair prepends/strips
  (logpipe-filter-pack-metadata.c:5-7, logpipe-filter-unpack-metadata.c:57-147).
  We implement the *intended* unpack semantics (parse the values); the
  reference's ``==6`` key-length and strnlen bugs (unpack-metadata.c:126-136)
  are not reproduced (SURVEY.md §2.3).
- ``split_fields`` / ``format_template``: the ES sink's
  separator-charset field split and ``$N`` output-template instantiation
  (logpipe-output-es.c:599-683, :463-596), as column projection.

All functions are ``pa.Table -> pa.Table`` and run inside
``map_batches(..., batch_format="pyarrow")`` — no Python row loops.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

_TEMPLATE_REF = re.compile(r"\$(\d+)")


def cut_route_key(
    batch: pa.Table,
    *,
    source_col: str = "source",
    out_col: str = "route_key",
    n_words: int = 2,
) -> pa.Table:
    """Derive the routing key by cutting the source filename.

    ``app_web_00.log`` → (strip ``.log``) → first ``n_words`` '_'-words →
    ``app_web``. Mirrors logpipe-output-ingeek.c:468-493.
    """
    stem = pc.replace_substring_regex(batch[source_col], r"\.[^._]*$", "")
    if n_words >= 1:
        pat = "^(?P<key>[^_]+" + ("(?:_[^_]+)?" * (n_words - 1)) + ")"
        key = pc.struct_field(pc.extract_regex(stem, pat), "key")
    else:
        key = stem
    return batch.append_column(out_col, key)


def pack_metadata(
    batch: pa.Table,
    *,
    system_col: str = "system",
    server_col: str = "server",
    filename_col: str = "source",
    offset_col: str | None = None,
    line_col: str | None = None,
    out_col: str = "packed",
) -> pa.Table:
    """Build the pack-metadata header string column.

    Format (logpipe-filter-pack-metadata.c:5-7):
    ``[[system=S][server=V][filename=F][offset=O][line=L]]``.
    system/server are the enrich tags (static config in the reference),
    filename/offset/line the per-record stream position.
    """
    parts: list[pa.Array | pa.ChunkedArray | str] = ["[[system="]
    parts.append(batch[system_col])
    parts += ["][server=", batch[server_col], "][filename=", batch[filename_col]]
    if offset_col is not None:
        parts += ["][offset=", pc.cast(batch[offset_col], pa.string())]
    if line_col is not None:
        parts += ["][line=", pc.cast(batch[line_col], pa.string())]
    parts.append("]]")
    packed = pc.binary_join_element_wise(*parts, "")
    return batch.append_column(out_col, packed)


_UNPACK_PAT = (
    r"^\[\[system=(?P<system>[^\]]*)\]\[server=(?P<server>[^\]]*)\]"
    r"\[filename=(?P<filename>[^\]]*)\]"
    r"(?:\[offset=(?P<offset>[^\]]*)\])?(?:\[line=(?P<line>[^\]]*)\])?\]"
)


def unpack_metadata(
    batch: pa.Table,
    *,
    packed_col: str = "packed",
    override_system: str | None = None,
    override_server: str | None = None,
) -> pa.Table:
    """Inverse of :func:`pack_metadata` — extract header fields as columns.

    Implements the intended semantics of
    logpipe-filter-unpack-metadata.c:57-147 (values parsed, not the
    reference's strnlen bug). Rows that don't match yield nulls.

    ``override_system`` / ``override_server``: the reference's
    config-override rule — when the filter's config carries its own
    ``system``/``server`` tags they REPLACE the parsed header values
    (unpack-metadata.c config block at :57-96); pass the configured
    constants to reproduce that.
    """
    extracted = pc.extract_regex(batch[packed_col], _UNPACK_PAT)
    overrides = {"system": override_system, "server": override_server}
    for name in ("system", "server", "filename"):
        ov = overrides.get(name)
        col = (
            pa.array([ov] * batch.num_rows, type=pa.string())
            if ov is not None
            else pc.struct_field(extracted, name)
        )
        batch = batch.append_column("meta_" + name, col)
    for name in ("offset", "line"):
        col = pc.struct_field(extracted, name)
        batch = batch.append_column(
            "meta_" + name, pc.cast(pc.if_else(pc.equal(col, ""), None, col), pa.int64())
        )
    return batch


def split_fields(
    batch: pa.Table,
    *,
    text_col: str,
    max_fields: int,
    sep_pattern: str = r"\s+",
    translate: tuple[str, str] | None = None,
    strict: bool = False,
    prefix: str = "f",
) -> pa.Table:
    """ES-sink field split: tr-style charset translate, then split.

    Emits ``{prefix}1..{prefix}{max_fields}`` string columns (``$N``
    numbering starts at 1, field 0 being the filename in the reference,
    logpipe-output-es.c:633-661). ``strict=True`` drops rows with fewer
    than ``max_fields`` fields (``fields_strictly``, :664-668).
    ``translate=(from_chars, to_char)`` replaces each char in
    ``from_chars`` with ``to_char`` first (:620-626).
    """
    text = batch[text_col]
    if translate:
        frm, to = translate
        text = pc.replace_substring_regex(text, "[" + re.escape(frm) + "]", to)
    fields = pc.split_pattern_regex(text, sep_pattern)
    if strict:
        keep = pc.greater_equal(pc.list_value_length(fields), max_fields)
        batch = batch.filter(keep)
        fields = pc.filter(fields, keep)
    for i in range(max_fields):
        batch = batch.append_column(f"{prefix}{i + 1}", _safe_list_element(fields, i))
    return batch


def _safe_list_element(fields, i: int):
    """list_element that yields null (not an error) for short lists."""
    import numpy as np

    if isinstance(fields, pa.ChunkedArray):
        fields = fields.combine_chunks()
    offsets = fields.offsets.to_numpy()
    lengths = np.diff(offsets)
    valid = lengths > i
    idx = np.where(valid, offsets[:-1] + i, 0)
    taken = fields.values.take(pa.array(idx, type=pa.int64()))
    return pc.if_else(
        pa.array(valid), taken, pa.scalar(None, type=fields.type.value_type)
    )


def format_template(
    batch: pa.Table,
    template: str,
    *,
    out_col: str = "doc",
    prefix: str = "f",
) -> pa.Table:
    """Instantiate a ``$N`` template into one output string column.

    ``$N`` refers to field column ``{prefix}N`` produced by
    :func:`split_fields` (logpipe-output-es.c FormatOutputTemplate
    :463-596; ``$N`` pre-scan :277-305).
    """
    parts: list = []
    pos = 0
    for mobj in _TEMPLATE_REF.finditer(template):
        if mobj.start() > pos:
            parts.append(template[pos : mobj.start()])
        parts.append(batch[f"{prefix}{mobj.group(1)}"])
        pos = mobj.end()
    if pos < len(template):
        parts.append(template[pos:])
    if all(isinstance(p, str) for p in parts):
        out = pa.array(["".join(parts)] * batch.num_rows)  # no $N refs
    elif len(parts) == 1:
        out = parts[0]  # template is exactly one "$N"
    else:
        out = pc.binary_join_element_wise(*parts, "")
    return batch.append_column(out_col, out)


def grep_filter(
    batch: pa.Table, *, text_col: str, pattern: str, regex: bool = False, invert: bool = False
) -> pa.Table:
    """Substring/regex pre-filter (ES sink grep, logpipe-output-es.c:610-617)."""
    if regex:
        mask = pc.match_substring_regex(batch[text_col], pattern)
    else:
        mask = pc.match_substring(batch[text_col], pattern)
    if invert:
        mask = pc.invert(mask)
    return batch.filter(mask)


# --- vectorized JSON column parsing ----------------------------------------


def parse_json_column(col, *, schema: "pa.Schema | None" = None) -> pa.Table:
    """Parse a string column of JSON objects into columns using
    pyarrow's C++ JSON reader — the whole batch is parsed as one
    newline-delimited JSON buffer, zero Python per row (the structured-
    log analog of the reference's fasterjson field extraction,
    src-plugins/logpipe-output-es.c). Rows must be single-line JSON
    objects (no embedded newlines), which is the JSONL contract.
    ``schema`` pins column types (pass ``explicit_schema``) — otherwise
    they are inferred from the batch."""
    import io

    from pyarrow import json as pajson

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    # null entries parse as JSON null rows (join of None would raise)
    col = pc.fill_null(col, "null")
    buf = "\n".join(col.to_pylist()).encode()
    opts = (
        pajson.ParseOptions(explicit_schema=schema)
        if schema is not None
        else pajson.ParseOptions()
    )
    parsed = pajson.read_json(io.BytesIO(buf), parse_options=opts)
    # enforce the no-embedded-newline contract: a value containing '\n'
    # would shift the NDJSON framing and change the row count
    if parsed.num_rows != len(col):
        raise ValueError(
            f"parse_json_column: {parsed.num_rows} parsed rows != "
            f"{len(col)} input rows — embedded newline in a JSON value?"
        )
    return parsed
