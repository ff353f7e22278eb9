"""Hypothesis property tests for the parse layer (pure-function stages)."""

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from logpipe_ray.stages.parse import (
    cut_route_key,
    format_template,
    pack_metadata,
    split_fields,
    unpack_metadata,
)

# header values: anything except ']' (the reference's bracket format has
# the same restriction — values are scanned up to the closing bracket)
value = st.text(
    alphabet=st.characters(blacklist_characters="]", blacklist_categories=("Cs",)),
    min_size=0,
    max_size=40,
)
word = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=1, max_size=8)


@settings(max_examples=200, deadline=None)
@given(system=value, server=value, filename=value, offset=st.integers(0, 2**62), line=st.integers(0, 2**62))
def test_pack_unpack_roundtrip(system, server, filename, offset, line):
    t = pa.table(
        {
            "system": [system],
            "server": [server],
            "source": [filename],
            "offset": [offset],
            "line": [line],
        }
    )
    packed = pack_metadata(t, offset_col="offset", line_col="line")
    out = unpack_metadata(packed)
    assert out["meta_system"].to_pylist() == [system]
    assert out["meta_server"].to_pylist() == [server]
    assert out["meta_filename"].to_pylist() == [filename]
    assert out["meta_offset"].to_pylist() == [offset]
    assert out["meta_line"].to_pylist() == [line]


@settings(max_examples=200, deadline=None)
@given(words=st.lists(word, min_size=1, max_size=6), ext=st.sampled_from(["log", "txt", ""]))
def test_cut_route_key_takes_first_two_words(words, ext):
    name = "_".join(words) + (f".{ext}" if ext else "")
    t = pa.table({"source": [name]})
    out = cut_route_key(t, n_words=2)["route_key"].to_pylist()[0]
    assert out == "_".join(words[:2])


@settings(max_examples=100, deadline=None)
@given(fields=st.lists(word, min_size=1, max_size=8))
def test_split_then_template_reassembles(fields):
    t = pa.table({"line": [" ".join(fields)]})
    n = len(fields)
    out = split_fields(t, text_col="line", max_fields=n, strict=True)
    assert out.num_rows == 1
    tmpl = " ".join(f"${i + 1}" for i in range(n))
    doc = format_template(out, tmpl)["doc"].to_pylist()[0]
    assert doc == " ".join(fields)


@settings(max_examples=100, deadline=None)
@given(
    fields=st.lists(word, min_size=1, max_size=4),
    required=st.integers(min_value=1, max_value=8),
)
def test_strict_arity_drop(fields, required):
    t = pa.table({"line": [" ".join(fields)]})
    out = split_fields(t, text_col="line", max_fields=required, strict=True)
    assert out.num_rows == (1 if len(fields) >= required else 0)
