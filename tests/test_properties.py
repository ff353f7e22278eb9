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


# --- vectorized token/text kernels (round 2) --------------------------------

texty = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs",), whitelist_characters=" \t"
    ),
    min_size=0,
    max_size=80,
)


@settings(max_examples=150, deadline=None)
@given(texts=st.lists(texty, min_size=1, max_size=8))
def test_batch_shingles_equals_scalar(texts):
    import numpy as np

    from logpipe_ray.stages.dedup import batch_shingles, word_shingles

    off, sh = batch_shingles(pa.array(texts, type=pa.string()))
    for i, t in enumerate(texts):
        assert np.array_equal(np.sort(word_shingles(t)), sh[off[i] : off[i + 1]]), t


@settings(max_examples=150, deadline=None)
@given(texts=st.lists(texty, min_size=1, max_size=8))
def test_batch_simhash_equals_scalar(texts):
    from logpipe_ray.stages.dedup import add_simhash, simhash64

    t = pa.table(
        {"doc_id": pa.array(range(len(texts))), "text": pa.array(texts)}
    )
    assert add_simhash(t)["simhash"].to_pylist() == [simhash64(x) for x in texts]


@settings(max_examples=150, deadline=None)
@given(
    lists=st.lists(
        st.lists(st.integers(0, 50256), min_size=0, max_size=30),
        min_size=1,
        max_size=6,
    ),
    chunk=st.integers(1, 7),
)
def test_chunk_tokens_partitions_exactly(lists, chunk):
    from logpipe_ray.stages.packing import chunk_tokens

    b = pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(len(lists))]),
            "tokens": pa.array(lists, type=pa.list_(pa.int32())),
        }
    )
    out = chunk_tokens(b, chunk=chunk)
    # chunks reconstruct each doc exactly: lengths sum to n_tok, sums to total
    per_doc_len = {f"d{i}": 0 for i in range(len(lists))}
    per_doc_sum = {f"d{i}": 0 for i in range(len(lists))}
    last_idx = {}
    for d, ci, cl, cs in zip(
        out["doc_id"].to_pylist(),
        out["chunk_idx"].to_pylist(),
        out["chunk_len"].to_pylist(),
        out["chunk_sum"].to_pylist(),
    ):
        assert 1 <= cl <= chunk
        assert ci == last_idx.get(d, -1) + 1  # contiguous, ordered
        last_idx[d] = ci
        per_doc_len[d] += cl
        per_doc_sum[d] += cs
    for i, toks in enumerate(lists):
        assert per_doc_len[f"d{i}"] == len(toks)
        assert per_doc_sum[f"d{i}"] == sum(toks)


@settings(max_examples=100, deadline=None)
@given(texts=st.lists(texty, min_size=1, max_size=6))
def test_repetition_stats_match_counter(texts):
    from collections import Counter

    from logpipe_ray.stages.text_analysis import repetition_stats

    b = pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(len(texts))]),
            "text": pa.array(texts),
        }
    )
    out = repetition_stats(b)
    for i, t in enumerate(texts):
        ws = t.split(" ")
        wc = Counter(ws)
        bg = Counter(zip(ws, ws[1:]))
        assert out["n_words"][i].as_py() == len(ws)
        assert out["n_dup_words"][i].as_py() == len(ws) - len(wc)
        assert out["top_word_count"][i].as_py() == max(wc.values())
        assert out["top_bigram_count"][i].as_py() == (
            max(bg.values()) if bg else 0
        )


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=50256), max_size=40),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=50, deadline=None)
def test_token_content_hash_is_content_function(lists):
    """Equal token arrays hash equal (for BOTH kernels — the blake2b
    add_tokens_hash and the vectorized token_content_hashes, incl.
    batches with empty rows anywhere); order- and boundary-sensitive;
    slicing the batch doesn't change row hashes."""
    from logpipe_ray.functions.tokens import (
        _list_buffers,
        add_tokens_hash,
        token_content_hashes,
    )

    arr = pa.array(lists, type=pa.list_(pa.int32()))
    t = pa.table({"tokens": arr})
    h = add_tokens_hash(t)["tokens_hash"].to_pylist()
    hv_batch = list(token_content_hashes(*_list_buffers(arr)))
    # pure function of content: recompute row-by-row matches
    for i, row in enumerate(lists):
        single = pa.array([row], type=pa.list_(pa.int32()))
        assert (
            add_tokens_hash(pa.table({"tokens": single}))["tokens_hash"][0].as_py()
            == h[i]
        )
        assert token_content_hashes(*_list_buffers(single))[0] == hv_batch[i]
    # sliced-table offsets handled
    h_tail = add_tokens_hash(t.slice(1))["tokens_hash"].to_pylist()
    assert h_tail == h[1:]
    if len(lists) > 1:
        assert list(token_content_hashes(*_list_buffers(arr.slice(1)))) == hv_batch[1:]
    # equal content ⇔ equal hash on these examples (no false merges),
    # for both kernels
    keys = [tuple(r) for r in lists]
    for hashes in (h, hv_batch):
        by_hash, by_key = {}, {}
        for k, hv in zip(keys, hashes):
            by_hash.setdefault(hv, set()).add(k)
            by_key.setdefault(k, set()).add(hv)
        assert all(len(s) == 1 for s in by_hash.values())
        assert all(len(s) == 1 for s in by_key.values())


def test_token_content_hash_order_and_boundary_sensitivity():
    import numpy as np

    from logpipe_ray.functions.tokens import token_content_hashes

    off = np.array([0, 3, 6, 10, 13, 14], dtype=np.int64)
    vals = np.array([1, 2, 3, 3, 2, 1, 4, 1, 2, 3, 1, 2, 3, 1], dtype=np.int64)
    h = token_content_hashes(off, vals)
    assert h[0] != h[1]  # permutation differs
    assert h[0] != h[2]  # prefixed differs
    assert h[0] == h[3]  # same content equal
    assert h[0] != h[4]  # prefix-of differs


# --- TCP wire framing (sources/tcp.py) --------------------------------------


def _decode_frames(buf: bytes):
    """Independent decoder written from the documented wire layout
    (module doc of sources/tcp.py / logpipe-input-tcp.c:221-361): '@' +
    BE16 name length + name, then (BE32 block length + 4 zero bytes +
    payload)* terminated by a zero length field. Deliberately NOT a
    call into the production code — the property is encode(x) →
    independent-decode → x."""
    import struct
    import zlib

    frames = []
    i = 0
    while i < len(buf):
        assert buf[i : i + 1] == b"@"
        (nlen,) = struct.unpack(">H", buf[i + 1 : i + 3])
        name = buf[i + 3 : i + 3 + nlen].decode()
        i += 3 + nlen
        blocks = []
        while True:
            (blen,) = struct.unpack(">I", buf[i : i + 4])
            assert buf[i + 4 : i + 8] == b"\x00" * 4  # htonl-into-uint64
            i += 8
            if blen == 0:
                break
            blocks.append(buf[i : i + blen])
            i += blen
        frames.append((name, blocks))
    return frames


@given(
    name=st.text(
        alphabet=st.characters(min_codepoint=33, max_codepoint=126),
        min_size=1,
        max_size=40,
    ),
    payload=st.binary(min_size=0, max_size=5000),
    block_bytes=st.integers(min_value=1, max_value=1 << 12),
)
@settings(max_examples=60, deadline=None)
def test_frame_file_independent_decode_roundtrip(name, payload, block_bytes):
    from logpipe_ray.sources.tcp import frame_file

    frames = _decode_frames(
        frame_file(name, payload, block_bytes=block_bytes)
    )
    assert len(frames) == 1
    got_name, blocks = frames[0]
    assert got_name == name
    assert b"".join(blocks) == payload
    # every block except possibly the last is exactly block_bytes
    assert all(len(b) == block_bytes for b in blocks[:-1])
    assert all(1 <= len(b) <= block_bytes for b in blocks)


@given(payload=st.binary(min_size=0, max_size=5000))
@settings(max_examples=40, deadline=None)
def test_frame_file_deflate_roundtrip(payload):
    import zlib

    from logpipe_ray.sources.tcp import frame_file

    frames = _decode_frames(
        frame_file("z.log", payload, block_bytes=1024, compress="deflate")
    )
    ((_, blocks),) = frames
    assert b"".join(zlib.decompress(b) for b in blocks) == payload


@given(
    n=st.integers(min_value=0, max_value=1 << 20),
    suf=st.sampled_from(["b", "kb", "mb", "gb", "tb"]),
    case=st.booleans(),
)
@settings(max_examples=60, deadline=None)
def test_parse_size_exact_for_integers(n, suf, case):
    from logpipe_ray.util import parse_size

    mult = {"b": 1, "kb": 1 << 10, "mb": 1 << 20, "gb": 1 << 30, "tb": 1 << 40}
    s = f"{n}{suf.upper() if case else suf}"
    assert parse_size(s) == n * mult[suf]
    assert parse_size(f"  {s} ") == n * mult[suf]  # whitespace-tolerant
