"""Deduplication family: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale shapes (standard MinHash/LSH dedup patterns; Broder 1997,
Leskovec et al. "Mining of Massive Datasets" ch.3):

- **exact**: content hash in ``map_batches`` (vectorized) →
  ``groupby(hash)`` keeps the min-id representative. The shuffle moves
  only (hash, id) pairs, never the text.
- **MinHash+LSH** (the 100 TB path): shingle → k minhashes → b bands;
  explode to (band, band_hash, doc_id) rows; ``groupby`` on the band
  key yields candidate buckets; exact Jaccard verifies candidates.
  Probabilistic recall — the exact n-gram path is the small-scale
  oracle it is tested against.
- **SimHash**: 64-bit sign-sum sketch; near-dups = small Hamming
  distance; bucket by bit-bands for sub-quadratic search.

All hashes are content-derived (sha1/blake2b prefixes) — never Python's
process-salted ``hash()``.
"""

from __future__ import annotations

import hashlib
from typing import Iterable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MERSENNE61 = (1 << 61) - 1


def stable_u64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")


def add_text_hash(
    batch: pa.Table, *, text_col: str = "text", out_col: str = "text_hash"
) -> pa.Table:
    """64-bit content hash column (int64, masked to 63 bits for Arrow).

    Hashes the string column's utf-8 buffer slices through memoryviews
    (offsets straight from the Arrow value buffer) — no per-row Python
    str materialization / re-encode. blake2b stays (content hash across
    workers; Python hash() is process-salted)."""
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count == 0 and isinstance(col, pa.StringArray):
        buf_offsets, buf_data = col.buffers()[1], col.buffers()[2]
        offsets = np.frombuffer(buf_offsets, dtype=np.int32, count=len(col) + 1,
                                offset=col.offset * 4)
        data = memoryview(buf_data)
        h = hashlib.blake2b
        vals = np.fromiter(
            (
                int.from_bytes(
                    h(data[offsets[i] : offsets[i + 1]], digest_size=8).digest(),
                    "big",
                )
                >> 1
                for i in range(len(col))
            ),
            dtype=np.int64,
            count=len(col),
        )
        return batch.append_column(out_col, pa.array(vals, type=pa.int64()))
    vals = [
        (stable_u64(t) >> 1) if t is not None else None
        for t in col.to_pylist()
    ]
    return batch.append_column(out_col, pa.array(vals, type=pa.int64()))


def exact_dedup(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 64,
):
    """Exact corpus dedup keeping the min-``id_col`` representative ROW
    per unique content (the config-stage / pipeline form of the
    ``dedup_exact`` query, which returns only stats).

    Shape: content hash per batch (vectorized) → ONE all-to-all range
    shuffle on the hash itself (irreducible for exact dedup: a row's
    duplicates can live anywhere; the sort invariant co-locates every
    hash's copies in one block) → vectorized first-wins per block.
    Sorting on the HIGH-cardinality ``text_hash`` — rather than a
    ``hash % num_buckets`` key — keeps every range nonempty (range
    bounds are quantiles of present keys), so the shuffle emits no
    schema-less empty blocks (stages/smallagg docstring).
    ``num_buckets`` bounds the shuffle block count; size it so
    corpus/num_buckets rows fit a worker's heap."""
    from functools import partial

    hashed = ds.map_batches(
        partial(add_text_hash, text_col=text_col), batch_format="pyarrow"
    ).repartition(num_buckets)

    def first_wins(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.drop_columns(["text_hash"])
        h = b["text_hash"].combine_chunks().to_numpy(zero_copy_only=False)
        i = b[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((i, h))
        hs = h[order]
        first = np.concatenate(([True], hs[1:] != hs[:-1]))
        return b.take(pa.array(order[first])).drop_columns(["text_hash"])

    return hashed.sort("text_hash").map_batches(
        first_wins, batch_format="pyarrow", batch_size=None
    )


def keep_best_dedup(
    ds,
    *,
    text_col: str = "text",
    quality_col: str = "n_chars",
    id_col: str = "doc_id",
):
    """Canonical-content dedup keeping the BEST copy, not the first:
    rows grouped by their distinct-word SET (order-, multiplicity- and
    whitespace-insensitive fingerprint); the max-``quality_col`` copy
    wins, ties broken by min ``id_col``. Returns one row per group:
    (id_col, quality_col, n_copies), all int64.

    Shape: per-batch vectorized set fingerprints (one arrow whitespace
    split + one hash_array over the flat word buffer — batch_shingles
    with ngram=1 — then a per-row wraparound sum of the DISTINCT word
    hashes), per-batch partial argmax so ≤ n_groups rows leave any
    block, ONE keyed shuffle of slim partial rows folds
    (max quality, min id among maxes, count) per fingerprint. The text
    itself never shuffles."""
    import pyarrow.compute as pc

    from logpipe_ray.stages.smallagg import run_starts

    empty = pa.schema(
        [
            ("ws_fp", pa.int64()),
            (id_col, pa.int64()),
            (quality_col, pa.int64()),
            ("n_copies", pa.int64()),
        ]
    ).empty_table()

    def partials(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty
        off, wh = batch_shingles(b[text_col], ngram=1)  # per-row DISTINCT words
        cs = np.zeros(len(wh) + 1, dtype=np.uint64)
        np.cumsum(wh, out=cs[1:])
        fp = ((cs[off[1:]] - cs[off[:-1]]) >> np.uint64(1)).astype(np.int64)
        doc = pc.cast(b[id_col], pa.int64()).to_numpy(zero_copy_only=False)
        q = pc.cast(b[quality_col], pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, -q, fp))  # fp asc, quality desc, id asc
        starts = run_starts(fp[order])
        counts = np.diff(np.concatenate((starts, [len(order)])))
        best = order[starts]  # first per fp run = (max quality, min id)
        return pa.table(
            {
                "ws_fp": pa.array(fp[best], type=pa.int64()),
                id_col: pa.array(doc[best], type=pa.int64()),
                quality_col: pa.array(q[best], type=pa.int64()),
                "n_copies": pa.array(counts, type=pa.int64()),
            }
        )

    parts = ds.map_batches(partials, batch_format="pyarrow")

    # fold partials: ONE range sort on the high-cardinality fingerprint
    # (every range nonempty — distinct fps far exceed partial blocks;
    # the sort invariant co-locates a fp's partial rows in one block),
    # then a single vectorized run-merge per block — no per-key Python
    # accumulator, no low-cardinality shuffle.
    def combine(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty.select([id_col, quality_col, "n_copies"])
        fp = b["ws_fp"].combine_chunks().to_numpy(zero_copy_only=False)
        did = b[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        q = b[quality_col].combine_chunks().to_numpy(zero_copy_only=False)
        nc = b["n_copies"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((did, -q, fp))  # fp asc, quality desc, id asc
        starts = run_starts(fp[order])
        best = order[starts]
        return pa.table(
            {
                id_col: pa.array(did[best], type=pa.int64()),
                quality_col: pa.array(q[best], type=pa.int64()),
                "n_copies": pa.array(
                    np.add.reduceat(nc[order], starts), type=pa.int64()
                ),
            }
        )

    from logpipe_ray.stages.smallagg import sorted_runs_fold

    return sorted_runs_fold(parts, "ws_fp", combine, rows_per_block=262144)


# --- vectorized shingle hashing --------------------------------------------
#
# Shingle hashes are pure IDENTITIES: every consumer (minhash, LSH
# buckets, Jaccard verify, inverted index) only ever compares them for
# equality, and the SQL oracles compute Jaccard over the literal string
# n-gram sets — so any injective-in-practice 64-bit hash gives
# byte-identical results, and the batch path below replaces the old
# per-gram blake2b loop (the dominant per-doc cost at corpus scale)
# with one `pd.util.hash_array` over the batch's words + a vectorized
# Horner combine.

_MIX_P = np.uint64(0x9E3779B97F4A7C15)


def _fmix64(h: np.ndarray) -> np.ndarray:
    """Final avalanche (murmur3 fmix64 constants), vectorized uint64."""
    h = h.copy()
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xFF51AFD7ED558CCD)
    h ^= h >> np.uint64(29)
    h *= np.uint64(0xC4CEB9FE1A85EC53)
    h ^= h >> np.uint64(32)
    return h


def hash_words(words: np.ndarray) -> np.ndarray:
    """Deterministic vectorized 64-bit word hashes —
    ``pd.util.hash_array`` (keyed, constant default key, stable across
    worker processes; Python ``hash()`` is per-process salted)."""
    import pandas as pd

    if len(words) == 0:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_array(words.astype(object, copy=False))


def _ngram_combine(wh: np.ndarray, n: int) -> np.ndarray:
    """Order-sensitive n-gram hash over a word-hash array: Horner with
    a golden-ratio multiplier + final avalanche. Output length
    ``len(wh) - n + 1`` (empty if fewer than n words)."""
    if len(wh) < n:
        return np.empty(0, dtype=np.uint64)
    m = len(wh) - n + 1
    h = wh[:m].copy()
    for j in range(1, n):
        h = h * _MIX_P + wh[j : m + j]
    return _fmix64(h)


def batch_words(texts) -> tuple[np.ndarray, np.ndarray]:
    """Whitespace-tokenize a whole batch: one arrow split, flat word
    array + per-row offsets, with the empty strings arrow emits at
    string edges dropped (matching python ``str.split()`` and the SQL
    oracles' ``regexp_extract_all(text, '\\S+')``). Shared kernel for
    shingling and corpus-frequency scoring."""
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    words = pc.utf8_split_whitespace(texts)
    offsets = words.offsets.to_numpy().astype(np.int64)
    flat = words.values.to_numpy(zero_copy_only=False)
    # a sliced ListArray's offsets need not start at 0
    flat = flat[offsets[0] : offsets[-1]]
    offsets = offsets - offsets[0]
    n_rows = len(offsets) - 1
    seg_w = np.repeat(np.arange(n_rows, dtype=np.int64), np.diff(offsets))
    nonempty_w = flat != ""
    if not nonempty_w.all():
        flat = flat[nonempty_w]
        seg_w = seg_w[nonempty_w]
        counts_w = np.bincount(seg_w, minlength=n_rows)
        offsets = np.zeros(n_rows + 1, dtype=np.int64)
        np.cumsum(counts_w, out=offsets[1:])
    return offsets, flat


def batch_shingles(
    texts, *, ngram: int = 3
) -> tuple[np.ndarray, np.ndarray]:
    """Per-row DISTINCT word-n-gram shingle hash sets for a whole batch:
    one arrow whitespace split, one ``hash_array`` over the flat word
    buffer, vectorized n-gram combine, per-row dedupe via lexsort.
    Returns ``(offsets, hashes)`` with each row's hash run sorted
    ascending; rows with fewer than ``ngram`` words are empty (the SQL
    oracle's trigram semantics — see :func:`word_shingles`)."""
    offsets, flat = batch_words(texts)
    n_rows = len(offsets) - 1
    lens = np.diff(offsets)
    n_sh = np.maximum(lens - ngram + 1, 0)
    tot = int(n_sh.sum())
    empty_off = np.zeros(n_rows + 1, dtype=np.int64)
    if tot == 0:
        return empty_off, np.empty(0, dtype=np.uint64)
    wh = hash_words(flat)
    gh = _ngram_combine(wh, ngram)  # windows over the FLAT buffer
    shoff = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(n_sh, out=shoff[1:])
    # flat positions of each row's in-row window starts
    pos = (
        np.arange(tot, dtype=np.int64)
        - np.repeat(shoff[:-1], n_sh)
        + np.repeat(offsets[:-1], n_sh)
    )
    tri = gh[pos]
    seg = np.repeat(np.arange(n_rows, dtype=np.int64), n_sh)
    order = np.lexsort((tri, seg))
    seg_s, tri_s = seg[order], tri[order]
    keep = np.ones(len(order), dtype=bool)
    keep[1:] = (seg_s[1:] != seg_s[:-1]) | (tri_s[1:] != tri_s[:-1])
    seg_d, tri_d = seg_s[keep], tri_s[keep]
    counts = np.bincount(seg_d, minlength=n_rows)
    out_off = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(counts, out=out_off[1:])
    return out_off, tri_d


def word_shingles(text: str, n: int = 3) -> np.ndarray:
    """Distinct word n-gram shingles as uint64 hashes (sorted).

    Docs with fewer than ``n`` words yield an EMPTY set — matching the
    SQL oracle's trigram semantics (range over len-n+1 positions), so
    two identical 1-2 word docs are not reported as J=1.0 pairs by one
    path and skipped by the other (ADVICE r1). Single-doc form of
    :func:`batch_shingles` (identical hashes by construction).
    """
    words = text.split()
    if len(words) < n:
        return np.empty(0, dtype=np.uint64)
    wh = hash_words(np.array(words, dtype=object))
    return np.unique(_ngram_combine(wh, n))


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Jaccard similarity; two empty sets → 0.0 (no shared evidence —
    keeps the LSH-verify path consistent with the inverted-index exact
    path, where shingle-less docs never become candidates)."""
    if len(a) == 0 and len(b) == 0:
        return 0.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    return inter / (len(a) + len(b) - inter)


# --- MinHash ---------------------------------------------------------------


MERSENNE31 = (1 << 31) - 1


def _minhash_params(k: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, MERSENNE31, size=k).astype(np.int64)
    b = rng.randint(0, MERSENNE31, size=k).astype(np.int64)
    return a, b


def minhash_signature(
    shingles: np.ndarray, k: int = 128, seed: int = 7
) -> np.ndarray:
    """k-permutation MinHash via universal hashing mod 2^31-1 — products
    stay < 2^62, so the whole (k × n) grid is one vectorized int64 op."""
    a, b = _minhash_params(k, seed)
    if len(shingles) == 0:
        return np.full(k, np.iinfo(np.int64).max, dtype=np.int64)
    x = (shingles % MERSENNE31).astype(np.int64)
    grid = (a[:, None] * x[None, :] + b[:, None]) % MERSENNE31
    return grid.min(axis=1)


def _band_hashes_matrix(sigs: np.ndarray, bands: int) -> np.ndarray:
    """(n_docs, k) signature matrix → (n_docs, bands) 63-bit band
    hashes, vectorized (Horner over each band's rows + avalanche)."""
    n, k = sigs.shape
    rows = k // bands
    # floor semantics for k % bands != 0: the signature tail beyond
    # bands*rows is ignored (the pre-vectorization band_keys sliced
    # per-band and never touched it either)
    rs = sigs[:, : bands * rows].astype(np.uint64).reshape(n, bands, rows)
    h = np.zeros((n, bands), dtype=np.uint64)
    for j in range(rows):
        h = h * _MIX_P + rs[:, :, j]
    return _fmix64(h) >> np.uint64(1)


def band_keys(sig: np.ndarray, bands: int = 16) -> list[int]:
    """LSH band hashes: split the signature into ``bands`` rows-chunks,
    hash each chunk → (band_id, band_hash) bucket keys. Single-doc form
    of :func:`_band_hashes_matrix` (identical values)."""
    return [int(v) for v in _band_hashes_matrix(np.asarray(sig).reshape(1, -1), bands)[0]]


def explode_lsh_bands(
    batch: pa.Table,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 128,
    bands: int = 16,
    ngram: int = 3,
) -> pa.Table:
    """doc rows → (band_id, band_hash, doc_id) rows for the bucket
    groupby. Fully vectorized: batch shingles → one (k × n_shingles)
    minhash pass with per-row segment mins (``minimum.reduceat``) →
    matrix band hashing. Shingle-less docs emit no rows (they can never
    verify, J=0 — and their all-max signatures would otherwise all
    collide in one bucket)."""
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    off, sh = batch_shingles(col.fill_null(""), ngram=ngram)
    lens = np.diff(off)
    nonempty = lens > 0
    n_rows = len(lens)
    if not nonempty.any():
        return pa.table(
            {
                "band_id": pa.array([], type=pa.int32()),
                "band_hash": pa.array([], type=pa.int64()),
                id_col: batch[id_col].slice(0, 0),
            }
        )
    a, b = _minhash_params(k)
    x = (sh % MERSENNE31).astype(np.int64)
    idx = np.nonzero(nonempty)[0]
    # reduceat ONLY over non-empty rows' starts: a trailing-empty row's
    # start equals len(x), and clipping it into range would truncate
    # the preceding row's segment (the ADVICE-r1 reduceat trap) —
    # non-empty starts are strictly increasing and always in range
    starts = off[:-1][nonempty]
    sigs = np.empty((len(idx), k), dtype=np.int64)
    for j in range(k):
        vals = (a[j] * x + b[j]) % MERSENNE31
        sigs[:, j] = np.minimum.reduceat(vals, starts)
    bh = _band_hashes_matrix(sigs, bands)
    doc_rep = np.repeat(idx, bands)
    return pa.table(
        {
            "band_id": pa.array(
                np.tile(np.arange(bands, dtype=np.int32), len(idx))
            ),
            "band_hash": pa.array(
                bh.ravel().astype(np.int64), type=pa.int64()
            ),
            id_col: pc.take(batch[id_col], pa.array(doc_rep)),
        }
    )


def candidate_pairs_from_bucket(tbl: pa.Table) -> pa.Table:
    """One LSH bucket → unordered candidate id pairs (a < b)."""
    ids = sorted(set(tbl["doc_id"].to_pylist()))
    a_out, b_out = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a_out.append(ids[i])
            b_out.append(ids[j])
    # typed even when empty — an untyped empty (null-type) block poisons
    # downstream schema unification / joins ("new schema: ." warnings);
    # the id type follows the input (int64 corpus ids or string test ids)
    id_type = tbl["doc_id"].type
    return pa.table(
        {
            "doc_a": pa.array(a_out, type=id_type),
            "doc_b": pa.array(b_out, type=id_type),
        }
    )


# --- SimHash ---------------------------------------------------------------


_SH_SHIFTS = np.arange(64, dtype=np.uint64)


def simhash64(text: str) -> int:
    """64-bit SimHash over distinct-word features (word-hash bit
    sign-sums); word hashes via :func:`hash_words` (same identities as
    the shingle family). Single-doc form of :func:`add_simhash`."""
    words = sorted(set(text.split()))
    if not words:
        return 0
    hs = hash_words(np.array(words, dtype=object))
    bits = ((hs[:, None] >> _SH_SHIFTS[None, :]) & np.uint64(1)).astype(np.int64)
    acc = (2 * bits - 1).sum(axis=0)
    out = int(((acc > 0).astype(np.uint64) << _SH_SHIFTS).sum())
    return out >> 1  # 63 bits, fits int64


def add_simhash(
    batch: pa.Table, *, text_col: str = "text", out_col: str = "simhash"
) -> pa.Table:
    """Vectorized batch SimHash: one split + one ``hash_array`` for the
    whole batch, per-doc distinct words via lexsort dedupe, sign-sums
    via ``add.reduceat`` over the (words × 64) bit matrix — no per-doc
    Python loop (the per-word blake2b was the dominant cost)."""
    import pyarrow.compute as pc

    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    words = pc.utf8_split_whitespace(col.fill_null(""))
    offsets = words.offsets.to_numpy().astype(np.int64)
    flat = words.values.to_numpy(zero_copy_only=False)
    flat = flat[offsets[0] : offsets[-1]]
    offsets = offsets - offsets[0]
    n_rows = len(offsets) - 1
    seg = np.repeat(np.arange(n_rows, dtype=np.int64), np.diff(offsets))
    keep_w = flat != ""  # arrow split emits empties at string edges
    flat, seg = flat[keep_w], seg[keep_w]
    out = np.zeros(n_rows, dtype=np.int64)
    if len(flat):
        wh = hash_words(flat)
        # distinct words per doc (simhash is over the word SET)
        order = np.lexsort((wh, seg))
        seg_s, wh_s = seg[order], wh[order]
        first = np.ones(len(order), dtype=bool)
        first[1:] = (seg_s[1:] != seg_s[:-1]) | (wh_s[1:] != wh_s[:-1])
        seg_d, wh_d = seg_s[first], wh_s[first]
        signs = (
            ((wh_d[:, None] >> _SH_SHIFTS[None, :]) & np.uint64(1)).astype(
                np.int32
            )
            * 2
            - 1
        )
        counts = np.bincount(seg_d, minlength=n_rows)
        starts = np.zeros(n_rows, dtype=np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        nonempty = counts > 0
        # reduceat ONLY over non-empty segments' starts: clipping a
        # trailing-empty row's start (== len) into range would truncate
        # the PRECEDING segment's range (the ADVICE-r1 reduceat trap)
        acc = np.add.reduceat(signs, starts[nonempty], axis=0)
        sketch = ((acc > 0).astype(np.uint64) << _SH_SHIFTS[None, :]).sum(
            axis=1
        ) >> np.uint64(1)
        out[nonempty] = sketch.astype(np.int64)
    return batch.append_column(out_col, pa.array(out, type=pa.int64()))


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def simhash_band_explode(
    batch: pa.Table,
    *,
    hash_col: str = "simhash",
    id_col: str = "doc_id",
    bands: int = 4,
    band_bits: int = 16,
) -> pa.Table:
    """(doc_id, simhash) rows → (band_id, band_val, doc_id, simhash)
    rows, vectorized. Pigeonhole guarantee: two hashes within Hamming
    distance ``bands - 1`` agree on at least one band, so the bucket
    groupby finds ALL such pairs (full recall, unlike MinHash bands)."""
    sh = batch[hash_col].to_numpy(zero_copy_only=False).astype(np.uint64)
    ids = batch[id_col]
    mask = np.uint64((1 << band_bits) - 1)
    parts = []
    for b in range(bands):
        band_val = ((sh >> np.uint64(b * band_bits)) & mask).astype(np.int64)
        parts.append(
            pa.table(
                {
                    "band_id": pa.array(
                        np.full(len(sh), b, dtype=np.int32), type=pa.int32()
                    ),
                    "band_val": pa.array(band_val, type=pa.int64()),
                    id_col: ids,
                    hash_col: batch[hash_col],
                }
            )
        )
    return pa.concat_tables(parts)


def simhash_bucket_pairs(
    tbl: pa.Table, *, max_hamming: int = 3, id_col: str = "doc_id",
    hash_col: str = "simhash",
) -> pa.Table:
    """One band bucket → (doc_a, doc_b, hamming) pairs with
    hamming ≤ max_hamming, verified via vectorized xor-popcount."""
    order = pc.sort_indices(tbl, sort_keys=[(id_col, "ascending")])
    tbl = tbl.take(order)
    ids = tbl[id_col].to_numpy(zero_copy_only=False)
    sh = tbl[hash_col].to_numpy(zero_copy_only=False).astype(np.uint64)
    # de-dup ids within the bucket (a doc appears once per bucket anyway)
    n = len(ids)
    a_out, b_out, h_out = [], [], []
    if n > 1:
        iu = np.triu_indices(n, k=1)
        x = sh[iu[0]] ^ sh[iu[1]]
        ham = np.zeros(len(x), dtype=np.int64)
        while x.any():
            ham += (x & np.uint64(1)).astype(np.int64)
            x = x >> np.uint64(1)
        keep = np.nonzero(ham <= max_hamming)[0]
        for o in keep:
            a, b = int(ids[iu[0][o]]), int(ids[iu[1][o]])
            if a == b:
                continue
            lo, hi = (a, b) if a < b else (b, a)
            a_out.append(lo)
            b_out.append(hi)
            h_out.append(int(ham[o]))
    return pa.table(
        {
            "doc_a": pa.array(a_out, type=pa.int64()),
            "doc_b": pa.array(b_out, type=pa.int64()),
            "hamming": pa.array(h_out, type=pa.int64()),
        }
    )


# --- exact all-pairs n-gram Jaccard (small-scale oracle path) --------------


def shingle_table(
    texts: Iterable[tuple[str, str]], ngram: int = 3
) -> dict[str, np.ndarray]:
    return {doc_id: word_shingles(t or "", ngram) for doc_id, t in texts}


def topk_jaccard_pairs(
    shingles: dict[str, np.ndarray], k: int = 20
) -> list[tuple[str, str, int]]:
    """Top-k (doc_a, doc_b, jaccard_bp) pairs, jaccard in basis points
    (floor(J*10000) — integer, engine-reproducible), ordered by
    (jaccard desc, doc_a, doc_b).

    Inverted-index prefilter: J > 0 requires a shared shingle, so only
    pairs co-occurring under some shingle are scored — identical output
    to all-pairs, sub-quadratic when overlap is sparse (the realistic
    corpus case; 5000 random docs: ~10^5 candidate pairs vs 1.25×10^7)."""
    index: dict[int, list[str]] = {}
    for doc_id in sorted(shingles):
        for h in shingles[doc_id].tolist():
            index.setdefault(h, []).append(doc_id)
    candidates: set[tuple[str, str]] = set()
    for docs in index.values():
        if len(docs) > 1:
            for i in range(len(docs)):
                for j in range(i + 1, len(docs)):
                    candidates.add((docs[i], docs[j]))
    pairs = []
    for a, b in candidates:
        jac = jaccard(shingles[a], shingles[b])
        if jac > 0:
            pairs.append((a, b, int(jac * 10000)))
    pairs.sort(key=lambda p: (-p[2], p[0], p[1]))
    return pairs[:k]


# --- clustering ------------------------------------------------------------


def union_find_clusters(pairs) -> dict:
    """node → cluster representative (min id) from an edge list.

    Driver-side union-find: correct when the verified near-dup pair set
    is small relative to the corpus (the usual post-LSH situation; the
    pairs, not the docs, come to the driver). For pathological pair
    volumes, run distributed min-label propagation instead: iterate
    ``edges.groupby(node).aggregate(Min(label))`` until labels stop
    changing — same result, one shuffle per round.
    """
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            # keep the smaller id as root → deterministic representative
            lo, hi = (ra, rb) if ra <= rb else (rb, ra)
            parent[hi] = lo
    return {n: find(n) for n in parent}
