"""Text-analysis stages over a document table (training-data pipeline ops).

These extend the engine beyond the reference's byte-forwarding scope
with the operations a large-scale training-data pipeline needs:
token counting, quality statistics, language ID, fingerprinting. All
kernels are vectorized ``pyarrow.compute`` regex/string ops (RE2 — the
same engine DuckDB uses, so regex semantics match the oracles) or
numpy; language ID is a stateful actor-pool stage (tables built once
per actor).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# word-ish tokens: runs of word chars, or single non-space punctuation —
# a cheap BPE-ish pre-tokenizer split
TOKEN_PATTERN = r"\w+|[^\w\s]"
PUNCT_PATTERN = r"[.!?,;:]"
STOPWORDS = ("the", "and", "of", "a", "to", "in", "is")


def add_token_count(
    batch: pa.Table, *, text_col: str = "text", out_col: str = "n_tokens"
) -> pa.Table:
    n = pc.count_substring_regex(batch[text_col], TOKEN_PATTERN)
    return batch.append_column(out_col, pc.cast(n, pa.int64()))


def add_text_stats(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """n_chars (codepoints), n_words (\\S+ runs), n_punct, n_stop."""
    text = batch[text_col]
    batch = batch.append_column(
        "n_chars", pc.cast(pc.utf8_length(text), pa.int64())
    )
    batch = batch.append_column(
        "n_words", pc.cast(pc.count_substring_regex(text, r"\S+"), pa.int64())
    )
    batch = batch.append_column(
        "n_punct", pc.cast(pc.count_substring_regex(text, PUNCT_PATTERN), pa.int64())
    )
    stop_pat = r"\b(?:" + "|".join(STOPWORDS) + r")\b"
    batch = batch.append_column(
        "n_stop", pc.cast(pc.count_substring_regex(text, stop_pat), pa.int64())
    )
    return batch


def quality_score_batch(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """Heuristic quality score in [0,1]: length, punctuation balance,
    stopword ratio (the classic pre-filter trio). Deterministic."""
    b = add_text_stats(batch, text_col=text_col)
    n_chars = b["n_chars"].to_numpy().astype(np.float64)
    n_words = b["n_words"].to_numpy().astype(np.float64)
    n_punct = b["n_punct"].to_numpy().astype(np.float64)
    n_stop = b["n_stop"].to_numpy().astype(np.float64)
    length_score = np.clip(n_chars / 500.0, 0.0, 1.0)
    punct_ratio = np.where(n_chars > 0, n_punct / np.maximum(n_chars, 1), 0.0)
    punct_score = 1.0 - np.clip(punct_ratio * 10.0, 0.0, 1.0)
    stop_ratio = np.where(n_words > 0, n_stop / np.maximum(n_words, 1), 0.0)
    stop_score = np.clip(stop_ratio * 4.0, 0.0, 1.0)
    score = (length_score + punct_score + stop_score) / 3.0
    return b.append_column("quality_score", pa.array(score, type=pa.float64()))


# --- repetition statistics (Gopher-style quality signals) ------------------


def repetition_stats(
    batch: pa.Table, *, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """Per-doc repetition signals (the Gopher/C4 duplicate-content
    filters): word count, duplicate-word count, most-frequent-word
    count, most-frequent-bigram count — integers only, so the DuckDB
    oracle matches exactly with no float rounding.

    Fully vectorized across the batch: one split, one global word
    interning (``np.unique``), then per-(doc, word) and per-(doc,
    bigram) counting via composite int keys + ``bincount``/
    ``maximum.at`` — no per-doc Python loop. Split semantics mirror
    DuckDB ``string_split(text, ' ')`` (consecutive separators yield
    empty-string words)."""
    words = pc.split_pattern(batch[text_col], " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    offsets = words.offsets.to_numpy().astype(np.int64)
    flat = words.values.to_numpy(zero_copy_only=False)
    # a sliced ListArray's offsets need not start at 0
    flat = flat[offsets[0] : offsets[-1]]
    offsets = offsets - offsets[0]
    n_docs = len(offsets) - 1
    n_words = np.diff(offsets)
    seg = np.repeat(np.arange(n_docs, dtype=np.int64), n_words)

    uniq, inv = np.unique(flat, return_inverse=True)
    v = np.int64(len(uniq))
    pair = seg * v + inv
    upair, cnt = np.unique(pair, return_counts=True)
    pseg = upair // v
    n_distinct = np.bincount(pseg, minlength=n_docs)
    top_word = np.zeros(n_docs, dtype=np.int64)
    np.maximum.at(top_word, pseg, cnt)

    # bigrams: adjacent word-code pairs within a doc. The (doc, bigram)
    # composite key is built from INTERNED bigram codes, not v² —
    # n_docs * v² silently wraps int64 for large batches (1e5 docs ×
    # 1e7 words), while n_docs * n_unique_bigrams is bounded by the
    # batch's word count.
    top_bigram = np.zeros(n_docs, dtype=np.int64)
    if len(seg) > 1:
        adj = seg[1:] == seg[:-1]
        bcode = inv[:-1][adj].astype(np.int64) * v + inv[1:][adj]
        bseg = seg[1:][adj]
        _, bint = np.unique(bcode, return_inverse=True)
        nb = np.int64(bint.max() + 1) if len(bint) else np.int64(1)
        ub, bcnt = np.unique(bseg * nb + bint, return_counts=True)
        np.maximum.at(top_bigram, (ub // nb).astype(np.int64), bcnt)

    return pa.table(
        {
            id_col: batch[id_col],
            "n_words": pa.array(n_words, type=pa.int64()),
            "n_dup_words": pa.array(n_words - n_distinct, type=pa.int64()),
            "top_word_count": pa.array(top_word, type=pa.int64()),
            "top_bigram_count": pa.array(top_bigram, type=pa.int64()),
        }
    )


def bigram_count_partials(
    batch: pa.Table, *, text_col: str = "text"
) -> pa.Table:
    """Per-batch word-bigram counts — the combiner half of the
    LM-familiarity model build (``hashed_partials`` below). Split
    semantics mirror DuckDB ``string_split(text, ' ')``. Arrow-native
    end to end: :func:`_doc_bigrams` builds the in-doc adjacent pairs
    and ``pc.value_counts`` combines them — the earlier pandas
    str.cat/value_counts variant measured 2-3× slower per fragment.
    (bigram_topk no longer consumes this: its all-distinct groupby was
    replaced by the MG exact-top-k kernel, 17× at 302k docs,
    BASELINE.md r5.)"""
    _, bg = _doc_bigrams(batch, text_col)
    if len(bg) == 0:
        return pa.table(
            {"bigram": pa.array([], type=pa.string()), "n": pa.array([], type=pa.int64())}
        )
    vc = pc.value_counts(bg)
    return pa.table(
        {
            "bigram": vc.field("values"),
            "n": pc.cast(vc.field("counts"), pa.int64()),
        }
    )


# --- language ID (stateful actor-pool stage) -------------------------------

_LANG_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "von", "zu", "mit", "den", "ein"},
    "fr": {"le", "la", "les", "et", "de", "un", "une", "est", "que", "pour"},
    "es": {"el", "la", "los", "y", "de", "un", "una", "es", "que", "por"},
}


class LangId:
    """Actor-pool language-ID stage (``map_batches(LangId, concurrency=N)``).

    ``__init__`` builds per-language token tables once per actor (the
    Init*PluginContext analog); ``__call__`` scores whole batches
    vectorized. A doc with CJK codepoints → ``zh``; otherwise argmax of
    per-language stopword hits in sorted-language order (first max
    wins — the DuckDB oracle's CASE order), 0 hits → ``und``.

    Token semantics mirror the oracle's ``regexp_extract_all('[a-zA-Z]+')``
    exactly: non-alpha runs become separators (so ``the9`` does NOT
    contain a token ``the`` — a ``\\b``-regex count would differ there).
    """

    def __init__(self):
        self.langs = sorted(_LANG_STOPWORDS)
        self.tables = [
            np.array(sorted(_LANG_STOPWORDS[lang]), dtype=object)
            for lang in self.langs
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = col.fill_null("")
        cjk = pc.greater(
            pc.count_substring_regex(col, "[一-鿿]"), 0
        ).to_numpy(zero_copy_only=False)
        norm = pc.utf8_lower(
            pc.replace_substring_regex(col, "[^a-zA-Z]+", " ")
        )
        words = pc.split_pattern(norm, " ")
        offsets = words.offsets.to_numpy().astype(np.int64)
        flat = words.values.to_numpy(zero_copy_only=False)
        flat = flat[offsets[0] : offsets[-1]]
        offsets = offsets - offsets[0]
        n_docs = len(offsets) - 1
        seg = np.repeat(np.arange(n_docs, dtype=np.int64), np.diff(offsets))
        keep = flat != ""
        flat, seg = flat[keep], seg[keep]
        scores = np.zeros((n_docs, len(self.langs)), dtype=np.int64)
        if len(flat):
            uniq, inv = np.unique(flat, return_inverse=True)
            for li, table in enumerate(self.tables):
                member = np.isin(uniq, table)
                hits = member[inv]
                if hits.any():
                    scores[:, li] = np.bincount(
                        seg, weights=hits, minlength=n_docs
                    ).astype(np.int64)
        best = np.argmax(scores, axis=1)  # first max wins (sorted langs)
        langs_arr = np.array(self.langs, dtype=object)
        preds = np.where(
            cjk, "zh", np.where(scores.max(axis=1) > 0, langs_arr[best], "und")
        )
        return batch.append_column(
            "lang_pred", pa.array(preds, type=pa.string())
        )


# --- fingerprinting --------------------------------------------------------

FP_MOD = (1 << 31) - 1  # Mersenne prime; fits Horner steps in int64


def fingerprint_batch(
    batch: pa.Table, *, text_col: str = "text", out_col: str = "fingerprint"
) -> pa.Table:
    """Document fingerprint: base-2^32 polynomial (rolling) hash over the
    CODEPOINTS, mod 2^31-1 — computed as ``int.from_bytes(utf-32-be) % p``
    (one C bigint op per doc, no per-byte Python loop). Defined over
    codepoints (not utf-8 bytes) and with a mod small enough that the
    equivalent per-char Horner step ``(acc*2^32 + cp) % p`` stays inside
    int64 — which is exactly what the DuckDB ``list_reduce`` oracle
    evaluates, making the fingerprint engine-reproducible in SQL."""
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    out = [
        (int.from_bytes(s.encode("utf-32-be"), "big") % FP_MOD)
        if s is not None
        else None
        for s in col.to_pylist()
    ]
    return batch.append_column(out_col, pa.array(out, type=pa.int64()))


# --- PII / pattern redaction ------------------------------------------------

# Generic PII-shaped defaults: email, IPv4, SSN-style digit groups.
# RE2 syntax on purpose — pyarrow.compute and DuckDB both embed RE2, so
# the same pattern string is oracle-reproducible in SQL.
PII_PATTERN = (
    r"[\w.+-]+@[\w-]+\.\w+"
    r"|\b(?:\d{1,3}\.){3}\d{1,3}\b"
    r"|\b\d{3}[- ]\d{2}[- ]\d{4}\b"
)


def redact_batch(
    batch: pa.Table,
    *,
    pattern: str = PII_PATTERN,
    replacement: str = "<PII>",
    text_col: str = "text",
    count_col: str = "n_redactions",
) -> pa.Table:
    """Redact every match of ``pattern`` (PII scrubbing at corpus scale:
    logpipe's grep/tr field rewriting generalized to arbitrary RE2 —
    reference src-plugins/logpipe-output-es.c field transforms).
    Fully vectorized: one ``replace_substring_regex`` + one
    ``count_substring_regex`` Arrow kernel pass per batch, no Python
    per row, no shuffle — the ideal 100 TB shape (pure map)."""
    col = batch[text_col]
    red = pc.replace_substring_regex(col, pattern=pattern, replacement=replacement)
    n = pc.cast(pc.count_substring_regex(col, pattern), pa.int64())
    batch = batch.set_column(
        batch.schema.get_field_index(text_col), text_col, red
    )
    return batch.append_column(count_col, n)


def _doc_bigrams(batch: pa.Table, text_col: str):
    """(doc_row_index int64[], bigram pa.StringArray) for a batch — the
    split/adjacency construction of :func:`bigram_count_partials`, kept
    arrow-native end to end (the pandas str.cat + object-array variant
    measured 2-3× slower per fragment at 1M docs). Split semantics
    mirror DuckDB ``string_split(text, ' ')``."""
    words = pc.split_pattern(batch[text_col], " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    offsets = words.offsets.to_numpy().astype(np.int64)
    n_docs = len(offsets) - 1
    flat = words.values.slice(offsets[0], offsets[-1] - offsets[0])
    offsets = offsets - offsets[0]
    seg = np.repeat(np.arange(n_docs, dtype=np.int64), np.diff(offsets))
    if len(seg) < 2:
        return np.zeros(0, dtype=np.int64), pa.array([], type=pa.string())
    adj = pa.array(seg[1:] == seg[:-1])
    left = flat.slice(0, len(flat) - 1).filter(adj)
    right = flat.slice(1).filter(adj)
    bg = pc.binary_join_element_wise(left, right, " ")
    return seg[:-1][adj.to_numpy(zero_copy_only=False)], bg


def lm_familiarity_scores(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 5,
):
    """Count-pruned bigram-LM familiarity (the CCNet-style LM quality
    filter, Wenzek et al. 2019 arXiv:1911.00359, restated exact-integer
    so results are bit-reproducible across engines — a float
    perplexity's log-sum order would not be):

    pass 1 builds the LM = every corpus bigram with global count ≥
    ``min_count`` (count pruning bounds the model: threshold pruning is
    deterministic where top-K tie-breaking is not, and the model size
    is vocabulary-, not corpus-, proportional). The model broadcasts
    once via ``ray.put`` as (sorted keys, counts).

    pass 2 scores every doc in one vectorized pass: familiarity =
    Σ model_count(bigram) over the doc's adjacent word pairs
    (out-of-model bigrams contribute 0), plus the bigram count — a
    downstream filter compares familiarity/n_bigrams. Docs with < 2
    words score (0, 0).

    Scale shape: only (bigram, n) partials enter any shuffle (never the
    corpus), and the EXPENSIVE keyed aggregation runs over int64
    content hashes, not strings — the long unique-bigram tail makes a
    direct string groupby a giant string sort (measured 224 s for a
    929-row model at 1M docs; the hash plan runs the same corpus in
    ~16 s). Exactness is preserved by a string-level recount of the
    hash survivors: a 64-bit collision can only ADD a sub-threshold
    candidate (hash-count ≥ its true string count), never drop a real
    one, and the recount prunes it exactly. The pruned model is the
    only broadcast; scoring is one C++ hash probe (pc.index_in) +
    np.add.at per block."""
    import pandas as pd
    import ray as _ray

    def hashed_partials(b: pa.Table) -> pa.Table:
        p = bigram_count_partials(b, text_col=text_col)
        h = pd.util.hash_array(
            p["bigram"].to_numpy(zero_copy_only=False)
        ).view(np.int64)
        return p.append_column("h", pa.array(h, type=pa.int64()))

    # the hash pass and the recount pass each RECOMPUTE the partials
    # from the corpus instead of materializing them: the partial set is
    # corpus-bigram-proportional (355M string rows at 10M docs — a
    # multi-GB object-store pin that measured WORSE than the second
    # scan), and recompute keeps both passes streaming
    partials = ds.map_batches(hashed_partials, batch_format="pyarrow")

    # pass 1a: candidate hashes via sorted_runs_fold over int64 hashes —
    # distinct corpus bigrams are UNBOUNDED (hundreds of millions at
    # 10M docs), so neither Ray's sort-based groupby (203 s at a mere
    # 35M partial rows) nor a one-block fold (the CLAUDE.md bounded-
    # cardinality gotcha — one multi-GB block) survives scale. The
    # volume-bounded int sort co-locates each hash (single-column sort:
    # equal keys never split), letting the combine THRESHOLD in place
    # and emit only candidate hashes — result-sized output, no
    # all-distinct table ever exists anywhere.
    from logpipe_ray.stages.smallagg import (
        fold_partials_tree,
        run_starts,
        sorted_runs_fold,
    )

    def cand_combine(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"h": pa.array([], type=pa.int64())})
        h = b["h"].to_numpy(zero_copy_only=False)
        nv = b["n"].to_numpy(zero_copy_only=False)
        starts = run_starts(h)
        sums = np.add.reduceat(nv, starts)
        keep = sums >= min_count
        return pa.table({"h": pa.array(h[starts][keep], type=pa.int64())})

    cand_hashes = np.array(
        sorted_runs_fold(
            partials.select_columns(["h", "n"]),
            "h",
            cand_combine,
            rows_per_block=4_000_000,
        ).unique("h")
        or [],
        dtype=np.int64,
    )
    cand_hashes.sort()
    cand_ref = _ray.put(cand_hashes)

    # pass 1b: exact string recount of the few candidates (result-sized)
    def keep_candidates(b: pa.Table) -> pa.Table:
        ch = _ray.get(cand_ref)
        h = b["h"].to_numpy(zero_copy_only=False)
        if len(ch) == 0:
            return b.select(["bigram", "n"]).slice(0, 0)
        pos = np.searchsorted(ch, h)
        hit = (pos < len(ch)) & (ch[np.minimum(pos, len(ch) - 1)] == h)
        return b.filter(pa.array(hit)).select(["bigram", "n"])

    model_tbl = (
        fold_partials_tree(
            # candidate-proportional rows per block; the tree keeps each
            # combine ≤ fanin × model rows at any fragment count
            partials.map_batches(keep_candidates, batch_format="pyarrow"),
            "bigram",
            "n",
        )
        .map_batches(
            lambda b: b.filter(pc.greater_equal(b["n"], min_count)),
            batch_format="pyarrow",
        )
        .materialize()
    )
    parts = [
        t
        for t in _ray.get(model_tbl.to_arrow_refs())
        if t.num_rows and t.num_columns
    ]
    if parts:
        mt = pa.concat_tables([t.select(["bigram", "n"]) for t in parts])
        keys = mt["bigram"].combine_chunks()
        vals = mt["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    else:
        keys = pa.array([], type=pa.string())
        vals = np.zeros(0, dtype=np.int64)
    # arrow arrays broadcast fine through the object store; lookups use
    # pc.index_in (C++ hash probe — measured 7.7× the object-dtype
    # np.searchsorted whose probes are per-comparison PyUnicode calls)
    model_ref = _ray.put((keys, vals))

    def score(b: pa.Table) -> pa.Table:
        k, v = _ray.get(model_ref)
        doc_idx, bg = _doc_bigrams(b, text_col)
        n = b.num_rows
        fam = np.zeros(n, dtype=np.int64)
        nbg = np.zeros(n, dtype=np.int64)
        if len(bg):
            np.add.at(nbg, doc_idx, 1)
            if len(k):
                pos = pc.fill_null(
                    pc.index_in(bg, value_set=k), -1
                ).to_numpy(zero_copy_only=False)
                hit = pos >= 0
                np.add.at(fam, doc_idx[hit], v[pos[hit]])
        return pa.table(
            {
                id_col: b[id_col],
                "n_bigrams": pa.array(nbg, type=pa.int64()),
                "familiarity": pa.array(fam, type=pa.int64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")
