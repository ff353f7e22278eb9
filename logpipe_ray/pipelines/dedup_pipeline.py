"""MinHash + LSH near-duplicate pipeline (the sub-quadratic scale path).

Shape (public Ray Data patterns: map_batches / groupby.map_groups /
Dataset.join — https://docs.ray.io/en/latest/data/transforming-data.html):

    documents
      → map_batches(explode_lsh_bands)       # doc → (band_id, band_hash, doc_id)
      → sort(band_id, band_hash)             # ONE shuffle of tiny rows
      → map_batches(pairs_from_sorted_runs)  # vectorized in-bucket pairs
      → groupby(doc_a, doc_b)                # DISTRIBUTED pair dedupe
      → broadcast candidate-id set           # ints only — |cands| ≪ corpus
      → map_batches filter docs → shingles   # text never leaves the cluster
      → pairs ⋈ shingles ⋈ shingles          # distributed hash joins
      → map_batches exact-Jaccard verify     # per-pair, inside tasks

Only 24-byte band rows, id pairs and candidate shingle sets ever move;
the corpus text stays inside map stages. Nothing document-sized is
materialized on the driver — the only driver-side values are the
candidate-id list (broadcast via ray.put) and the final verified pairs
(the result). Reference analog: logpipe has no dedup; this is the
training-data extension (SURVEY.md §8.5).

Two configurations:
- ``bands < k`` (e.g. 16 bands × 8 rows): classic LSH — sub-quadratic,
  probabilistic recall (measured vs the exact path in tests).
- ``bands == k`` (128 single-hash bands): candidates = any shared
  minhash; miss probability for J ≥ t is (1-t)^k ≈ 4e-13 at t=0.2 —
  effectively full recall, so the output equals the exact all-pairs
  threshold set and is SQL-oracle-checkable (``dedup_lsh_verified``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from logpipe_ray.stages.dedup import (
    explode_lsh_bands,
    jaccard,
)
from logpipe_ray.stages.joins import join_partitions

PAIR_SCHEMA = pa.schema(
    [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("jaccard_bp", pa.int64())]
)

_PROC_CACHE: dict[str, object] = {}


def _resolve(ref):
    from logpipe_ray.util import bounded_resolve

    return bounded_resolve(_PROC_CACHE, ref)


class ShingleFilter:
    """Keep only candidate docs; emit (doc_id, shingles-as-binary).

    The candidate-id set is broadcast once (``ray.put``) and resolved at
    most once per worker process; shingle sets are serialized as the raw
    bytes of the sorted uint64 hash array so they survive the join
    shuffle as a plain binary column.
    """

    def __init__(self, ids_ref, *, ngram: int = 3):
        self.ids_ref = ids_ref
        self.ngram = ngram

    def __call__(self, batch: pa.Table) -> pa.Table:
        from logpipe_ray.stages.dedup import batch_shingles

        ids = _resolve(self.ids_ref)  # pa.Array of int64
        mask = pc.is_in(batch["doc_id"], value_set=ids)
        sub = batch.filter(mask)
        col = sub["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        off, sh = batch_shingles(col.fill_null(""), ngram=self.ngram)
        # batch_shingles returns sorted-ascending per-row runs
        sh_bytes = [sh[off[i] : off[i + 1]].tobytes() for i in range(len(off) - 1)]
        return pa.table(
            {
                "doc_id": pc.cast(sub["doc_id"], pa.int64()),
                "sh": pa.array(sh_bytes, type=pa.binary()),
            }
        )


def _score_pairs(batch: pa.Table, *, threshold_bp: int) -> pa.Table:
    """(doc_a, doc_b, sh_a, sh_b) rows → verified pairs ≥ threshold."""
    a_ids, b_ids, bps = [], [], []
    for a, b, sa, sb in zip(
        batch["doc_a"].to_pylist(),
        batch["doc_b"].to_pylist(),
        batch["sh_a"].to_pylist(),
        batch["sh_b"].to_pylist(),
    ):
        j = jaccard(
            np.frombuffer(sa, dtype=np.uint64), np.frombuffer(sb, dtype=np.uint64)
        )
        bp = int(j * 10000)
        if bp >= threshold_bp:
            a_ids.append(a)
            b_ids.append(b)
            bps.append(bp)
    return pa.table(
        {
            "doc_a": pa.array(a_ids, type=pa.int64()),
            "doc_b": pa.array(b_ids, type=pa.int64()),
            "jaccard_bp": pa.array(bps, type=pa.int64()),
        }
    )


def candidate_pairs(
    ds: ray.data.Dataset,
    *,
    k: int = 128,
    bands: int = 16,
    ngram: int = 3,
) -> ray.data.Dataset:
    """documents Dataset → distinct candidate (doc_a, doc_b) pairs.

    Band explode → ONE sort co-locating each (band_id, band_hash)
    bucket → vectorized run-boundary pair generation → distributed
    pair dedupe (a near-dup pair collides in many bands). doc_ids stay
    int64 end-to-end — pairs are oriented numerically (doc_a < doc_b).

    The single sort replaced r2's count-aggregate + inner-join hot-
    bucket prefilter: both shapes make the per-bucket Python work
    dup-pair-proportional, but the old one paid TWO all-to-alls over
    the band rows (profiled 11.7 s aggregate + 3.4 s join of the
    18.8 s candidate phase at 100k docs) where the sort pays one, and
    the run scan skips singleton buckets with a vectorized
    ``run_lengths >= 2`` mask instead of a join. Ray's own map_groups
    relies on the same sort invariant (a key's rows never span
    blocks), so in-block boundary detection sees every bucket whole.
    """

    def explode(b: pa.Table) -> pa.Table:
        b2 = pa.table(
            {"doc_id": pc.cast(b["doc_id"], pa.int64()), "text": b["text"]}
        )
        return explode_lsh_bands(b2, k=k, bands=bands, ngram=ngram)

    def _i64_keys(b: pa.Table) -> pa.Table:
        for c in ("band_id", "band_hash"):
            b = b.set_column(
                b.schema.get_field_index(c), c, pc.cast(b[c], pa.int64())
            )
        return b

    band_rows = ds.map_batches(explode, batch_format="pyarrow").map_batches(
        _i64_keys, batch_format="pyarrow"
    )
    bucket_pairs = band_rows.sort(["band_id", "band_hash"]).map_batches(
        pairs_from_sorted_runs, batch_format="pyarrow", batch_size=None
    )
    from logpipe_ray.stages.smallagg import sorted_runs_fold

    nb_schema = pa.schema(
        [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("n_bands", pa.int64())]
    )

    def count_bands(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return nb_schema.empty_table()
        a = _col_np(b, "doc_a")
        bb = _col_np(b, "doc_b")
        change = (a[1:] != a[:-1]) | (bb[1:] != bb[:-1])
        starts = np.concatenate(([0], np.flatnonzero(change) + 1))
        ends = np.concatenate((starts[1:], [len(a)]))
        return pa.table(
            {
                "doc_a": pa.array(a[starts], type=pa.int64()),
                "doc_b": pa.array(bb[starts], type=pa.int64()),
                "n_bands": pa.array(ends - starts, type=pa.int64()),
            }
        )

    # pair rows are dup-proportional — the fold sorts them once with
    # volume-bounded ranges (no empty schema-less blocks) and counts
    # band matches per (doc_a, doc_b) run vectorized
    return sorted_runs_fold(bucket_pairs, ["doc_a", "doc_b"], count_bands)


def pairs_from_sorted_runs(block: pa.Table) -> pa.Table:
    """(band_id, band_hash)-sorted band rows → candidate pairs (a < b).

    Vectorized: run boundaries from one diff over the key columns;
    the Python loop touches only runs of length ≥ 2 (dup-pair-
    proportional — in a real corpus almost every bucket is a
    singleton). Same-bucket duplicate doc_ids (the corpus contains
    exact-duplicate rows by design) collapse via np.unique, matching
    candidate_pairs_from_bucket's set() semantics."""
    n = block.num_rows
    if n == 0:
        return pa.schema(
            [("doc_a", pa.int64()), ("doc_b", pa.int64())]
        ).empty_table()
    bid = _col_np(block, "band_id")
    bh = _col_np(block, "band_hash")
    ids = _col_np(block, "doc_id")
    change = (bid[1:] != bid[:-1]) | (bh[1:] != bh[:-1])
    starts = np.concatenate(([0], np.flatnonzero(change) + 1, [n]))
    lengths = np.diff(starts)
    a_parts, b_parts = [], []
    for ri in np.flatnonzero(lengths >= 2):
        u = np.unique(ids[starts[ri] : starts[ri] + lengths[ri]])
        if len(u) < 2:
            continue
        iu = np.triu_indices(len(u), k=1)
        a_parts.append(u[iu[0]])
        b_parts.append(u[iu[1]])
    a = np.concatenate(a_parts) if a_parts else np.array([], dtype=np.int64)
    b = np.concatenate(b_parts) if b_parts else np.array([], dtype=np.int64)
    return pa.table(
        {
            "doc_a": pa.array(a, type=pa.int64()),
            "doc_b": pa.array(b, type=pa.int64()),
        }
    )


def _col_np(block: pa.Table, name: str) -> "np.ndarray":
    col = block[name]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.to_numpy(zero_copy_only=False)


def simhash_pairs_from_sorted_runs(
    block: pa.Table, *, max_hamming: int = 3
) -> pa.Table:
    """(band_id, band_val)-sorted simhash band rows → verified pairs.

    Run boundaries vectorized as in :func:`pairs_from_sorted_runs`;
    each run ≥ 2 is sliced out (zero-copy) and scored by the existing
    vectorized xor-popcount bucket scorer — so the Python loop is
    colliding-bucket-proportional, not corpus-proportional."""
    from logpipe_ray.stages.dedup import simhash_bucket_pairs

    empty = pa.schema(
        [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("hamming", pa.int64())]
    ).empty_table()
    n = block.num_rows
    if n == 0:
        return empty
    bid = _col_np(block, "band_id")
    bv = _col_np(block, "band_val")
    change = (bid[1:] != bid[:-1]) | (bv[1:] != bv[:-1])
    starts = np.concatenate(([0], np.flatnonzero(change) + 1, [n]))
    lengths = np.diff(starts)
    outs = [
        simhash_bucket_pairs(
            block.slice(starts[ri], lengths[ri]), max_hamming=max_hamming
        )
        for ri in np.flatnonzero(lengths >= 2)
    ]
    return pa.concat_tables(outs) if outs else empty


def verify_pairs(
    ds: ray.data.Dataset,
    pairs: ray.data.Dataset,
    *,
    threshold_bp: int = 2000,
    ngram: int = 3,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Exact-Jaccard verification of candidate pairs, fully distributed.

    Broadcast the candidate-id set (ints), filter the corpus to
    candidates and compute shingle sets inside map_batches, then attach
    both sides' shingles to each pair with two hash joins and score
    per-pair inside tasks. The driver only ever holds ids.

    Callers should pass a MATERIALIZED ``pairs`` — it is counted here
    (to clamp the joins' partition count by the small side, the r2
    ArrowInvalid fix; see joins.join_partitions) and consumed by the
    join, and Ray Data re-executes lineage per consumer otherwise.
    """
    num_partitions = join_partitions(
        requested=num_partitions, small_rows=pairs.count(), cap=32
    )
    cand_ids = pairs.map_batches(
        lambda b: pa.table(
            {
                "doc_id": pa.concat_arrays(
                    [
                        pc.cast(b["doc_a"], pa.int64()).combine_chunks(),
                        pc.cast(b["doc_b"], pa.int64()).combine_chunks(),
                    ]
                )
            }
        ),
        batch_format="pyarrow",
    ).unique("doc_id")
    ids_ref = ray.put(pa.array(sorted(cand_ids), type=pa.int64()))

    shingles = ds.map_batches(
        ShingleFilter(ids_ref, ngram=ngram), batch_format="pyarrow"
    ).materialize()  # small (candidates only); joined twice below

    def _rename_sh(to: str):
        def fn(b: pa.Table) -> pa.Table:
            return b.rename_columns(
                [to if c == "sh" else c for c in b.column_names]
            )

        return fn

    with_a = pairs.join(
        shingles, join_type="inner", num_partitions=num_partitions,
        on=("doc_a",), right_on=("doc_id",),
    ).map_batches(_rename_sh("sh_a"), batch_format="pyarrow")
    with_both = with_a.join(
        shingles, join_type="inner", num_partitions=num_partitions,
        on=("doc_b",), right_on=("doc_id",),
    ).map_batches(_rename_sh("sh_b"), batch_format="pyarrow")
    from functools import partial

    return with_both.map_batches(
        partial(_score_pairs, threshold_bp=threshold_bp), batch_format="pyarrow"
    )


def minhash_lsh_pairs(
    sf_dir: str,
    *,
    threshold_bp: int = 2000,
    k: int = 128,
    bands: int = 16,
    ngram: int = 3,
) -> pa.Table:
    """Verified near-dup pairs over the documents table, ordered by
    (jaccard desc, doc_a, doc_b). Only the final verified pairs (the
    result) come to the driver."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    pairs = candidate_pairs(ds, k=k, bands=bands, ngram=ngram).materialize()
    if pairs.count() == 0:
        return PAIR_SCHEMA.empty_table()
    verified = verify_pairs(ds, pairs, threshold_bp=threshold_bp, ngram=ngram)
    tbl = pa.Table.from_pylist(verified.take_all(), schema=PAIR_SCHEMA)
    order = pc.sort_indices(
        tbl,
        sort_keys=[
            ("jaccard_bp", "descending"),
            ("doc_a", "ascending"),
            ("doc_b", "ascending"),
        ],
    )
    return tbl.take(order)


def simhash_near_pairs(
    sf_dir: str,
    *,
    max_hamming: int = 3,
    bands: int = 4,
    band_bits: int = 16,
) -> pa.Table:
    """SimHash near-dup pairs with FULL recall for hamming ≤ bands-1:
    sketch → band explode → ONE sort co-locating buckets → vectorized
    xor-popcount verify per run → distributed pair dedupe. Only
    (band, id, hash) rows and id pairs shuffle; ordered (hamming asc,
    doc_a, doc_b). Same sorted-runs shape as :func:`candidate_pairs`
    (and for the same reason — ``groupby().map_groups`` pays a Python
    call per bucket, and almost every bucket is a singleton)."""
    from functools import partial

    from logpipe_ray.stages.dedup import (
        add_simhash,
        simhash_band_explode,
    )

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    def sketch(b: pa.Table) -> pa.Table:
        b = add_simhash(b).select(["doc_id", "simhash"])
        # drop wordless docs (sketch 0): contentless docs share no
        # evidence (same rule as the LSH path's shingle-less skip), and
        # at scale they would all collide into one bucket per band —
        # a quadratic blowup in simhash_bucket_pairs
        return b.filter(pc.not_equal(b["simhash"], 0))

    hashed = ds.map_batches(sketch, batch_format="pyarrow")
    band_rows = hashed.map_batches(
        partial(simhash_band_explode, bands=bands, band_bits=band_bits),
        batch_format="pyarrow",
    )
    from logpipe_ray.stages.smallagg import sorted_runs_fold

    pairs = sorted_runs_fold(
        band_rows,
        ["band_id", "band_val"],
        partial(simhash_pairs_from_sorted_runs, max_hamming=max_hamming),
        rows_per_block=262144,
    )
    from logpipe_ray.stages.smallagg import sorted_runs_fold

    ham_schema = pa.schema(
        [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("hamming", pa.int64())]
    )

    def min_hamming(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return ham_schema.empty_table()
        a = _col_np(b, "doc_a")
        bb = _col_np(b, "doc_b")
        h = _col_np(b, "hamming")
        change = (a[1:] != a[:-1]) | (bb[1:] != bb[:-1])
        starts = np.concatenate(([0], np.flatnonzero(change) + 1))
        return pa.table(
            {
                "doc_a": pa.array(a[starts], type=pa.int64()),
                "doc_b": pa.array(bb[starts], type=pa.int64()),
                "hamming": pa.array(
                    np.minimum.reduceat(h, starts), type=pa.int64()
                ),
            }
        )

    uniq = sorted_runs_fold(pairs, ["doc_a", "doc_b"], min_hamming)
    tbl = pa.Table.from_pylist(uniq.take_all(), schema=ham_schema)
    order = pc.sort_indices(
        tbl,
        sort_keys=[
            ("hamming", "ascending"),
            ("doc_a", "ascending"),
            ("doc_b", "ascending"),
        ],
    )
    return tbl.take(order)


# --- distributed connected components --------------------------------------


def min_label_propagation(
    edges: ray.data.Dataset,
    *,
    max_iters: int = 30,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Connected components by iterated min-label propagation.

    ``edges``: (doc_a, doc_b) rows. Returns (doc_id, cluster_rep) where
    cluster_rep is the minimum id reachable from doc_id — identical to
    union-find with min representative, but every step is a Dataset op
    (join + groupby(Min)), so nothing graph-sized touches the driver.

    Per round: every node offers its current label to each neighbor
    (edges ⋈ labels) AND takes the label of its own label node
    (labels ⋈ labels — pointer doubling, halving path lengths), then
    keeps the min of its own and all offered labels. Labels decrease
    monotonically, so an unchanged label-sum ⇒ fixpoint; with doubling
    the rounds needed are O(log max-cluster-diameter). Labels are
    materialized per round — they are O(|nodes in edges|), tiny next to
    the corpus.
    """

    def both_dirs(b: pa.Table) -> pa.Table:
        a = pc.cast(b["doc_a"], pa.int64()).combine_chunks()
        bb = pc.cast(b["doc_b"], pa.int64()).combine_chunks()
        return pa.table(
            {
                "src": pa.concat_arrays([a, bb]),
                "dst": pa.concat_arrays([bb, a]),
            }
        )

    both = edges.map_batches(both_dirs, batch_format="pyarrow").materialize()

    from logpipe_ray.stages.smallagg import sorted_runs_fold

    lbl_schema = pa.schema([("node", pa.int64()), ("label", pa.int64())])

    def _min_per_node(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return lbl_schema.empty_table()
        n = _col_np(b, "node")
        l = _col_np(b, "label")
        starts = np.concatenate(([0], np.flatnonzero(n[1:] != n[:-1]) + 1))
        return pa.table(
            {
                "node": pa.array(n[starts], type=pa.int64()),
                "label": pa.array(np.minimum.reduceat(l, starts), type=pa.int64()),
            }
        )

    def _fold_labels(ds: ray.data.Dataset) -> ray.data.Dataset:
        # node-proportional input; one volume-bounded range sort + a
        # vectorized min-per-run — no over-partitioned keyed shuffle
        return sorted_runs_fold(ds, "node", _min_per_node).materialize()

    labels = _fold_labels(
        both.map_batches(
            lambda b: pa.table({"node": b["src"], "label": b["src"]}),
            batch_format="pyarrow",
        )
    )
    # node count is constant across rounds — clamp the per-round join
    # partitions by it once (empty-partition guard, joins.join_partitions;
    # a fixed count of 8 crashes pyarrow's join on graphs of a few dozen
    # nodes, exactly the near-dup-cluster case at small sf)
    num_partitions = join_partitions(
        requested=num_partitions, small_rows=labels.count(), cap=16
    )
    prev_sum = labels.sum("label")
    for _ in range(max_iters):
        msgs = both.join(
            labels, join_type="inner", num_partitions=num_partitions,
            on=("src",), right_on=("node",),
        ).map_batches(
            lambda b: pa.table({"node": b["dst"], "label": b["label"]}),
            batch_format="pyarrow",
        )
        # pointer doubling: node n with label l also considers label[l]
        hops = labels.map_batches(
            lambda b: pa.table({"node0": b["node"], "lbl": b["label"]}),
            batch_format="pyarrow",
        ).join(
            labels, join_type="inner", num_partitions=num_partitions,
            on=("lbl",), right_on=("node",),
        ).map_batches(
            lambda b: pa.table({"node": b["node0"], "label": b["label"]}),
            batch_format="pyarrow",
        )
        labels = _fold_labels(labels.union(msgs).union(hops))
        cur = labels.sum("label")
        if cur == prev_sum:
            break
        prev_sum = cur
    return labels


def near_dup_clusters(
    sf_dir: str, *, threshold_bp: int = 2000, **lsh_kwargs
) -> pa.Table:
    """Cluster near-duplicates: LSH candidates → verified pairs →
    distributed connected components → (doc_id, cluster_rep). Docs with
    no near-dup are omitted (implicit singleton clusters)."""
    pairs_tbl = minhash_lsh_pairs(sf_dir, threshold_bp=threshold_bp, **lsh_kwargs)
    if pairs_tbl.num_rows == 0:
        return pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "cluster_rep": pa.array([], type=pa.int64()),
            }
        )
    edges = ray.data.from_arrow(pairs_tbl.select(["doc_a", "doc_b"]))
    labels = min_label_propagation(edges)
    rows = sorted((r["node"], r["label"]) for r in labels.take_all())
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "cluster_rep": pa.array([r[1] for r in rows], type=pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# ExactSubstr-style duplicated-span removal (Lee et al. 2021,
# "Deduplicating Training Data Makes Language Models Better",
# arXiv:2107.06499 — suffix-array exact-substring dedup restated as a
# k-gram-granular Ray Data pipeline)
# ---------------------------------------------------------------------------


def remove_duplicate_spans(
    ds: ray.data.Dataset,
    *,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Cross-document duplicated-span removal at word-``k``-gram
    granularity: every k-gram occurrence that is NOT the corpus-wide
    first occurrence (ordered by (doc_id, position)) is a duplicate
    span; a word is removed iff some duplicate span covers it. Output:
    (doc_id, text_clean, n_kept) — docs whose every word is covered
    drop out entirely.

    Scale shape:

    1. explode — per-batch vectorized (one arrow split, one
       ``pd.util.hash_array``, Horner k-gram combine): only
       (gram_hash, doc_id, pos) int64 triples leave the map side; the
       text never shuffles here. Corpus-token-proportional, the same
       volume class as the suffix-array input of the reference method.
    2. ONE ``sort(gram)`` co-locates each gram's occurrences (Ray's
       map_groups sort invariant: a key's rows never span blocks);
       an in-block lexsort orders each run by (doc_id, pos) and a
       vectorized not-first-in-run mask emits the duplicate positions.
       A pathologically hot gram (boilerplate at web scale) skews its
       one partition — production ExactSubstr runs cap per-gram
       occurrence counts first; at this corpus' cardinality it's moot.
    3. duplicate (doc_id, pos) rows — DUP-PROPORTIONAL, not
       corpus-proportional — group per doc into a packed span-start
       string (list payloads don't survive pyarrow hash joins).
    4. one partition-bounded left-outer hash join docs ⋈ span-lists
       (the single text exchange), then a per-batch cut: clean docs
       pass through vectorized; only docs WITH removals pay a Python
       splice.
    """
    import pandas as pd

    from logpipe_ray.stages.dedup import _ngram_combine, batch_words, hash_words
    from logpipe_ray.stages.joins import hash_join
    from logpipe_ray.stages.smallagg import map_groups_typed

    def explode(b: pa.Table) -> pa.Table:
        offsets, flat = batch_words(b[text_col])
        lens = np.diff(offsets)
        gh_flat = _ngram_combine(hash_words(flat), k)
        n_g = np.maximum(lens - k + 1, 0)
        total = int(n_g.sum())
        goff = np.zeros(len(lens) + 1, dtype=np.int64)
        np.cumsum(n_g, out=goff[1:])
        in_row = np.arange(total, dtype=np.int64) - np.repeat(goff[:-1], n_g)
        flat_pos = in_row + np.repeat(offsets[:-1], n_g)
        row_rep = np.repeat(np.arange(len(lens), dtype=np.int64), n_g)
        doc = pc.cast(b[id_col], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "gram": pa.array(
                    (gh_flat[flat_pos] >> np.uint64(1)).astype(np.int64)
                ),
                "doc_id": pa.array(doc[row_rep], type=pa.int64()),
                "pos": pa.array(in_row, type=pa.int64()),
            }
        )

    gram_rows = ds.map_batches(explode, batch_format="pyarrow")

    dup_schema = pa.schema([("doc_id", pa.int64()), ("pos", pa.int64())])

    def dup_positions(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return dup_schema.empty_table()
        g = block["gram"].combine_chunks().to_numpy(zero_copy_only=False)
        d = block["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        p = block["pos"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((p, d, g))
        g, d, p = g[order], d[order], p[order]
        dup = np.zeros(len(g), dtype=bool)
        dup[1:] = g[1:] == g[:-1]
        return pa.table(
            {
                "doc_id": pa.array(d[dup], type=pa.int64()),
                "pos": pa.array(p[dup], type=pa.int64()),
            }
        )

    dups = gram_rows.sort("gram").map_batches(
        dup_positions, batch_format="pyarrow", batch_size=None
    )

    span_schema = pa.schema([("doc_id", pa.int64()), ("starts_csv", pa.string())])

    def to_span_list(g: pa.Table) -> pa.Table:
        pos = sorted(g["pos"].to_pylist())
        return pa.table(
            {
                "doc_id": pa.array([g["doc_id"][0].as_py()], type=pa.int64()),
                "starts_csv": pa.array(
                    [",".join(map(str, pos))], type=pa.string()
                ),
            }
        )

    # materialize: dup positions are DUP-proportional, and their count
    # bounds (a) the span-groupby sort ranges (so the second sort isn't
    # over-partitioned into schema-less empties) and (b) the join
    # partitions below (the r2 ArrowInvalid class)
    from logpipe_ray.util import cluster_cpus

    dups = dups.materialize()
    n_dup = dups.count()
    span_lists = map_groups_typed(
        dups,
        "doc_id",
        to_span_list,
        span_schema,
        batch_format="pyarrow",
        pre_blocks=max(1, min(cluster_cpus(), n_dup // 8192 + 1)),
    ).materialize()
    n_span_docs = span_lists.count()

    docs = ds.map_batches(
        lambda b: pa.table(
            {"doc_id": pc.cast(b[id_col], pa.int64()), text_col: b[text_col]}
        ),
        batch_format="pyarrow",
    )
    joined = hash_join(
        docs,
        span_lists,
        on="doc_id",
        join_type="left_outer",
        small_rows=max(1, n_span_docs),
    )

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text_clean", pa.string()),
            ("n_kept", pa.int64()),
        ]
    )

    def cut(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return out_schema.empty_table()
        offsets, flat = batch_words(b[text_col])
        lens = np.diff(offsets)
        clean = pc.is_null(b["starts_csv"]).to_numpy(zero_copy_only=False)
        # clean docs: fully vectorized pass-through (text unchanged)
        cmask = clean & (lens > 0)
        clean_tbl = pa.table(
            {
                "doc_id": pc.cast(b[id_col], pa.int64()).filter(
                    pa.array(cmask)
                ),
                "text_clean": b[text_col].filter(pa.array(cmask)),
                "n_kept": pa.array(lens[cmask], type=pa.int64()),
            }
        )
        # dirty docs: dup-proportional Python splice
        doc = pc.cast(b[id_col], pa.int64()).to_numpy(zero_copy_only=False)
        starts = b["starts_csv"].to_pylist()
        out_id, out_text, out_kept = [], [], []
        for i in np.flatnonzero(~clean):
            words = flat[offsets[i] : offsets[i + 1]]
            keep = np.ones(len(words), dtype=bool)
            for s in starts[i].split(","):
                si = int(s)
                keep[si : si + k] = False
            kept = words[keep]
            if len(kept) == 0:
                continue
            out_id.append(int(doc[i]))
            out_text.append(" ".join(kept))
            out_kept.append(int(len(kept)))
        dirty_tbl = pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "text_clean": pa.array(out_text, type=pa.string()),
                "n_kept": pa.array(out_kept, type=pa.int64()),
            }
        )
        return pa.concat_tables(
            [clean_tbl.cast(out_schema), dirty_tbl.cast(out_schema)]
        )

    return joined.map_batches(cut, batch_format="pyarrow")
