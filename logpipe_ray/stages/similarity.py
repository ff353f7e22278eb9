"""Similarity search over an embedding column (``list<float>``).

- **Brute-force cosine top-k** (the baseline): the query matrix is
  broadcast (``ray.put`` once), each ``map_batches`` task does one
  numpy matmul of its batch against it — embarrassingly parallel, the
  right answer up to ~10^8 corpus×query products per batch.
- **LSH-bucketed ANN** (the scale path): random-hyperplane signatures
  bucket the corpus; a query only scans its bucket (+ optional
  multi-probe). Deterministic seed; recall measured against brute
  force in tests.

float64 matmul per batch; ranks (not raw cosines) are the exported
result so cross-engine float summation-order differences cannot flip a
comparison (distinct cosines differ ≫ 1e-12).
"""

from __future__ import annotations

import gc

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _matrix(col) -> np.ndarray:
    """list<float> column → (n, d) float64 matrix (zero-copy flatten)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class BruteForceKnn:
    """Per-batch corpus × broadcast-queries cosine top-k (task mode).

    ``cell_gate``: optional ``(centroids_ref, per_query_cells)`` — when
    set, each corpus row is assigned its nearest centroid and only
    counts for queries whose own probed-cell set contains it (the IVF
    per-query semantics; rows outside a query's cells are masked to
    -inf, never merely 'outside the union of all queries' cells')."""

    def __init__(
        self,
        queries_ref,
        *,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        k: int = 5,
        cell_gate=None,
    ):
        self.queries_ref = queries_ref
        self.vec_col = vec_col
        self.id_col = id_col
        self.k = k
        self.cell_gate = cell_gate
        self._cache = None
        self._cents = None

    def _queries(self):
        if self._cache is None:
            q = (
                ray.get(self.queries_ref)
                if isinstance(self.queries_ref, ray.ObjectRef)
                else self.queries_ref
            )
            self._cache = (q["ids"], _normalize(np.asarray(q["matrix"])))
        return self._cache

    def _gate(self, mat: np.ndarray, n_queries: int) -> np.ndarray | None:
        if self.cell_gate is None:
            return None
        cents_ref, q_cells = self.cell_gate
        if self._cents is None:
            self._cents = (
                ray.get(cents_ref)
                if isinstance(cents_ref, ray.ObjectRef)
                else cents_ref
            )
        assign = np.argmax(mat @ self._cents.T, axis=1)
        allowed = np.zeros((len(assign), n_queries), dtype=bool)
        for qi, cells in enumerate(q_cells):
            allowed[:, qi] = np.isin(assign, list(cells))
        return allowed

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Emit per-batch partial top-k: (query_id, neighbor_id, cosine).

        A downstream per-query reduction merges partials to global top-k.
        """
        q_ids, q_mat = self._queries()
        ids = np.asarray(batch[self.id_col].to_pylist())
        mat = _normalize(_matrix(batch[self.vec_col]))
        sims = mat @ q_mat.T  # (n_corpus, n_queries)
        allowed = self._gate(mat, len(q_ids))
        if allowed is not None:
            sims = np.where(allowed, sims, -np.inf)
        out_q, out_n, out_s = [], [], []
        k = min(self.k, len(ids))
        for qi, qid in enumerate(q_ids):
            col = sims[:, qi]
            top = np.argpartition(-col, k - 1)[:k] if k < len(ids) else np.arange(len(ids))
            for t in top:
                if ids[t] == qid or col[t] == -np.inf:
                    continue  # exclude self-match / gated-out rows
                out_q.append(qid)
                out_n.append(int(ids[t]))
                out_s.append(float(col[t]))
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "neighbor_id": pa.array(out_n, type=pa.int64()),
                "cosine": pa.array(out_s, type=pa.float64()),
            }
        )


def _knn_topk_order(b: pa.Table):
    q = b["query_id"].to_numpy(zero_copy_only=False)
    cs = b["cosine"].to_numpy(zero_copy_only=False)
    nb = b["neighbor_id"].to_numpy(zero_copy_only=False)
    order = np.lexsort((nb, -cs, q))  # query, cosine desc, neighbor asc
    return order, q[order]


def merge_knn_partials(partials: ray.data.Dataset, k: int) -> ray.data.Dataset:
    """Global per-query top-k merge of (query_id, neighbor_id, cosine)
    partial tables: hierarchical tree-fold (top-k selection is
    associative — re-selecting from a concatenation of selections
    equals one selection over the raw rows), no keyed shuffle of the
    corpus-block-proportional partial stream (bench:
    scripts/bench_knn_merge_ab.py — the sort-groupby it replaced plans
    reduce ranges from the BLOCK count while only n_queries keys exist).
    Returns ranked rows (query_id, rank, neighbor_id); ties broken by
    neighbor_id."""
    from logpipe_ray.stages.smallagg import fold_blocks_tree, run_ranks

    def combine(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        order, qs = _knn_topk_order(b)
        keep = run_ranks(qs) < k  # top-k per query survives each level
        return b.take(pa.array(order[keep], type=pa.int64()))

    def finish(b: pa.Table) -> pa.Table:
        order, qs = _knn_topk_order(b)
        return pa.table(
            {
                "query_id": pa.array(qs, type=pa.int64()),
                "rank": pa.array(run_ranks(qs) + 1, type=pa.int64()),
                "neighbor_id": b["neighbor_id"].take(
                    pa.array(order, type=pa.int64())
                ),
            }
        )

    # repartition(1) before finish: Ray may dynamically split a large
    # fold-root block, and finish ranks per block — a query whose rows
    # straddled a split would rank from 1 twice. The root is ≤
    # n_queries × k rows, so the coalesce is cheap.
    return (
        fold_blocks_tree(partials, combine)
        .repartition(1)
        .map_batches(finish, batch_format="pyarrow", batch_size=None)
    )


def knn_topk(
    ds: ray.data.Dataset,
    query_ids: list[int],
    query_matrix: np.ndarray,
    *,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    batch_size: int = 4096,
    cell_gate=None,
) -> ray.data.Dataset:
    """Global top-k neighbors per query: partial top-k per batch →
    :func:`merge_knn_partials` (hierarchical per-query top-k tree-fold)
    → ranked rows (query_id, rank, neighbor_id)."""
    ref = ray.put({"ids": list(query_ids), "matrix": np.asarray(query_matrix)})
    partials = ds.map_batches(
        BruteForceKnn(
            ref, vec_col=vec_col, id_col=id_col, k=k + 1, cell_gate=cell_gate
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    return merge_knn_partials(partials, k)


# --- LSH-bucketed ANN (scale path) ----------------------------------------


def hyperplane_signatures(mat: np.ndarray, n_planes: int = 8, seed: int = 11) -> np.ndarray:
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(mat.shape[1], n_planes))
    bits = (mat @ planes) > 0
    return (bits * (1 << np.arange(n_planes))).sum(axis=1).astype(np.int64)


def add_lsh_bucket(
    batch: pa.Table,
    *,
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 11,
    out_col: str = "bucket",
) -> pa.Table:
    sig = hyperplane_signatures(_normalize(_matrix(batch[vec_col])), n_planes, seed)
    return batch.append_column(out_col, pa.array(sig, type=pa.int64()))


def ann_knn_bucketed(
    ds: ray.data.Dataset,
    query_ids: list[int],
    query_matrix: np.ndarray,
    *,
    k: int = 5,
    n_planes: int = 6,
    multiprobe: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_rows: int | None = None,
    target_bucket_rows: int = 1024,
    scale_occupancy: bool = True,
) -> ray.data.Dataset:
    """ANN: only corpus rows whose LSH bucket matches some query bucket
    are scanned (bucket filter inside map_batches — a semi join against
    the broadcast query-bucket set), then exact cosine top-k as usual.

    ``multiprobe``: also probe buckets within that Hamming distance of
    each query signature (flip 1..m sign bits) — near-neighbors that
    fall just across a hyperplane land in an adjacent bucket, so probing
    them buys recall for (1 + n_planes choose ≤m)/2^n_planes of the scan
    cost, no re-hash of the corpus. Recall < 1 by construction; measured
    vs brute force in tests.

    Passing ``n_rows`` opts into occupancy scaling: planes are raised to
    ceil(log2(n_rows / target_bucket_rows)) so the SCORED set per query
    stays ~target_bucket_rows × probed buckets as the corpus grows (at
    fixed planes it grows linearly with n). The corpus filter pass is
    O(n) either way — this bounds the matmul side, not the scan — and
    more planes lower per-bucket recall, so raise ``multiprobe``
    alongside (the standard LSH tradeoff; same policy and rationale as
    :func:`cosine_dedup_lsh`).

    Occupancy scaling is the DEFAULT (``scale_occupancy=True``): when
    ``n_rows`` isn't given it is taken from ``ds.count()``. That count
    is metadata-cheap ONLY on a bare ``read_parquet`` dataset; on a
    derived/mapped Dataset it executes the whole upstream pipeline an
    extra time before the query runs — callers with mapped inputs must
    pass ``n_rows`` explicitly (an estimate is fine: planes move by one
    per factor-of-2 error). Fixed planes at a growing corpus is the
    same latent linear-scored-set defect the dedup LSH path already
    paid for — pass ``scale_occupancy=False`` for the explicit-planes
    behavior (planes never drop below the caller's ``n_planes`` either
    way, so small corpora are unaffected)."""
    import math
    from itertools import combinations

    if scale_occupancy and n_rows is None:
        n_rows = ds.count()
    if n_rows is not None:
        n_planes = min(
            62,
            max(
                n_planes,
                math.ceil(
                    math.log2(max(2.0, n_rows / max(1, target_bucket_rows)))
                ),
            ),
        )

    q_mat = _normalize(np.asarray(query_matrix, dtype=np.float64))
    q_buckets = set(hyperplane_signatures(q_mat, n_planes).tolist())
    if multiprobe > 0:
        flips = [
            sum(1 << b for b in bits)
            for m in range(1, multiprobe + 1)
            for bits in combinations(range(n_planes), m)
        ]
        q_buckets |= {s ^ f for s in list(q_buckets) for f in flips}

    def bucket_filter(b: pa.Table) -> pa.Table:
        b = add_lsh_bucket(b, vec_col=vec_col, n_planes=n_planes)
        mask = pa.array(
            np.isin(b["bucket"].to_numpy(zero_copy_only=False), list(q_buckets))
        )
        return b.filter(mask).drop_columns(["bucket"])

    filtered = ds.map_batches(bucket_filter, batch_format="pyarrow")
    return knn_topk(
        filtered, query_ids, query_matrix, k=k, vec_col=vec_col, id_col=id_col
    )


# --- IVF (inverted-file) ANN — the centroid-partitioned scale path ---------


def kmeans_centroids(
    sample: np.ndarray, k: int, *, iters: int = 10, seed: int = 7
) -> np.ndarray:
    """Deterministic spherical k-means over a (small, driver-held)
    SAMPLE of the corpus — the classic IVF coarse quantizer build.
    k-means++-style seeded init (RandomState(seed)), Lloyd iterations
    with cosine assignment; empty clusters keep their previous
    centroid. The sample is the only data the driver touches — corpus
    assignment happens distributed in :func:`ivf_knn`."""
    m = _normalize(np.asarray(sample, dtype=np.float64))
    rng = np.random.RandomState(seed)
    n = m.shape[0]
    k = min(k, n)
    # k-means++ init on the sample
    first = int(rng.randint(n))
    cents = [m[first]]
    d2 = 1.0 - m @ cents[0]
    for _ in range(1, k):
        p = np.maximum(d2, 1e-12)
        nxt = int(rng.choice(n, p=p / p.sum()))
        cents.append(m[nxt])
        d2 = np.minimum(d2, 1.0 - m @ cents[-1])
    c = np.stack(cents)
    for _ in range(iters):
        assign = np.argmax(m @ c.T, axis=1)
        for j in range(k):
            sel = m[assign == j]
            if len(sel):
                c[j] = sel.sum(axis=0)
        c = _normalize(c)
    return c


def ivf_knn(
    ds: ray.data.Dataset,
    query_ids: list[int],
    query_matrix: np.ndarray,
    *,
    k: int = 5,
    n_clusters: int = 8,
    nprobe: int = 4,
    sample_limit: int = 4096,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> ray.data.Dataset:
    """IVF ANN: corpus rows are assigned to their nearest centroid
    inside ``map_batches`` (one matmul against the broadcast centroid
    matrix); a query scans only its ``nprobe`` nearest centroid cells,
    then exact cosine top-k over the scanned rows.

    ``nprobe == n_clusters`` probes every cell — the gate passes all
    rows and the result equals brute-force :func:`knn_topk` exactly
    (that equivalence and the recall at partial probe are pytest
    properties). Centroids come from a bounded driver-side sample
    (``ds.limit(sample_limit)``); assignment and scan are distributed.

    Semantics are PER QUERY: a corpus row counts for a query only if
    the row's cell is in that query's own ``nprobe`` nearest cells (the
    scan prunes to the union of all queries' cells purely as an I/O
    optimization — the scoring gate enforces per-query membership).
    """
    sample_tbl = pa.concat_tables(
        ray.get(ds.limit(sample_limit).to_arrow_refs())
    )
    cents = kmeans_centroids(_matrix(sample_tbl[vec_col]), n_clusters)

    q_mat = _normalize(np.asarray(query_matrix, dtype=np.float64))
    nprobe = min(nprobe, cents.shape[0])
    q_sims = q_mat @ cents.T  # (n_queries, k)
    q_cells = [
        frozenset(np.argsort(-row)[:nprobe].tolist()) for row in q_sims
    ]
    probed_arr = np.fromiter(
        sorted(set().union(*q_cells)), dtype=np.int64
    )
    cents_ref = ray.put(cents)

    def cell_filter(b: pa.Table) -> pa.Table:
        c = ray.get(cents_ref)
        assign = np.argmax(_normalize(_matrix(b[vec_col])) @ c.T, axis=1)
        return b.filter(pa.array(np.isin(assign, probed_arr)))

    scanned = ds.map_batches(cell_filter, batch_format="pyarrow")
    return knn_topk(
        scanned,
        query_ids,
        query_matrix,
        k=k,
        vec_col=vec_col,
        id_col=id_col,
        cell_gate=(cents_ref, q_cells),
    )


def _pair_topk_from_sims(
    sims: np.ndarray, ids_a: np.ndarray, ids_b: np.ndarray, k: int, *, triu: bool
) -> list[tuple[float, int, int]]:
    """Top-k (cosine, min_id, max_id) entries of one chunk-pair sim block."""
    if triu:
        iu = np.triu_indices(sims.shape[0], k=1)
        vals, ai, bi = sims[iu], iu[0], iu[1]
    else:
        vals = sims.ravel()
        ai, bi = np.divmod(np.arange(vals.size), sims.shape[1])
    if vals.size == 0:
        return []
    take = min(k, vals.size)
    part = np.argpartition(-vals, take - 1)[:take]
    # tie-safe: duplicate vectors give exactly-equal cosines; include ALL
    # entries tied with the k-th value, then order by (cos desc, a, b)
    # so the id tie-break matches the global (and oracle) ordering
    kth = vals[part].min()
    cand = np.nonzero(vals >= kth)[0]
    rows = []
    for o in cand:
        a, b = int(ids_a[ai[o]]), int(ids_b[bi[o]])
        lo, hi = (a, b) if a <= b else (b, a)
        rows.append((float(vals[o]), lo, hi))
    rows.sort(key=lambda r: (-r[0], r[1], r[2]))
    return rows[:k]


class ChunkPairScorer:
    """Actor-pool stage scoring one chunk-pair work item per row:
    loads both chunk files (per-actor cache — each chunk participates in
    C tasks, read once per actor), matmuls, emits the pair-local top-k.
    The full n×n gram matrix never exists anywhere; each task holds one
    chunk_rows × chunk_rows block."""

    def __init__(
        self,
        chunk_dir: str,
        *,
        k: int,
        id_col: str,
        vec_col: str,
        dtype=np.float64,
    ):
        self.chunk_dir = chunk_dir
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col
        self.dtype = dtype
        self._cache: dict[str, tuple[np.ndarray, np.ndarray]] = {}

    def _load(self, name: str) -> tuple[np.ndarray, np.ndarray]:
        if name not in self._cache:
            import os

            import pyarrow.parquet as pq

            t = pq.read_table(os.path.join(self.chunk_dir, name))
            self._cache[name] = (
                t[self.id_col].to_numpy(zero_copy_only=False),
                _normalize(_matrix(t[self.vec_col])).astype(
                    self.dtype, copy=False
                ),
            )
        return self._cache[name]

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: list[tuple[float, int, int]] = []
        for fi, fj in zip(batch["fi"].to_pylist(), batch["fj"].to_pylist()):
            ids_a, mat_a = self._load(fi)
            if fi == fj:
                sims = mat_a @ mat_a.T
                out.extend(
                    _pair_topk_from_sims(sims, ids_a, ids_a, self.k, triu=True)
                )
            else:
                ids_b, mat_b = self._load(fj)
                sims = mat_a @ mat_b.T
                out.extend(
                    _pair_topk_from_sims(sims, ids_a, ids_b, self.k, triu=False)
                )
        return pa.table(
            {
                "cosine": pa.array([r[0] for r in out], type=pa.float64()),
                "vec_a": pa.array([r[1] for r in out], type=pa.int64()),
                "vec_b": pa.array([r[2] for r in out], type=pa.int64()),
            }
        )


def _chunk_pair_worklist(
    ds: ray.data.Dataset,
    tmp_dir: str | None,
    *,
    id_col: str,
    vec_col: str,
    chunk_rows: int,
) -> tuple[list[dict], str]:
    """Chunk the corpus onto shared storage and build the C(C+1)/2
    chunk-pair work list (shared by the top-k and threshold scorers).
    Chunk names are idempotent (min id per chunk) — the resumable-
    fragment naming pattern.

    The corpus is repartitioned to exactly ``ceil(n / chunk_rows)``
    blocks first (one chunk per block, ``batch_size=None``): a plain
    ``batch_size=chunk_rows`` leaves a partial tail batch per READ
    TASK, and ragged chunks inflate the quadratic pair list — measured
    43 chunks → 946 pairs instead of 25 → 325 at 100k vectors (2.9×
    the scoring work)."""
    import math
    import os
    import tempfile

    import pyarrow.parquet as pq

    if tmp_dir is None:
        tmp_dir = tempfile.mkdtemp(prefix="lpr_embchunks_")
    os.makedirs(tmp_dir, exist_ok=True)

    def write_chunk(b: pa.Table) -> pa.Table:
        ids = b[id_col]
        tag = int(pa.compute.min(ids).as_py())
        path = os.path.join(tmp_dir, f"chunk-{tag:014d}.parquet")
        pq.write_table(b.select([id_col, vec_col]), path, compression="zstd")
        return pa.table({"chunk": pa.array([tag], type=pa.int64())})

    n_chunks = max(1, math.ceil(ds.count() / chunk_rows))
    ds.repartition(n_chunks).map_batches(
        write_chunk, batch_format="pyarrow", batch_size=None
    ).materialize()
    chunks = sorted(n for n in os.listdir(tmp_dir) if n.startswith("chunk-"))
    items = [
        {"fi": chunks[i], "fj": chunks[j]}
        for i in range(len(chunks))
        for j in range(i, len(chunks))
    ]
    return items, tmp_dir


def topk_cosine_pairs_distributed(
    ds: ray.data.Dataset,
    *,
    k: int = 20,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    chunk_rows: int = 4096,
    tmp_dir: str | None = None,
) -> pa.Table:
    """Embedding near-dup at scale: global top-k most-similar distinct
    pairs via DISTRIBUTED chunk-pair block matmuls.

    Exact (not LSH): chunk the corpus into ``chunk_rows``-row Parquet
    chunks on shared storage (idempotent names — the resumable-fragment
    pattern), build the C(C+1)/2 chunk-pair work list as a Dataset, and
    score each pair block inside an actor-pool ``map_batches`` (per-actor
    chunk cache). Only per-task top-k partials (k rows each) leave the
    tasks, and the global merge is a hierarchical top-k tree-fold
    (``fold_blocks_tree`` — top-k selection is associative): no task or
    the driver ever holds the k × C(C+1)/2 partial stream, which is
    QUADRATIC in corpus size. Because chunks partition the ids, every
    unordered pair is scored exactly once.
    """
    from logpipe_ray.stages.smallagg import fold_blocks_tree
    from logpipe_ray.util import pool_size

    items, tmp_dir = _chunk_pair_worklist(
        ds, tmp_dir, id_col=id_col, vec_col=vec_col, chunk_rows=chunk_rows
    )
    partials = ray.data.from_items(items).map_batches(
        ChunkPairScorer(tmp_dir, k=k, id_col=id_col, vec_col=vec_col),
        batch_format="pyarrow",
        batch_size=1,
        concurrency=pool_size(per_actor_cpus=1.0, cap=max(1, len(items))),
    )
    # materialize + drop the pool-stage Dataset BEFORE the fold: actor
    # pools free their CPUs only when the Dataset is GC'd (CLAUDE.md),
    # and a held pool would serialize every fold level onto the reserve
    # CPUs.
    partials = partials.materialize()
    gc.collect()

    def combine(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        cs = b["cosine"].to_numpy(zero_copy_only=False)
        va = b["vec_a"].to_numpy(zero_copy_only=False)
        vb = b["vec_b"].to_numpy(zero_copy_only=False)
        order = np.lexsort((vb, va, -cs))[:k]  # cosine desc, then (a, b)
        return b.take(pa.array(order, type=pa.int64()))

    top = fold_blocks_tree(partials, combine).take_all()
    # the driver-side re-sort is the defense against Ray dynamically
    # splitting the fold root into >1 block (take_all order would then
    # interleave) — k rows, trivial
    rows = sorted(
        ((r["cosine"], r["vec_a"], r["vec_b"]) for r in top),
        key=lambda r: (-r[0], r[1], r[2]),
    )[:k]
    return pa.table(
        {
            "rank": pa.array(range(1, len(rows) + 1), type=pa.int64()),
            "vec_a": pa.array([r[1] for r in rows], type=pa.int64()),
            "vec_b": pa.array([r[2] for r in rows], type=pa.int64()),
        }
    )


class ThresholdPairScorer(ChunkPairScorer):
    """Chunk-pair scorer emitting EVERY distinct pair with cosine ≥
    threshold — the edge set of the near-dup graph. Output size is
    dup-pair-proportional (a corpus with no near-dups emits nothing),
    which is what makes collecting it safe at scale."""

    def __init__(
        self,
        chunk_dir: str,
        *,
        threshold: float,
        id_col: str,
        vec_col: str,
        dtype=np.float32,
    ):
        """``dtype`` defaults to float32 — a single-precision dot of
        unit vectors is within ~1e-5 of the float64 value (d ≤ 4096),
        and thresholding (unlike top-k RANKING, where exact tie order
        matters — ChunkPairScorer stays float64) only needs the margin
        around ``threshold`` to exceed that; pick thresholds
        accordingly or pass ``dtype=np.float64``. sgemm is ~2× dgemm —
        this stage is pure matmul at scale."""
        super().__init__(chunk_dir, k=0, id_col=id_col, vec_col=vec_col, dtype=dtype)
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        lo_parts, hi_parts = [], []
        for fi, fj in zip(batch["fi"].to_pylist(), batch["fj"].to_pylist()):
            ids_a, mat_a = self._load(fi)
            if fi == fj:
                sims = mat_a @ mat_a.T
                ai, bi = np.nonzero(np.triu(sims >= self.threshold, k=1))
                a, b = ids_a[ai], ids_a[bi]
            else:
                ids_b, mat_b = self._load(fj)
                sims = mat_a @ mat_b.T
                ai, bi = np.nonzero(sims >= self.threshold)
                a, b = ids_a[ai], ids_b[bi]
            lo_parts.append(np.minimum(a, b))
            hi_parts.append(np.maximum(a, b))
        lo = np.concatenate(lo_parts) if lo_parts else np.array([], dtype=np.int64)
        hi = np.concatenate(hi_parts) if hi_parts else np.array([], dtype=np.int64)
        return pa.table(
            {
                "vec_lo": pa.array(lo.astype(np.int64)),
                "vec_hi": pa.array(hi.astype(np.int64)),
            }
        )


def cosine_dedup_distributed(
    ds: ray.data.Dataset,
    *,
    threshold: float = 0.45,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    chunk_rows: int = 4096,
    tmp_dir: str | None = None,
) -> ray.data.Dataset:
    """Embedding-cosine near-dup removal: drop every vector whose cosine
    to some LOWER-id vector is ≥ ``threshold`` (greedy min-id
    representative — the embedding-space analog of exact_dedup's
    first-wins rule, and exactly SQL's ``NOT EXISTS (lower id with
    cos ≥ t)``, so a dropped vector still disqualifies higher ids).

    Shape at 100 TB: the same C(C+1)/2 chunk-pair block-matmul work
    list as :func:`topk_cosine_pairs_distributed` (per-actor chunk
    cache; no full gram matrix anywhere); only threshold-crossing edges
    leave tasks (dup-pair-proportional). The removal id set (distinct
    ``vec_hi``) is dup-count-sized, so it is collected and broadcast
    (``ray.put`` once) for a vectorized survivor filter — no corpus
    shuffle. If the dup fraction were ever unbounded, swap the
    broadcast for the joins.py anti-join; for real corpora near-dup
    sets are a small fraction of rows.
    """
    from logpipe_ray.util import pool_size

    items, tmp_dir = _chunk_pair_worklist(
        ds, tmp_dir, id_col=id_col, vec_col=vec_col, chunk_rows=chunk_rows
    )
    edges = ray.data.from_items(items).map_batches(
        ThresholdPairScorer(
            tmp_dir, threshold=threshold, id_col=id_col, vec_col=vec_col
        ),
        batch_format="pyarrow",
        batch_size=1,
        concurrency=pool_size(per_actor_cpus=1.0, cap=max(1, len(items))),
    )
    removed: set[int] = set()
    for b in edges.iter_batches(batch_format="pyarrow", batch_size=65536):
        removed.update(b["vec_hi"].to_pylist())
    removed_ref = ray.put(np.fromiter(removed, dtype=np.int64, count=len(removed)))

    def keep(b: pa.Table) -> pa.Table:
        gone = ray.get(removed_ref)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(~np.isin(ids, gone)))

    return ds.map_batches(keep, batch_format="pyarrow")


def cosine_dedup_lsh(
    ds: ray.data.Dataset,
    *,
    threshold: float = 0.9,
    n_planes: int = 12,
    bands: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 11,
    target_bucket_rows: int = 16,
    n_rows: int | None = None,
    min_band_matches: int = 1,
) -> ray.data.Dataset:
    """Sub-quadratic embedding-cosine near-dup removal — the SCALE path
    next to :func:`cosine_dedup_distributed` (whose chunk-pair work
    list is quadratic in corpus size; right up to ~1M vectors, wrong at
    100 TB).

    Same pipeline shape as the MinHash text dedup
    (pipelines/dedup_pipeline.py): ``bands`` independent hyperplane
    signatures bucket each vector → ONE sort co-locating (band, bucket)
    → vectorized run-scan candidate pairs → distributed pair dedupe →
    exact-cosine verify of the dup-proportional candidate set (vectors
    for candidate ids broadcast once — result-sized, the same bound as
    the removal set) → broadcast removal filter. Only (band, bucket,
    id) int64 rows ever shuffle; vectors never leave their read tasks
    except for the candidate subset.

    Recall is probabilistic (per-band collision P = (1-θ/π)^n_planes;
    miss P = (1-p)^bands — measured vs the exact path in tests);
    precision is exact (every emitted removal is cosine-verified).

    ``n_planes`` is a FLOOR, not the operative value: the plane count
    is raised to ceil(log2(n_rows / target_bucket_rows)) so mean bucket
    occupancy stays ~constant as the corpus grows — per-bucket pair
    generation is quadratic in occupancy, so a FIXED plane count makes
    total candidate pairs quadratic in n (measured: the 12-plane
    default ground for 20+ min at 400k vectors where 100k took
    seconds); with occupancy pinned, expected pairs grow ~linearly.
    The cost is lower per-band recall for borderline-θ pairs (the
    standard LSH tradeoff — raise ``bands`` to compensate); true
    near-dups (cos → 1) are insensitive. ``n_rows`` skips the count
    when the caller already knows it.

    ``min_band_matches``: candidate pairs must collide in at least this
    many bands before the exact verify. Random bucket collisions are
    overwhelmingly single-band (P(≥2) ≈ C(bands,2)·p² for tiny p), so
    2 cuts the verify input by orders of magnitude (measured at 400k
    vectors: the ≥1 pair set was ~19M rows and its verify joins took
    500 s; see BASELINE.md), while a true near-dup (per-band p → 1)
    still collides in ~every band. Default 1 preserves the widest-net
    semantics for borderline-θ workloads.
    """
    import math

    from logpipe_ray.pipelines.dedup_pipeline import pairs_from_sorted_runs
    from logpipe_ray.stages.smallagg import sorted_runs_fold

    if n_rows is None:
        n_rows = ds.count()
    occ_planes = math.ceil(math.log2(max(2.0, n_rows / max(1, target_bucket_rows))))
    n_planes = min(62, max(n_planes, occ_planes))

    def explode(b: pa.Table) -> pa.Table:
        mat = _normalize(_matrix(b[vec_col]))
        ids = pa.compute.cast(b[id_col], pa.int64())
        parts = []
        for band in range(bands):
            sig = hyperplane_signatures(mat, n_planes, seed=seed + 7919 * band)
            parts.append(
                pa.table(
                    {
                        "band_id": pa.array(
                            np.full(len(sig), band, dtype=np.int64)
                        ),
                        "band_hash": pa.array(sig, type=pa.int64()),
                        "doc_id": ids,
                    }
                )
            )
        return pa.concat_tables(parts)

    band_rows = ds.map_batches(explode, batch_format="pyarrow")
    cand = band_rows.sort(["band_id", "band_hash"]).map_batches(
        pairs_from_sorted_runs, batch_format="pyarrow", batch_size=None
    )
    # distributed pair dedupe: the raw pair stream is ~bands·occ/2 rows
    # PER VECTOR — NOT bounded-cardinality, so fold_partials (which
    # coalesces to one block) OOMs a worker at ~1M vectors; use the
    # volume-bounded range-sort fold with a vectorized per-run count
    # (same shape as dedup_pipeline.candidate_pairs)
    nb_schema = pa.schema(
        [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("n_bands", pa.int64())]
    )

    def count_bands(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return nb_schema.empty_table()
        a = b["doc_a"].combine_chunks().to_numpy(zero_copy_only=False)
        bb = b["doc_b"].combine_chunks().to_numpy(zero_copy_only=False)
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

    pairs = sorted_runs_fold(
        cand, ["doc_a", "doc_b"], count_bands, rows_per_block=1 << 21
    )
    if min_band_matches > 1:
        pairs = pairs.map_batches(
            lambda b: b.filter(
                pa.compute.greater_equal(b["n_bands"], min_band_matches)
            ),
            batch_format="pyarrow",
        )
    # materialized: consumed by count() AND both verify joins — without
    # this the whole candidate-generation pipeline re-executes per
    # consumer; the pair set is the same result-proportional bound the
    # text pipeline materializes (band rows there)
    pairs = pairs.materialize()
    # DISTRIBUTED exact-cosine verify: the candidate list is
    # (dup + random-collision)-proportional — linear in n but with a
    # ~bands·occupancy/2 constant, far too big to materialize on the
    # driver (measured: a driver-side dict verify took 15 min / 22 GB
    # at 400k vectors where the pipeline itself took 40 s). Join the
    # pair rows with the normalized vectors twice (once per endpoint,
    # fp32 fixed-size-list payload), score per batch, and reduce to
    # the removal-id set — the ONLY driver materialization left is the
    # result-sized removal set.
    n_pairs = pairs.count()
    if n_pairs == 0:
        removed_arr = np.zeros(0, dtype=np.int64)
    else:
        from logpipe_ray.stages.joins import hash_join

        # endpoint-id pre-filter: without it the joins hash-shuffle the
        # ENTIRE corpus's vector payload (twice); the distinct endpoint
        # set is candidate-proportional and only int64 ids touch the
        # driver (the old driver-side verify collected the VECTORS)
        def endpoints(b: pa.Table) -> pa.Table:
            ids = np.unique(
                np.concatenate(
                    (
                        b["doc_a"].combine_chunks().to_numpy(zero_copy_only=False),
                        b["doc_b"].combine_chunks().to_numpy(zero_copy_only=False),
                    )
                )
            )
            return pa.table({"vid": pa.array(ids, type=pa.int64())})

        end_ids = np.asarray(
            sorted(
                pairs.map_batches(endpoints, batch_format="pyarrow").unique("vid")
                or []
            ),
            dtype=np.int64,
        )
        end_ref = ray.put(end_ids)

        def vec_rows(b: pa.Table) -> pa.Table:
            # payload as binary, not fixed_size_list: acero joins reject
            # nested non-key fields ("not supported in join non-key
            # field"); uniform-width binary decodes back zero-copy
            want = ray.get(end_ref)
            ids_np = pa.compute.cast(b[id_col], pa.int64()).to_numpy(
                zero_copy_only=False
            )
            b = b.filter(pa.array(np.isin(ids_np, want)))
            if b.num_rows == 0:
                return pa.table(
                    {
                        "vid": pa.array([], type=pa.int64()),
                        "vec": pa.array([], type=pa.binary()),
                    }
                )
            mat = _normalize(_matrix(b[vec_col])).astype(np.float32)
            width = 4 * mat.shape[1]
            n = mat.shape[0]
            flat = pa.py_buffer(np.ascontiguousarray(mat).tobytes())
            offs = pa.array(
                np.arange(0, (n + 1) * width, width, dtype=np.int32)
            )
            vec = pa.BinaryArray.from_buffers(
                pa.binary(), n, [None, offs.buffers()[1], flat]
            )
            return pa.table(
                {"vid": pa.compute.cast(b[id_col], pa.int64()), "vec": vec}
            )

        # materialized: two join consumers — candidate-proportional size
        vecs_ds = ds.map_batches(vec_rows, batch_format="pyarrow").materialize()
        j = hash_join(
            pairs.select_columns(["doc_a", "doc_b"]),
            vecs_ds,
            on="doc_a",
            right_on="vid",
            small_rows=n_pairs,
        ).map_batches(
            lambda b: b.rename_columns(
                ["vec_a" if c == "vec" else c for c in b.column_names]
            ),
            batch_format="pyarrow",
        )
        j = hash_join(j, vecs_ds, on="doc_b", right_on="vid", small_rows=n_pairs)

        def decode(col) -> np.ndarray:
            arr = col.combine_chunks()
            off_all = np.frombuffer(arr.buffers()[1], dtype=np.int32)
            off = off_all[arr.offset : arr.offset + len(arr) + 1].astype(np.int64)
            buf = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
            widths = np.diff(off)
            w = int(widths[0]) if len(widths) else 0
            if len(widths) and np.all(widths == w):
                return (
                    buf[off[0] : off[-1]]
                    .view(np.float32)
                    .reshape(-1, w // 4)
                )
            return np.vstack(
                [np.frombuffer(x, dtype=np.float32) for x in arr.to_pylist()]
            )

        def score(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table({"rm": pa.array([], type=pa.int64())})
            va = decode(b["vec_a"])
            vb = decode(b["vec_b"])
            cos = np.einsum("ij,ij->i", va, vb)
            hit = cos >= threshold
            a_ids = b["doc_a"].combine_chunks().to_numpy(zero_copy_only=False)
            b_ids = b["doc_b"].combine_chunks().to_numpy(zero_copy_only=False)
            rm = np.unique(np.maximum(a_ids[hit], b_ids[hit]))
            return pa.table({"rm": pa.array(rm, type=pa.int64())})

        scored = j.map_batches(
            lambda b: score(
                b.rename_columns(
                    ["vec_b" if c == "vec" else c for c in b.column_names]
                )
            ),
            batch_format="pyarrow",
        )
        # unique() yields None when every scored block is empty (no
        # pair met the threshold)
        uniq = scored.unique("rm") or []
        removed_arr = np.asarray(sorted(uniq), dtype=np.int64)

    removed_ref = ray.put(removed_arr)

    def keep(b: pa.Table) -> pa.Table:
        gone = ray.get(removed_ref)
        ids = pa.compute.cast(b[id_col], pa.int64()).to_numpy(zero_copy_only=False)
        return b.filter(pa.array(~np.isin(ids, gone)))

    return ds.map_batches(keep, batch_format="pyarrow")


def topk_cosine_pairs(
    table: pa.Table,
    *,
    k: int = 20,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pa.Table:
    """Embedding near-dup: global top-k most-similar distinct pairs
    (vec_a < vec_b), ranked (rank, vec_a, vec_b). Small-corpus exact
    path (n ≤ ~10^4: one gram matrix); see
    :func:`topk_cosine_pairs_distributed` for the scale path."""
    ids = np.asarray(table[id_col].to_pylist())
    mat = _normalize(_matrix(table[vec_col]))
    sims = mat @ mat.T
    iu = np.triu_indices(len(ids), k=1)
    vals = sims[iu]
    order = np.argsort(-vals, kind="stable")[: max(k * 4, k)]
    rows = sorted(
        ((float(vals[o]), int(ids[iu[0][o]]), int(ids[iu[1][o]])) for o in order),
        key=lambda r: (-r[0], r[1], r[2]),
    )[:k]
    return pa.table(
        {
            "rank": pa.array(range(1, len(rows) + 1), type=pa.int64()),
            "vec_a": pa.array([r[1] for r in rows], type=pa.int64()),
            "vec_b": pa.array([r[2] for r in rows], type=pa.int64()),
        }
    )


def semantic_cluster_dedup(
    ds: ray.data.Dataset,
    *,
    threshold: float = 0.9,
    n_clusters: int = 64,
    sample_limit: int = 8192,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> ray.data.Dataset:
    """SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication", arXiv:2303.09540):
    k-means-cluster the embedding space, then remove near-duplicates
    only WITHIN each cluster — quadratic work drops from n² to
    Σ m_cluster², and clusters process independently.

    Survivor rule matches :func:`cosine_dedup_distributed`: a vector is
    removed iff some LOWER-id vector in its cluster has cosine ≥
    threshold (min id of a duplicate set survives).

    Scale shape: centroids from a bounded driver-side sample
    (broadcast once); assignment is one matmul per batch; co-location
    is ONE volume-bounded range sort on the cluster id
    (stages/smallagg.sorted_runs_fold — a cluster's rows land in one
    block); each run scores an fp32 gram matrix and emits ONLY removal
    ids. At web scale pick ``n_clusters ∝ n`` so the per-cluster m²
    matrix stays bounded (the paper runs ~10⁵ clusters); misses are
    exactly the dup pairs whose endpoints straddle a cluster boundary —
    the SemDeDup tradeoff (near-identical points share an argmax
    centroid almost surely).
    """
    from logpipe_ray.stages.smallagg import sorted_runs_fold

    sample_tbl = pa.concat_tables(
        ray.get(ds.limit(sample_limit).to_arrow_refs())
    )
    cents = kmeans_centroids(_matrix(sample_tbl[vec_col]), n_clusters)
    cents_ref = ray.put(cents.astype(np.float32))

    def assign(b: pa.Table) -> pa.Table:
        c = ray.get(cents_ref)
        mat = _normalize(_matrix(b[vec_col])).astype(np.float32)
        cl = np.argmax(mat @ c.T, axis=1).astype(np.int64)
        width = 4 * mat.shape[1]
        n = mat.shape[0]
        offs = pa.array(np.arange(0, (n + 1) * width, width, dtype=np.int32))
        vec = pa.BinaryArray.from_buffers(
            pa.binary(),
            n,
            [None, offs.buffers()[1], pa.py_buffer(np.ascontiguousarray(mat).tobytes())],
        )
        return pa.table(
            {
                "cluster": pa.array(cl),
                "vid": pa.compute.cast(b[id_col], pa.int64()),
                "vec": vec,
            }
        )

    tagged = ds.map_batches(assign, batch_format="pyarrow")

    rm_schema = pa.schema([("rm", pa.int64())])

    def per_cluster(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return rm_schema.empty_table()
        cl = b["cluster"].combine_chunks().to_numpy(zero_copy_only=False)
        vid = b["vid"].combine_chunks().to_numpy(zero_copy_only=False)
        arr = b["vec"].combine_chunks()
        off = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
            arr.offset : arr.offset + len(arr) + 1
        ].astype(np.int64)
        buf = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
        w = int(off[1] - off[0]) if len(off) > 1 else 0
        mat = buf[off[0] : off[-1]].view(np.float32).reshape(-1, max(w, 4) // 4)
        out: list[np.ndarray] = []
        starts = np.concatenate(([0], np.flatnonzero(cl[1:] != cl[:-1]) + 1))
        ends = np.concatenate((starts[1:], [len(cl)]))
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            order = np.argsort(vid[s:e], kind="stable")
            ids = vid[s:e][order]
            m = mat[s:e][order]
            sims = m @ m.T
            hit = np.triu(sims >= threshold, k=1)  # i<j in id order
            dup = hit.any(axis=0)
            if dup.any():
                out.append(ids[dup])
        if not out:
            return rm_schema.empty_table()
        return pa.table(
            {"rm": pa.array(np.unique(np.concatenate(out)), type=pa.int64())}
        )

    rm_ds = sorted_runs_fold(tagged, "cluster", per_cluster, rows_per_block=262144)
    removed = np.asarray(sorted(rm_ds.unique("rm") or []), dtype=np.int64)
    removed_ref = ray.put(removed)

    def keep(b: pa.Table) -> pa.Table:
        gone = ray.get(removed_ref)
        ids = pa.compute.cast(b[id_col], pa.int64()).to_numpy(zero_copy_only=False)
        return b.filter(pa.array(~np.isin(ids, gone)))

    return ds.map_batches(keep, batch_format="pyarrow")
