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
    """Per-batch corpus × broadcast-queries cosine top-k (task mode)."""

    def __init__(
        self,
        queries_ref,
        *,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        k: int = 5,
    ):
        self.queries_ref = queries_ref
        self.vec_col = vec_col
        self.id_col = id_col
        self.k = k
        self._cache = None

    def _queries(self):
        if self._cache is None:
            q = (
                ray.get(self.queries_ref)
                if isinstance(self.queries_ref, ray.ObjectRef)
                else self.queries_ref
            )
            self._cache = (q["ids"], _normalize(np.asarray(q["matrix"])))
        return self._cache

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Emit per-batch partial top-k: (query_id, neighbor_id, cosine).

        A downstream per-query reduction merges partials to global top-k.
        """
        q_ids, q_mat = self._queries()
        ids = np.asarray(batch[self.id_col].to_pylist())
        mat = _normalize(_matrix(batch[self.vec_col]))
        sims = mat @ q_mat.T  # (n_corpus, n_queries)
        out_q, out_n, out_s = [], [], []
        k = min(self.k, len(ids))
        for qi, qid in enumerate(q_ids):
            col = sims[:, qi]
            top = np.argpartition(-col, k - 1)[:k] if k < len(ids) else np.arange(len(ids))
            for t in top:
                if ids[t] == qid:
                    continue  # exclude self-match
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


def knn_topk(
    ds: ray.data.Dataset,
    query_ids: list[int],
    query_matrix: np.ndarray,
    *,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    batch_size: int = 4096,
) -> ray.data.Dataset:
    """Global top-k neighbors per query: partial top-k per batch →
    per-query merge (pandas sort inside map_groups) → ranked rows
    (query_id, rank, neighbor_id). Rank ties broken by neighbor_id."""
    import pandas as pd

    ref = ray.put({"ids": list(query_ids), "matrix": np.asarray(query_matrix)})
    partials = ds.map_batches(
        BruteForceKnn(ref, vec_col=vec_col, id_col=id_col, k=k + 1),
        batch_format="pyarrow",
        batch_size=batch_size,
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["cosine", "neighbor_id"], ascending=[False, True]
        ).head(k)
        g = g.reset_index(drop=True)
        return pd.DataFrame(
            {
                "query_id": g["query_id"].astype("int64"),
                "rank": np.arange(1, len(g) + 1, dtype=np.int64),
                "neighbor_id": g["neighbor_id"].astype("int64"),
            }
        )

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


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
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> ray.data.Dataset:
    """ANN: only corpus rows whose LSH bucket matches some query bucket
    are scanned (bucket filter inside map_batches — a semi join against
    the broadcast query-bucket set), then exact cosine top-k as usual.
    Recall < 1 by construction; measured vs brute force in tests."""
    q_mat = _normalize(np.asarray(query_matrix, dtype=np.float64))
    q_buckets = set(hyperplane_signatures(q_mat, n_planes).tolist())

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


def topk_cosine_pairs(
    table: pa.Table,
    *,
    k: int = 20,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pa.Table:
    """Embedding near-dup: global top-k most-similar distinct pairs
    (vec_a < vec_b), ranked (rank, vec_a, vec_b). Small-corpus exact
    path (n ≤ ~10^4: one gram matrix); the LSH bucketing above is the
    scale path."""
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
