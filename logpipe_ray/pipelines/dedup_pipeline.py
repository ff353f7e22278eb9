"""MinHash + LSH near-duplicate pipeline (the sub-quadratic scale path).

Shape (ray_guide "Near-dup (MinHash-LSH)"):

    documents
      → map_batches(explode_lsh_bands)      # doc → (band_id, band_hash, doc_id)
      → groupby(band_id, band_hash)          # ONE shuffle of tiny rows
      → map_groups(candidate_pairs)          # pairs within each bucket
      → dedupe pairs (groupby first)         # a pair can hit many bands
      → verify exact Jaccard per pair        # broadcast shingle sets
      → pairs with jaccard ≥ threshold

Only 24-byte band rows and id pairs ever shuffle — the text stays in
the map stage. Candidate verification broadcasts the (tiny) shingle
sets; at 100 TB the verify side would re-read just the candidate docs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from logpipe_ray.stages.dedup import (
    candidate_pairs_from_bucket,
    explode_lsh_bands,
    jaccard,
    word_shingles,
)

PAIR_SCHEMA = pa.schema(
    [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("jaccard_bp", pa.int64())]
)


def minhash_lsh_pairs(
    sf_dir: str,
    *,
    threshold_bp: int = 2000,
    k: int = 128,
    bands: int = 16,
    ngram: int = 3,
) -> pa.Table:
    """Verified near-dup pairs over the documents table."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def explode(b: pa.Table) -> pa.Table:
        b2 = pa.table(
            {
                "doc_id": pa.compute.cast(b["doc_id"], pa.string()),
                "text": b["text"],
            }
        )
        return explode_lsh_bands(b2, k=k, bands=bands, ngram=ngram)

    band_rows = ds.map_batches(explode, batch_format="pyarrow")
    candidates = band_rows.groupby(["band_id", "band_hash"]).map_groups(
        candidate_pairs_from_bucket, batch_format="pyarrow"
    )
    # a near-dup pair collides in many bands — dedupe before verifying
    seen: set[tuple[str, str]] = set()
    for part in candidates.iter_batches(batch_format="pyarrow"):
        for a, b in zip(part["doc_a"].to_pylist(), part["doc_b"].to_pylist()):
            seen.add((a, b))

    if not seen:
        return PAIR_SCHEMA.empty_table()

    # verify: broadcast shingle sets of candidate docs only
    need = {d for p in seen for d in p}
    shingles: dict[str, np.ndarray] = {}
    for part in ds.iter_batches(batch_format="pyarrow"):
        for doc_id, text in zip(
            part["doc_id"].to_pylist(), part["text"].to_pylist()
        ):
            key = str(doc_id)
            if key in need:
                shingles[key] = word_shingles(text or "", ngram)
    rows = []
    for a, b in sorted(seen):
        j = jaccard(shingles[a], shingles[b])
        bp = int(j * 10000)
        if bp >= threshold_bp:
            rows.append((int(a), int(b), bp))
    rows.sort(key=lambda r: (-r[2], r[0], r[1]))
    return pa.table(
        {
            "doc_a": pa.array([r[0] for r in rows], type=pa.int64()),
            "doc_b": pa.array([r[1] for r in rows], type=pa.int64()),
            "jaccard_bp": pa.array([r[2] for r in rows], type=pa.int64()),
        }
    )


def near_dup_clusters(
    sf_dir: str, *, threshold_bp: int = 2000, **lsh_kwargs
) -> pa.Table:
    """Cluster near-duplicates: LSH candidates → verified pairs →
    connected components → (doc_id, cluster_rep). Docs with no near-dup
    are omitted (they are their own singleton cluster implicitly)."""
    from logpipe_ray.stages.dedup import union_find_clusters

    pairs_tbl = minhash_lsh_pairs(sf_dir, threshold_bp=threshold_bp, **lsh_kwargs)
    pairs = list(
        zip(pairs_tbl["doc_a"].to_pylist(), pairs_tbl["doc_b"].to_pylist())
    )
    clusters = union_find_clusters(pairs)
    items = sorted(clusters.items())
    return pa.table(
        {
            "doc_id": pa.array([k for k, _ in items], type=pa.int64()),
            "cluster_rep": pa.array([v for _, v in items], type=pa.int64()),
        }
    )
