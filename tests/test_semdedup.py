"""SemDeDup-style cluster-then-dedup (stages/similarity.semantic_cluster_dedup):
planted-partner removal exactness, agreement with the global exact path,
and the no-duplicates identity."""

import numpy as np
import pyarrow as pa
import ray.data

from logpipe_ray.stages.similarity import (
    cosine_dedup_distributed,
    semantic_cluster_dedup,
)


def _corpus(n=4000, d=32, every=50, seed=23):
    rng = np.random.RandomState(seed)
    base = rng.randn(n, d).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    planted = np.arange(0, n, every)
    partners = base[planted] + 0.005 * rng.randn(len(planted), d).astype(np.float32)
    ids = np.concatenate([np.arange(n), planted + n]).astype(np.int64)
    mat = np.concatenate([base, partners])
    tbl = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.array(
                [r.tolist() for r in mat], type=pa.list_(pa.float32())
            ),
        }
    )
    return tbl, n, set((planted + n).tolist())


def _survivors(ds) -> set:
    out = set()
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=65536):
        out.update(b["vec_id"].to_pylist())
    return out


def test_semdedup_removes_planted_no_false_removals(ray_session):
    tbl, n, planted = _corpus()
    ds = ray.data.from_arrow(tbl).repartition(8)
    surv = _survivors(
        semantic_cluster_dedup(ds, threshold=0.9, n_clusters=16)
    )
    # precision is absolute: no base vector may ever be removed
    assert set(range(n)) <= surv
    # recall is bounded by cluster-boundary straddles (the documented
    # SemDeDup miss mode — observed: 1 of 80 partners lands in a
    # different argmax cell than its base); require ≥ 95%
    missed = surv & planted
    assert len(missed) <= max(1, len(planted) // 20), sorted(missed)


def test_semdedup_subset_of_global_exact(ray_session):
    # within-cluster dedup can only remove a SUBSET of what the global
    # exact path removes (it sees a subset of the pairs), and misses
    # only cluster-boundary straddles — so global survivors ⊆ sem
    # survivors, with a bounded gap
    tbl, n, _ = _corpus(n=2500, every=40, seed=5)
    ds1 = ray.data.from_arrow(tbl).repartition(6)
    ds2 = ray.data.from_arrow(tbl).repartition(6)
    sem = _survivors(semantic_cluster_dedup(ds1, threshold=0.9, n_clusters=12))
    glob = _survivors(
        cosine_dedup_distributed(ds2, threshold=0.9, chunk_rows=512)
    )
    assert glob <= sem
    assert len(sem - glob) <= max(1, (len(tbl) - len(glob)) // 20)


def test_semdedup_no_dups_keeps_everything(ray_session):
    rng = np.random.RandomState(3)
    mat = rng.randn(1500, 24).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(1500, dtype=np.int64)),
            "embedding": pa.array(
                [r.tolist() for r in mat], type=pa.list_(pa.float32())
            ),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(4)
    surv = _survivors(semantic_cluster_dedup(ds, threshold=0.9, n_clusters=8))
    assert surv == set(range(1500))


def test_ann_occupancy_scaling_equivalence_and_recall(ray_session):
    """ann_knn_bucketed(n_rows=...) raises planes to
    ceil(log2(n/target)) — results must EQUAL the explicit-planes call
    (same seed → same hyperplanes), and planted near-identical
    neighbors must still be found at multiprobe=2."""
    from logpipe_ray.stages.similarity import ann_knn_bucketed

    rng = np.random.RandomState(17)
    n, d = 30000, 16
    base = rng.randn(n, d).astype(np.float32)
    planted = np.arange(0, 400 * 50, 50)  # 400 queries' partners
    partners = base[planted] + 0.003 * rng.randn(len(planted), d).astype(
        np.float32
    )
    ids = np.concatenate([np.arange(n), planted + n]).astype(np.int64)
    mat = np.concatenate([base, partners])
    tbl = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.array(
                [r.tolist() for r in mat], type=pa.list_(pa.float32())
            ),
        }
    )
    qids = [int(i) for i in planted[:40]]
    qmat = base[planted[:40]]

    def run(**kw):
        ds = ray.data.from_arrow(tbl).repartition(6)
        out = ann_knn_bucketed(ds, qids, qmat, k=3, multiprobe=2, **kw)
        rows = sorted(
            (r["query_id"], r["rank"], r["neighbor_id"])
            for b in out.iter_batches(batch_format="pyarrow", batch_size=65536)
            for r in b.to_pylist()
        )
        return rows

    # ceil(log2(30400 / 128)) = 8
    scaled = run(n_planes=4, n_rows=len(ids), target_bucket_rows=128)
    explicit = run(n_planes=8)
    assert scaled == explicit
    # rank-1 neighbor of query q must be its planted partner q+n
    top1 = {q: nb for q, rk, nb in scaled if rk == 1}
    hits = sum(1 for q in qids if top1.get(q) == q + n)
    assert hits >= int(0.9 * len(qids)), f"{hits}/{len(qids)}"


def test_merge_knn_partials_tree_exact(ray_session):
    """merge_knn_partials (the exported knn_topk fold) on a many-block
    synthetic partial stream equals a single global pandas top-k:
    cosine desc, neighbor-id-asc tie-break, ranks 1..k per query —
    including across a multi-level tree (60 blocks > fanin// levels)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from logpipe_ray.stages.similarity import merge_knn_partials

    K, NQ, NB = 3, 7, 60
    rng = np.random.RandomState(7)
    tables, frames = [], []
    for blk in range(NB):
        q = np.repeat(np.arange(NQ, dtype=np.int64), K + 1)
        nb = np.arange(NQ * (K + 1), dtype=np.int64) + blk * NQ * (K + 1) + NQ
        cs = np.round(rng.uniform(-1, 1, NQ * (K + 1)), 3)  # forced ties
        tables.append(
            pa.table(
                {
                    "query_id": pa.array(q),
                    "neighbor_id": pa.array(nb),
                    "cosine": pa.array(cs, type=pa.float64()),
                }
            )
        )
        frames.append(
            pd.DataFrame({"query_id": q, "neighbor_id": nb, "cosine": cs})
        )
    got = (
        merge_knn_partials(ray.data.from_arrow(tables), K)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    exp = (
        pd.concat(frames)
        .sort_values(
            ["query_id", "cosine", "neighbor_id"],
            ascending=[True, False, True],
        )
        .groupby("query_id")
        .head(K)
        .reset_index(drop=True)
    )
    exp["rank"] = exp.groupby("query_id").cumcount() + 1
    exp = exp[["query_id", "rank", "neighbor_id"]].astype("int64")
    pd.testing.assert_frame_equal(got, exp)
