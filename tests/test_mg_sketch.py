"""Misra–Gries heavy-hitters sketch (functions/sketches.py): the
undercount/superset guarantee on a skewed stream where truncation
actually fires (capacity ≪ vocabulary), merge associativity across
arbitrary partial splits, and the provably-exact top-k composition
including its cannot-certify failure mode."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data

from logpipe_ray.functions.sketches import (
    heavy_hitters_exact_topk,
    mg_merge_table,
    mg_partial_table,
)


def _zipf_stream(n=60000, vocab=3000, seed=11):
    rng = np.random.default_rng(seed)
    # zipf-ish: item i with weight 1/(i+1); heavy head, long tail
    w = 1.0 / np.arange(1, vocab + 1)
    ids = rng.choice(vocab, size=n, p=w / w.sum())
    return np.array([f"w{i:05d}" for i in ids], dtype=object)


def _summary_parts(tbl: pa.Table):
    null_mask = pc.is_null(tbl["item"])
    d = int(pc.sum(tbl.filter(null_mask)["n"]).as_py() or 0)
    rest = tbl.filter(pc.invert(null_mask))
    items = dict(zip(rest["item"].to_pylist(), rest["n"].to_pylist()))
    return items, d


def test_mg_undercount_and_superset_guarantee():
    stream = _zipf_stream()
    m = 64
    # split into 7 uneven partials, merge once
    cuts = [0, 1000, 9000, 15000, 30000, 31000, 52000, len(stream)]
    parts = [
        mg_partial_table(pa.array(stream[a:b], type=pa.string()), m=m)
        for a, b in zip(cuts[:-1], cuts[1:])
    ]
    merged = mg_merge_table(pa.concat_tables(parts), m=m)
    items, d = _summary_parts(merged)
    assert 0 < len(items) <= m
    assert d > 0  # truncation actually fired
    vals, true = np.unique(stream, return_counts=True)
    truth = dict(zip(vals, true))
    # every retained count is a lower bound within D of the truth
    for it, n in items.items():
        assert 0 < n <= truth[it]
        assert truth[it] - n <= d
    # superset: any item with true count > D is retained
    for it, tc in truth.items():
        if tc > d:
            assert it in items, f"{it} (count {tc} > D {d}) missing"


def test_mg_merge_matches_single_pass_bound():
    # merging partials can only raise D vs sketching the whole stream
    # at once, and both must satisfy the guarantee for the same m
    stream = _zipf_stream(n=20000, vocab=800, seed=3)
    m = 48
    whole = mg_partial_table(pa.array(stream, type=pa.string()), m=m)
    _, d_whole = _summary_parts(whole)
    halves = pa.concat_tables(
        [
            mg_partial_table(pa.array(stream[:9000], type=pa.string()), m=m),
            mg_partial_table(pa.array(stream[9000:], type=pa.string()), m=m),
        ]
    )
    _, d_merged = _summary_parts(mg_merge_table(halves, m=m))
    assert d_whole <= d_merged


def test_heavy_hitters_exact_topk_matches_truth(ray_session):
    stream = _zipf_stream(n=50000, vocab=2000, seed=5)
    ds = ray.data.from_arrow(
        pa.table({"w": pa.array(stream, type=pa.string())})
    ).repartition(9)
    k = 10
    top = heavy_hitters_exact_topk(
        ds, k=k, m=256, make_values=lambda b: b["w"]
    )
    vals, true = np.unique(stream, return_counts=True)
    order = np.lexsort((vals, -true))
    exp = [(vals[i], int(true[i])) for i in order[:k]]
    got = list(zip(top["item"].to_pylist(), top["n"].to_pylist()))
    assert got == exp


def test_heavy_hitters_refuses_uncertifiable(ray_session):
    # near-uniform stream + tiny capacity: D exceeds the k-th count and
    # the composition must REFUSE rather than return a plausible lie
    rng = np.random.default_rng(9)
    stream = np.array([f"u{i:04d}" for i in rng.integers(0, 500, 30000)],
                      dtype=object)
    ds = ray.data.from_arrow(
        pa.table({"w": pa.array(stream, type=pa.string())})
    ).repartition(4)
    with pytest.raises(ValueError, match="cannot certify"):
        heavy_hitters_exact_topk(ds, k=5, m=8, make_values=lambda b: b["w"])


def test_heavy_hitters_exact_topk_multilevel_tree(ray_session):
    """150 partial blocks force fold_blocks_tree through >1 merge level
    (fanin 64): intermediate MERGED summaries are re-merged, D
    accumulates along the tree, and the certified top-k still equals
    ground truth exactly."""
    stream = _zipf_stream(n=60000, vocab=2500, seed=13)
    ds = ray.data.from_arrow(
        pa.table({"w": pa.array(stream, type=pa.string())})
    ).repartition(150)
    k = 8
    top = heavy_hitters_exact_topk(
        ds, k=k, m=512, make_values=lambda b: b["w"]
    )
    vals, true = np.unique(stream, return_counts=True)
    order = np.lexsort((vals, -true))
    exp = [(vals[i], int(true[i])) for i in order[:k]]
    got = list(zip(top["item"].to_pylist(), top["n"].to_pylist()))
    assert got == exp
