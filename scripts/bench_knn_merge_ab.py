"""A/B: per-query kNN top-k merge — Ray sort-groupby vs fold_blocks_tree.

Benches ONLY the merge stage of ``knn_topk`` (the brute-force matmul
scan is identical either way): synthesize the per-block partial top-k
tables exactly as ``BruteForceKnn`` emits them — ``n_blocks`` blocks of
``n_queries × (k+1)`` rows (query_id, neighbor_id, cosine) — and fold
them to global per-query top-k two ways:

  A (old, removed 2026-08-19): ``partials.groupby("query_id")
    .map_groups(pandas merge)`` — a keyed sort-shuffle whose reduce
    side is sized from the BLOCK count while only n_queries keys exist
    (n_queries ≪ n_blocks ⇒ most sort ranges are the schema-less empty
    blocks of stages/smallagg's module docstring), shipping the whole
    n_blocks × n_queries × (k+1) partial stream through the sort.
  B (current): ``fold_blocks_tree`` — top-k selection is associative,
    every combine task sees ≤ fanin × n_queries × (k+1) rows, no keyed
    shuffle at any corpus block count.

Interleaved A/B/B/A in ONE process (CLAUDE.md drift rule); results are
asserted identical before timing is reported.

Usage: python scripts/bench_knn_merge_ab.py [n_blocks] [n_queries] [k]
       (--tree-only: skip the groupby side — for block counts where it
        cannot finish, e.g. 5000, where it exceeded 580 s)
"""

import gc
import json
import sys
import time

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TREE_ONLY = "--tree-only" in sys.argv
_args = [a for a in sys.argv[1:] if not a.startswith("--")]
# default must FINISH with the groupby side on (5000 blocks times out
# at >580 s on the groupby path — pass it explicitly with --tree-only)
N_BLOCKS = int(_args[0]) if len(_args) > 0 else 1500
N_QUERIES = int(_args[1]) if len(_args) > 1 else 64
K = int(_args[2]) if len(_args) > 2 else 5


def synth_partials() -> ray.data.Dataset:
    """n_blocks blocks, each the partial top-(k+1) a BruteForceKnn batch
    would emit: (k+1) candidate neighbors per query, cosines seeded per
    (block, query) so the global top-k is deterministic and spread
    across blocks."""

    def one_block(b: pa.Table) -> pa.Table:
        blk = int(b["id"][0].as_py())
        rng = np.random.RandomState(blk)
        per_q = K + 1
        q = np.repeat(np.arange(N_QUERIES, dtype=np.int64), per_q)
        # neighbor ids unique per block so pairs never collide globally
        nb = (
            np.arange(N_QUERIES * per_q, dtype=np.int64)
            + blk * N_QUERIES * per_q
            + N_QUERIES  # keep clear of query ids (self-matches excluded upstream)
        )
        cs = rng.uniform(-1.0, 1.0, size=N_QUERIES * per_q)
        return pa.table(
            {
                "query_id": pa.array(q),
                "neighbor_id": pa.array(nb),
                "cosine": pa.array(cs, type=pa.float64()),
            }
        )

    return ray.data.range(N_BLOCKS, override_num_blocks=N_BLOCKS).map_batches(
        one_block, batch_format="pyarrow", batch_size=None
    )


def merge_a_groupby(partials: ray.data.Dataset) -> pd.DataFrame:
    """The pre-2026-08-19 knn_topk merge, verbatim shape."""

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "neighbor_id"], ascending=[False, True]).head(K)
        g = g.reset_index(drop=True)
        return pd.DataFrame(
            {
                "query_id": g["query_id"].astype("int64"),
                "rank": np.arange(1, len(g) + 1, dtype=np.int64),
                "neighbor_id": g["neighbor_id"].astype("int64"),
            }
        )

    return (
        partials.groupby("query_id")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
    )


def merge_b_tree(partials: ray.data.Dataset) -> pd.DataFrame:
    # the SHIPPED merge — knn_topk's actual fold, not a copy
    from logpipe_ray.stages.similarity import merge_knn_partials

    return merge_knn_partials(partials, K).to_pandas()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(["query_id", "rank"]).reset_index(drop=True)


def main() -> None:
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False)
    partials = synth_partials().materialize()
    n_rows = partials.count()
    print(
        f"partials: {N_BLOCKS} blocks x {N_QUERIES} queries x (k+1)={K + 1} "
        f"= {n_rows} rows"
    )

    results: dict[str, pd.DataFrame] = {}
    times: dict[str, list[float]] = {"groupby": [], "tree": []}
    plan = (
        (("tree", merge_b_tree), ("tree", merge_b_tree))
        if TREE_ONLY
        else (
            ("groupby", merge_a_groupby),
            ("tree", merge_b_tree),
            ("tree", merge_b_tree),
            ("groupby", merge_a_groupby),
        )
    )
    for label, fn in plan:
        gc.collect()
        t0 = time.perf_counter()
        out = fn(partials)
        dt = time.perf_counter() - t0
        times[label].append(dt)
        prev = results.get(label)
        if prev is not None:
            assert canon(prev).equals(canon(out)), f"{label} not deterministic"
        results[label] = out
        print(f"{label}: {dt:.2f}s ({len(out)} rows)")

    out = {
        "n_blocks": N_BLOCKS,
        "n_queries": N_QUERIES,
        "k": K,
        "partial_rows": n_rows,
        "tree_best_s": round(min(times["tree"]), 2),
    }
    if not TREE_ONLY:
        a, b = canon(results["groupby"]), canon(results["tree"])
        assert a.equals(b), "groupby and tree merges disagree"
        best_a = min(times["groupby"])
        out["groupby_best_s"] = round(best_a, 2)
        out["speedup"] = round(best_a / out["tree_best_s"], 2)
        out["identical"] = True
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
