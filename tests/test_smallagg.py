"""Bounded-cardinality aggregation helpers (stages/smallagg)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from logpipe_ray.stages.smallagg import (
    count_partials,
    fold_partials,
    map_groups_typed,
)


def _events(n=5000, keys=7, blocks=16):
    rng = np.random.RandomState(13)
    tbl = pa.table(
        {
            "k": pa.array(rng.randint(0, keys, n).astype(np.int64)),
            "v": pa.array(rng.randint(0, 100, n).astype(np.int64)),
            "w": pa.array(np.ones(n, dtype=np.int64)),
        }
    )
    return ray.data.from_arrow(tbl).repartition(blocks), tbl


def test_fold_partials_equals_groupby_sum(ray_session):
    ds, tbl = _events()
    got = (
        fold_partials(ds, "k", ["v", "w"])
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    exp = (
        tbl.to_pandas()
        .groupby("k", as_index=False)[["v", "w"]]
        .sum()
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)


def test_count_partials_then_fold_equals_value_counts(ray_session):
    ds, tbl = _events()
    got = (
        fold_partials(count_partials(ds, "k", out_col="n"), "k", "n")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    exp = (
        tbl.to_pandas()
        .groupby("k", as_index=False)
        .size()
        .rename(columns={"size": "n"})
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)


def test_map_groups_typed_matches_ray_map_groups(ray_session):
    ds, tbl = _events(n=2000, keys=5, blocks=8)

    def summarize(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"k": [g["k"].iloc[0]], "vmax": [g["v"].max()], "n": [len(g)]}
        )

    schema = pa.schema([("k", pa.int64()), ("vmax", pa.int64()), ("n", pa.int64())])
    got = (
        map_groups_typed(ds, "k", summarize, schema)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    pdf = tbl.to_pandas()
    exp = (
        pdf.groupby("k", as_index=False)
        .agg(vmax=("v", "max"), n=("v", "size"))
        .sort_values("k")
        .reset_index(drop=True)
    )
    exp["n"] = exp["n"].astype(np.int64)
    pd.testing.assert_frame_equal(got, exp)
    # declared schema holds exactly
    out_schema = map_groups_typed(ds, "k", summarize, schema).schema()
    assert out_schema.names == ["k", "vmax", "n"]


def test_map_groups_typed_pre_blocks_whole_groups(ray_session):
    """pre_blocks must never split a key across blocks (whole-group
    invariant the UDF relies on)."""
    ds, tbl = _events(n=3000, keys=4, blocks=12)

    def ident(g: pd.DataFrame) -> pd.DataFrame:
        # one output row per group occurrence; a split group would
        # produce >1 row for the same key
        return pd.DataFrame({"k": [g["k"].iloc[0]], "n": [len(g)]})

    schema = pa.schema([("k", pa.int64()), ("n", pa.int64())])
    got = map_groups_typed(ds, "k", ident, schema, pre_blocks=2).to_pandas()
    assert sorted(got["k"].tolist()) == sorted(set(tbl["k"].to_pylist()))
    exp_counts = tbl.to_pandas().groupby("k").size()
    for k, n in zip(got["k"], got["n"]):
        assert n == exp_counts[k]


class TestRunHelpers:
    def test_run_starts_and_ranks(self):
        import numpy as np

        from logpipe_ray.stages.smallagg import run_ranks, run_starts

        keys = np.array([1, 1, 1, 4, 4, 9])
        assert run_starts(keys).tolist() == [0, 3, 5]
        assert run_ranks(keys).tolist() == [0, 1, 2, 0, 1, 0]

    def test_run_helpers_single_and_empty(self):
        import numpy as np

        from logpipe_ray.stages.smallagg import run_ranks, run_starts

        assert run_starts(np.array([], dtype=np.int64)).tolist() == []
        assert run_ranks(np.array([], dtype=np.int64)).tolist() == []
        assert run_starts(np.array([7])).tolist() == [0]
        assert run_ranks(np.array([7])).tolist() == [0]

    def test_run_helpers_string_keys(self):
        import numpy as np

        from logpipe_ray.stages.smallagg import run_ranks

        keys = np.array(["a", "a", "b", "b", "b", "c"], dtype=object)
        assert run_ranks(keys).tolist() == [0, 1, 0, 1, 2, 0]


class TestSortedRunsFold:
    """sorted_runs_fold — the one-range-sort global fold that dedup
    candidate counting, keep-best, label propagation, and the band join
    all sit on. Checks the fold result against pandas groupby and the
    whole-key-per-block invariant the combine relies on."""

    @pytest.mark.parametrize("seed,n,keys,rpb", [
        (1, 4000, 9, 512),       # many blocks, small cardinality
        (2, 4000, 1500, 256),    # cardinality ≈ rows/2
        (3, 3000, 5, 100000),    # single block
        (4, 6000, 40, 333),      # skew below
    ])
    def test_matches_pandas_groupby(self, ray_session, seed, n, keys, rpb):
        from logpipe_ray.stages.smallagg import run_starts, sorted_runs_fold

        rng = np.random.RandomState(seed)
        k = rng.randint(0, keys, n).astype(np.int64)
        if seed == 4:  # one hot key holding half the rows
            k[: n // 2] = 7
        v = rng.randint(-50, 50, n).astype(np.int64)
        ds = ray.data.from_arrow(
            pa.table({"k": pa.array(k), "v": pa.array(v)})
        ).repartition(11)

        out_schema = pa.schema(
            [("k", pa.int64()), ("n", pa.int64()), ("mn", pa.int64()),
             ("sm", pa.int64())]
        )

        def combine(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return out_schema.empty_table()
            kk = b["k"].combine_chunks().to_numpy(zero_copy_only=False)
            vv = b["v"].combine_chunks().to_numpy(zero_copy_only=False)
            order = np.argsort(kk, kind="stable")
            kk, vv = kk[order], vv[order]
            starts = run_starts(kk)
            ends = np.concatenate((starts[1:], [len(kk)]))
            return pa.table(
                {
                    "k": pa.array(kk[starts], type=pa.int64()),
                    "n": pa.array(ends - starts, type=pa.int64()),
                    "mn": pa.array(np.minimum.reduceat(vv, starts), type=pa.int64()),
                    "sm": pa.array(np.add.reduceat(vv, starts), type=pa.int64()),
                }
            )

        got = (
            sorted_runs_fold(ds, "k", combine, rows_per_block=rpb)
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        exp = (
            pd.DataFrame({"k": k, "v": v})
            .groupby("k", as_index=False)
            .agg(n=("v", "size"), mn=("v", "min"), sm=("v", "sum"))
            .astype(np.int64)
            .sort_values("k")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)
        # fold emitted each key exactly once ⇒ no key straddled blocks
        assert got["k"].is_unique


def test_fold_partials_tree_matches_flat_fold(ray_session):
    """Hierarchical fold over a many-block bounded-domain partial
    stream: equals the flat groupby result, every combine input stays
    ≤ fanin × |domain| rows, and a 1-block stream still gets its final
    combine (duplicate keys within the block are summed)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from logpipe_ray.stages.smallagg import fold_partials_tree

    rng = np.random.default_rng(7)
    # 40 partial blocks over a 3×5 key domain, duplicate keys everywhere
    tables = []
    for _ in range(40):
        n = int(rng.integers(5, 20))
        tables.append(
            pa.table(
                {
                    "t": rng.choice(["a", "b", "c"], n),
                    "c": rng.integers(0, 5, n),
                    "n": rng.integers(1, 100, n),
                }
            )
        )
    ds = ray.data.from_arrow(tables)  # 40 blocks
    got = (
        fold_partials_tree(ds, ["t", "c"], "n", fanin=4)
        .to_pandas()
        .sort_values(["t", "c"])
        .reset_index(drop=True)
    )
    exp = (
        pa.concat_tables(tables)
        .to_pandas()
        .groupby(["t", "c"], as_index=False)["n"]
        .sum()
        .sort_values(["t", "c"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert got.set_index(["t", "c"]).index.is_unique

    # 1-block stream with in-block duplicate keys: still combined
    one = ray.data.from_arrow(
        pa.table({"t": ["x", "x"], "c": [1, 1], "n": [2, 3]})
    )
    df = fold_partials_tree(one, ["t", "c"], "n").to_pandas()
    assert len(df) == 1 and int(df["n"][0]) == 5


def test_fold_blocks_tree_cap_merge_matches_flat(ray_session):
    """Generic tree fold with a selection-merge combine (keep the 3
    smallest ids per key — the source_cap shape): multiple tree levels
    (fanin=2 over 33 blocks) produce exactly the flat global answer,
    and every level's combine output stays ≤ cap × |keys| rows."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from logpipe_ray.stages.smallagg import fold_blocks_tree, run_ranks

    CAP = 3

    def cap_combine(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.select(["k", "id"])
        k = b["k"].combine_chunks().to_numpy(zero_copy_only=False)
        i = b["id"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((i, k))
        keep = order[run_ranks(k[order]) < CAP]
        return pa.table(
            {
                "k": pa.array(k[keep], type=pa.string()),
                "id": pa.array(i[keep], type=pa.int64()),
            }
        )

    rng = np.random.default_rng(11)
    tables = []
    all_k, all_i = [], []
    for _ in range(33):
        n = int(rng.integers(4, 12))
        ks = rng.choice(["a", "b", "c", "d"], n)
        ids = rng.choice(10_000, n, replace=False).astype(np.int64)
        all_k.append(ks)
        all_i.append(ids)
        tables.append(pa.table({"k": ks, "id": ids}))
    ds = ray.data.from_arrow(tables).map_batches(
        cap_combine, batch_format="pyarrow"
    )
    got = (
        fold_blocks_tree(ds, cap_combine, fanin=2)
        .to_pandas()
        .sort_values(["k", "id"])
        .reset_index(drop=True)
    )
    exp = (
        pd.DataFrame(
            {"k": np.concatenate(all_k), "id": np.concatenate(all_i)}
        )
        .sort_values(["k", "id"])
        .groupby("k", as_index=False)
        .head(CAP)
        .sort_values(["k", "id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert got.groupby("k").size().max() <= CAP

    import pytest

    with pytest.raises(ValueError):
        fold_blocks_tree(ds, cap_combine, fanin=1)


def test_fold_blocks_tree_fanin_bound(ray_session):
    """Ceil-division level sizing: no combine task may receive more
    than ~fanin blocks' worth of rows. 127 one-row partials at
    fanin=64 must fold as 127→2→1 (floor division would plan ONE task
    holding all 127 rows — up to 2·fanin−1 — breaking the documented
    per-task bound)."""
    import pyarrow as pa
    import ray.data

    from logpipe_ray.stages.smallagg import fold_blocks_tree

    FANIN = 64
    N = 2 * FANIN - 1  # 127: the floor-division worst case

    def summing(b: pa.Table) -> pa.Table:
        assert b.num_rows <= FANIN, (
            f"combine saw {b.num_rows} rows > fanin={FANIN}"
        )
        return pa.table({"n": pa.array([sum(b["n"].to_pylist())], type=pa.int64())})

    ds = ray.data.from_arrow(
        [pa.table({"n": pa.array([1], type=pa.int64())}) for _ in range(N)]
    )
    out = fold_blocks_tree(ds, summing, fanin=FANIN).take_all()
    assert [r["n"] for r in out] == [N]


def test_top_k_string_keys(ray_session):
    """top_k is key-dtype-generic: string keys (domains) rank by
    cents-sum desc with key-asc tie-break — the capability the old
    groupby implementation had and the int64 cast briefly dropped."""
    import pyarrow as pa
    import ray.data

    from logpipe_ray.stages.window import top_k

    t = pa.table(
        {
            "domain": ["b.com", "a.com", "c.com", "a.com", "b.com", "d.com"],
            "value": [1.0, 2.0, 3.5, 1.5, 2.5, 3.5],
        }
    )
    out = top_k(
        ray.data.from_arrow(t).repartition(3),
        key_col="domain",
        value_col="value",
        k=3,
    ).take_all()
    # sums: a.com 350, b.com 350, c.com 350, d.com 350 → key-asc ties
    assert [(r["domain"], r["total_cents"]) for r in out] == [
        ("a.com", 350),
        ("b.com", 350),
        ("c.com", 350),
    ]
