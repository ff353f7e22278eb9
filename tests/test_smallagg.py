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
